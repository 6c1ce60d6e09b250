"""Local (in-memory) preprocessing path — the pickle-able sequence workflow
(reference `data/preprocessing_local.py`).

For small local datasets: parse + baseline-correct (+ window) a raw trials
DataFrame, then build per-session sliding-window sequence dicts carrying the
raw traces — the form consumed by `create_session_splits` and by on-the-fly
spectrogram training. Heavy math (baseline/window) is vectorized numpy here;
the spectrogram itself happens later on device.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

from neural_vit_tpu.data.sequences import parse_trace


def build_dataset(
    raw_data: pd.DataFrame,
    fs: int = 1000,
    apply_time_window: bool = False,
    start_time: float = 0.0,
    end_time: float = 5.0,
    baseline_end: float = 2.0,
) -> pd.DataFrame:
    """Parse trace cells and baseline-correct (+ optionally window)."""
    dataset = raw_data.copy()
    traces = [parse_trace(t).astype(np.float64) for t in dataset["trace"]]
    nb = int(baseline_end * fs)
    traces = [t - (t[:nb].mean() if t.size else 0.0) for t in traces]
    if apply_time_window:
        s, e = int(start_time * fs), int(end_time * fs)
        traces = [t[s:e] for t in traces]
    dataset["trace"] = traces
    return dataset


def build_trial_sequences(
    df: pd.DataFrame,
    n_trials: int = 8,
    stride: int = 4,
    min_trials: Optional[int] = None,
) -> List[dict]:
    """Sliding-window sequences of raw traces per session.

    Returns dicts {'traces': (n_trials, n_samples), 'label': int,
    'session': id, 'start_trial': int}; label 1 iff condition == 'FMR1';
    mixed-condition sessions are a hard error.
    """
    min_trials = n_trials if min_trials is None else min_trials
    sequences = []
    for session_id, session_df in df.groupby("session"):
        session_df = session_df.sort_values("trial_num", kind="stable")
        if len(session_df) < min_trials:
            continue
        if session_df["condition"].nunique() != 1:
            raise ValueError(f"Session {session_id} has mixed conditions.")
        label = 1 if session_df["condition"].iloc[0] == "FMR1" else 0
        traces = np.stack(session_df["trace"].to_list())
        for start in range(0, traces.shape[0] - n_trials + 1, stride):
            sequences.append(
                {
                    "traces": traces[start:start + n_trials],
                    "label": label,
                    "session": session_id,
                    "start_trial": start,
                }
            )
    return sequences
