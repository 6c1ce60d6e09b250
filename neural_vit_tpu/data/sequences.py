"""Sliding-window trial-sequence construction as flat index arrays.

The reference builds Python lists of row-index lists per session
(`data/data_loader.py:128-150`); here the same windowing semantics produce a
single `(n_sequences, n_trials)` int32 gather index plus `(n_sequences,)`
labels — the shape the TPU input pipeline wants: batches are pure
`jnp.take` gathers (device-resident mode) or one contiguous host gather per
batch, with no per-item Python.

Windowing semantics (identical to the reference):
  * rows grouped by session, sorted by trial_num (stable);
  * a session with mixed conditions is a hard error;
  * sessions with fewer than n_trials rows are skipped;
  * windows of n_trials rows every `stride`, label = label_map[condition]
    (default {'FMR1': 1}, anything else 0);
  * windows containing any empty spectrogram are dropped.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

DEFAULT_LABEL_MAP = {"FMR1": 1}


@dataclass
class SequenceIndex:
    """Flat sequence-window index over a trials table."""

    indices: np.ndarray          # (n_seq, n_trials) int32 row indices
    labels: np.ndarray           # (n_seq,) int32
    sessions: np.ndarray         # (n_seq,) object — session id per sequence

    def __len__(self) -> int:
        return self.indices.shape[0]


def build_sequence_index(
    df: pd.DataFrame,
    *,
    n_trials: int,
    stride: int,
    label_map: Optional[Dict[str, int]] = None,
    valid_rows: Optional[np.ndarray] = None,
) -> SequenceIndex:
    """Build the window index from a DataFrame with columns
    session / condition / trial_num.

    Args:
        valid_rows: optional (n_rows,) bool — False marks rows whose
            spectrogram is empty; windows touching them are dropped
            (reference `data_loader.py:145-146`).
    """
    label_map = DEFAULT_LABEL_MAP if label_map is None else label_map
    if valid_rows is None:
        valid_rows = np.ones(len(df), dtype=bool)
    valid_rows = np.asarray(valid_rows, dtype=bool)

    all_indices = []
    all_labels = []
    all_sessions = []
    for session_id, group in df.groupby("session"):
        group = group.sort_values("trial_num", kind="stable")
        if group["condition"].nunique() != 1:
            raise ValueError(f"Session {session_id} has mixed conditions.")
        label = label_map.get(group["condition"].iloc[0], 0)
        rows = group.index.to_numpy()
        if rows.shape[0] < n_trials:
            continue
        for start in range(0, rows.shape[0] - n_trials + 1, stride):
            window = rows[start:start + n_trials]
            if not valid_rows[window].all():
                continue
            all_indices.append(window)
            all_labels.append(label)
            all_sessions.append(session_id)

    if not all_indices:
        return SequenceIndex(
            indices=np.zeros((0, n_trials), np.int32),
            labels=np.zeros((0,), np.int32),
            sessions=np.asarray([], dtype=object),
        )
    return SequenceIndex(
        indices=np.stack(all_indices).astype(np.int32),
        labels=np.asarray(all_labels, np.int32),
        sessions=np.asarray(all_sessions, dtype=object),
    )


def label_counts(labels: Sequence[int]) -> np.ndarray:
    """Per-class counts sized to max(label)+1 (reference
    `train.py:157-160`)."""
    labels = np.asarray(labels)
    if labels.size == 0:
        raise ValueError("Training dataset has no labels.")
    n_classes = int(labels.max()) + 1
    return np.bincount(labels, minlength=n_classes)


def sequence_feature(specs: np.ndarray, mode: str) -> np.ndarray:
    """Classical-baseline feature reduction of one (K, F, T) sequence
    (reference `baselines/common.py:98-109`)."""
    if mode == "trial_time_stats":
        reduced = specs.mean(axis=2)  # (K, F)
        return np.concatenate(
            [reduced.mean(axis=0).ravel(), reduced.std(axis=0).ravel()]
        ).astype(np.float32)
    if mode == "trial_stats":
        return np.concatenate(
            [specs.mean(axis=0).ravel(), specs.std(axis=0).ravel()]
        ).astype(np.float32)
    raise ValueError(f"Unknown feature mode: {mode}")


def parse_trace(value) -> np.ndarray:
    """Parse one raw trace cell: ndarray, list, or the BigQuery string form
    "[v1, v2, …]" (reference `preprocessing_core.py:6-19`)."""
    if isinstance(value, np.ndarray):
        return value
    if isinstance(value, list):
        return np.asarray(value)
    if isinstance(value, str):
        cleaned = value.strip()
        if cleaned.startswith("[") and cleaned.endswith("]"):
            cleaned = cleaned[1:-1]
        cleaned = cleaned.replace(",", " ").strip()
        if not cleaned:
            return np.array([])
        return np.fromstring(cleaned, sep=" ")
    return np.asarray(value)


def stack_traces(
    trace_cells: Sequence, expected_len: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Parse + stack a column of raw traces into a dense (n, L) float32 array
    and a validity mask (False where a trace is empty/short).

    String columns (the BigQuery "[v1, v2, …]" form) go through the native
    C++ column parser (`neural_vit_tpu/native`) when available — one C call
    for the whole column instead of a Python loop.
    """
    if (
        expected_len is not None
        and len(trace_cells) > 0
        and all(isinstance(t, str) for t in trace_cells)
    ):
        from neural_vit_tpu import native

        result = native.parse_string_traces(list(trace_cells), expected_len)
        if result is not None:
            return result
    parsed = [parse_trace(t) for t in trace_cells]
    if expected_len is None:
        lens = [p.size for p in parsed if p.size > 0]
        if not lens:
            raise ValueError("All traces are empty.")
        expected_len = int(np.bincount(lens).argmax())
    out = np.zeros((len(parsed), expected_len), np.float32)
    valid = np.zeros(len(parsed), bool)
    for i, p in enumerate(parsed):
        if p.size >= expected_len:
            out[i] = p[:expected_len]
            valid[i] = True
    return out, valid
