"""Synthetic LFP dataset generator for tests and benchmarks.

The reference's local tests depend on a gitignored BigQuery sample parquet
(`local_tests/test_pipeline.py:9-26`); we replace it with a deterministic
generator producing the same schema (session / condition / trial_num /
stimulus metadata / trace) with a learnable class difference: FMR1 sessions
carry elevated gamma-band (30-80 Hz) power and altered 1/f slope relative to
WT — enough structure that the full pipeline can reach high AUC on held-out
sessions, which end-to-end training tests assert.
"""

from __future__ import annotations


import numpy as np
import pandas as pd


def synthetic_lfp_frame(
    n_sessions: int = 8,
    trials_per_session: int = 24,
    trace_len: int = 5500,
    fs: int = 1000,
    seed: int = 0,
    as_string: bool = False,
) -> pd.DataFrame:
    """Generate a raw-trials DataFrame in the BigQuery export schema.

    Args:
        as_string: serialize traces to "[v1, v2, …]" strings to exercise the
            string-parse path (reference `preprocessing_core.py:11-18`).
    """
    rng = np.random.default_rng(seed)
    rows = []
    t = np.arange(trace_len) / fs
    for s in range(n_sessions):
        condition = "FMR1" if s % 2 == 0 else "WT"
        # Session-specific characteristics.
        alpha_f = rng.uniform(8, 12)
        gamma_f = rng.uniform(35, 70)
        gamma_gain = 2.2 if condition == "FMR1" else 0.7
        noise_gain = 1.0 if condition == "FMR1" else 1.4
        for trial in range(trials_per_session):
            phase = rng.uniform(0, 2 * np.pi, size=3)
            stim_freq = float(rng.choice([4000, 8000, 16000]))
            stim_amp = float(rng.choice([50, 60, 70]))
            trace = (
                3.0 * np.sin(2 * np.pi * alpha_f * t + phase[0])
                + gamma_gain * np.sin(2 * np.pi * gamma_f * t + phase[1])
                + 0.8 * np.sin(2 * np.pi * 2.0 * t + phase[2])
                + noise_gain * rng.standard_normal(trace_len)
                + rng.uniform(-20, 20)  # DC offset, removed by baseline corr
            ).astype(np.float32)
            cell = (
                "[" + ", ".join(f"{v:.4f}" for v in trace) + "]"
                if as_string else trace
            )
            rows.append(
                {
                    "session": f"sess_{s:03d}",
                    "condition": condition,
                    "trial_num": trial,
                    "stimulus_frequency": stim_freq,
                    "stimulus_amplitude": stim_amp,
                    "trace": cell,
                }
            )
    return pd.DataFrame(rows)


def synthetic_volume_batch(
    batch: int,
    n_trials: int = 8,
    freq: int = 64,
    time: int = 128,
    seed: int = 0,
    dtype=np.float32,
) -> tuple[np.ndarray, np.ndarray]:
    """Random normalized spectrogram volumes + labels, for model/bench code
    that doesn't need the signal structure."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((batch, n_trials, freq, time)).astype(dtype)
    y = rng.integers(0, 2, size=batch).astype(np.int32)
    return x, y
