"""Synthetic LFP dataset generator for tests and benchmarks.

The reference's local tests depend on a gitignored BigQuery sample parquet
(`local_tests/test_pipeline.py:9-26`); we replace it with a deterministic
generator producing the same schema (session / condition / trial_num /
stimulus metadata / trace).

Two signal profiles:

``"default"`` — the *discriminative* gate. Calibrated so a linear model on
spectrogram summary statistics (the reference's log-reg baseline,
`baselines/log_reg_baseline.py`) lands around the reference's real margin
(test AUC ≈ 0.88, `evals/baseline_results.json`) while the ViT can exceed
0.95 — mirroring the published ViT-over-baseline gap (0.9467 vs 0.8820,
BASELINE.md). Construction:

  * **Linear-accessible component**: a sustained hum at a FIXED frequency
    (`hum_freq`, high-gamma) present in both classes, FMR1 louder by
    `hum_delta` (log units). Because the frequency never moves, a
    fixed-pixel linear readout generalizes across held-out sessions; the
    realized AUC is set by the offset against session-level spread
    (`hum_sigma`) plus per-trial amplitude jitter (`trial_jitter`,
    averaged over the 8-trial sequence window) — sequence-level noise
    dominates by construction so the AUC is stable across seeds rather
    than hostage to the energy ranks of a handful of test sessions.
    (A session-frequency-gamma energy offset was tried first and measured:
    its oracle AUC collapses to ~0.5 out-of-session.)
  * **Nonlinear (ViT-accessible) component**: FMR1 trials additionally
    emit brief high-amplitude gamma bursts (Hann-windowed, ~160 ms,
    `burst_frac` × sustained energy) at per-trial random latencies. The
    bursts are time-localized blobs in the spectrogram at arbitrary
    positions — a translation-invariant pattern detector (attention over
    patches) reads them anywhere; their linear shadow (mean/std elevation
    smeared over the gamma band) leaks a bounded amount into the linear
    channel, folded into the calibration of `hum_delta`/`burst_frac`.
  * **Nuisance is per-TRIAL, not per-session**: gamma frequency, alpha
    frequency/amplitude, slow-drift amplitude, and burst layout are drawn
    fresh every trial. Session-fixed versions were tried first and
    measured: with many sequences per session a 62k-dim linear model
    memorizes sessions through those fingerprints (train AUC 1.0) and
    generalizes arbitrarily (seed-42 demo-scale test AUC 0.19). Only the
    class-relevant hum level, a weak broadband gain, and the noise gain
    remain session-level — as in real LFP, where per-subject fingerprints
    are weak relative to within-subject variability.

``"easy"`` — the round-1 strongly-separable signal (flat 2.2× vs 0.7× gamma
gain). Every model saturates AUC ≈ 1.0 within a couple of epochs; used by
fast end-to-end tests that assert "the pipeline learns" rather than "the
gate discriminates".

Calibration record (scripts/calibrate_synthetic.py, 32 sessions × 300
trials, seed 42 — the full-scale-demo configuration; log-reg trial_stats
test AUC): delta/jitter/burst 0.35/0.55/0.5 → 0.960; 0.28/0.8/0.4 → 0.836;
**0.31/0.7/0.45 → 0.891** (defaults; reference real-data margin 0.8820).
"""

from __future__ import annotations


import numpy as np
import pandas as pd


def _hann(n: int) -> np.ndarray:
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / max(n - 1, 1)))


def synthetic_lfp_frame(
    n_sessions: int = 8,
    trials_per_session: int = 24,
    trace_len: int = 5500,
    fs: int = 1000,
    seed: int = 0,
    as_string: bool = False,
    profile: str = "default",
    hum_delta: float = 0.31,
    hum_sigma: float = 0.03,
    hum_amp: float = 0.65,
    hum_freq: float = 100.0,
    trial_jitter: float = 0.7,
    burst_frac: float = 0.45,
) -> pd.DataFrame:
    """Generate a raw-trials DataFrame in the BigQuery export schema.

    Args:
        as_string: serialize traces to "[v1, v2, …]" strings to exercise the
            string-parse path (reference `preprocessing_core.py:11-18`).
        profile: "default" (calibrated discriminative gate) or "easy"
            (round-1 strongly-separable signal).
        hum_delta: FMR1 log-amplitude offset of the fixed-frequency
            high-gamma hum — the linear AUC dial. The hum sits at the SAME
            frequency in every session, so a fixed-pixel linear readout
            generalizes across held-out sessions (session-frequency gamma
            does not — measured: its oracle AUC collapses to ~0.5).
        hum_sigma: session-to-session log spread of hum amplitude.
        hum_amp: FMR1 hum amplitude scale (WT = hum_amp·e^-hum_delta).
        hum_freq: hum carrier frequency (Hz) — keep clear of the gamma
            nuisance band [35, 70].
        trial_jitter: per-trial lognormal sigma on hum/gamma/burst
            amplitudes (both classes — keeps cross-trial std class-neutral
            while widening the sequence-level feature distribution).
        burst_frac: FMR1 burst energy as a fraction of its sustained gamma
            energy (the ViT-visible blobs).
    """
    if profile not in ("default", "easy"):
        raise ValueError(f"unknown profile {profile!r}")
    rng = np.random.default_rng(seed)
    rows = []
    t = np.arange(trace_len) / fs
    duration = trace_len / fs
    burst_len = int(0.16 * fs)
    burst_env = _hann(burst_len)
    for s in range(n_sessions):
        condition = "FMR1" if s % 2 == 0 else "WT"
        is_fmr1 = condition == "FMR1"
        # Session-level draws (easy profile keys the class on these).
        session_alpha_f = rng.uniform(8, 12)
        session_gamma_f = rng.uniform(35, 70)
        if profile == "easy":
            broadband_gain = 1.0
            noise_gain = 1.0 if is_fmr1 else 1.4
            gamma_gain = 2.2 if is_fmr1 else 0.7
        else:
            # The ONLY session-level structure: hum level (class signal),
            # weak broadband gain, noise gain. Everything else is per-trial
            # so sessions carry no memorizable fingerprint.
            broadband_gain = rng.lognormal(0.0, 0.05)
            # Narrow noise-gain range: the noise floor sits under the hum
            # bin in log space, so wide per-session floors re-introduce
            # session-level confounds on the linear channel (measured).
            noise_gain = rng.uniform(1.0, 1.25)
            # Linear channel: fixed-frequency high-gamma hum, FMR1 louder
            # by e^hum_delta.
            session_hum = hum_amp * rng.lognormal(
                (0.0 if is_fmr1 else -hum_delta), hum_sigma
            )
        for trial in range(trials_per_session):
            phase = rng.uniform(0, 2 * np.pi, size=3)
            stim_freq = float(rng.choice([4000, 8000, 16000]))
            stim_amp = float(rng.choice([50, 60, 70]))
            if profile == "easy":
                alpha_f, gamma_f = session_alpha_f, session_gamma_f
                alpha_amp, slow_amp = 3.0, 0.8
                gamma = gamma_gain * np.sin(2 * np.pi * gamma_f * t + phase[1])
            else:
                # Per-trial nuisance (class-neutral distributions).
                alpha_f = rng.uniform(8, 12)
                alpha_amp = rng.uniform(2.0, 3.5)
                slow_amp = rng.uniform(0.5, 1.2)
                gamma_f = rng.uniform(35, 70)
                sustained_amp = 2.0 * rng.lognormal(0.0, 0.2)
                # Same per-trial amplitude jitter spread for both classes.
                jitter = rng.lognormal(0.0, trial_jitter)
                gamma = (
                    jitter * sustained_amp
                    * np.sin(2 * np.pi * gamma_f * t + phase[1])
                    + jitter * session_hum
                    * np.sin(2 * np.pi * hum_freq * t
                             + rng.uniform(0, 2 * np.pi))
                )
                if is_fmr1:
                    # Per-trial burst layout at the trial's own gamma_f.
                    n_bursts = int(rng.integers(2, 5))
                    sus_energy = (jitter * sustained_amp) ** 2 / 2.0 * duration
                    burst_energy = burst_frac * sus_energy
                    # ∫(a·hann)²/2 dt = a²·0.375·len/fs per burst.
                    burst_amp = float(np.sqrt(
                        2.0 * burst_energy
                        / (0.375 * n_bursts * burst_len / fs)
                    ))
                    bursty = np.zeros(trace_len)
                    starts = rng.uniform(
                        0.2 * fs, trace_len - burst_len - 0.2 * fs,
                        size=n_bursts,
                    ).astype(int)
                    for b0 in starts:
                        seg = t[b0:b0 + burst_len]
                        bursty[b0:b0 + burst_len] += burst_env * np.sin(
                            2 * np.pi * gamma_f * seg
                            + rng.uniform(0, 2 * np.pi)
                        )
                    gamma = gamma + burst_amp * bursty
            trace = (
                alpha_amp * np.sin(2 * np.pi * alpha_f * t + phase[0])
                + gamma
                + slow_amp * np.sin(2 * np.pi * 2.0 * t + phase[2])
                + noise_gain * rng.standard_normal(trace_len)
            )
            trace = (
                broadband_gain * trace
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
