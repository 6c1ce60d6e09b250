"""Numerical parity of the fused TPU spectrogram against scipy.

This is the AUC-parity gate: the reference computes spectrograms with
`scipy.signal.spectrogram(window=hann(nperseg), scaling='density')` +
`log10(+1e-10)` (preprocessing_core.py:54-98); our single-conv formulation
must match to float32 precision for both live parameterizations
(128/120 default, 126/116 production).
"""

import numpy as np
import pytest
from scipy.signal import spectrogram as scipy_spectrogram
from scipy.signal import windows

from neural_vit_tpu.ops.spectrogram import (
    SpectrogramConfig,
    finalize_stats,
    hann_symmetric,
    log_spectrogram,
    preprocess_traces,
    spectrogram_shape,
    spectrogram_stats_batch,
)


def _scipy_ref(trace, fs, nperseg, noverlap, freq_max=None, log_scale=True):
    win = windows.hann(nperseg)
    freqs, times, sxx = scipy_spectrogram(
        trace, fs=fs, window=win, nperseg=nperseg, noverlap=noverlap,
        scaling="density",
    )
    if freq_max is not None:
        mask = freqs <= freq_max
        sxx = sxx[mask, :]
    if log_scale:
        sxx = np.log10(sxx + 1e-10)
    return sxx


def test_hann_matches_scipy():
    for m in (8, 126, 128, 127):
        np.testing.assert_allclose(hann_symmetric(m), windows.hann(m), atol=1e-12)


@pytest.mark.parametrize(
    "nperseg,noverlap,freq_max",
    [(128, 120, None), (126, 116, None), (128, 120, 200.0), (64, 48, None)],
)
def test_log_spectrogram_matches_scipy(rng, nperseg, noverlap, freq_max):
    cfg = SpectrogramConfig(
        fs=1000, nperseg=nperseg, noverlap=noverlap, freq_max=freq_max,
        apply_time_window=False, apply_baseline=False,
    )
    traces = rng.standard_normal((4, 2500)).astype(np.float32) * 50.0
    ours = np.asarray(log_spectrogram(traces, cfg))
    for i in range(traces.shape[0]):
        ref = _scipy_ref(traces[i].astype(np.float64), 1000, nperseg, noverlap, freq_max)
        assert ours[i].shape == ref.shape
        np.testing.assert_allclose(ours[i], ref, rtol=2e-4, atol=2e-4)


def test_shapes_match_survey():
    # Production parameterization: 5000-sample trace → 64 × 488.
    cfg = SpectrogramConfig(fs=1000, nperseg=126, noverlap=116)
    assert spectrogram_shape(cfg, 5000) == (64, 488)
    # Default parameterization: 65 × 610.
    cfg = SpectrogramConfig(fs=1000, nperseg=128, noverlap=120)
    assert spectrogram_shape(cfg, 5000) == (65, 610)


def test_full_preprocess_matches_reference_chain(rng):
    """Crop + baseline-correct + spectrogram + z-norm vs the numpy/scipy chain."""
    cfg = SpectrogramConfig(fs=1000, nperseg=126, noverlap=116)
    raw = rng.standard_normal((3, 6000)).astype(np.float32) * 20.0 + 5.0
    mean, std = -4.2, 1.7
    ours = np.asarray(preprocess_traces(raw, cfg, mean, std, normalize=True))
    for i in range(raw.shape[0]):
        t = raw[i].astype(np.float64)[0:5000]
        t = t - t[:2000].mean()
        ref = _scipy_ref(t, 1000, 126, 116)
        ref = (ref - mean) / (std + 1e-8)
        # atol 1e-3 in normalized-log10 domain (~0.2% power): oneDNN's CPU
        # conv is run-to-run nondeterministic at the last fp32 bits.
        np.testing.assert_allclose(ours[i], ref, rtol=1e-3, atol=1e-3)


def test_baseline_correction_is_spectrogram_noop(rng):
    """Constant detrend per segment ⇒ whole-trace baseline subtraction cannot
    change the spectrogram (documents why the fusion is safe)."""
    cfg = SpectrogramConfig(fs=1000, nperseg=126, noverlap=116, apply_baseline=False)
    cfg_b = SpectrogramConfig(fs=1000, nperseg=126, noverlap=116, apply_baseline=True)
    raw = rng.standard_normal((2, 5500)).astype(np.float32) + 10.0
    a = np.asarray(preprocess_traces(raw, cfg))
    b = np.asarray(preprocess_traces(raw, cfg_b))
    # Exact in real arithmetic; fp32 cancellation with the DC offset leaves
    # near-zero-power bins with small absolute error in log10 domain.
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-2)


def test_streaming_stats_match_direct(rng):
    cfg = SpectrogramConfig(fs=1000, nperseg=64, noverlap=48)
    batches = [rng.standard_normal((8, 5200)).astype(np.float32) for _ in range(3)]
    s = sq = 0.0
    n = 0
    specs = []
    for b in batches:
        bs, bsq, bn = spectrogram_stats_batch(b, cfg)
        s += float(bs); sq += float(bsq); n += int(bn)
        specs.append(np.asarray(preprocess_traces(b, cfg)))
    stats = finalize_stats(s, sq, n)
    allpix = np.concatenate([x.ravel() for x in specs])
    assert stats["count"] == allpix.size
    np.testing.assert_allclose(stats["mean"], allpix.mean(), rtol=1e-5)
    np.testing.assert_allclose(stats["std"], allpix.std(), rtol=1e-4)


def test_empty_stats():
    assert finalize_stats(0.0, 0.0, 0) == {"mean": 0.0, "std": 1.0, "count": 0}
