"""Fused TPU spectrogram preprocessing: STFT + log-power + z-normalization.

TPU-native replacement for the reference's per-trace scipy pipeline
(`temporal_vit/data/preprocessing_core.py:54-98` — `scipy.signal.spectrogram`
with an explicit symmetric Hann window, `scaling='density'`, default
`detrend='constant'`, then `log10(Sxx + 1e-10)`), redesigned as ONE XLA
program per batch of traces:

    crop → baseline-correct → strided conv against a windowed real-DFT basis
    (maps to the MXU) → |X|² density scaling + one-sided doubling → log10 →
    (x - mean) / (std + 1e-8)

Instead of framing each trace and calling an FFT per segment, the whole STFT
is expressed as a single strided 1-D convolution whose filters are the
Hann-windowed DFT basis with the per-segment mean-detrend folded in:

    X_k(t) = Σ_n (f_n - mean(f)) · w_n · e^{-2πikn/N}
           = Σ_n f_n · (w_n C_kn - d_k / N)          with d_k = Σ_n w_n C_kn

so detrending is exactly a rank-1 correction of the basis and the entire
frame-extract + window + detrend + DFT collapses into one conv with
2·n_freq output channels — large, batched, MXU-shaped work instead of a
scalar FFT loop. Everything after the conv is elementwise and fuses into the
conv epilogue under jit.

Numerical parity with scipy is enforced by `tests/test_spectrogram.py`
(float64 host math in the basis, float32 accumulate on device; rtol ~1e-5).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_symmetric(m: int) -> np.ndarray:
    """Symmetric Hann window, matching `scipy.signal.windows.hann(M)`
    (the reference passes the window array explicitly, so the *symmetric*
    variant is in effect — not the periodic one scipy uses for string names).
    """
    if m == 1:
        return np.ones(1)
    n = np.arange(m)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * n / (m - 1)))


@dataclass(frozen=True)
class SpectrogramConfig:
    """Static spectrogram parameters (hashable → jit static arg).

    Defaults mirror `preprocessing_core.compute_spectrogram_single`
    (nperseg=128, noverlap=120); the production parquet pipeline uses
    nperseg=126, noverlap=116 (`preprocess_to_gcs.py:333-334`).
    """

    fs: int = 1000
    nperseg: int = 128
    noverlap: int = 120
    freq_max: Optional[float] = None
    log_scale: bool = True
    # Trace conditioning (reference `preprocessing_core.py:27-51`).
    start_time: float = 0.0
    end_time: float = 5.0
    baseline_end: float = 2.0
    apply_time_window: bool = True
    apply_baseline: bool = True

    @property
    def step(self) -> int:
        return self.nperseg - self.noverlap

    @property
    def n_freq_full(self) -> int:
        return self.nperseg // 2 + 1

    @property
    def freqs(self) -> np.ndarray:
        return np.fft.rfftfreq(self.nperseg, d=1.0 / self.fs)

    @property
    def n_freq(self) -> int:
        if self.freq_max is None:
            return self.n_freq_full
        return int(np.sum(self.freqs <= self.freq_max))

    def n_frames(self, n_samples: int) -> int:
        return (n_samples - self.nperseg) // self.step + 1

    @property
    def window_samples(self) -> int:
        return int((self.end_time - self.start_time) * self.fs)

    def out_samples(self, raw_len: int) -> int:
        return self.window_samples if self.apply_time_window else raw_len


def spectrogram_shape(cfg: SpectrogramConfig, raw_len: int = 5000) -> Tuple[int, int]:
    """(freq_bins, time_bins) of the output spectrogram."""
    return cfg.n_freq, cfg.n_frames(cfg.out_samples(raw_len))


def _dft_basis(cfg: SpectrogramConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis with constant-detrend folded in, plus the
    one-sided density scaling per frequency bin.

    Returns:
        basis: (2 * n_freq, nperseg) float32 — real rows then imag rows.
        bin_scale: (n_freq,) float32 — density scale × one-sided doubling.
    """
    n = cfg.nperseg
    win = hann_symmetric(n).astype(np.float64)
    k = np.arange(cfg.n_freq_full)[:, None]  # (n_freq_full, 1)
    t = np.arange(n)[None, :]                # (1, nperseg)
    angle = -2.0 * np.pi * k * t / n
    c_re = np.cos(angle)
    c_im = np.sin(angle)
    # Fold the per-segment constant detrend into the basis:
    # X_k = Σ f_n (w_n C_kn - d_k / N) with d_k = Σ w_n C_kn.
    d_re = (win[None, :] * c_re).sum(axis=1, keepdims=True)
    d_im = (win[None, :] * c_im).sum(axis=1, keepdims=True)
    b_re = win[None, :] * c_re - d_re / n
    b_im = win[None, :] * c_im - d_im / n

    nf = cfg.n_freq  # possibly freq_max-cropped
    basis = np.concatenate([b_re[:nf], b_im[:nf]], axis=0).astype(np.float32)

    # Density scaling (scipy `scaling='density'`): 1 / (fs * Σ w²),
    # with one-sided doubling of every bin except DC and (for even nperseg)
    # the Nyquist bin.
    scale = 1.0 / (cfg.fs * (win ** 2).sum())
    bin_scale = np.full(cfg.n_freq_full, 2.0 * scale)
    bin_scale[0] = scale
    if n % 2 == 0:
        bin_scale[-1] = scale
    return basis, bin_scale[:nf].astype(np.float32)


@partial(jax.jit, static_argnames=("cfg",))
def log_spectrogram(traces: jax.Array, cfg: SpectrogramConfig) -> jax.Array:
    """Batched log-power spectrogram of already-conditioned traces.

    Args:
        traces: (..., n_samples) float array of cropped, baseline-corrected
            traces (use `preprocess_traces` for the full conditioning chain).
        cfg: static spectrogram parameters.

    Returns:
        (..., n_freq, n_frames) float32 — log10 power spectral density if
        cfg.log_scale, matching scipy's (freq, time) layout.
    """
    basis, bin_scale = _dft_basis(cfg)
    lead = traces.shape[:-1]
    n_samples = traces.shape[-1]
    n_frames = cfg.n_frames(n_samples)

    x = traces.reshape((-1, 1, n_samples)).astype(jnp.float32)
    # Strided conv: (B, 1, L) ⊛ (2·n_freq, 1, nperseg) → (B, 2·n_freq, T').
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(basis)[:, None, :],
        window_strides=(cfg.step,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        # Full fp32 MXU precision: the DFT conv is a tiny fraction of model
        # FLOPs but its output feeds log10, where bf16 error is magnified.
        precision=jax.lax.Precision.HIGHEST,
    )
    nf = cfg.n_freq
    power = y[:, :nf, :] ** 2 + y[:, nf:, :] ** 2
    sxx = power * jnp.asarray(bin_scale)[None, :, None]
    if cfg.log_scale:
        sxx = jnp.log10(sxx + 1e-10)
    return sxx.reshape(lead + (nf, n_frames))


@partial(jax.jit, static_argnames=("cfg", "normalize"))
def preprocess_traces(
    raw: jax.Array,
    cfg: SpectrogramConfig,
    mean: jax.Array | float = 0.0,
    std: jax.Array | float = 1.0,
    normalize: bool = False,
) -> jax.Array:
    """Full fused preprocessing: crop → baseline-correct → STFT → log10 →
    z-normalize with train-set statistics.

    Equivalent of the reference's offline chain (`preprocess_to_gcs.py:44-52`
    + `:179-194`) as one device program. Note: the per-segment constant
    detrend makes the whole-trace baseline subtraction a mathematical no-op on
    the spectrogram; it is kept in the trace path for `trace`-column parity
    (verified in tests).

    Args:
        raw: (..., raw_len) raw traces, raw_len ≥ window samples.
        mean/std: scalar train-set normalization stats.
        normalize: apply (x - mean) / (std + 1e-8) (reference adds 1e-8).
    """
    x = raw
    if cfg.apply_time_window:
        start = int(cfg.start_time * cfg.fs)
        x = jax.lax.slice_in_dim(x, start, start + cfg.window_samples, axis=-1)
    if cfg.apply_baseline:
        nb = int(cfg.baseline_end * cfg.fs)
        base = jnp.mean(jax.lax.slice_in_dim(x, 0, nb, axis=-1), axis=-1, keepdims=True)
        x = x - base
    spec = log_spectrogram(x, cfg)
    if normalize:
        spec = (spec - mean) / (std + 1e-8)
    return spec


@partial(jax.jit, static_argnames=("cfg",))
def _stats_partial(raw: jax.Array, cfg: SpectrogramConfig):
    spec = preprocess_traces(raw, cfg)
    flat = spec.reshape(spec.shape[0], -1)
    return jnp.sum(flat, axis=-1), jnp.sum(flat ** 2, axis=-1)


def spectrogram_stats_batch(
    raw: jax.Array, cfg: SpectrogramConfig, n_valid: Optional[int] = None
) -> Tuple[float, float, int]:
    """Per-batch (Σ, Σ², count) of log-spectrogram pixels for the two-pass
    train-set normalization (reference `compute_spectrogram_stats`,
    `preprocess_to_gcs.py:72-124`). Per-trace partial sums reduce on device
    in fp32 (≤ ~30k pixels each); the cross-trace and cross-batch
    accumulation happens here in float64, matching the reference's
    host-float64 streaming accumulation.

    Args:
        n_valid: only the first n_valid traces contribute (callers pad the
            batch to a fixed size to keep one compiled shape).
    """
    s, sq = _stats_partial(raw, cfg)
    nf, nt = spectrogram_shape(cfg, raw.shape[-1])
    n_traces = int(np.prod(raw.shape[:-1])) if n_valid is None else n_valid
    s = np.asarray(s, np.float64).reshape(-1)[:n_traces]
    sq = np.asarray(sq, np.float64).reshape(-1)[:n_traces]
    return float(np.sum(s)), float(np.sum(sq)), n_traces * nf * nt


def finalize_stats(total_sum: float, total_sq: float, count: int) -> dict:
    """Combine streamed (Σ, Σ², n) into {mean, std, count} with the
    reference's conventions (`preprocess_to_gcs.py:116-124`)."""
    if count == 0:
        return {"mean": 0.0, "std": 1.0, "count": 0}
    mean = total_sum / count
    var = total_sq / count - mean ** 2
    std = float(np.sqrt(var)) if var > 0 else 0.0
    return {"mean": float(mean), "std": std, "count": int(count)}
