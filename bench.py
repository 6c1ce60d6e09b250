"""Benchmark: training throughput of the flagship model on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "volumes/sec/chip", "vs_baseline": N}

Measures full training steps (forward + backward + AdamW update) of the
'small' Temporal 3D ViT (384d / 6h / 8L, 513 tokens) on (8, 64, 128)
spectrogram volumes under real train conditions — dropout, attention
dropout (in-kernel, flash path), stochastic depth, class-weighted smoothed
CE. vs_baseline is measured against the north-star target of 5,000
volumes/sec/chip (BASELINE.json; the reference never measured throughput —
SURVEY §6).

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_train_throughput(batch: int = 256, steps: int = 30, warmup: int = 5):
    from neural_vit_tpu.core.config import CONFIGS
    from neural_vit_tpu.models.vit import Temporal3DViT
    from neural_vit_tpu.training.loop import TrainState, make_step_fns

    cfg = CONFIGS["small"].replace(
        dropout=0.2, attention_dropout=0.1, drop_path=0.1,
    )
    model = Temporal3DViT(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch, cfg.n_trials, cfg.freq_size, cfg.time_size)),
        jnp.float32,
    )
    y = jnp.asarray(rng.integers(0, 2, batch))
    mask = jnp.ones(batch, jnp.float32)

    variables = model.init(jax.random.key(0), x)
    tx = optax.adamw(3e-4, weight_decay=0.01)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )
    train_step, _ = make_step_fns(
        model, class_weights=np.array([0.9, 1.1], np.float32),
        label_smoothing=0.05,
    )
    key = jax.random.key(1, impl="rbg")  # hardware RNG for dropout masks

    t0 = time.perf_counter()
    state, m = train_step(state, x, y, mask, key)
    jax.block_until_ready(m["loss_sum"])
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s")

    for _ in range(warmup):
        state, m = train_step(state, x, y, mask, key)
    jax.block_until_ready(m["loss_sum"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = train_step(state, x, y, mask, key)
    jax.block_until_ready(m["loss_sum"])
    dt = time.perf_counter() - t0
    vols_per_sec = batch * steps / dt
    log(f"batch={batch} steps={steps} time={dt:.3f}s "
        f"→ {vols_per_sec:,.0f} volumes/sec/chip (fwd+bwd+update)")
    return vols_per_sec


def bench_preprocess_throughput(batch: int = 2048, steps: int = 10):
    """Device throughput of the fused STFT+log+z-norm (production 126/116
    params, 5000-sample traces). Input mutates between calls so the remote
    executor can't serve memoized results; reported on stderr only (the
    stdout contract is one JSON line)."""
    from neural_vit_tpu.ops.spectrogram import SpectrogramConfig, preprocess_traces

    cfg = SpectrogramConfig(fs=1000, nperseg=126, noverlap=116)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 5000)), jnp.float32)

    @jax.jit
    def step(x):
        spec = preprocess_traces(x, cfg, -4.0, 1.5, normalize=True)
        # Fold a cheap reduction of the output back into the input so each
        # iteration's argument differs (defeats result memoization).
        return x + jnp.mean(spec) * 1e-6, spec

    x, spec = step(x)
    jax.block_until_ready(spec)
    for _ in range(3):
        x, spec = step(x)
    jax.block_until_ready(spec)
    t0 = time.perf_counter()
    for _ in range(steps):
        x, spec = step(x)
    jax.block_until_ready(spec)
    dt = time.perf_counter() - t0
    sps = batch * steps / dt
    log(f"preprocess (device-resident): {sps:,.0f} spectrograms/sec "
        f"({cfg.nperseg}/{cfg.noverlap}, 5000-sample traces)")
    return sps


def main():
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    try:
        bench_preprocess_throughput()
    except Exception as exc:  # diagnostics only — never break the JSON line
        log(f"preprocess bench failed: {exc}")
    value = bench_train_throughput()
    target = 5000.0
    print(json.dumps({
        "metric": "train_throughput_small_vit_fwd_bwd",
        "value": round(value, 1),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(value / target, 3),
    }))


if __name__ == "__main__":
    main()
