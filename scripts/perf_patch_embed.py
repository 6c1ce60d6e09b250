"""Probe: patch-embed formulations at bench dims (run manually on TPU).

The batch-128 per-op profile (docs/ROOFLINE.md) attributes ~6.2 ms/step to
the patch-embed stage — ~2 TF/s effective on a ~13 GF fwd+wgrad pair, far
below matmul entitlement. Candidate explanations: the 7-D f32 transpose
(last dim pt=8 breaks the 128-lane tiling) or a slow conv lowering.

Variants measured (fwd + weight-grad only; input needs no grad as the
patch embed is the first layer):
  A  current model code: f32 transpose -> reshape -> bf16 Dense
  B  cast to bf16 BEFORE the transpose (halves transpose HBM traffic)
  C  lax.dot_general with 3 contracting dims, no explicit transpose
  D  conv_general_dilated kernel=stride (the reference's Conv3d form)
  E  loader stores each trial pre-tiled as (GF, GT, PF·PT): the per-step
     shuffle moves 64-element (128-byte) contiguous chunks instead of
     pt=8 strides; the one-time tiling happens at dataset load
  F  loader additionally pre-pairs trials (valid when stride % PK == 0 —
     the default stride=4, PK=2): stored rows are (GF, GT, PK·PF·PT=128)
     pair-tiles, a window gathers K/PK pair rows, and the patch embed is
     reshape + Dense — ZERO per-step transpose
Patch-vector element order is (pk, pf, pt) in all variants, so the same
Dense weights apply — E/F are loader-layout changes, not model changes.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/perf_patch_embed.py
(`--cpu` forces the CPU backend for a correctness-only run; the
JAX_PLATFORMS env var is ignored by the axon TPU plugin.)
"""

import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax import lax

B, K, F, T = 128, 8, 64, 128
PK, PF, PT = 2, 8, 8
D = 384
GK, GF, GT = K // PK, F // PF, T // PT
NP_, PD = GK * GF * GT, PK * PF * PT


def timed(fn, x, w, steps=30, warm=5):
    """Scalar-fetch fenced timing with input mutation (the remote executor
    memoizes identical dispatches; block_until_ready is not a fence)."""
    # eps must survive the input dtype's rounding or every "mutated" input
    # is bit-identical and the remote executor memoizes the dispatch:
    # bf16 needs >=2^-8 against O(1) values.
    eps = jnp.asarray(1e-6 if x.dtype == jnp.float32 else 2.0 ** -7, x.dtype)
    out = fn(x, w)
    float(jnp.sum(out))
    for _ in range(warm):
        x = x + eps
        out = fn(x, w)
    float(jnp.sum(out))
    xs = [x + (i + 1) * eps for i in range(steps)]
    float(jnp.sum(xs[-1][0, 0]))
    t0 = time.perf_counter()
    for m in xs:
        out = fn(m, w)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / steps


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K, F, T)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((PD, D)) * 0.02, jnp.float32)

    def embed_a(x, w):  # current: f32 transpose, bf16 dot
        p = x.reshape(B, GK, PK, GF, PF, GT, PT)
        p = p.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, NP_, PD)
        return jnp.dot(p.astype(jnp.bfloat16), w.astype(jnp.bfloat16))

    def embed_b(x, w):  # bf16 cast before the transpose
        p = x.astype(jnp.bfloat16).reshape(B, GK, PK, GF, PF, GT, PT)
        p = p.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, NP_, PD)
        return jnp.dot(p, w.astype(jnp.bfloat16))

    def embed_c(x, w):  # multi-contract dot_general, no explicit transpose
        p = x.astype(jnp.bfloat16).reshape(B, GK, PK, GF, PF, GT, PT)
        k = w.astype(jnp.bfloat16).reshape(PK, PF, PT, D)
        y = lax.dot_general(p, k, (((2, 4, 6), (0, 1, 2)), ((), ())))
        return y.reshape(B, NP_, D)

    def embed_d(x, w):  # conv form (reference Conv3d kernel=stride)
        p = x.astype(jnp.bfloat16)[:, None]  # (B, 1, K, F, T)
        k = w.astype(jnp.bfloat16).T.reshape(D, 1, PK, PF, PT)
        y = lax.conv_general_dilated(
            p, k, window_strides=(PK, PF, PT), padding="VALID",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
        return y.reshape(B, D, NP_).transpose(0, 2, 1)

    # E: per-trial tiled storage (B, K, GF, GT, PF·PT), bf16 — the one-time
    # tiling below is the load-time op, NOT charged to the step.
    x_tiled = (
        x.astype(jnp.bfloat16)
        .reshape(B, K, GF, PF, GT, PT)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(B, K, GF, GT, PF * PT)
    )

    def embed_e(xt, w):
        p = xt.reshape(B, GK, PK, GF, GT, PF * PT)
        p = p.transpose(0, 1, 3, 4, 2, 5).reshape(B, NP_, PD)
        return jnp.dot(p, w.astype(jnp.bfloat16))

    # F: pair-tiled storage (B, GK, GF, GT, PK·PF·PT) — gather returns
    # pair rows; the embed is a bare reshape + matmul.
    x_pair = (
        x.astype(jnp.bfloat16)
        .reshape(B, GK, PK, GF, PF, GT, PT)
        .transpose(0, 1, 3, 5, 2, 4, 6)
        .reshape(B, GK, GF, GT, PD)
    )

    def embed_f(xp, w):
        return jnp.dot(xp.reshape(B, NP_, PD), w.astype(jnp.bfloat16))

    variants = dict(A=(embed_a, x), B=(embed_b, x), C=(embed_c, x),
                    D=(embed_d, x), E=(embed_e, x_tiled), F=(embed_f, x_pair))
    ref = None
    for name, (fn, x) in variants.items():
        fwd = jax.jit(fn)
        out = np.asarray(fwd(x, w), np.float32)
        if ref is None:
            ref = out
        err = np.abs(out - ref).max()
        dt_f = timed(fwd, x, w)

        def loss(xx, ww, fn=fn):
            return jnp.sum(fn(xx, ww).astype(jnp.float32) ** 2)

        wg = jax.jit(lambda xx, ww, fn=fn: jax.grad(
            lambda w_: loss(xx, w_, fn))(ww))
        dt_g = timed(wg, x, w)
        gf = 2 * B * NP_ * PD * D / 1e9
        print(f"{name}: fwd {dt_f*1e3:6.2f} ms ({gf/dt_f/1e3:5.1f} TF/s)  "
              f"fwd+wgrad {dt_g*1e3:6.2f} ms  max|Δ|={err:.2e}")


if __name__ == "__main__":
    main()
