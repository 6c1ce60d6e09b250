"""Flash-kernel microbenchmark (run manually on the TPU chip).

Times the packed-qkv flash attention forward and fwd+bwd in isolation at
the bench operating point (B=128, N=513, D=384, H=6) to attribute kernel
time between matmuls, softmax, and the in-kernel dropout hash:

  * dropout=0.1 vs dropout=0.0 bounds the dropout mask's VPU cost
    (hash + select are the only ops that differ).
  * per-program overhead: compare measured ms against the analytic
    MXU-bound floor printed alongside.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/perf_flash.py
"""

import argparse
import time

import jax
import jax.numpy as jnp

from neural_vit_tpu.ops.flash_attention import flash_attention_qkv


def timed(fn, first, steps=30, warm=3):
    """Mutate the first arg between calls (remote executor memoizes)."""
    out = fn(first)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    for _ in range(warm):
        first = first + jnp.asarray(1e-6, first.dtype)
        out = fn(first)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    mutated = [first + jnp.asarray((i + 1) * 1e-6, first.dtype)
               for i in range(steps)]
    jax.block_until_ready(mutated)
    t0 = time.perf_counter()
    for m in mutated:
        out = fn(m)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=513)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--heads", type=int, default=6)
    args = ap.parse_args()

    b, n, d, h = args.batch, args.seq, args.dim, args.heads
    dh = d // h
    scale = dh ** -0.5
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (b, n, 3 * d), jnp.bfloat16)
    rng = jax.random.PRNGKey(1)

    # Analytic floors (MXU-bound, v5e 197 TF/s bf16; K=64 contractions half).
    fwd_fl = 2 * 2 * n * n * dh * h * b                 # QK^T + PV
    bwd_fl = 5 * 2 * n * n * dh * h * b                 # s2,dp,dq,dk,dv
    fwd_floor = (fwd_fl / 2) / 98e12 + (fwd_fl / 2) / 197e12
    bwd_floor = (2 * bwd_fl / 5) / 98e12 + (3 * bwd_fl / 5) / 197e12

    for rate in (0.0, 0.1):
        f_fwd = jax.jit(lambda x, r=rate: flash_attention_qkv(
            x, n_heads=h, scale=scale, dropout_rate=r, dropout_rng=rng))

        def loss(x, r=rate):
            o = flash_attention_qkv(
                x, n_heads=h, scale=scale, dropout_rate=r, dropout_rng=rng)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        f_grad = jax.jit(jax.grad(loss))
        t_f = timed(f_fwd, qkv)
        t_g = timed(f_grad, qkv)
        t_b = t_g - t_f  # grad runs fwd (no resid reuse across jits) + bwd
        print(
            f"dropout={rate}: fwd {t_f*1e3:7.3f} ms "
            f"({fwd_fl/t_f/1e12:5.1f} TF/s, floor {fwd_floor*1e3:.3f} ms)  "
            f"fwd+bwd {t_g*1e3:7.3f} ms  bwd≈{t_b*1e3:7.3f} ms "
            f"({bwd_fl/max(t_b,1e-9)/1e12:5.1f} TF/s, floor "
            f"{bwd_floor*1e3:.3f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
