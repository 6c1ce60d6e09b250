"""Flash-kernel microbenchmark (run manually on the TPU chip).

Times the packed-qkv flash attention forward and fwd+bwd at the bench
operating point (B=128, N=513, D=384, H=6), with dropout on/off, to
attribute kernel time between matmuls, softmax, and the dropout mask.

Measurement rules this script obeys (learned the hard way — see
docs/ROOFLINE.md "negative results"):
  * Per-dispatch wall timing over the tunneled backend measures dispatch
    latency (~3 ms/call), not kernel time → all iterations run inside ONE
    `lax.fori_loop` program.
  * The remote executor memoizes identical (executable, operand) calls,
    and bf16 rounds +1e-6 away → the loop carries a REAL data dependency:
    each iteration's input mixes in the previous output.
  * The dependency glue itself moves ~150 MB/iter → a glue-only baseline
    loop is timed separately and subtracted.
"""

import argparse
import functools

import jax
import jax.numpy as jnp

from neural_vit_tpu.ops.flash_attention import flash_attention_qkv


# Measurement rules shared by every flash perf script live in _timing.py.
from _timing import make_loop
from _timing import timed as _timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=513)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    b, n, d, h = args.batch, args.seq, args.dim, args.heads
    dh = d // h
    scale = dh ** -0.5
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * d),
                            jnp.bfloat16)
    rng = jax.random.PRNGKey(1)

    # Analytic MXU floors (v5e 197 TF/s bf16; K=64 contractions at half
    # rate; lane padding 513→640 not charged — these are optimistic).
    fwd_fl = 2 * 2 * n * n * dh * h * b
    bwd_fl = 5 * 2 * n * n * dh * h * b

    def attn(x, rate):
        return flash_attention_qkv(
            x, n_heads=h, scale=scale, dropout_rate=rate, dropout_rng=rng)

    loop = make_loop(args.iters)
    t_base, _ = _timed(loop(lambda x: x[..., :d]), qkv, args.iters)
    print(f"glue baseline: {t_base*1e3:.3f} ms/iter", flush=True)

    for rate in (0.0, 0.1):
        t_f, _ = _timed(loop(functools.partial(attn, rate=rate)),
                        qkv, args.iters)
        t_f -= t_base
        grad = jax.grad(
            lambda x, r: jnp.sum(attn(x, r).astype(jnp.float32) ** 2),
            argnums=0)
        t_fb, _ = _timed(loop(lambda x, r=rate: grad(x, r)), qkv, args.iters)
        t_fb -= t_base
        t_b = t_fb - t_f
        print(
            f"dropout={rate}: fwd {t_f*1e3:7.3f} ms "
            f"({fwd_fl/t_f/1e12:5.1f} TF/s)  fwd+bwd {t_fb*1e3:7.3f} ms  "
            f"bwd≈{t_b*1e3:7.3f} ms ({bwd_fl/max(t_b,1e-9)/1e12:5.1f} TF/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
