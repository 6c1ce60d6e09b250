"""EXPERIMENT: forward query-block size at production N, independent of
the backward plan.

The fused plan (`_plan`) runs the FORWARD whole-row (bq = n_proc = 1952)
because the fused one-program backward requires a single q-block — but the
forward doesn't: the dropout hash uses GLOBAL coordinates (row0 =
program_id·bq), so fwd and bwd may use different block geometries and
still regenerate identical masks (that invariant is what fixed the round-1
fwd/bwd mask desync). A smaller fwd bq shrinks the live score planes
(bq×N instead of N×N f32) at the cost of more grid programs.

Probes fwd bq ∈ divisors of 1952 {1952, 976, 488} (all UNPADDED) plus the
padded lane-aligned 512@2048 variant. Bit-identical outputs are asserted
for the unpadded variants before timing.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_flash_fwdbq.py
"""

import argparse
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_vit_tpu.ops.flash_attention import (
    _PARALLEL_2D,
    _fwd_kernel,
    _kernel_params,
    _maybe_pad,
    _plan,
    _qkv_specs,
    _staged_ok,
    flash_attention_qkv,
)


def fwd_with_bq(qkv, seed, *, n_heads, scale, dropout_rate, bq, n_proc,
                budget, interpret):
    bsz, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    assert n_proc % bq == 0, (n_proc, bq)
    qkv_p = _maybe_pad(qkv, n_proc)
    grid = (bsz, n_proc // bq)
    q_spec, k_spec, v_spec = _qkv_specs(n_proc, bq, d, q_blocked=True)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, n_heads=n_heads, dh=dh, n_valid=n,
        padded=n_proc != n, dropout_rate=dropout_rate,
        staged=_staged_ok(bq, n_proc, d, "fwd", budget),
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[q_spec, k_spec, v_spec],
            out_specs=[
                pl.BlockSpec((1, bq, d), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, n_heads, bq), lambda b, i, *_: (b, 0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_proc, d), qkv.dtype),
            jax.ShapeDtypeStruct((bsz, n_heads, n_proc), jnp.float32),
        ],
        compiler_params=_kernel_params(budget),
        interpret=interpret,
    )(seed, qkv_p, qkv_p, qkv_p)
    if n_proc != n:
        out = out[:, :n]
    return out, lse


# Measurement rules shared by every flash perf script live in _timing.py.
from _timing import make_loop, timed


def _timed(jitted, x, iters):
    return timed(jitted, x, iters)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=1952)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dropout", type=float, default=0.1)
    args = ap.parse_args()

    b, n, d, h = args.batch, args.seq, args.dim, args.heads
    dh = d // h
    scale = dh ** -0.5
    interpret = jax.default_backend() != "tpu"
    n_proc, plan_bq, _, fused, budget = _plan(n, d)
    print(f"plan: n_proc={n_proc} bq={plan_bq} fused={fused} "
          f"budget={budget >> 20}MiB")

    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * d),
                            jnp.bfloat16)
    seed = jnp.array([12345], jnp.int32)

    from neural_vit_tpu.ops.flash_attention import _flash_fwd

    # parity at a small unpadded shape (same kernel, different bq)
    small_n = 512
    small = qkv[:2, :small_n]
    want, lse_w = _flash_fwd(small, seed, n_heads=h, scale=scale,
                             dropout_rate=args.dropout, interpret=interpret)
    for bq in (256, 128):
        got, lse_g = fwd_with_bq(small, seed, n_heads=h, scale=scale,
                                 dropout_rate=args.dropout, bq=bq,
                                 n_proc=small_n, budget=budget,
                                 interpret=interpret)
        assert jnp.array_equal(got, want), f"mismatch bq={bq}"
        assert jnp.array_equal(lse_g, lse_w), f"lse mismatch bq={bq}"
    print("parity ok (bq 256/128 vs plan at N=512)", flush=True)

    if interpret:
        print("CPU interpreter — numerics only, no timing.")
        return

    fwd_fl = 2 * 2 * n * n * dh * h * b

    loop = make_loop(args.iters)
    t_base = _timed(loop(lambda x: x[..., :d]), qkv, args.iters)
    print(f"glue baseline: {t_base*1e3:.3f} ms/iter", flush=True)

    prod = loop(lambda x: flash_attention_qkv(
        x, n_heads=h, scale=scale, dropout_rate=args.dropout,
        dropout_rng=jax.random.PRNGKey(1)))
    t_p = _timed(prod, qkv, args.iters) - t_base
    print(f"production fwd (bq={plan_bq}) {t_p*1e3:7.3f} ms "
          f"({fwd_fl/t_p/1e12:5.1f} TF/s)", flush=True)

    variants = []
    for bq in (976, 488, 244):
        if n_proc % bq == 0:
            variants.append((bq, n_proc))
    variants.append((512, 2048))  # padded lane-aligned comparison
    for bq, npx in variants:
        var = loop(lambda x, q=bq, m=npx: fwd_with_bq(
            x, seed, n_heads=h, scale=scale, dropout_rate=args.dropout,
            bq=q, n_proc=m, budget=budget, interpret=False)[0])
        try:
            t_v = _timed(var, qkv, args.iters) - t_base
        except Exception as exc:
            print(f"bq={bq} n_proc={npx}: FAILED {type(exc).__name__}",
                  flush=True)
            continue
        print(f"fwd bq={bq} n_proc={npx} {t_v*1e3:7.3f} ms "
              f"({fwd_fl/t_v/1e12:5.1f} TF/s)  delta vs prod "
              f"{100*(t_p-t_v)/t_p:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
