"""EXPERIMENT: hoist the dropout keep-mask generation in the flash kernels.

The in-kernel counter-hash dropout costs ~17-25% of the fwd kernel with
rate=0.1 vs rate=0 (docs/ROOFLINE.md), yet deleting full-plane VPU ops was
measured neutral — the cost is serialization, not op count. The keep mask
is a pure function of (seed, b, h, global coords): it has NO data
dependency on the scores, so its 5 full-plane VPU ops can issue anywhere
in the program. Production computes it between softmax and PV, i.e. on
the critical VPU path. Variants probed here (all bit-identical — only the
issue order moves):

  * fwd 'early':     compute keep(h) at the TOP of iteration h, right
                     after head h+1's QKᵀ issues — the mask VPU work sits
                     where the scheduler has the hoisted MXU op in flight.
  * fwd 'hoistnext': compute keep(h+1) alongside qk(h+1) and carry it,
                     like the score-plane hoist (one extra live bool
                     plane). Iteration h's VPU block then interleaves
                     softmax(h) with mask(h+1).
  * bwd 'hoistnext': same carry in the fused backward (triple-hoist:
                     QKᵀ, do·vᵀ AND keep of head h+1).

Run on CPU for numerics (interpreter), on the chip for timing:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_flash_maskhoist.py
"""

import argparse
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_vit_tpu.ops.flash_attention import (
    _LN2,
    _LOG2E,
    _PARALLEL_2D,
    _col_mask,
    _head_seed,
    _keep_mask,
    _maybe_pad,
    _plan,
    _qkv_specs,
    _scaled,
    flash_attention_qkv,
)


def _fwd_kernel_maskhoist(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                          scale: float, n_heads: int, dh: int, n_valid: int,
                          padded: bool, dropout_rate: float, mode: str):
    b = pl.program_id(0)
    row0 = (pl.program_id(1) * q_ref.shape[1]).astype(jnp.uint32)
    nk = k_ref.shape[1]
    bq = q_ref.shape[1]

    def qk(h):
        sl = slice(h * dh, (h + 1) * dh)
        q = _scaled(q_ref[0, :, sl], scale * _LOG2E)
        return jax.lax.dot_general(
            q, k_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mask(h):
        return _keep_mask((bq, nk), dropout_rate,
                          _head_seed(seed_ref, b, h, n_heads), row0)

    s2_next = qk(0)
    keep_next = mask(0) if (dropout_rate > 0.0 and mode == "hoistnext") \
        else None
    for h in range(n_heads):
        s2 = s2_next
        keep = keep_next
        if h + 1 < n_heads:
            s2_next = qk(h + 1)
            if dropout_rate > 0.0 and mode == "hoistnext":
                keep_next = mask(h + 1)
        if dropout_rate > 0.0 and mode == "early":
            keep = mask(h)
        sl = slice(h * dh, (h + 1) * dh)
        v = v_ref[0, :, sl]
        m2 = jnp.max(s2, axis=-1, keepdims=True)
        p = jnp.exp2(s2 - m2)
        if padded:
            p = _col_mask(p, n_valid, 0)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        lse = m2 * _LN2 + jnp.log(denom)
        lse_ref[0, h:h + 1, :] = jnp.transpose(lse)
        if dropout_rate > 0.0:
            p = jnp.where(keep, p, 0.0)
            denom = denom * (1.0 - dropout_rate)
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (acc / denom).astype(o_ref.dtype)


def maskhoist_fwd(qkv, seed, *, n_heads, scale, dropout_rate, interpret,
                  mode):
    bsz, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    n_proc, bq, _, _, _budget = _plan(n, d)
    qkv_p = _maybe_pad(qkv, n_proc)
    grid = (bsz, n_proc // bq)
    q_spec, k_spec, v_spec = _qkv_specs(n_proc, bq, d, q_blocked=True)
    kernel = functools.partial(
        _fwd_kernel_maskhoist, scale=scale, n_heads=n_heads, dh=dh,
        n_valid=n, padded=n_proc != n, dropout_rate=dropout_rate, mode=mode,
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
        compiler_params=_PARALLEL_2D,
        interpret=interpret,
    )(seed, qkv_p, qkv_p, qkv_p)
    if n_proc != n:
        out = out[:, :n]
    return out, lse


def _bwd_fused_kernel_maskhoist(seed_ref, q_ref, k_ref, v_ref, o_ref,
                                lse_ref, do_ref, dqkv_ref, *, scale: float,
                                n_heads: int, dh: int, n_valid: int,
                                padded: bool, dropout_rate: float):
    """Fused backward with a TRIPLE hoist: head h+1's QKᵀ, do·vᵀ AND keep
    mask all issue ahead of head h's VPU work."""
    b = pl.program_id(0)
    d = n_heads * dh
    nr = q_ref.shape[1]

    def qk(h):
        sl = slice(h * dh, (h + 1) * dh)
        qs2 = _scaled(q_ref[0, :, sl], scale * _LOG2E)
        return qs2, jax.lax.dot_general(
            qs2, k_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dovt(h):
        sl = slice(h * dh, (h + 1) * dh)
        return jax.lax.dot_general(
            do_ref[0, :, sl], v_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mask(h):
        return _keep_mask((nr, nr), dropout_rate,
                          _head_seed(seed_ref, b, h, n_heads),
                          jnp.uint32(0))

    qs2_next, s2_next = qk(0)
    dp_next = dovt(0)
    keep_next = mask(0) if dropout_rate > 0.0 else None
    for h in range(n_heads):
        qs2, s2, dp, keep = qs2_next, s2_next, dp_next, keep_next
        if h + 1 < n_heads:
            qs2_next, s2_next = qk(h + 1)
            dp_next = dovt(h + 1)
            if dropout_rate > 0.0:
                keep_next = mask(h + 1)
        sl = slice(h * dh, (h + 1) * dh)
        k = k_ref[0, :, sl]
        do = do_ref[0, :, sl]
        o = o_ref[0, :, sl]
        lse = jnp.transpose(lse_ref[0, h:h + 1, :])
        p = jnp.exp2(s2 - lse * jnp.float32(_LOG2E))
        if padded:
            p = _col_mask(p, n_valid, 0)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            inv = 1.0 / (1.0 - dropout_rate)
            ds = p * (jnp.where(keep, dp, 0.0)
                      - delta * (1.0 - dropout_rate))
            pk = jnp.where(keep, p, 0.0)
            dq_scale, dk_scale, dv_scale = scale * inv, inv / _LOG2E, inv
        else:
            ds = p * (dp - delta)
            pk = p
            dq_scale, dk_scale, dv_scale = scale, 1.0 / _LOG2E, 1.0
        ds_c = ds.astype(qs2.dtype)
        dqkv_ref[0, :, sl] = (jax.lax.dot_general(
            ds_c, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * dq_scale).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, d + h * dh:d + (h + 1) * dh] = (jax.lax.dot_general(
            ds_c, qs2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * dk_scale).astype(dqkv_ref.dtype)
        dv = jax.lax.dot_general(
            pk.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0:
            dv = dv * dv_scale
        dqkv_ref[0, :, 2 * d + h * dh:2 * d + (h + 1) * dh] = (
            dv.astype(dqkv_ref.dtype)
        )


def maskhoist_bwd_fused(qkv, out, lse, do, seed, *, n_heads, scale,
                        dropout_rate, interpret):
    bsz, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    n_proc, bq, bk, fused, _budget = _plan(n, d)
    assert fused, "maskhoist bwd experiment only covers the fused path"
    qkv_p = _maybe_pad(qkv, n_proc)
    do_p = _maybe_pad(do, n_proc)
    out_p = _maybe_pad(out, n_proc)
    q_spec, k_spec, v_spec = _qkv_specs(n_proc, bq, d, q_blocked=False)
    row_spec = pl.BlockSpec((1, n_proc, d), lambda b, *_: (b, 0, 0))
    lse_spec = pl.BlockSpec((1, n_heads, n_proc), lambda b, *_: (b, 0, 0))
    dqkv = pl.pallas_call(
        functools.partial(
            _bwd_fused_kernel_maskhoist, scale=scale, n_heads=n_heads,
            dh=dh, n_valid=n, padded=n_proc != n, dropout_rate=dropout_rate,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, 1),
            in_specs=[q_spec, k_spec, v_spec, row_spec, lse_spec, row_spec],
            out_specs=pl.BlockSpec(
                (1, n_proc, 3 * d), lambda b, *_: (b, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n_proc, 3 * d), qkv.dtype),
        compiler_params=_PARALLEL_2D,
        interpret=interpret,
    )(seed, qkv_p, qkv_p, qkv_p, out_p, lse, do_p)
    return dqkv[:, :n] if n_proc != n else dqkv


# Measurement rules shared by every flash perf script live in _timing.py.
from _timing import make_loop, timed


def _timed(jitted, x, iters):
    return timed(jitted, x, iters)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dropout", type=float, default=0.1)
    args = ap.parse_args()

    b, n, d, h = args.batch, args.seq, args.dim, args.heads
    dh = d // h
    scale = dh ** -0.5
    interpret = jax.default_backend() != "tpu"
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * d),
                            jnp.bfloat16)
    seed = jnp.array([12345], jnp.int32)

    # --- parity: every variant must be bit-identical to production ------
    from neural_vit_tpu.ops.flash_attention import _flash_bwd, _flash_fwd
    small = qkv[:2]
    do_small = jnp.ones_like(small[..., :d])
    rate = args.dropout
    want, lse_p = _flash_fwd(small, seed, n_heads=h, scale=scale,
                             dropout_rate=rate, interpret=interpret)
    for mode in ("early", "hoistnext"):
        got, lse_s = maskhoist_fwd(small, seed, n_heads=h, scale=scale,
                                   dropout_rate=rate, interpret=interpret,
                                   mode=mode)
        assert jnp.array_equal(got, want), f"fwd mismatch mode={mode}"
        assert jnp.array_equal(lse_s, lse_p), f"lse mismatch mode={mode}"
    bwant = _flash_bwd(small, want, lse_p, do_small, seed, n_heads=h,
                       scale=scale, dropout_rate=rate, interpret=interpret)
    bgot = maskhoist_bwd_fused(small, want, lse_p, do_small, seed,
                               n_heads=h, scale=scale, dropout_rate=rate,
                               interpret=interpret)
    assert jnp.array_equal(bgot, bwant), "bwd mismatch"
    print("parity ok (fwd early/hoistnext + bwd triple-hoist)", flush=True)

    if interpret:
        print("CPU interpreter — numerics only, no timing.")
        return

    # --- timing (perf_flash measurement rules) --------------------------
    fwd_fl = 2 * 2 * n * n * dh * h * b
    bwd_fl = 5 * 2 * n * n * dh * h * b

    loop = make_loop(args.iters)
    t_base = _timed(loop(lambda x: x[..., :d]), qkv, args.iters)
    print(f"glue baseline: {t_base*1e3:.3f} ms/iter", flush=True)

    out_full, lse_full = _flash_fwd(qkv, seed, n_heads=h, scale=scale,
                                    dropout_rate=rate, interpret=False)
    do_full = jax.random.normal(jax.random.PRNGKey(2), (b, n, d),
                                jnp.bfloat16)

    prod = loop(lambda x: flash_attention_qkv(
        x, n_heads=h, scale=scale, dropout_rate=rate,
        dropout_rng=jax.random.PRNGKey(1)))
    t_p = _timed(prod, qkv, args.iters) - t_base
    print(f"production fwd {t_p*1e3:7.3f} ms ({fwd_fl/t_p/1e12:5.1f} TF/s)",
          flush=True)
    for mode in ("early", "hoistnext"):
        var = loop(lambda x, m=mode: maskhoist_fwd(
            x, seed, n_heads=h, scale=scale, dropout_rate=rate,
            interpret=False, mode=m)[0])
        t_v = _timed(var, qkv, args.iters) - t_base
        print(
            f"maskhoist fwd '{mode}' {t_v*1e3:7.3f} ms "
            f"({fwd_fl/t_v/1e12:5.1f} TF/s)   delta {100*(t_p-t_v)/t_p:+.1f}%",
            flush=True,
        )

    bprod = loop(lambda x: _flash_bwd(
        x, out_full, lse_full, do_full, seed, n_heads=h, scale=scale,
        dropout_rate=rate, interpret=False)[..., :d])
    t_bp = _timed(bprod, qkv, args.iters) - t_base
    bvar = loop(lambda x: maskhoist_bwd_fused(
        x, out_full, lse_full, do_full, seed, n_heads=h, scale=scale,
        dropout_rate=rate, interpret=False)[..., :d])
    t_bv = _timed(bvar, qkv, args.iters) - t_base
    print(
        f"production bwd {t_bp*1e3:7.3f} ms ({bwd_fl/t_bp/1e12:5.1f} TF/s)\n"
        f"triple-hoist bwd {t_bv*1e3:7.3f} ms "
        f"({bwd_fl/t_bv/1e12:5.1f} TF/s)   delta {100*(t_bp-t_bv)/t_bp:+.1f}%",
        flush=True,
    )


if __name__ == "__main__":
    main()
