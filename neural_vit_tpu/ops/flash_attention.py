"""Pallas TPU fused attention (flash attention) with custom VJP.

Replaces the reference's materialized O(N²) attention
(`models/model.py:106-119`): per grid step one query block's (Bq × N)
logits live entirely in VMEM, softmax is taken there, and the result is
multiplied into V — the full B·H·N² probability tensor never touches HBM in
either direction. For this model family N is short (513 tokens at default
dims, ~2k at production spectrogram dims), so K/V for one (batch, head) fit
comfortably in VMEM and a single-pass row-block softmax beats multi-block
online softmax.

Layout: the public API is heads-last (B, N, H, Dh) — q/k/v arrive as
plain slices of the fused qkv projection. Internally operands fold to
(B·H, N, Dh) so the kernel's tiled trailing dims are (N, Dh), the shape the
MXU wants (Mosaic requires the last two block dims whole-or-aligned, which
rules out per-head blocks of a heads-last array). The fold is one transpose
copy per operand — ~2% of forward wall-clock at production shapes. MXU
matmuls run in the input dtype (bf16 on the train path) with f32
accumulation; softmax math is f32.

Attention-probability dropout (reference `Attention.attn_drop`) runs inside
the kernel: the keep mask is a counter-based hash of
(seed, batch, head, q-block, position), regenerated bit-identically in the
backward kernel — no mask tensor is stored, and the train path stays fused.

Backward follows the standard flash decomposition per query block, with the
softmax normalizer recomputed rather than stored (the score block is being
recomputed anyway, so saving lse would only add HBM traffic):
    P  = softmax(S)              (recomputed, never stored)
    dV += (P∘M)ᵀ dO
    dP = (dO Vᵀ)∘M
    dS = P ∘ (dP - rowsum(dP∘P))
    dQ = dS K · scale,   dK += dSᵀ Q · scale
dK/dV accumulate in f32 across the sequential q-block grid steps.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kv_mask(n_valid: int, n_pad: int, bq: int):
    """(Bq, n_pad) additive mask: 0 for real keys, -inf for padding."""
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, n_pad), 1)
    return jnp.where(col < n_valid, 0.0, _NEG_INF).astype(jnp.float32)


def _hash_bits(shape, seed, row0):
    """Counter-based uint32 bits (murmur3-style finalizer over GLOBAL
    row/col coordinates).

    A pure function of (seed, global element position): the backward kernel
    regenerates the exact forward mask with no stored state **even when it
    tiles the sequence with a different query-block size** (the VMEM budget
    differs between fwd and bwd, so `_pick_blocks` may legally disagree).
    The same code runs under Mosaic on TPU and the Pallas interpreter on CPU
    (the dedicated TPU PRNG primitive has no CPU lowering).
    """
    r = row0 + jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (r * jnp.uint32(0x9E3779B1)) ^ (c * jnp.uint32(0x85EBCA6B))
    x = x + seed.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _dropout_keep(shape, rate: float, seed, row0):
    """Inverted-dropout keep multiplier: 1/(1-p) with prob (1-p), else 0.

    `row0` is the global row offset of this query block; the mask depends
    only on (seed, global row, col) — never on block geometry.
    """
    bits = _hash_bits(shape, seed, row0)
    threshold = jnp.uint32(int(rate * (2 ** 32)))
    keep = bits >= threshold
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _program_seed(seed_ref, j: int, bh_block: int):
    """Per-(batch·head) seed — deliberately independent of the q-block grid
    so forward and backward (which may pick different Bq) agree."""
    bh = pl.program_id(0) * bh_block + j
    return seed_ref[0] + bh


def _row_offset(bq: int):
    """Global row index of this program's first query row (uint32)."""
    return (pl.program_id(1) * bq).astype(jnp.uint32)


def _softmax_probs(q, k, scale, mask):
    """(Bq, Dh) × (Nk, Dh) → exact softmax probabilities (Bq, Nk) in f32.
    `mask` is the precomputed additive padding mask (hoisted out of the
    per-head loop — it is identical for every (batch, head))."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + mask
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *,
                scale: float, n_valid: int, dropout_rate: float):
    bh_block = q_ref.shape[0]
    mask = _kv_mask(n_valid, k_ref.shape[1], q_ref.shape[1])
    for j in range(bh_block):  # static unroll amortizes per-program overhead
        q = q_ref[j]                           # (Bq, Dh)
        k = k_ref[j]                           # (Nk, Dh)
        v = v_ref[j]
        p = _softmax_probs(q, k, scale, mask)
        if dropout_rate > 0.0:
            p = p * _dropout_keep(
                p.shape, dropout_rate,
                _program_seed(seed_ref, j, bh_block),
                _row_offset(q_ref.shape[1]),
            )
        o_ref[j] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *,
                scale: float, n_valid: int, dropout_rate: float):
    qi = pl.program_id(1)
    bh_block = q_ref.shape[0]

    @pl.when(qi == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref[...])
        dv_ref[...] = jnp.zeros_like(dv_ref[...])

    mask = _kv_mask(n_valid, k_ref.shape[1], q_ref.shape[1])
    for j in range(bh_block):
        q = q_ref[j]                           # (Bq, Dh)
        k = k_ref[j]                           # (Nk, Dh)
        v = v_ref[j]
        do = do_ref[j]                         # (Bq, Dh)
        p = _softmax_probs(q, k, scale, mask)

        if dropout_rate > 0.0:
            # Same (seed, global row, col) hash as forward ⇒ bit-identical
            # mask even if forward tiled with a different Bq.
            keep = _dropout_keep(
                p.shape, dropout_rate,
                _program_seed(seed_ref, j, bh_block),
                _row_offset(q_ref.shape[1]),
            )
            p_drop = p * keep
        else:
            keep = None
            p_drop = p

        dp_drop = jax.lax.dot_general(         # dO Vᵀ: (Bq, Nk)
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = dp_drop * keep if keep is not None else dp_drop
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)                  # (Bq, Nk) f32

        ds_c = ds.astype(q.dtype)
        dq_ref[j] = (jax.lax.dot_general(
            ds_c, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dq_ref.dtype)

        dk_part = jax.lax.dot_general(         # dSᵀ Q: (Nk, Dh)
            ds_c, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dv_part = jax.lax.dot_general(         # P̃ᵀ dO: (Nk, Dh)
            p_drop.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_ref[j] += dk_part
        dv_ref[j] += dv_part


def _pick_blocks(
    bh_dim: int, n_pad: int, dh: int, bwd: bool, dropout: bool
) -> tuple:
    """Jointly choose (query block Bq, batch·head block) against a total
    VMEM-stack budget: double-buffered operand blocks plus the live
    (Bq, Nk) f32 score-block intermediates (softmax probs, dP, dS, mask,
    keep — the bulk of the backward pass's scratch). Larger Bq wins first
    (fewer K/V revisits), then larger bh (amortized per-program latency).
    """
    # Coefficients calibrated against Mosaic's reported stack sizes on v5e
    # (four measured configs): score-block intermediates are partially
    # shared (~0.55× their naive sum) while operand blocks are
    # multi-buffered (~3.8×). Budget 14 MB of the 16 MB limit.
    limit = 14 * 1024 * 1024
    n_inter = (6 if bwd else 3) + (1 if dropout else 0)
    if bwd:
        bq_bytes, kv_bytes = (2 + 2 + 2), (2 + 2 + 4 + 4)
    else:
        bq_bytes, kv_bytes = (2 + 2), (2 + 2)
    for bq in range(min(n_pad, 1024), 0, -128):
        if n_pad % bq != 0:
            continue
        inter = 0.6 * n_inter * bq * n_pad * 4
        for bh in (8, 4, 2, 1):
            if bh_dim % bh != 0:
                continue
            blocks = 4.0 * dh * bh * (bq * bq_bytes + n_pad * kv_bytes)
            if inter + blocks <= limit:
                return int(bq), bh
    # Even (Bq=128, bh=1) exceeds the VMEM budget: this kernel holds full
    # K/V per (batch, head) in VMEM, which stops scaling at roughly
    # N ≈ 4-8k (dh=64). Fail with a clear message instead of letting
    # Mosaic OOM at compile time.
    raise ValueError(
        f"flash_attention: sequence too long for the single-pass kernel "
        f"(N_pad={n_pad}, head_dim={dh}): no (Bq, bh) block fits the "
        f"~{limit // (1024 * 1024)} MB VMEM stack budget. Use the XLA "
        f"attention path (use_flash_attention=False) or a multi-block "
        f"online-softmax kernel for sequences this long."
    )


def _specs(bhb: int, bq: int, n_pad: int, dh: int):
    q_spec = pl.BlockSpec((bhb, bq, dh), lambda b, i, *_: (b, i, 0))
    kv_spec = pl.BlockSpec((bhb, n_pad, dh), lambda b, i, *_: (b, 0, 0))
    return q_spec, kv_spec


def _flash_call(q, k, v, seed, *, scale, dropout_rate, interpret):
    """q/k/v: (BH, N, Dh) → out (BH, N, Dh)."""
    bh_dim, n, dh = q.shape
    n_pad = _ceil_to(n, 128)
    bq, bhb = _pick_blocks(bh_dim, n_pad, dh, bwd=False,
                           dropout=dropout_rate > 0)
    n_q = n_pad // bq
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n), (0, 0)]
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))

    grid = (bh_dim // bhb, n_q)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, n_valid=n, dropout_rate=dropout_rate
    )
    q_spec, kv_spec = _specs(bhb, bq, n_pad, dh)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((bh_dim, n_pad, dh), q.dtype),
        interpret=interpret,
    )(seed, q, k, v)
    return out[:, :n]


def _flash_bwd_call(q, k, v, do, seed, *, scale, dropout_rate, interpret):
    bh_dim, n, dh = q.shape
    n_pad = _ceil_to(n, 128)
    bq, bhb = _pick_blocks(bh_dim, n_pad, dh, bwd=True,
                           dropout=dropout_rate > 0)
    n_q = n_pad // bq
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n), (0, 0)]
        q, k, v, do = (jnp.pad(a, pad) for a in (q, k, v, do))

    grid = (bh_dim // bhb, n_q)
    kernel = functools.partial(
        _bwd_kernel, scale=scale, n_valid=n, dropout_rate=dropout_rate
    )
    q_spec, kv_spec = _specs(bhb, bq, n_pad, dh)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, q_spec],
            out_specs=[q_spec, kv_spec, kv_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh_dim, n_pad, dh), q.dtype),
            # dk/dv accumulate across sequential q-block grid steps → f32.
            jax.ShapeDtypeStruct((bh_dim, n_pad, dh), jnp.float32),
            jax.ShapeDtypeStruct((bh_dim, n_pad, dh), jnp.float32),
        ],
        interpret=interpret,
    )(seed, q, k, v, do)
    return (
        dq[:, :n],
        dk[:, :n].astype(q.dtype),
        dv[:, :n].astype(q.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 6))
def _flash_core(q, k, v, scale, dropout_rate, seed, interpret):
    return _flash_call(
        q, k, v, seed, scale=scale, dropout_rate=dropout_rate,
        interpret=interpret,
    )


def _flash_core_fwd(q, k, v, scale, dropout_rate, seed, interpret):
    out = _flash_call(
        q, k, v, seed, scale=scale, dropout_rate=dropout_rate,
        interpret=interpret,
    )
    return out, (q, k, v, seed)


def _flash_core_bwd(scale, dropout_rate, interpret, res, do):
    q, k, v, seed = res
    dq, dk, dv = _flash_bwd_call(
        q, k, v, do, seed, scale=scale, dropout_rate=dropout_rate,
        interpret=interpret,
    )
    return dq, dk, dv, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention over (B, N, H, Dh) heads-last operands.

    Args:
        scale: logit scale (head_dim ** -0.5 in the model).
        dropout_rate: attention-probability dropout (train only; pass 0.0
            for eval). Requires dropout_rng when > 0.
        interpret: run the Pallas interpreter (CPU tests).

    Returns:
        (B, N, H, Dh) attention output.
    """
    b, n, h, dh = q.shape
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, n, dh)
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seed = jax.random.randint(
            dropout_rng, (1,), minval=0, maxval=2 ** 31 - 1, dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out = _flash_core(
        fold(q), fold(k), fold(v), scale, float(dropout_rate), seed, interpret
    )
    return out.reshape(b, h, n, dh).transpose(0, 2, 1, 3)
