"""Pallas TPU fused attention over the packed qkv projection, with custom VJP.

Replaces the reference's materialized O(N²) attention
(`models/model.py:106-119`). Unlike a conventional flash kernel that takes
separate (B, H, N, Dh) operands, this kernel consumes the fused qkv Dense
output directly — one (B, N, 3·H·Dh) array in exactly the layout the matmul
produces — and returns (B, N, H·Dh), the layout the output projection wants.
Head handling happens *inside* the kernel via lane slicing. Profiling the
round-1 kernel showed why this matters: on a v5e, ~95 ms of a 384 ms train
step was XLA-level layout traffic around the kernel (pad 513→640,
(B,N,H,Dh)→(B·H,N,Dh) fold/unfold transposes, qkv slice copies). In this
design none of those ops exist — the only HBM tensors are qkv, out, lse, and
their gradients, all in matmul-native layouts, at the true sequence length
(Mosaic handles non-128 trailing dims logically; no zero padding).

Kernel math per (batch, head), one q-block per grid step (all exponentials
run in base 2 — scale·log2e is folded into the q operand build, so the
full-plane op is a bare exp2; lse keeps its natural-log HBM contract via
(n, 1)-vector conversions):
    s₂  = (q·scale·log2e) @ kᵀ        (folded into q: (bq,Dh) not (bq,N))
    lse = ln2·rowmax(s₂) + log(rowsum(exp2(s₂ - rowmax(s₂))))  → (B, H, N)
    p   = exp2(s₂ - lse·log2e)         (exact softmax)
    o   = (p ∘ keep01) @ v / (1-rate)  (keep01: {0,1} dropout select; the
                                        1/(1-rate) rescale rides the existing
                                        vector/scalar epilogues, never a
                                        full (N, N) multiply)
Backward uses the saved (o, lse) pair — the classic flash residuals:
    delta = rowsum(do ∘ o)             (Σₖ pₖ dpₖ = Σ_d do_d o_d; in-kernel
                                        on the fused path, but precomputed
                                        as ONE XLA einsum → (B, H, N) for
                                        the blocked path so those kernels
                                        never load the full (N, D) `o` rows
                                        — that whole-row operand was what
                                        pushed the dkv VMEM stack over
                                        budget at production N = 1953)
    ds    = p ∘ ((do @ vᵀ) ∘ keep - delta)
    dq    = (ds @ k)·scale    dk = (dsᵀ @ q)·scale    dv = (p∘keep)ᵀ @ do
Two backward shapes:
  * fused (n_q == 1, the production path — N = 513 default dims): one kernel
    per batch computes dq/dk/dv for all heads in one program and writes a
    single (B, N, 3D) dqkv block — no cross-step accumulation, so gradients
    are plain bf16 writes and the VJP output is already in qkv layout.
  * blocked (n_q > 1, long sequences): two embarrassingly-parallel kernels —
    dq over q-blocks, dk/dv over kv-blocks — each recomputing p from lse.
    No accumulation across grid steps in either.

Attention-probability dropout (reference `Attention.attn_drop`) runs inside
the kernel: the keep mask is a counter-based hash of
(seed, batch, head, global row, global col) — a pure function of global
coordinates, so forward and every backward kernel regenerate it
bit-identically regardless of block geometry, and no mask tensor ever
touches HBM. The same code runs under Mosaic on TPU and the Pallas
interpreter on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# exp(x) on the VPU lowers to exp2(x·log2e) — folding log2e into the score
# scale (a (n, dh) operand build that already multiplies by `scale`) turns
# every full-plane exp into a bare exp2, deleting one (n, n) multiply per
# plane. lse keeps its natural-log HBM contract: the kernels convert at
# vector (n, 1) granularity.
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _scaled(q, c: float):
    """q·c with the constant held in f32. scale=Dh^-0.5 is usually a power
    of two (exact in bf16) but scale·log2e is not — pre-rounding the
    constant to bf16 would shift the softmax temperature systematically by
    ~2^-9; multiplying in f32 and rounding per element leaves only
    unbiased representation noise."""
    return (q.astype(jnp.float32) * jnp.float32(c)).astype(q.dtype)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hash_bits(shape, seed, row0, col0):
    """Counter-based uint32 bits over GLOBAL row/col coordinates. A pure
    function of (seed, global position): every kernel regenerates the
    exact same bits for the same coordinates, whatever block of the (N, N)
    plane it is looking at.

    VPU-lean: the row/seed and col affine parts are computed on (rows, 1)
    and (1, cols) VECTORS (the broadcast into the full plane rides the
    combining add), and the mixer is ONE round — combine, xorshift, mult:
    5 full-plane ops against the round-1 murmur3 finalizer's ~10. The
    dropout threshold compares the full 32-bit value, which the final
    multiply's avalanche serves well in its high bits; the known weakness
    of a single round (structured LOW bits) never reaches the compare.
    Collisions from the affine combine (two coordinates hashing
    identically) occur for ~n³/2³² ≈ 0.03 positions per 513² plane —
    irrelevant for a dropout mask. The full-step cost of this plane is
    real: the N=513 kernels are VPU-bound, and each saved full-plane op
    is ~0.5 µs/program (measured: 2-round → 1-round mixer lifted the
    whole train step 1,462 → 1,489 v/s, +1.9%)."""
    r = row0 + jax.lax.broadcasted_iota(jnp.uint32, (shape[0], 1), 0)
    c = col0 + jax.lax.broadcasted_iota(jnp.uint32, (1, shape[1]), 1)
    rv = r * jnp.uint32(0x9E3779B1) + seed.astype(jnp.uint32) * jnp.uint32(
        0xC2B2AE35
    )
    cv = c * jnp.uint32(0x85EBCA6B)
    x = rv + cv                                  # full-plane op 1
    x = x ^ (x >> 16)                            # ops 2-3
    x = x * jnp.uint32(0x7FEB352D)               # op 4 (cmp in caller is 5)
    return x


def _keep_mask(shape, rate: float, seed, row0, col0=0):
    """Boolean keep mask (True = keep). The 1/(1-rate) inverted-dropout
    rescale is NOT applied here: callers zero dropped lanes with a bare
    select and fold the scalar rescale into vector-level epilogues
    (denom, delta, output scales) — one less full-plane multiply than
    building a {0, 1/(1-rate)} multiplier plane."""
    bits = _hash_bits(shape, seed, row0, col0)
    threshold = jnp.uint32(int(rate * (2 ** 32)))
    return bits >= threshold


def _head_seed(seed_ref, b, h: int, n_heads: int):
    """Per-(batch, head) seed — independent of any block geometry."""
    return seed_ref[0] + b * n_heads + h


def _col_mask(p, n_valid: int, col0):
    """Zero attention probabilities in zero-padded key columns (only used
    when the sequence was host-padded; pad keys give s=0 ⇒ p=exp(-lse)≠0)."""
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    return jnp.where(col < n_valid, p, 0.0)


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                scale: float, n_heads: int, dh: int, n_valid: int,
                padded: bool, dropout_rate: float, staged: bool,
                q_base: int = 0, k_base: int = 0, v_base: int = 0):
    # q/k/v_base: lane offsets of the q/k/v thirds when the three refs
    # alias ONE packed (1, N, 3D) block (the packed-full mode for
    # non-128-aligned D — see _flash_fwd); 0 when they are separate
    # D-wide column blocks.
    b = pl.program_id(0)
    row0 = (pl.program_id(1) * q_ref.shape[1]).astype(jnp.uint32)

    def qk(h):
        q = _scaled(q_ref[0, :, q_base + h * dh:q_base + (h + 1) * dh],
                    scale * _LOG2E)                     # (bq, dh)
        return jax.lax.dot_general(                     # s·log2e: (bq, nk)
            q, k_ref[0, :, k_base + h * dh:k_base + (h + 1) * dh],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # Software pipelining across the unrolled head loop: issue head h+1's
    # QKᵀ (MXU) before head h's softmax/mask (VPU) so the scheduler always
    # has an independent MXU op to overlap with VPU phases — measured
    # kernel-isolated +10.9% with dropout, +15.2% without, bit-identical
    # output (the issue order changes, the per-head math does not). Costs
    # one extra live (bq, nk) f32 plane, so the driver enables it only
    # when that plane fits the VMEM stack budget (_staged_ok).
    s2_next = qk(0) if staged else None
    for h in range(n_heads):
        if staged:
            s2 = s2_next
            if h + 1 < n_heads:
                s2_next = qk(h + 1)
        else:
            s2 = qk(h)
        sl = slice(h * dh, (h + 1) * dh)
        v = v_ref[0, :, v_base + h * dh:v_base + (h + 1) * dh]
        m2 = jnp.max(s2, axis=-1, keepdims=True)
        p = jnp.exp2(s2 - m2)                           # == exp(s - m)
        if padded:
            p = _col_mask(p, n_valid, 0)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        lse = m2 * _LN2 + jnp.log(denom)                # (bq, 1), natural log
        lse_ref[0, h:h + 1, :] = jnp.transpose(lse)
        pv = p.astype(v.dtype)
        if dropout_rate > 0.0:
            # Select AFTER the bf16 downcast (bit-identical: 0 is exact in
            # both widths and astype∘select == select∘astype for it) so
            # the full-plane select runs at bf16 VPU width.
            pv = jnp.where(
                _keep_mask(p.shape, dropout_rate,
                           _head_seed(seed_ref, b, h, n_heads), row0),
                pv, jnp.zeros((), pv.dtype),
            )
            denom = denom * (1.0 - dropout_rate)        # folded 1/(1-r)
        acc = jax.lax.dot_general(                      # (bq, dh)
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (acc / denom).astype(o_ref.dtype)


# --------------------------------------------------------------------------
# fused backward (single q-block: dq, dk, dv in one program, bf16 writes)
# --------------------------------------------------------------------------

def _bwd_fused_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                      dqkv_ref, *, scale: float, n_heads: int,
                      dh: int, n_valid: int, padded: bool,
                      dropout_rate: float, staged: bool,
                      q_base: int = 0, k_base: int = 0, v_base: int = 0):
    # q/k/v_base: lane offsets when q/k/v_ref alias one packed (1, N, 3D)
    # block (packed-full mode for non-128-aligned D); 0 otherwise.
    b = pl.program_id(0)
    d = n_heads * dh

    def qk(h):
        qs2 = _scaled(q_ref[0, :, q_base + h * dh:q_base + (h + 1) * dh],
                      scale * _LOG2E)
        return qs2, jax.lax.dot_general(
            qs2, k_ref[0, :, k_base + h * dh:k_base + (h + 1) * dh],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dovt(h):
        sl = slice(h * dh, (h + 1) * dh)
        return jax.lax.dot_general(                     # do @ vᵀ: (n, n)
            do_ref[0, :, sl],
            v_ref[0, :, v_base + h * dh:v_base + (h + 1) * dh],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # Software pipelining as in _fwd_kernel, graded by `staged` level:
    # level 2 (dual-hoist) stages BOTH of head h+1's independent MXU
    # planes — QKᵀ AND dp = do·vᵀ — ahead of head h's VPU work (measured
    # 2.127 → 2.044 ms kernel-isolated at dropout 0.1, +3.9%,
    # bit-identical); level 1 stages only QKᵀ (+1.2-1.5%) and costs one
    # live (n, n) f32 plane instead of two — the fallback when the dual
    # planes overflow the stack budget (production N=1952 under the
    # 90 MiB tier). Driver-gated via _staged_ok.
    if staged:
        qs2_next, s2_next = qk(0)
        dp_next = dovt(0) if staged >= 2 else None
    for h in range(n_heads):
        if staged:
            qs2, s2 = qs2_next, s2_next
            dp = dp_next if staged >= 2 else dovt(h)
            if h + 1 < n_heads:
                qs2_next, s2_next = qk(h + 1)
                if staged >= 2:
                    dp_next = dovt(h + 1)
        else:
            qs2, s2 = qk(h)
            dp = dovt(h)
        sl = slice(h * dh, (h + 1) * dh)
        k = k_ref[0, :, k_base + h * dh:k_base + (h + 1) * dh]
        do = do_ref[0, :, sl]                           # (n, dh)
        o = o_ref[0, :, sl]
        lse = jnp.transpose(lse_ref[0, h:h + 1, :])     # (n, 1)
        p = jnp.exp2(s2 - lse * jnp.float32(_LOG2E))    # exact softmax probs
        if padded:
            p = _col_mask(p, n_valid, 0)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)         # (n, 1)
        if dropout_rate > 0.0:
            # Rescale folded out of the plane: ds_true = inv·ds below,
            # pk_true = inv·pk — the inv lands in the output scales.
            keep = _keep_mask(
                p.shape, dropout_rate,
                _head_seed(seed_ref, b, h, n_heads), jnp.uint32(0),
            )
            inv = 1.0 / (1.0 - dropout_rate)
            ds = p * (jnp.where(keep, dp, 0.0)
                      - delta * (1.0 - dropout_rate))
            # bf16-width select (bit-identical — see _fwd_kernel).
            pk = jnp.where(keep, p.astype(do.dtype),
                           jnp.zeros((), do.dtype))
            dq_scale, dk_scale, dv_scale = scale * inv, inv / _LOG2E, inv
        else:
            ds = p * (dp - delta)
            pk = p.astype(do.dtype)
            dq_scale, dk_scale, dv_scale = scale, 1.0 / _LOG2E, 1.0
        ds_c = ds.astype(qs2.dtype)
        dqkv_ref[0, :, sl] = (jax.lax.dot_general(
            ds_c, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * dq_scale).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, d + h * dh:d + (h + 1) * dh] = (jax.lax.dot_general(
            ds_c, qs2, (((0,), (0,)), ((), ())),     # dsᵀ @ (q·scale·log2e)
            preferred_element_type=jnp.float32,
        ) * dk_scale).astype(dqkv_ref.dtype)
        dv = jax.lax.dot_general(
            pk, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0:
            dv = dv * dv_scale
        dqkv_ref[0, :, 2 * d + h * dh:2 * d + (h + 1) * dh] = (
            dv.astype(dqkv_ref.dtype)
        )


# --------------------------------------------------------------------------
# blocked backward (long sequences): dq over q-blocks, dk/dv over kv-blocks
# --------------------------------------------------------------------------

def _bwd_dq_kernel(seed_ref, q_ref, k_ref, v_ref, lse_ref, delta_ref, do_ref,
                   dq_ref, *, scale: float, n_heads: int, dh: int,
                   n_valid: int, padded: bool, dropout_rate: float):
    b = pl.program_id(0)
    row0 = (pl.program_id(1) * q_ref.shape[1]).astype(jnp.uint32)
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qs2 = _scaled(q_ref[0, :, sl], scale * _LOG2E)  # (bq, dh)
        k = k_ref[0, :, sl]                             # (nk, dh)
        v = v_ref[0, :, sl]
        do = do_ref[0, :, sl]                           # (bq, dh)
        lse = jnp.transpose(lse_ref[0, h:h + 1, :])     # (bq, 1)
        s2 = jax.lax.dot_general(
            qs2, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp2(s2 - lse * jnp.float32(_LOG2E))
        if padded:
            p = _col_mask(p, n_valid, 0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.transpose(delta_ref[0, h:h + 1, :])  # (bq, 1)
        if dropout_rate > 0.0:
            dp = jnp.where(
                _keep_mask(p.shape, dropout_rate,
                           _head_seed(seed_ref, b, h, n_heads), row0),
                dp, 0.0,
            )
            delta = delta * (1.0 - dropout_rate)
            dq_scale = scale / (1.0 - dropout_rate)
        else:
            dq_scale = scale
        ds = (p * (dp - delta)).astype(qs2.dtype)
        dq_ref[0, :, sl] = (jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * dq_scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, lse_ref, delta_ref,
                    do_ref, dk_ref, dv_ref, *, scale: float, n_heads: int,
                    dh: int, n_valid: int, padded: bool, dropout_rate: float):
    """One kv-block per program: recompute the (all rows × this block) score
    stripe from lse and emit this block's dk/dv outright — no accumulation."""
    b = pl.program_id(0)
    col0 = (pl.program_id(1) * k_ref.shape[1]).astype(jnp.uint32)
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qs2 = _scaled(q_ref[0, :, sl], scale * _LOG2E)  # (n, dh)
        k = k_ref[0, :, sl]                             # (bk, dh) this block
        v = v_ref[0, :, sl]
        do = do_ref[0, :, sl]                           # (n, dh)
        lse = jnp.transpose(lse_ref[0, h:h + 1, :])     # (n, 1)
        s2 = jax.lax.dot_general(                       # (n, bk) stripe
            qs2, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp2(s2 - lse * jnp.float32(_LOG2E))
        if padded:
            p = _col_mask(p, n_valid, col0)
        dp = jax.lax.dot_general(                       # (n, bk)
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.transpose(delta_ref[0, h:h + 1, :])  # (n, 1)
        if dropout_rate > 0.0:
            keep = _keep_mask(
                p.shape, dropout_rate,
                _head_seed(seed_ref, b, h, n_heads), jnp.uint32(0), col0,
            )
            inv = 1.0 / (1.0 - dropout_rate)
            ds = p * (jnp.where(keep, dp, 0.0)
                      - delta * (1.0 - dropout_rate))
            # bf16-width select (bit-identical — see _fwd_kernel).
            pk = jnp.where(keep, p.astype(do.dtype),
                           jnp.zeros((), do.dtype))
            dk_scale, dv_scale = inv / _LOG2E, inv
        else:
            ds = p * (dp - delta)
            pk = p.astype(do.dtype)
            dk_scale, dv_scale = 1.0 / _LOG2E, 1.0
        dk_ref[0, :, sl] = (jax.lax.dot_general(
            ds.astype(qs2.dtype), qs2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * dk_scale).astype(dk_ref.dtype)
        dv = jax.lax.dot_general(
            pk, do, (((0,), (0,)), ((), ())),               # p̃ᵀ @ do
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0:
            dv = dv * dv_scale
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


# --------------------------------------------------------------------------
# block planning
# --------------------------------------------------------------------------

def _divisors_desc(n: int, cap: int):
    """Mosaic-legal block sizes for a length-n dim, biggest first: the full
    dim itself, else multiples of 128 (the lowering requires the last two
    block dims be ×8/×128 or full — lse blocks put bq in the lane dim, so
    ×128 covers every spec)."""
    out = [n] if n <= cap else []
    out += [128 * k for k in range(min(n, cap) // 128, 0, -1)
            if n % (128 * k) == 0]
    return out

# VMEM-stack budget (bytes). Mosaic multi-buffers operand/output blocks and
# shares score-block intermediates; coefficients below were sanity-checked
# against Mosaic's reported stack sizes on v5e at the production shapes.
_VMEM_BUDGET = 13 * 1024 * 1024


def _stack_bytes(bq: int, n: int, d: int, kind: str) -> float:
    """Rough VMEM stack model: double-buffered operand/output blocks plus
    live (bq, n) f32 score intermediates (the dominant term)."""
    lanes = _ceil_to(n, 128)
    score = bq * lanes * 4.0
    if kind == "fwd":
        blocks = 2 * (bq * d + 2 * n * d + bq * d) * 2      # q,k,v,o bf16
        inter = 2.2 * score
    elif kind == "fused":
        blocks = 2 * (4 * n * d + n * d + n * 3 * d) * 2    # q,k,v,o,do,dqkv
        inter = 3.2 * score
    elif kind == "fwd_packed":
        # Packed-full mode (non-128-aligned D): ONE (n, 3d) qkv block
        # instead of separate q/k/v column views, whole rows (bq = n).
        blocks = 2 * (n * 3 * d + n * d) * 2                # qkv, o
        inter = 2.2 * score
    elif kind == "fused_packed":
        blocks = 2 * (n * 3 * d + n * d + n * d + n * 3 * d) * 2  # +o,do,dqkv
        inter = 3.2 * score
    elif kind == "dq":
        blocks = 2 * (2 * bq * d + 2 * n * d + bq * d) * 2  # q,do,k,v,dq
        inter = 3.0 * score
    else:  # dkv stripe: (n, bk) intermediates; whole-row q/do only
        lanes_bk = _ceil_to(bq, 128)
        score = n * lanes_bk * 4.0
        blocks = 2 * (2 * n * d + 2 * bq * d + 2 * bq * d) * 2
        inter = 3.0 * score
    # delta/lse rows are f32 (n_heads, n) — small but not free.
    return blocks + inter + 2 * 2 * (d // 64) * n * 4.0


def _plan_at(n: int, d: int, budget: float):
    """Best (n_proc, bq, bk, fused) under a given VMEM stack budget, or
    None when nothing fits. Fused (whole-row fwd + one-program backward)
    is preferred whenever BOTH its stacks fit: it executes 5 N² matmuls
    per layer against the pair's 7 and needs no delta einsum — measured
    17% faster end-to-end than the bq=512 pair at N=2048 on a v5e."""
    for n_proc in (n, _ceil_to(n, 128)):
        if (_stack_bytes(n_proc, n_proc, d, "fwd") <= budget
                and _stack_bytes(n_proc, n_proc, d, "fused") <= budget):
            return n_proc, n_proc, n_proc, True
        for bq in _divisors_desc(n_proc, 1024):
            if _stack_bytes(bq, n_proc, d, "fwd") > budget:
                continue
            if _stack_bytes(bq, n_proc, d, "dq") > budget:
                continue
            for bk in _divisors_desc(n_proc, 1024):
                if _stack_bytes(bk, n_proc, d, "dkv") <= budget:
                    return n_proc, bq, bk, False
    return None


# Escalation ladder for long sequences. The base 13 MiB budget matches the
# default 16 MiB per-kernel VMEM limit; when the blocks it yields collapse
# (bq < 256 at production N≈2k the pair kernels measured ~23 TF/s — whole
# K/V rows are re-streamed per tiny q-block), re-plan under a bigger budget
# and raise the kernel's own limit via CompilerParams.vmem_limit_bytes
# (v5e has 128 MiB VMEM; the per-kernel field is the only reliable channel
# over the tunneled backend — TPU-only XLA_FLAGS abort the local process).
# Top tier is bounded by compilability, not ambition: accepted plans model
# their stack <= budget, Mosaic's real stack runs ~1.3x the model, and the
# per-kernel limit tops out at 118 MiB (v5e VMEM is 128 MiB) — so the
# largest safe budget is 118/1.3 ≈ 90 MiB. Anything the ladder accepts is
# believed compilable; supported() must not admit shapes whose kernels
# would then fail instead of falling back to XLA.
_BUDGET_LADDER = (_VMEM_BUDGET, 26 * 2**20, 48 * 2**20, 90 * 2**20)


def _plan(n: int, d: int) -> tuple:
    """Choose (n_proc, bq, bk, fused, budget) — n_proc is the (possibly
    padded) sequence length the kernels run at; fused=True means the
    one-program backward applies (single q-block); budget is the VMEM
    stack budget the plan was drawn from (> _VMEM_BUDGET ⇒ the kernels
    must raise their per-kernel vmem_limit_bytes).

    The ladder keeps escalating past an acceptable PAIR plan in case a
    later tier admits the fused plan (measured 17% faster at N=2048);
    the earliest acceptable pair plan is the fallback."""
    pair = None
    for budget in _BUDGET_LADDER:
        p = _plan_at(n, d, budget)
        if p is None:
            continue
        if p[3]:  # fused — take it at the smallest tier that fits it
            return (*p, budget)
        # Remember the earliest pair plan with big-enough q-blocks (whole
        # K/V rows amortize); tiny-block plans only as a last resort.
        good = p[1] >= (256 if budget == _VMEM_BUDGET else 512)
        if pair is None or (good and not pair[1]):
            pair = ((*p, budget), good)
    if pair is not None:
        return pair[0]
    raise ValueError(
        f"flash_attention: no block plan fits even the "
        f"~{_BUDGET_LADDER[-1] >> 20} MB VMEM stack budget for N={n}, "
        f"D={d}: the whole-KV forward stops scaling once 2·N·D bf16 "
        f"(double-buffered) alone fills VMEM — "
        f"N≈{_BUDGET_LADDER[-1] // (8 * d)} at this D. The dispatcher "
        f"(ops/attention.py) falls back to the XLA path automatically; "
        f"check `supported(n, d)` before calling the kernel directly."
    )


def _plan_packed(n: int, d: int) -> Optional[float]:
    """VMEM budget tier for the packed-full mode (non-128-aligned D), or
    None when nothing fits.

    Mosaic requires a block's LAST dim be a multiple of 128 lanes or the
    full array dim. The regular specs carve the (B, N, 3D) qkv array into
    D-wide thirds — illegal when D % 128 != 0 (e.g. 'tiny' D=192, or
    'small' D=384 under tp=2 → 192 per shard). Packed-full mode instead
    loads the FULL (1, N, 3D) row block (full-dim last axis — always
    legal; the (1, H, N) lse blocks already rely on the same rule at
    N=513) and the kernel slices q/k/v by lane offset in VMEM. Whole rows
    only (single q-block, fused backward), so it covers exactly the
    small-D regime where whole rows fit — larger N at unaligned D still
    falls back to XLA."""
    for budget in _BUDGET_LADDER:
        if (_stack_bytes(n, n, d, "fwd_packed") <= budget
                and _stack_bytes(n, n, d, "fused_packed") <= budget):
            return budget
    return None


def _staged_ok(bq: int, n: int, d: int, kind: str,
               budget: float = _VMEM_BUDGET) -> int:
    """Head-staged issue-order LEVEL (0 = off): each level keeps one extra
    (bq, n) f32 plane live. Forward has one stageable MXU plane (head
    h+1's QKᵀ — level 1); the fused backward has two (level 1 = QKᵀ only,
    level 2 = dual-hoist: QKᵀ AND h+1's do·vᵀ). Pick the deepest level
    whose extra planes still fit the stack budget — at production N=1952
    the fused stack (~75 MB) fits one extra plane (~16 MB) under the
    90 MiB tier but not two, so the backward degrades to the qk-only
    hoist instead of losing staging entirely. Math is bit-identical at
    every level (issue order only)."""
    max_level = 2 if kind.startswith("fused") else 1
    plane = bq * _ceil_to(n, 128) * 4.0
    base = _stack_bytes(bq, n, d, kind)
    for level in range(max_level, 0, -1):
        if base + level * plane <= budget:
            return level
    return 0


def supported(n: int, d: int) -> bool:
    """True iff the kernels can run at (sequence, embed) = (n, d).

    128-aligned D ('small' 384, 'base' 512): the regular column-block
    specs apply — any N for which a VMEM block plan exists.

    Non-128-aligned D ('tiny' 192, 'small' under tp=2): the packed-full
    mode applies (see _plan_packed) — one full-lane (1, N, 3D) qkv block,
    whole-row processing, fused backward — as long as the whole-row
    stacks fit a VMEM ladder tier. Beyond that, the dispatcher
    (ops/attention.py) falls back to the XLA path."""
    if d % 128 != 0:
        return d % 8 == 0 and _plan_packed(n, d) is not None
    try:
        _plan(n, d)
        return True
    except ValueError:
        return False


# --------------------------------------------------------------------------
# pallas_call drivers
# --------------------------------------------------------------------------

# No kernel carries state across grid steps (fwd/dq/dkv write disjoint
# blocks; the fused bwd is one program per batch), so every grid dim is
# `parallel` — lets Mosaic reorder/overlap programs instead of assuming a
# sequential ("arbitrary") carried dependency.
_PARALLEL_2D = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel")
)


def _kernel_params(budget: float) -> pltpu.CompilerParams:
    """Parallel grid semantics, plus an explicit per-kernel VMEM limit when
    the block plan came from an escalated budget (the default limit is
    16 MiB; the stack model under-counts Mosaic's real stack by ~1.3×, so
    leave generous headroom — v5e VMEM is 128 MiB)."""
    if budget <= _VMEM_BUDGET:
        return _PARALLEL_2D
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
        vmem_limit_bytes=min(int(budget * 1.8), 118 * 2**20),
    )


def _maybe_pad(x, n_proc: int):
    n = x.shape[1]
    if n_proc == n:
        return x
    return jnp.pad(x, [(0, 0), (0, n_proc - n), (0, 0)])


def _qkv_specs(n_proc: int, bq: int, d: int, q_blocked: bool):
    """Three views of the single (B, N, 3D) qkv operand: col-block 0/1/2."""
    if q_blocked:
        q_spec = pl.BlockSpec((1, bq, d), lambda b, i, *_: (b, i, 0))
    else:
        q_spec = pl.BlockSpec((1, n_proc, d), lambda b, i, *_: (b, 0, 0))
    k_spec = pl.BlockSpec((1, n_proc, d), lambda b, i, *_: (b, 0, 1))
    v_spec = pl.BlockSpec((1, n_proc, d), lambda b, i, *_: (b, 0, 2))
    return q_spec, k_spec, v_spec


def _fwd_kernel_packed(seed_ref, qkv_ref, o_ref, lse_ref, **kw):
    """Packed-full forward: q/k/v are lane offsets into ONE qkv block."""
    d = kw["n_heads"] * kw["dh"]
    _fwd_kernel(seed_ref, qkv_ref, qkv_ref, qkv_ref, o_ref, lse_ref,
                q_base=0, k_base=d, v_base=2 * d, **kw)


def _bwd_fused_kernel_packed(seed_ref, qkv_ref, o_ref, lse_ref, do_ref,
                             dqkv_ref, **kw):
    d = kw["n_heads"] * kw["dh"]
    _bwd_fused_kernel(seed_ref, qkv_ref, qkv_ref, qkv_ref, o_ref, lse_ref,
                      do_ref, dqkv_ref, q_base=0, k_base=d, v_base=2 * d,
                      **kw)


def _flash_fwd_packed(qkv, seed, *, n_heads, scale, dropout_rate, interpret):
    """Forward for non-128-aligned D: one full-lane (1, N, 3D) qkv block
    per batch, whole rows (no q-blocking, no padding — every block's last
    dim is a full array dim, and the sublane dim is the full N)."""
    bsz, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    budget = _plan_packed(n, d)
    if budget is None:
        raise ValueError(
            f"flash_attention (packed-full): whole-row stacks do not fit "
            f"VMEM at N={n}, D={d} — check supported() before calling"
        )
    kernel = functools.partial(
        _fwd_kernel_packed, scale=scale, n_heads=n_heads, dh=dh, n_valid=n,
        padded=False, dropout_rate=dropout_rate,
        staged=_staged_ok(n, n, d, "fwd_packed", budget),
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, 1),
            in_specs=[pl.BlockSpec((1, n, 3 * d), lambda b, i, *_: (b, 0, 0))],
            out_specs=[
                pl.BlockSpec((1, n, d), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, n_heads, n), lambda b, i, *_: (b, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n, d), qkv.dtype),
            jax.ShapeDtypeStruct((bsz, n_heads, n), jnp.float32),
        ],
        compiler_params=_kernel_params(budget),
        interpret=interpret,
    )(seed, qkv)
    return out, lse


def _flash_bwd_packed(qkv, out, lse, do, seed, *, n_heads, scale,
                      dropout_rate, interpret):
    """Backward for non-128-aligned D: the fused single-program shape only
    (dq/dk/dv written as one full-lane (1, N, 3D) block)."""
    bsz, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    budget = _plan_packed(n, d)
    qkv_spec = pl.BlockSpec((1, n, 3 * d), lambda b, *_: (b, 0, 0))
    row_spec = pl.BlockSpec((1, n, d), lambda b, *_: (b, 0, 0))
    lse_spec = pl.BlockSpec((1, n_heads, n), lambda b, *_: (b, 0, 0))
    kernel = functools.partial(
        _bwd_fused_kernel_packed, scale=scale, n_heads=n_heads, dh=dh,
        n_valid=n, padded=False, dropout_rate=dropout_rate,
        staged=_staged_ok(n, n, d, "fused_packed", budget),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, 1),
            in_specs=[qkv_spec, row_spec, lse_spec, row_spec],
            out_specs=pl.BlockSpec((1, n, 3 * d), lambda b, *_: (b, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n, 3 * d), qkv.dtype),
        compiler_params=_kernel_params(budget),
        interpret=interpret,
    )(seed, qkv, out, lse, do)


def _flash_fwd(qkv, seed, *, n_heads, scale, dropout_rate, interpret):
    bsz, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    if d % 128 != 0:
        return _flash_fwd_packed(
            qkv, seed, n_heads=n_heads, scale=scale,
            dropout_rate=dropout_rate, interpret=interpret,
        )
    n_proc, bq, _, _, budget = _plan(n, d)
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


def _flash_bwd(qkv, out, lse, do, seed, *, n_heads, scale, dropout_rate,
               interpret):
    bsz, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    if d % 128 != 0:
        return _flash_bwd_packed(
            qkv, out, lse, do, seed, n_heads=n_heads, scale=scale,
            dropout_rate=dropout_rate, interpret=interpret,
        )
    n_proc, bq, bk, fused, budget = _plan(n, d)
    qkv_p = _maybe_pad(qkv, n_proc)
    do_p = _maybe_pad(do, n_proc)
    common = dict(scale=scale, n_heads=n_heads, dh=dh, n_valid=n,
                  padded=n_proc != n, dropout_rate=dropout_rate)

    if fused:
        # Single-program backward: `o` fits in VMEM at these shapes, so
        # delta stays an in-kernel rowsum (no extra XLA pass).
        out_p = _maybe_pad(out, n_proc)
        q_spec, k_spec, v_spec = _qkv_specs(n_proc, bq, d, q_blocked=False)
        row_spec = pl.BlockSpec((1, n_proc, d), lambda b, *_: (b, 0, 0))
        lse_spec = pl.BlockSpec((1, n_heads, n_proc), lambda b, *_: (b, 0, 0))
        dqkv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, **common,
                              staged=_staged_ok(n_proc, n_proc, d, "fused", budget)),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bsz, 1),
                in_specs=[q_spec, k_spec, v_spec, row_spec, lse_spec,
                          row_spec],
                out_specs=pl.BlockSpec(
                    (1, n_proc, 3 * d), lambda b, *_: (b, 0, 0)
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, n_proc, 3 * d), qkv.dtype),
            compiler_params=_kernel_params(budget),
            interpret=interpret,
        )(seed, qkv_p, qkv_p, qkv_p, out_p, lse, do_p)
        return dqkv[:, :n] if n_proc != n else dqkv

    # Blocked path (long sequences): delta[b,h,i] = Σ_dh do·o as ONE XLA
    # einsum shaped like lse, so neither blocked kernel loads the full
    # (n, d) `o` rows — the whole-row o operand was what pushed the dkv
    # stack over VMEM at production N=1953.
    delta = jnp.einsum(
        "bnhd,bnhd->bhn",
        out.reshape(bsz, n, n_heads, dh).astype(jnp.float32),
        do.reshape(bsz, n, n_heads, dh).astype(jnp.float32),
    )
    if n_proc != n:
        delta = jnp.pad(delta, [(0, 0), (0, 0), (0, n_proc - n)])
    # dq over q-blocks, dk/dv over kv-blocks, then one concat.
    q_spec, k_spec, v_spec = _qkv_specs(n_proc, bq, d, q_blocked=True)
    qrow = pl.BlockSpec((1, bq, d), lambda b, i, *_: (b, i, 0))
    full = pl.BlockSpec((1, n_proc, d), lambda b, i, *_: (b, 0, 0))
    lse_blk = pl.BlockSpec((1, n_heads, bq), lambda b, i, *_: (b, 0, i))
    lse_full = pl.BlockSpec((1, n_heads, n_proc), lambda b, i, *_: (b, 0, 0))
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, n_proc // bq),
            in_specs=[q_spec, k_spec, v_spec, lse_blk, lse_blk, qrow],
            out_specs=qrow,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n_proc, d), qkv.dtype),
        compiler_params=_kernel_params(budget),
        interpret=interpret,
    )(seed, qkv_p, qkv_p, qkv_p, lse, delta, do_p)

    qfull = pl.BlockSpec((1, n_proc, d), lambda b, i, *_: (b, 0, 0))
    kblk = pl.BlockSpec((1, bk, d), lambda b, i, *_: (b, i, 1))
    vblk = pl.BlockSpec((1, bk, d), lambda b, i, *_: (b, i, 2))
    kvrow = pl.BlockSpec((1, bk, d), lambda b, i, *_: (b, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, n_proc // bk),
            in_specs=[qfull, kblk, vblk, lse_full, lse_full, full],
            out_specs=[kvrow, kvrow],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_proc, d), qkv.dtype),
            jax.ShapeDtypeStruct((bsz, n_proc, d), qkv.dtype),
        ],
        compiler_params=_kernel_params(budget),
        interpret=interpret,
    )(seed, qkv_p, qkv_p, qkv_p, lse, delta, do_p)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return dqkv[:, :n] if n_proc != n else dqkv


# --------------------------------------------------------------------------
# custom VJP + public API
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _flash_core(qkv, seed, n_heads, scale, dropout_rate, interpret):
    out, _ = _flash_fwd(
        qkv, seed, n_heads=n_heads, scale=scale,
        dropout_rate=dropout_rate, interpret=interpret,
    )
    return out


def _flash_core_fwd(qkv, seed, n_heads, scale, dropout_rate, interpret):
    out, lse = _flash_fwd(
        qkv, seed, n_heads=n_heads, scale=scale,
        dropout_rate=dropout_rate, interpret=interpret,
    )
    return out, (qkv, out, lse, seed)


def _flash_core_bwd(n_heads, scale, dropout_rate, interpret, res, do):
    qkv, out, lse, seed = res
    dqkv = _flash_bwd(
        qkv, out, lse, do, seed, n_heads=n_heads, scale=scale,
        dropout_rate=dropout_rate, interpret=interpret,
    )
    return dqkv, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _seed_from_rng(dropout_rate: float, dropout_rng) -> jax.Array:
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        return jax.random.randint(
            dropout_rng, (1,), minval=0, maxval=2 ** 31 - 1, dtype=jnp.int32
        )
    return jnp.zeros((1,), jnp.int32)


def flash_attention_qkv(
    qkv: jax.Array,
    *,
    n_heads: int,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention straight off the packed qkv projection.

    Args:
        qkv: (B, N, 3·D) packed projection output, column order
            [q_h0…q_hH | k_h0…k_hH | v_h0…v_hH] — i.e. exactly
            `Dense(3·D)(x)` under the standard (B, N, 3, H, Dh) reshape
            convention (reference `models/model.py:108`).
        n_heads: number of attention heads H (D must divide evenly).
        scale: logit scale (head_dim ** -0.5 in the model).
        dropout_rate: attention-probability dropout (train only; pass 0.0
            for eval). Requires dropout_rng when > 0.
        interpret: run the Pallas interpreter (CPU tests).

    Returns:
        (B, N, D) attention output — the input layout of the out-projection.
    """
    d3 = qkv.shape[-1]
    if d3 % 3 != 0 or (d3 // 3) % n_heads != 0:
        raise ValueError(f"qkv last dim {d3} incompatible with 3×{n_heads} heads")
    seed = _seed_from_rng(dropout_rate, dropout_rng)
    return _flash_core(
        qkv, seed, n_heads, scale, float(dropout_rate), interpret
    )


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
    """Compatibility wrapper over separate heads-last (B, N, H, Dh) operands.

    Packs q/k/v into the (B, N, 3D) layout and calls the qkv kernel. The
    packing concat is real data movement — model code should call
    `flash_attention_qkv` on the projection output directly; this entry
    exists for tests and ad-hoc use.
    """
    b, n, h, dh = q.shape
    pack = lambda x: x.reshape(b, n, h * dh)
    qkv = jnp.concatenate([pack(q), pack(k), pack(v)], axis=-1)
    out = flash_attention_qkv(
        qkv, n_heads=h, scale=scale, dropout_rate=dropout_rate,
        dropout_rng=dropout_rng, interpret=interpret,
    )
    return out.reshape(b, n, h, dh)
