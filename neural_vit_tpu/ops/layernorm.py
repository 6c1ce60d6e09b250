"""Pallas TPU fused LayerNorm with custom VJP.

Replaces `flax.linen.LayerNorm` on the hot path (reference
`models/model.py:151-178` pre-LN blocks + final norm). Profiling the train
step showed ~25 ms/step of XLA LayerNorm fusions (f32 convert + mean/var
reduction forward, two more reduction passes backward) against an
HBM-bound floor of ~9 ms — XLA keeps stats tensors in HBM and splits the
backward into separate reduce fusions. This kernel:

  * computes per-row mean/variance in f32 ON the VMEM-resident block and
    applies the affine in one pass (forward = exactly one HBM read of x
    and one write of y);
  * saves NOTHING for the backward — stats are recomputed from x inside
    the backward kernel (they cost a VPU reduction over a block that has
    to be loaded anyway for dx);
  * accumulates dgamma/dbeta across row-blocks in VMEM via the sequential
    TPU grid (zero-init at program 0, += every step), so the backward is
    one kernel instead of XLA's three reduction fusions.

Semantics match `nn.LayerNorm(epsilon=eps)`: y = (x - μ)·rsqrt(σ² + eps)
∘ γ + β with biased variance, f32 statistics, output cast to x.dtype.
The module-level fallback (`layer_norm(..., fused=False)`) is the plain
jnp expression (used on CPU and for parity tests); both paths are
checked against each other in tests/test_layernorm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ROWS = 1024  # rows-per-grid-step cap: 1024·384·(in/out bf16 + f32 work) ≈ 5 MB


def _pick_rows(m: int) -> int:
    """Largest divisor of m that is ≤ _ROWS and a multiple of 8.

    The block size must DIVIDE m: a ragged final block would feed
    out-of-bounds rows into the dgamma/dbeta accumulation. Returns 0 if no
    such divisor exists (caller falls back to the unfused path)."""
    for r in range(min(_ROWS, m), 7, -1):
        if r % 8 == 0 and m % r == 0:
            return r
    return 0


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)                  # (R, C)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd * g_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32
    )
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps: float):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    dyg = dy * g
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (dyg - m1 - xhat * m2)).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _zero():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dg_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)


def _call_fwd(x2, gamma, beta, eps, interpret):
    m, c = x2.shape
    rows = _pick_rows(m)
    grid = (m // rows,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
        interpret=interpret,
    )(x2, gamma.reshape(1, c), beta.reshape(1, c))


def _call_bwd(x2, gamma, dy2, eps, interpret):
    m, c = x2.shape
    rows = _pick_rows(m)
    grid = (m // rows,)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, c), dy2.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x2, gamma.reshape(1, c), dy2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_ln(x2, gamma, beta, eps, interpret):
    return _call_fwd(x2, gamma, beta, eps, interpret)


def _fused_ln_fwd(x2, gamma, beta, eps, interpret):
    return _call_fwd(x2, gamma, beta, eps, interpret), (x2, gamma)


def _fused_ln_bwd(eps, interpret, res, dy2):
    x2, gamma = res
    dx, dg, db = _call_bwd(x2, gamma, dy2, eps, interpret)
    return (
        dx,
        dg.reshape(gamma.shape).astype(gamma.dtype),
        db.reshape(gamma.shape).astype(gamma.dtype),
    )


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def layer_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    eps: float = 1e-6,
    fused: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm over the last axis, `nn.LayerNorm` semantics.

    fused=True uses the Pallas kernel (TPU hot path; also runs under the
    interpreter for tests); fused=False is the plain jnp expression, which
    is what autodiff differentiates on the fallback path.
    """
    c = x.shape[-1]
    m = 1
    for d in x.shape[:-1]:
        m *= d
    if fused and (c % 128 != 0 or _pick_rows(m) == 0):
        fused = False
    if not fused:
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32) + (
            beta.astype(jnp.float32)
        )
        return y.astype(x.dtype)
    lead = x.shape[:-1]
    y2 = _fused_ln(x.reshape(-1, c), gamma, beta, float(eps), interpret)
    return y2.reshape(*lead, c)
