"""Flash attention kernel vs the XLA reference path (interpret mode on CPU;
the same kernel code compiles via Mosaic on TPU). Operands are heads-last
(B, N, H, Dh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_vit_tpu.ops.attention import xla_attention
from neural_vit_tpu.ops.flash_attention import flash_attention


def _qkv(rng, b=2, n=129, h=3, dh=64, dtype=np.float32):
    shape = (b, n, h, dh)
    return (
        jnp.asarray(rng.standard_normal(shape), dtype),
        jnp.asarray(rng.standard_normal(shape), dtype),
        jnp.asarray(rng.standard_normal(shape), dtype),
    )


@pytest.mark.parametrize("n", [128, 129, 513])
def test_forward_matches_xla(rng, n):
    q, k, v = _qkv(rng, n=n)
    scale = 64 ** -0.5
    ref, _ = xla_attention(q, k, v, scale)
    out = flash_attention(q, k, v, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_qkv_api_matches_xla(rng):
    """The packed-projection API: (B, N, 3D) in, (B, N, D) out."""
    b, n, h, dh = 2, 257, 3, 64
    q, k, v = _qkv(rng, b=b, n=n, h=h, dh=dh)
    from neural_vit_tpu.ops.flash_attention import flash_attention_qkv

    qkv = jnp.concatenate(
        [q.reshape(b, n, -1), k.reshape(b, n, -1), v.reshape(b, n, -1)], -1
    )
    out = flash_attention_qkv(qkv, n_heads=h, scale=0.125, interpret=True)
    ref, _ = xla_attention(q, k, v, 0.125)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref).reshape(b, n, -1),
        rtol=2e-5, atol=2e-5,
    )


def test_blocked_path_matches_xla(rng, monkeypatch):
    """Long-N path: fwd grid over q-blocks, bwd as the dq/dkv kernel pair
    (no fused single-program backward)."""
    import neural_vit_tpu.ops.flash_attention as fa

    n = 1024
    # The escalating VMEM ladder now plans this shape fused; pin the pair
    # plan so the blocked kernels stay regression-covered (they remain the
    # production path for N beyond the fused stack ceiling, e.g. N>=3k).
    monkeypatch.setattr(fa, "_plan", lambda _n, _d: (n, 256, 256, False,
                                                     fa._VMEM_BUDGET))
    q, k, v = _qkv(rng, b=1, n=n, h=1)
    scale = 64 ** -0.5

    def loss(fn):
        def inner(q, k, v):
            o = fn(q, k, v)
            return jnp.sum(o * jnp.sin(o))
        return inner

    ref, _ = xla_attention(q, k, v, scale)
    out = flash_attention(q, k, v, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    gf = jax.grad(loss(lambda *a: flash_attention(
        *a, scale=scale, interpret=True)), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda *a: xla_attention(*a, scale)[0]),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch (blocked path)",
        )


def test_gradients_match_xla(rng):
    q, k, v = _qkv(rng, b=1, n=200, h=2)
    scale = 64 ** -0.5

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, scale=scale, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o, _ = xla_attention(q, k, v, scale)
        return jnp.sum(o * jnp.cos(o))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch",
        )


def test_dropout_statistics_and_determinism(rng):
    q, k, v = _qkv(rng, b=1, n=128, h=1)
    scale = 64 ** -0.5
    key = jax.random.key(11)
    o1 = flash_attention(q, k, v, scale=scale, dropout_rate=0.5,
                         dropout_rng=key, interpret=True)
    o2 = flash_attention(q, k, v, scale=scale, dropout_rate=0.5,
                         dropout_rng=key, interpret=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
    o3 = flash_attention(q, k, v, scale=scale, dropout_rate=0.5,
                         dropout_rng=jax.random.key(12), interpret=True)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    # Inverted dropout keeps expectation ≈ no-dropout output.
    outs = [
        np.asarray(
            flash_attention(q, k, v, scale=scale, dropout_rate=0.5,
                            dropout_rng=jax.random.key(100 + i), interpret=True)
        )
        for i in range(24)
    ]
    ref, _ = xla_attention(q, k, v, scale)
    mean = np.mean(outs, axis=0)
    corr = np.corrcoef(mean.ravel(), np.asarray(ref).ravel())[0, 1]
    assert corr > 0.95


def test_dropout_differs_across_heads_and_blocks(rng):
    """The per-program seed must vary with (batch, head): identical q/k/v in
    two heads must get different masks."""
    q1, k1, v1 = _qkv(rng, b=1, n=128, h=1)
    q = jnp.concatenate([q1, q1], axis=2)
    k = jnp.concatenate([k1, k1], axis=2)
    v = jnp.concatenate([v1, v1], axis=2)
    out = flash_attention(q, k, v, scale=0.125, dropout_rate=0.5,
                          dropout_rng=jax.random.key(0), interpret=True)
    assert not np.allclose(np.asarray(out[:, :, 0]), np.asarray(out[:, :, 1]))


def test_dropout_mask_identical_under_different_block_geometry(rng, monkeypatch):
    """Regression: at long N the backward runs as two kv/q-blocked kernels
    whose tiles cover the (N, N) plane differently from the forward; the
    dropout mask is a pure function of (seed, global row, global col), so
    gradients must stay consistent across the geometries.

    With a fixed mask M the output is LINEAR in v: o = (P∘M)ᵀ-free v-map,
    so sum(o·w) == <∂/∂v, v> exactly. If bwd regenerated a different mask,
    this identity breaks (measured 1.7e-2 deviation on the round-1 kernel)."""
    import neural_vit_tpu.ops.flash_attention as fa

    n = 1024
    # Pin the pair plan (see test_blocked_path_matches_xla): the mask must
    # be identical across ANY block geometry, so cover the blocked one.
    monkeypatch.setattr(fa, "_plan", lambda _n, _d: (n, 256, 256, False,
                                                     fa._VMEM_BUDGET))
    q, k, v = _qkv(rng, b=1, n=n, h=1)
    w = jnp.asarray(np.random.default_rng(7).standard_normal(v.shape), v.dtype)
    key = jax.random.key(3)

    def f(vv):
        o = flash_attention(q, k, vv, scale=0.125, dropout_rate=0.3,
                            dropout_rng=key, interpret=True)
        return jnp.sum(o * w)

    g = jax.grad(f)(v)
    np.testing.assert_allclose(
        float(f(v)), float(jnp.sum(g * v)), rtol=1e-4,
        err_msg="bwd dropout mask differs from fwd",
    )


def test_escalated_budget_fused_path_matches_xla(rng):
    """The VMEM budget ladder: at N=1000/Dh=64 the base 13 MiB budget can't
    hold the fused stacks but the 26 MiB tier can — the plan must be the
    whole-row fused one, UNPADDED (whole-row blocks need no ×128
    divisibility), and fwd+grads must match XLA."""
    from neural_vit_tpu.ops.flash_attention import _VMEM_BUDGET, _plan

    n = 1000
    n_proc, bq, _, fused, budget = _plan(n, 64)
    assert fused and n_proc == n and budget > _VMEM_BUDGET

    q, k, v = _qkv(rng, b=1, n=n, h=1)
    scale = 64 ** -0.5
    ref, _ = xla_attention(q, k, v, scale)
    out = flash_attention(q, k, v, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss(fn):
        def inner(q, k, v):
            o = fn(q, k, v)
            return jnp.sum(o * jnp.sin(o))
        return inner

    gf = jax.grad(loss(lambda *a: flash_attention(
        *a, scale=scale, interpret=True)), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda *a: xla_attention(*a, scale)[0]),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch (escalated fused path)",
        )


def test_dropout_grad_uses_same_mask(rng):
    """Forward and backward must see an identical keep mask: the VJP of a
    fixed-seed dropout attention must match finite differences."""
    q, k, v = _qkv(rng, b=1, n=128, h=1)
    scale = 64 ** -0.5
    key = jax.random.key(5)

    def f(qq):
        o = flash_attention(qq, k, v, scale=scale, dropout_rate=0.3,
                            dropout_rng=key, interpret=True)
        return jnp.sum(o ** 2)

    g = jax.grad(f)(q)
    d = jnp.asarray(np.random.default_rng(0).standard_normal(q.shape), q.dtype)
    eps = 1e-3
    fd = (f(q + eps * d) - f(q - eps * d)) / (2 * eps)
    analytic = jnp.sum(g * d)
    np.testing.assert_allclose(float(analytic), float(fd), rtol=2e-2)


def test_unsupported_shape_reports_and_dispatch_falls_back(rng):
    """supported() must reject shapes with no VMEM block plan, and the
    qkv dispatcher must silently take the XLA path there instead of
    raising (ops/attention.py fallback)."""
    from neural_vit_tpu.ops.flash_attention import _plan, supported

    assert supported(513, 384) and supported(1953, 384)
    # 4096 is now in-plan via the escalated per-kernel VMEM budget
    # (26/48 MiB ladder); the whole-KV design tops out around N~8k at
    # D=384 even under the largest budget.
    assert supported(4096, 384)   # pair plan, escalated budget
    assert not supported(24576, 384)  # beyond the top-tier stack ceiling
    with pytest.raises(ValueError, match="no block plan"):
        _plan(24576, 384)

    # Lane legality: non-128-aligned D ('tiny' 192, 'small' at tp=2) now
    # runs the packed-full mode (one full-lane (1, N, 3D) block, whole
    # rows, fused backward) as long as whole rows fit VMEM; beyond that
    # it must fall back to XLA, not raise in pallas_call.
    assert supported(513, 192)    # 'tiny' default dims
    assert supported(1953, 192)   # 'tiny' production dims
    assert supported(1952, 192)   # TP shard of 'small' at production dims
    assert not supported(16384, 192)  # whole rows exceed every VMEM tier
    assert supported(512, 512)    # 'base' is lane-legal

    # Dispatch on CPU exercises the XLA branch for any shape; the
    # supported() check guards the TPU branch (same code path).
    from neural_vit_tpu.ops.attention import multi_head_attention_qkv

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 20, 3 * 64)),
                    jnp.float32)
    out, _ = multi_head_attention_qkv(x, n_heads=1, scale=0.125)
    assert out.shape == (1, 20, 64)


@pytest.mark.parametrize("force", [1, 2])
def test_staged_issue_order_is_bit_identical(rng, monkeypatch, force):
    """Head-staging (software-pipelining head h+1's QK^T / do.v^T past head
    h's VPU work) only reorders MXU issue — forward output and all three
    packed gradients must be BIT-identical at every staging level
    (0 = off, 1 = qk-only hoist, 2 = fused dual-hoist) vs off."""
    import neural_vit_tpu.ops.flash_attention as fa

    b, n, h, dh = 2, 129, 3, 64
    q, k, v = _qkv(rng, b=b, n=n, h=h, dh=dh)
    qkv = jnp.concatenate(
        [q.reshape(b, n, -1), k.reshape(b, n, -1), v.reshape(b, n, -1)], -1
    )

    def run():
        def loss(x):
            o = fa.flash_attention_qkv(
                x, n_heads=h, scale=dh ** -0.5, dropout_rate=0.2,
                dropout_rng=jax.random.key(7), interpret=True,
            )
            return jnp.sum(o * jnp.cos(o)), o

        (_, out), grad = jax.value_and_grad(loss, has_aux=True)(qkv)
        return np.asarray(out), np.asarray(grad)

    monkeypatch.setattr(fa, "_staged_ok", lambda *a, **k: force)
    got_out, got_grad = run()
    monkeypatch.setattr(fa, "_staged_ok", lambda *a, **k: 0)
    ref_out, ref_grad = run()
    np.testing.assert_array_equal(got_out, ref_out)
    np.testing.assert_array_equal(got_grad, ref_grad)


def test_packed_full_mode_matches_xla_at_unaligned_d(rng):
    """Non-128-aligned D (192 = 'tiny' / 'small'-at-tp=2 per-shard): the
    packed-full mode — one full-lane (1, N, 3D) qkv block, whole rows,
    fused backward — must match the XLA path in forward and all three
    gradients, at both an odd and a production-like N."""
    import neural_vit_tpu.ops.flash_attention as fa

    for n in (129, 488):
        b, h, dh = 2, 3, 64
        q, k, v = _qkv(rng, b=b, n=n, h=h, dh=dh)
        qkv = jnp.concatenate(
            [q.reshape(b, n, -1), k.reshape(b, n, -1),
             v.reshape(b, n, -1)], -1
        )
        scale = dh ** -0.5

        def loss(x):
            o = fa.flash_attention_qkv(x, n_heads=h, scale=scale,
                                       interpret=True)
            return jnp.sum(o * jnp.cos(o))

        def loss_ref(q, k, v):
            o, _ = xla_attention(q, k, v, scale)
            return jnp.sum(o * jnp.cos(o))

        out = fa.flash_attention_qkv(qkv, n_heads=h, scale=scale,
                                     interpret=True)
        ref, _ = xla_attention(q, k, v, scale)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref).reshape(b, n, -1),
            rtol=2e-5, atol=2e-5, err_msg=f"packed fwd N={n}",
        )
        g = jax.grad(loss)(qkv)
        gq, gk, gv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        gref = jnp.concatenate(
            [gq.reshape(b, n, -1), gk.reshape(b, n, -1),
             gv.reshape(b, n, -1)], -1
        )
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gref), rtol=5e-4, atol=5e-5,
            err_msg=f"packed grads N={n}",
        )


def test_packed_full_mode_dropout_grad_uses_same_mask(rng):
    """Packed-full mode with in-kernel dropout: the backward must
    regenerate the identical keep mask (finite-difference check through
    the custom VJP at D=192)."""
    import neural_vit_tpu.ops.flash_attention as fa

    b, n, h, dh = 1, 96, 3, 64
    q, k, v = _qkv(rng, b=b, n=n, h=h, dh=dh)
    qkv = jnp.concatenate(
        [q.reshape(b, n, -1), k.reshape(b, n, -1), v.reshape(b, n, -1)], -1
    )
    key = jax.random.key(5)

    def f(x):
        o = fa.flash_attention_qkv(
            x, n_heads=h, scale=dh ** -0.5, dropout_rate=0.3,
            dropout_rng=key, interpret=True,
        )
        return jnp.sum(o * o)

    g = jax.grad(f)(qkv)
    d = jnp.asarray(np.random.default_rng(0).standard_normal(qkv.shape),
                    qkv.dtype)
    eps = 1e-3
    fd = (f(qkv + eps * d) - f(qkv - eps * d)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.sum(g * d)), float(fd), rtol=2e-2)
