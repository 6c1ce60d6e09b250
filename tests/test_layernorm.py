"""Fused Pallas LayerNorm (`ops/layernorm.py`) vs reference math.

The fused path replaces `nn.LayerNorm` in the model's hot path (reference
`models/model.py:151-178` pre-LN); these tests run the kernel through the
Pallas interpreter on CPU and check values AND gradients against the plain
f32 expression / flax.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_vit_tpu.ops.layernorm import _pick_rows, layer_norm


def _ref(x, g, b, eps=1e-5):
    ln = nn.LayerNorm(epsilon=eps, dtype=jnp.float32)
    return ln.apply({"params": {"scale": g, "bias": b}}, x)


@pytest.mark.parametrize("shape", [(16, 384), (8, 9, 128)])
def test_fused_matches_flax_forward(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    g = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    got = layer_norm(x, g, b, eps=1e-5, fused=True, interpret=True)
    ref = _ref(x, g, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_gradients_match_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((24, 384)), jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(384), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(384), jnp.float32)
    w = jnp.asarray(rng.standard_normal((24, 384)), jnp.float32)

    def fused_loss(x, g, b):
        return jnp.sum(w * layer_norm(x, g, b, eps=1e-5, fused=True,
                                      interpret=True))

    def ref_loss(x, g, b):
        return jnp.sum(w * layer_norm(x, g, b, eps=1e-5, fused=False))

    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(x, g, b)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(x, g, b)
    for a, e in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-5)


def test_bf16_io_f32_stats():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((32, 256)), jnp.bfloat16)
    g = jnp.ones(256, jnp.float32)
    b = jnp.zeros(256, jnp.float32)
    got = layer_norm(x, g, b, eps=1e-5, fused=True, interpret=True)
    assert got.dtype == jnp.bfloat16
    ref = _ref(x.astype(jnp.float32), g, b).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_pick_rows_divides():
    for m in (131328, 1024, 128, 513 * 8, 40):
        r = _pick_rows(m)
        assert r > 0 and m % r == 0 and r % 8 == 0
    # prime-ish row counts fall back
    assert _pick_rows(131) == 0


def test_fallback_for_odd_channels():
    # C not a multiple of 128 silently takes the jnp path.
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 100)), jnp.float32)
    g, b = jnp.ones(100), jnp.zeros(100)
    got = layer_norm(x, g, b, eps=1e-5, fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, g, b)),
                               rtol=1e-5, atol=1e-5)
