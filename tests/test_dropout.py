"""Unit tests for the bandwidth-lean 8-bit dropout (`ops/dropout.py`).

The op replaces `nn.Dropout` inside the model (reference
`models/model.py:122-148` uses torch Dropout); semantics to verify:
inverted-dropout expectation E[dropout(x)] == x, determinism for a fixed
key, an IDENTICAL mask between forward and backward (custom VJP
regenerates rather than stores), and the bernoulli fallback for
non-4-aligned shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from neural_vit_tpu.ops.dropout import _byte_threshold, dropout


def test_deterministic_passthrough():
    x = jnp.arange(12.0).reshape(3, 4)
    out = dropout(x, 0.5, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out = dropout(x, 0.0, rng=jax.random.key(0), deterministic=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_realized_rate_and_expectation():
    rate = 0.2
    t = _byte_threshold(rate)  # 51 → realized rate 51/256
    x = jnp.ones((256, 512), jnp.float32)
    out = np.asarray(dropout(x, rate, rng=jax.random.key(3),
                             deterministic=False))
    realized_drop = float((out == 0).mean())
    assert abs(realized_drop - t / 256.0) < 0.01
    # Inverted scaling uses the realized keep prob ⇒ mean stays ~1.
    assert abs(out.mean() - 1.0) < 0.01
    # Kept elements carry exactly the 256/(256-t) rescale.
    kept = out[out != 0]
    np.testing.assert_allclose(kept, 256.0 / (256.0 - t), rtol=1e-6)


def test_same_key_same_mask():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 64)),
                    jnp.float32)
    a = dropout(x, 0.3, rng=jax.random.key(5), deterministic=False)
    b = dropout(x, 0.3, rng=jax.random.key(5), deterministic=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = dropout(x, 0.3, rng=jax.random.key(6), deterministic=False)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_backward_mask_matches_forward():
    """grad of sum(w * dropout(x)) w.r.t. x must equal the forward's
    realized w*mask*scale — i.e. the VJP regenerates the SAME mask."""
    key = jax.random.key(11)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((16, 128)),
                    jnp.float32)
    w = jnp.asarray(np.random.default_rng(2).standard_normal((16, 128)),
                    jnp.float32)

    out = dropout(x, 0.25, rng=key, deterministic=False)
    fwd_mask_scale = np.asarray(out) / np.where(np.asarray(x) == 0, 1,
                                                np.asarray(x))

    g = jax.grad(
        lambda x_: jnp.sum(w * dropout(x_, 0.25, rng=key,
                                       deterministic=False))
    )(x)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(w) * fwd_mask_scale, rtol=1e-5, atol=1e-6
    )


def test_fallback_non_aligned_shape():
    # trailing dim 5 is not 4-aligned → bernoulli fallback path.
    x = jnp.ones((32, 5), jnp.float32)
    out = np.asarray(dropout(x, 0.5, rng=jax.random.key(2),
                             deterministic=False))
    assert set(np.unique(out)).issubset({0.0, 2.0})
    assert 0.2 < (out == 0).mean() < 0.8
