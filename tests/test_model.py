"""Temporal3DViT model tests: shapes, config validation, stochastic
regularization semantics, and direct numerical parity against the reference
PyTorch implementation (imported read-only from /root/reference when present
— no reference code is vendored here)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_vit_tpu.core.config import CONFIGS, Temporal3DViTConfig, build_vit_config
from neural_vit_tpu.models.vit import Temporal3DViT, attention_maps

TINY = Temporal3DViTConfig(
    n_trials=4, freq_size=16, time_size=32,
    patch_trial=2, patch_freq=8, patch_time=8,
    embed_dim=64, n_heads=2, n_layers=2,
    compute_dtype="float32", use_flash_attention=False,
)


def _init(cfg, batch=2, seed=0):
    model = Temporal3DViT(cfg)
    x = jax.random.normal(
        jax.random.key(seed), (batch, cfg.n_trials, cfg.freq_size, cfg.time_size)
    )
    variables = model.init(jax.random.key(1), x)
    return model, variables, x


def test_forward_shapes_and_channel_dim():
    model, variables, x = _init(TINY)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 2)
    # (B, 1, K, F, T) input accepted as in the reference (model.py:294).
    logits5 = model.apply(variables, x[:, None])
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits5))


def test_gelu_variants_close_and_usable():
    """The gelu config knob: 'tanh' and 'quick' are approximations of the
    exact-erf reference formulation — bounded pointwise deviation on the
    activation range, and the model must run under each."""
    from neural_vit_tpu.models.vit import _gelu

    x = jnp.linspace(-6.0, 6.0, 4001)
    ref = _gelu(x, "erf")
    # Known approximation bounds: tanh ≤ ~1e-3 abs, quick ≤ ~2e-2 abs.
    assert float(jnp.max(jnp.abs(_gelu(x, "tanh") - ref))) < 2e-3
    assert float(jnp.max(jnp.abs(_gelu(x, "quick") - ref))) < 2.5e-2
    for kind in ("tanh", "quick"):
        model, variables, xx = _init(TINY.replace(gelu=kind))
        logits = model.apply(variables, xx)
        assert np.all(np.isfinite(np.asarray(logits)))


def test_config_validation():
    with pytest.raises(ValueError):
        Temporal3DViTConfig(n_trials=7, patch_trial=2).validate()
    with pytest.raises(ValueError):
        Temporal3DViTConfig(freq_size=65).validate()
    cfg = build_vit_config("tiny", n_layers=3)
    assert cfg.n_layers == 3 and cfg.embed_dim == 192


def test_registry_matches_reference():
    assert CONFIGS["tiny"].embed_dim == 192 and CONFIGS["tiny"].n_layers == 4
    assert CONFIGS["small"].embed_dim == 384 and CONFIGS["small"].n_layers == 8
    assert CONFIGS["base"].embed_dim == 512 and CONFIGS["base"].n_layers == 12
    # N = 1 + 4·8·16 = 513 tokens at default dims (SURVEY §2.2).
    assert CONFIGS["small"].seq_len == 513


def test_train_mode_is_stochastic_eval_deterministic():
    model, variables, x = _init(TINY)
    e1 = model.apply(variables, x)
    e2 = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))
    t1 = model.apply(variables, x, train=True, rngs={"dropout": jax.random.key(7)})
    t2 = model.apply(variables, x, train=True, rngs={"dropout": jax.random.key(8)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    # Same rng ⇒ reproducible.
    t3 = model.apply(variables, x, train=True, rngs={"dropout": jax.random.key(7)})
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t3))


def test_gradients_flow_everywhere():
    model, variables, x = _init(TINY)

    def loss_fn(params):
        logits = model.apply({"params": params}, x)
        return jnp.sum(logits ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    zero = [jax.tree_util.keystr(p) for p, g in flat if not np.any(np.asarray(g))]
    assert zero == [], f"zero grads at: {zero}"


def test_attention_maps_shape():
    model, variables, x = _init(TINY)
    maps = attention_maps(model, variables, x)
    n = TINY.seq_len
    assert len(maps) == TINY.n_layers
    for m in maps:
        assert m.shape == (2, TINY.n_heads, n, n)
        np.testing.assert_allclose(
            np.asarray(m.sum(-1)), np.ones((2, TINY.n_heads, n)), rtol=1e-5
        )


def test_bf16_default_config_runs_on_cpu():
    """The TPU-default bfloat16 compute path must be exercisable everywhere:
    logits stay float32 and finite, close to the f32 path."""
    cfg = TINY.replace(compute_dtype="bfloat16")
    model, variables, x = _init(TINY)
    model_bf16 = Temporal3DViT(cfg)
    a = np.asarray(model.apply(variables, x))
    b = np.asarray(model_bf16.apply(variables, x))
    assert b.dtype == np.float32
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, atol=0.15)  # bf16 mantissa error


@pytest.mark.parametrize("mode", [True, "mlp"])
def test_remat_matches_no_remat(mode):
    """cfg.remat (whole-block or MLP-only) trades FLOPs for memory
    without changing values/grads."""
    model, variables, x = _init(TINY)
    model_r = Temporal3DViT(TINY.replace(remat=mode))
    a = model.apply(variables, x)
    b = model_r.apply(variables, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def loss(m):
        return lambda p: jnp.sum(m.apply({"params": p}, x) ** 2)

    ga = jax.grad(loss(model))(variables["params"])
    gb = jax.grad(loss(model_r))(variables["params"])
    for la, lb in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-5, atol=1e-7)


def test_mean_pool_variant():
    """pool='mean' (SimpleViT-style CLS-free readout, the TPU perf
    configuration): no cls_token param, seq_len is the bare patch grid
    (lane-aligned on TPU), logits well-formed, gradients flow everywhere,
    and attention maps have the CLS-free token count."""
    cfg = TINY.replace(pool="mean")
    assert cfg.seq_len == cfg.n_patches  # no +1 for CLS
    model, variables, x = _init(cfg)
    assert "cls_token" not in variables["params"]
    logits = model.apply(variables, x)
    assert logits.shape == (2, 2) and np.isfinite(np.asarray(logits)).all()

    def loss_fn(params):
        return jnp.sum(model.apply({"params": params}, x) ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    zero = [jax.tree_util.keystr(p) for p, g in flat if not np.any(np.asarray(g))]
    assert zero == [], f"zero grads at: {zero}"

    maps = attention_maps(model, variables, x)
    n = cfg.n_patches
    assert len(maps) == cfg.n_layers and maps[0].shape == (2, cfg.n_heads, n, n)

    # Mean-pool readout actually differs from CLS (distinct architecture).
    with pytest.raises(ValueError):
        cfg.replace(pool="max").validate()


def test_probe_pool_variant():
    """pool='probe' (MAP head, Zhai et al.): blocks run on the bare
    lane-aligned patch grid like pool='mean', but the readout is a learned
    single-query multi-head attention pool — checking the probe params
    exist, logits are finite, and gradients flow through every param
    including the probe and its attention projections."""
    cfg = TINY.replace(pool="probe")
    assert cfg.seq_len == cfg.n_patches  # no CLS token in the sequence
    model, variables, x = _init(cfg)
    params = variables["params"]
    assert "cls_token" not in params
    assert "probe" in params and "probe_attn" in params
    logits = model.apply(variables, x)
    assert logits.shape == (2, 2) and np.isfinite(np.asarray(logits)).all()

    def loss_fn(params):
        return jnp.sum(model.apply({"params": params}, x) ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    zero = [jax.tree_util.keystr(p) for p, g in flat if not np.any(np.asarray(g))]
    assert zero == [], f"zero grads at: {zero}"


def test_param_count_small_config():
    """~14 M params for 'small' at default dims (SURVEY §6)."""
    cfg = CONFIGS["small"].replace(compute_dtype="float32")
    model = Temporal3DViT(cfg)
    x = jnp.zeros((1, 8, 64, 128))
    variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 13_000_000 < n_params < 16_000_000


# ---------------------------------------------------------------------------
# Parity vs the reference PyTorch model (strongest parity gate).
# ---------------------------------------------------------------------------

_REF = "/root/reference"


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(_REF, "temporal_vit")),
    reason="reference checkout not available",
)
def test_logits_match_reference_torch():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, _REF)
    try:
        from temporal_vit.models.model import (
            Temporal3DViT as TorchViT,
            Temporal3DViTConfig as TorchCfg,
        )
    finally:
        sys.path.remove(_REF)

    kwargs = dict(
        n_trials=4, freq_size=16, time_size=32,
        patch_trial=2, patch_freq=8, patch_time=8,
        embed_dim=64, n_heads=2, n_layers=2,
        dropout=0.0, attention_dropout=0.0, drop_path=0.0,
    )
    tcfg = TorchCfg(**kwargs)
    tmodel = TorchViT(tcfg).eval()

    jcfg = Temporal3DViTConfig(
        **kwargs, compute_dtype="float32", use_flash_attention=False
    )
    model, variables, _ = _init(jcfg)

    # Port torch weights → flax param tree via the shared transplant
    # utility (the paired parity experiment depends on this exact path).
    from neural_vit_tpu.utils.transplant import (
        assert_same_tree,
        torch_state_dict_to_flax,
    )

    p = torch_state_dict_to_flax(tmodel.state_dict())
    assert_same_tree(variables["params"], p)

    rng = np.random.default_rng(3)
    x = rng.standard_normal(
        (3, jcfg.n_trials, jcfg.freq_size, jcfg.time_size)
    ).astype(np.float32)
    ours = np.asarray(model.apply({"params": p}, jnp.asarray(x)))
    theirs = tmodel(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_init_distributions_match_torch_defaults():
    """Round-4 parity fix regression guard: every initializer must match the
    reference's EFFECTIVE init (reference `models/model.py:257-274`):
      * Linear/pos/CLS: trunc_normal_(std=0.02) truncates at ±2 ABSOLUTE
        (±100σ — effectively untruncated), so realized std must be ≈0.02,
        NOT the 0.88×0.02 a ±2σ-truncated sampler yields;
      * the Conv3d patch embed keeps torch DEFAULTS (never re-initialized):
        kaiming_uniform weight U(±√(1/patch_dim)) and uniform bias
        U(±1/√patch_dim) — nonzero."""
    cfg = CONFIGS["tiny"]
    model = Temporal3DViT(cfg)
    x = jnp.zeros((1, cfg.n_trials, cfg.freq_size, cfg.time_size), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]

    qkv = np.asarray(params["block_0"]["attn"]["qkv"]["kernel"]).ravel()
    # Untruncated normal(0.02): realized std within 3% of 0.02 and samples
    # beyond 2σ present (a ±2σ-truncated sampler has none).
    assert abs(qkv.std() - 0.02) < 0.02 * 0.03
    assert (np.abs(qkv) > 2.0 * 0.02).any()

    pe_w = np.asarray(params["patch_embed"]["kernel"])
    pe_b = np.asarray(params["patch_embed"]["bias"])
    fan_in = cfg.patch_dim
    bound = (1.0 / fan_in) ** 0.5
    # Uniform(-bound, bound): std ≈ bound/√3, support inside ±bound, and
    # mass near the edges (a normal at this std would exceed the bound).
    assert abs(pe_w.std() - bound / np.sqrt(3)) < 0.05 * bound
    assert np.abs(pe_w).max() <= bound and np.abs(pe_w).max() > 0.95 * bound
    assert np.abs(pe_b).max() <= bound and np.abs(pe_b).max() > 0.8 * bound
    assert np.abs(pe_b).mean() > 0.0  # nonzero bias, unlike Linear layers

    lin_b = np.asarray(params["block_0"]["attn"]["qkv"]["bias"])
    assert np.all(lin_b == 0.0)  # Linear biases ARE zeroed by the reference


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(_REF, "temporal_vit")),
    reason="reference checkout not available",
)
def test_transplant_no_layerscale_branch():
    """layer_scale_init=0: the reference swaps LayerScale for nn.Identity
    (dropping ls*.gamma from the state_dict) and our model creates no ls
    params — the transplant must map that tree too, logit-exactly."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, _REF)
    try:
        from temporal_vit.models.model import (
            Temporal3DViT as TorchViT,
            Temporal3DViTConfig as TorchCfg,
        )
    finally:
        sys.path.remove(_REF)

    from neural_vit_tpu.utils.transplant import (
        assert_same_tree,
        torch_state_dict_to_flax,
    )

    kwargs = dict(
        n_trials=4, freq_size=16, time_size=32,
        patch_trial=2, patch_freq=8, patch_time=8,
        embed_dim=64, n_heads=2, n_layers=2,
        dropout=0.0, attention_dropout=0.0, drop_path=0.0,
        layer_scale_init=0.0,
    )
    tmodel = TorchViT(TorchCfg(**kwargs)).eval()
    assert not any("ls1" in k for k in tmodel.state_dict())

    jcfg = Temporal3DViTConfig(
        **kwargs, compute_dtype="float32", use_flash_attention=False
    )
    model, variables, _ = _init(jcfg)
    p = torch_state_dict_to_flax(tmodel.state_dict())
    assert_same_tree(variables["params"], p)

    x = np.random.default_rng(5).standard_normal(
        (2, jcfg.n_trials, jcfg.freq_size, jcfg.time_size)
    ).astype(np.float32)
    ours = np.asarray(model.apply({"params": p}, jnp.asarray(x)))
    theirs = tmodel(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
