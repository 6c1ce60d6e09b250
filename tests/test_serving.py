"""Serving export: self-contained StableHLO artifact round-trip.

The reference has no deployment path (its eval-job checkpoint loader is an
unchecked TODO, project_plan.md:115-117); here the eval forward exports via
jax.export with a symbolic batch dim and reloads without model code.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_vit_tpu.core.config import Temporal3DViTConfig
from neural_vit_tpu.models.vit import Temporal3DViT
from neural_vit_tpu.serving import (
    export_checkpoint,
    load_exported,
    save_exported,
)
from neural_vit_tpu.training.checkpoint import save_checkpoint

CFG = Temporal3DViTConfig(
    n_trials=4, freq_size=16, time_size=32,
    patch_trial=2, patch_freq=8, patch_time=8,
    embed_dim=64, n_heads=2, n_layers=2,
    compute_dtype="float32", use_flash_attention=False,
)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serving")
    model = Temporal3DViT(CFG)
    x = jnp.zeros((2, CFG.n_trials, CFG.freq_size, CFG.time_size))
    params = model.init(jax.random.key(0), x)["params"]
    path = str(tmp / "model.nvx")
    save_exported(path, params, CFG, platforms=("cpu",))
    return path, params, model


def test_roundtrip_matches_eval_forward(artifact):
    path, params, model = artifact
    served = load_exported(path)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(
        (3, CFG.n_trials, CFG.freq_size, CFG.time_size)).astype(np.float32)
    got = np.asarray(served.predict(x))
    want = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                  train=False))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_symbolic_batch_and_proba(artifact):
    path, _, _ = artifact
    served = load_exported(path)
    rng = np.random.default_rng(1)
    for batch in (1, 5):
        x = rng.standard_normal(
            (batch, CFG.n_trials, CFG.freq_size, CFG.time_size)
        ).astype(np.float32)
        probs = served.predict_proba(x)
        assert probs.shape == (batch, CFG.n_classes)
        np.testing.assert_allclose(probs.sum(-1), np.ones(batch), atol=1e-5)
    single = served.predict(x[0])  # 3-D convenience path
    assert single.shape == (1, CFG.n_classes)


def test_sidecar_describes_artifact(artifact):
    path, _, _ = artifact
    with open(path + ".json") as f:
        sidecar = json.load(f)
    assert sidecar["format"] == "neural-vit-tpu-exported-v1"
    assert sidecar["input_shape"] == ["b", CFG.n_trials, CFG.freq_size,
                                     CFG.time_size]
    assert sidecar["class_names"] == ["WT", "FMR1"]
    assert sidecar["model_config"]["embed_dim"] == 64


def test_export_forces_xla_attention(tmp_path, monkeypatch, artifact):
    """A flash-enabled config must export portably: the artifact can't carry
    the Pallas kernel's Mosaic custom call (no CPU lowering) and the pallas
    grid can't take the symbolic batch dim, so export rebuilds the model
    with use_flash_attention=False (math is identical on both paths)."""
    import neural_vit_tpu.models.vit as vit_mod

    seen = []
    real_model = vit_mod.Temporal3DViT

    def spy(config):
        seen.append(config)
        return real_model(config)

    monkeypatch.setattr(vit_mod, "Temporal3DViT", spy)

    _, params, model = artifact
    flash_cfg = CFG.replace(use_flash_attention=True)
    path = str(tmp_path / "flash.nvx")
    save_exported(path, params, flash_cfg, platforms=("cpu",))
    assert seen and all(not c.use_flash_attention for c in seen)

    served = load_exported(path)
    x = np.zeros((2, CFG.n_trials, CFG.freq_size, CFG.time_size), np.float32)
    want = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                  train=False))
    np.testing.assert_allclose(np.asarray(served.predict(x)), want,
                               atol=1e-5)


def test_export_from_checkpoint(tmp_path, artifact):
    _, params, model = artifact
    save_checkpoint(str(tmp_path), "best", params, CFG)
    out = str(tmp_path / "served.nvx")
    export_checkpoint(str(tmp_path), "best", out, platforms=("cpu",))
    served = load_exported(out)
    x = np.zeros((2, CFG.n_trials, CFG.freq_size, CFG.time_size), np.float32)
    want = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                  train=False))
    np.testing.assert_allclose(np.asarray(served.predict(x)), want,
                               atol=1e-5)


# ---- int8 post-training quantization (serving/quantize.py) ----------------


def test_int8_gemm_accuracy():
    """Per-channel weight + dynamic per-row activation int8 keeps a single
    GEMM within ~1% relative of f32."""
    from neural_vit_tpu.serving.quantize import _int8_gemm, _quantize_weight

    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.05
    x = rng.standard_normal((64, 256)).astype(np.float32)
    b = rng.standard_normal((128,)).astype(np.float32) * 0.01
    w_q, scale = _quantize_weight(w)
    got = np.asarray(_int8_gemm(
        jnp.asarray(x),
        {"w_q": jnp.asarray(w_q), "scale": jnp.asarray(scale),
         "bias": jnp.asarray(b)},
        jnp.float32,
    ))
    want = x @ w + b
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.015, rel


def test_quantized_table_covers_gemms(artifact):
    from neural_vit_tpu.serving.quantize import quantize_dense_tree

    _, params, _ = artifact
    table = quantize_dense_tree(params)
    keys = set(table)
    assert "patch_embed" in keys and "head_fc1" in keys
    for i in range(CFG.n_layers):
        for name in (f"block_{i}/attn/qkv", f"block_{i}/attn/proj",
                     f"block_{i}/mlp/fc1", f"block_{i}/mlp/fc2"):
            assert name in keys, name
    # QKVProjection's (D, 3, D) kernel flattened to the Dense form.
    assert table["block_0/attn/qkv"]["w_q"].shape == (
        CFG.embed_dim, 3 * CFG.embed_dim)
    # head_fc2 (2-class logits) and LayerNorms stay unquantized.
    assert "head_fc2" not in keys


def test_quantized_forward_tracks_f32():
    """End-to-end int8 logits stay within a few % of f32 and agree on
    predictions (layer_scale bumped to 1.0 so the residual stream carries
    full-strength activations through every quantized GEMM)."""
    from neural_vit_tpu.serving.quantize import make_quantized_forward

    cfg = CFG.replace(layer_scale_init=1.0)
    model = Temporal3DViT(cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(
        (16, cfg.n_trials, cfg.freq_size, cfg.time_size)), jnp.float32)
    params = model.init(jax.random.key(1), x[:1])["params"]
    want = np.asarray(model.apply({"params": params}, x, train=False))
    fwd, table = make_quantized_forward(model, params)
    got = np.asarray(jax.jit(fwd)(x))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.05, rel
    assert (got.argmax(-1) == want.argmax(-1)).mean() >= 0.9


def test_quantized_export_roundtrip(tmp_path, artifact):
    """quantize='int8' exports bake int8 constants: the artifact shrinks
    ~4× on the GEMM weights and reloads to the quantized-forward logits."""
    from neural_vit_tpu.serving.quantize import make_quantized_forward

    path_f32, params, model = artifact
    out = str(tmp_path / "model_int8.nvx")
    save_exported(out, params, CFG, platforms=("cpu",), quantize="int8")

    with open(out + ".json") as f:
        sidecar = json.load(f)
    assert sidecar["quantize"] == "int8"
    f32_bytes = json.load(open(path_f32 + ".json"))["bytes"]
    assert sidecar["bytes"] < 0.55 * f32_bytes, (sidecar["bytes"], f32_bytes)

    served = load_exported(out)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(
        (4, CFG.n_trials, CFG.freq_size, CFG.time_size)).astype(np.float32)
    fwd, _ = make_quantized_forward(model, params)
    want = np.asarray(fwd(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(served.predict(x)), want,
                               atol=1e-5)
