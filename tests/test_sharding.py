"""Mesh/sharding: DP+TP on the virtual 8-device CPU mesh — numerical parity
with single-device execution, TP partition-spec rules, and the driver's
multi-chip dry-run contract."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from neural_vit_tpu.core.config import Temporal3DViTConfig
from neural_vit_tpu.models.vit import Temporal3DViT
from neural_vit_tpu.parallel.mesh import (
    MeshSpec,
    batch_sharding,
    make_mesh,
    param_shardings,
)
from neural_vit_tpu.training.loop import TrainState, make_step_fns

TINY = Temporal3DViTConfig(
    n_trials=4, freq_size=16, time_size=32,
    patch_trial=2, patch_freq=8, patch_time=8,
    embed_dim=64, n_heads=2, n_layers=2,
    dropout=0.0, attention_dropout=0.0, drop_path=0.0,
    compute_dtype="float32", use_flash_attention=False,
)


def _setup(batch=16):
    model = Temporal3DViT(TINY)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, TINY.n_trials, TINY.freq_size, TINY.time_size)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, batch))
    mask = jnp.ones(batch, jnp.float32)
    variables = model.init(jax.random.key(0), x)
    tx = optax.adamw(1e-3, weight_decay=0.01)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )
    step, _ = make_step_fns(model, np.array([1.0, 1.0], np.float32), 0.05)
    return model, state, step, x, y, mask


def test_mesh_resolution():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    mesh = make_mesh(MeshSpec())
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(MeshSpec(data=4, model=2))
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        MeshSpec(model=3).resolve(8)


def test_tp_rules_match_paths():
    model, state, *_ = _setup()
    mesh = make_mesh(MeshSpec(data=4, model=2))
    sh = param_shardings(state.params, mesh)
    b0 = sh["block_0"]
    # qkv is a (D, 3, D) DenseGeneral kernel: the LAST dim is head-major D,
    # so the 'model' split gives each shard whole head groups of q, k AND v.
    assert b0["attn"]["qkv"]["kernel"].spec == P(None, None, "model")
    assert b0["attn"]["qkv"]["bias"].spec == P(None, "model")
    assert b0["attn"]["proj"]["kernel"].spec == P("model", None)
    assert b0["attn"]["proj"]["bias"].spec == P()
    assert b0["mlp"]["fc1"]["kernel"].spec == P(None, "model")
    assert b0["mlp"]["fc2"]["kernel"].spec == P("model", None)
    assert sh["patch_embed"]["kernel"].spec == P()
    # model=1 mesh ⇒ everything replicated.
    sh1 = param_shardings(state.params, make_mesh(MeshSpec()))
    assert sh1["block_0"]["attn"]["qkv"]["kernel"].spec == P()


@pytest.mark.parametrize("spec", [MeshSpec(data=8, model=1), MeshSpec(data=4, model=2)])
def test_sharded_step_matches_single_device(spec):
    """One DP(×TP) train step produces the same loss and updated params as
    unsharded execution (XLA collectives are exact for this step)."""
    _, state0, step, x, y, mask = _setup()
    key = jax.random.key(3)

    s_ref, m_ref = step(state0, x, y, mask, key)
    loss_ref = float(m_ref["loss_sum"]) / float(m_ref["n_valid"])

    _, state1, step1, *_ = _setup()
    mesh = make_mesh(spec)
    state1 = jax.device_put(state1, param_shardings(state1, mesh))
    xb = jax.device_put(x, batch_sharding(mesh))
    yb = jax.device_put(y, batch_sharding(mesh))
    mb = jax.device_put(mask, batch_sharding(mesh))
    s_sh, m_sh = step1(state1, xb, yb, mb, key)
    loss_sh = float(m_sh["loss_sum"]) / float(m_sh["n_valid"])

    np.testing.assert_allclose(loss_sh, loss_ref, rtol=1e-5)
    ref_leaves = jax.tree_util.tree_leaves(s_ref.params)
    sh_leaves = jax.tree_util.tree_leaves(s_sh.params)
    for a, b in zip(ref_leaves, sh_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_probe_pool_sharded_step_matches_single_device():
    """pool='probe' under DP×TP: the MAP-head params (probe + its attention
    projections) fall through the TP rules to replicated shardings, and the
    sharded step reproduces the unsharded loss/updates exactly."""
    cfg = TINY.replace(pool="probe")
    model = Temporal3DViT(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (16, cfg.n_trials, cfg.freq_size, cfg.time_size)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, 16))
    mask = jnp.ones(16, jnp.float32)

    def fresh():
        variables = model.init(jax.random.key(0), x)
        tx = optax.adamw(1e-3, weight_decay=0.01)
        return TrainState.create(
            apply_fn=model.apply, params=variables["params"], tx=tx
        )

    step, _ = make_step_fns(model, np.array([1.0, 1.0], np.float32), 0.05)
    key = jax.random.key(3)
    s_ref, m_ref = step(fresh(), x, y, mask, key)
    loss_ref = float(m_ref["loss_sum"]) / float(m_ref["n_valid"])

    mesh = make_mesh(MeshSpec(data=4, model=2))
    state1 = fresh()
    sh = param_shardings(state1, mesh)
    # probe readout params replicate (tiny; not worth TP traffic)
    assert sh.params["probe"].spec == P()
    assert sh.params["probe_attn"]["query"]["kernel"].spec == P()
    state1 = jax.device_put(state1, sh)
    xb, yb, mb = (jax.device_put(a, batch_sharding(mesh))
                  for a in (x, y, mask))
    s_sh, m_sh = step(state1, xb, yb, mb, key)
    loss_sh = float(m_sh["loss_sum"]) / float(m_sh["n_valid"])
    np.testing.assert_allclose(loss_sh, loss_ref, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_sh.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_batch_iterator_shards_over_mesh(tmp_path):
    """Device-resident gather lands batches sharded over the data axis."""
    from neural_vit_tpu.data.loader import BatchIterator, DataLoaderConfig, SpectrogramDataset
    from neural_vit_tpu.data.sequences import SequenceIndex

    n_rows, F, T = 32, 16, 32
    specs = np.random.default_rng(0).standard_normal((n_rows, F, T)).astype(np.float32)
    idx = SequenceIndex(
        indices=np.arange(24, dtype=np.int32).reshape(8, 3) % n_rows,
        labels=np.zeros(8, np.int32),
        sessions=np.array(["s"] * 8, dtype=object),
    )
    ds = SpectrogramDataset(specs, idx)
    mesh = make_mesh(MeshSpec())
    it = BatchIterator(
        ds, DataLoaderConfig(batch_size=8, device_resident=True),
        shuffle=False, batch_sharding=batch_sharding(mesh),
    )
    vol, labels, mask = next(iter(it))
    assert vol.shape == (8, 3, F, T)
    assert vol.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(vol)[0], specs[idx.indices[0]])


def test_dryrun_multichip_contract():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_tp_attention_matches_single_device():
    """Head-parallel shard_map attention (model=2) reproduces the plain
    single-device forward exactly (eval mode; same params)."""
    model, state, *_ = _setup()
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(
        (16, TINY.n_trials, TINY.freq_size, TINY.time_size)), jnp.float32)
    ref = jax.jit(
        lambda p, v: model.apply({"params": p}, v, train=False)
    )(state.params, x)

    mesh = make_mesh(MeshSpec(data=4, model=2))
    model_tp = Temporal3DViT(TINY, mesh=mesh)
    params_tp = jax.device_put(
        state.params, param_shardings(state.params, mesh)
    )
    x_tp = jax.device_put(x, batch_sharding(mesh))
    got = jax.jit(
        lambda p, v: model_tp.apply({"params": p}, v, train=False)
    )(params_tp, x_tp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tp_flash_shard_map_matches_xla():
    """The Pallas kernel under shard_map (interpret mode) over the model
    axis matches full XLA attention — the exact path real TPU TP takes."""
    from neural_vit_tpu.ops.attention import (
        tp_multi_head_attention_qkv3,
        xla_attention,
    )

    b, n, h, dh = 8, 64, 4, 8
    d = h * dh
    rng = np.random.default_rng(3)
    qkv3 = jnp.asarray(rng.standard_normal((b, n, 3, d)), jnp.float32)
    mesh = make_mesh(MeshSpec(data=4, model=2))
    qkv3_sh = jax.device_put(
        qkv3,
        jax.sharding.NamedSharding(mesh, P("data", None, None, "model")),
    )
    got = tp_multi_head_attention_qkv3(
        qkv3_sh, mesh=mesh, n_heads=h, scale=dh ** -0.5, interpret=True
    )
    q, k, v = (qkv3.reshape(b, n, 3, h, dh)[:, :, i] for i in range(3))
    ref, _ = xla_attention(q, k, v, scale=dh ** -0.5)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref).reshape(b, n, d),
        rtol=2e-5, atol=2e-5,
    )


def test_tp_attention_dropout_is_deterministic_per_key():
    """In-kernel attention dropout under shard_map: same key → identical
    output; different key → different output (per-shard fold_in works)."""
    from neural_vit_tpu.ops.attention import tp_multi_head_attention_qkv3

    b, n, h, dh = 8, 64, 4, 8
    d = h * dh
    rng = np.random.default_rng(5)
    qkv3 = jnp.asarray(rng.standard_normal((b, n, 3, d)), jnp.float32)
    mesh = make_mesh(MeshSpec(data=4, model=2))
    run = lambda key: np.asarray(tp_multi_head_attention_qkv3(
        qkv3, mesh=mesh, n_heads=h, scale=dh ** -0.5,
        dropout_rate=0.3, deterministic=False,
        dropout_rng=jax.random.key(key), interpret=True,
    ))
    a, a2, c = run(0), run(0), run(1)
    np.testing.assert_array_equal(a, a2)
    assert np.abs(a - c).max() > 1e-3
    assert np.isfinite(a).all()
