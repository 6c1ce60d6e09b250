"""End-to-end training: the minimum slice (BASELINE config 1) — synthetic
LFP → preprocess → tiny ViT train → loss falls, checkpoints round-trip,
metrics JSONL parses — plus schedule/loss-masking unit checks."""

import glob
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_vit_tpu.data.loader import DataLoaderConfig
from neural_vit_tpu.data.pipeline import preprocess_splits
from neural_vit_tpu.data.splits import create_session_splits_df
from neural_vit_tpu.data.synthetic import synthetic_lfp_frame
from neural_vit_tpu.ops.losses import weighted_smoothed_cross_entropy
from neural_vit_tpu.ops.spectrogram import SpectrogramConfig
from neural_vit_tpu.training.checkpoint import restore_checkpoint
from neural_vit_tpu.training.config import TrainConfig
from neural_vit_tpu.training.loop import train
from neural_vit_tpu.training.schedule import (
    linear_scaled_lr,
    warmup_cosine_epoch_schedule,
)

SPEC = SpectrogramConfig(fs=1000, nperseg=126, noverlap=116)


@pytest.fixture(scope="module")
def prepared_splits(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("train_e2e")
    # "easy" profile: the e2e assertions here are "training learns at tiny
    # scale in few epochs" (auc > 0.8), not gate discrimination — that is
    # covered by the full-scale demo + test_demo_gate_ordering.
    df = synthetic_lfp_frame(
        n_sessions=10, trials_per_session=14, trace_len=5200, seed=7,
        profile="easy",
    )
    train_df, val_df, test_df = create_session_splits_df(df, 0.2, 0.2)
    paths = {}
    for name, d in (("train", train_df), ("val", val_df), ("test", test_df)):
        raw = str(tmp / f"{name}.parquet")
        d.to_parquet(raw)
        paths[name] = raw
    out = {n: str(tmp / f"{n}_pre.parquet") for n in paths}
    preprocess_splits(
        paths["train"], paths["val"], paths["test"],
        out["train"], out["val"], out["test"],
        cfg=SPEC, batch_size=64, verbose=False,
    )
    return tmp, out


def test_schedule_matches_reference_lambda():
    """Epoch staircase equals the reference LambdaLR factors
    (train_hptune.py:211-221)."""
    base_lr, warmup, total, min_lr = 3e-4, 3, 10, 1e-6
    sch = warmup_cosine_epoch_schedule(
        base_lr, warmup_epochs=warmup, total_epochs=total, min_lr=min_lr,
        steps_per_epoch=5,
    )
    import math

    def ref_lambda(epoch):
        if epoch < warmup:
            return (epoch + 1) / warmup
        progress = (epoch - warmup) / max(1, total - warmup)
        cd = 0.5 * (1 + math.cos(math.pi * progress))
        ms = min_lr / base_lr
        return ms + (1 - ms) * cd

    for epoch in range(total):
        for step_in_epoch in (0, 4):
            got = float(sch(epoch * 5 + step_in_epoch))
            np.testing.assert_allclose(got, base_lr * ref_lambda(epoch), rtol=1e-6)
    assert linear_scaled_lr(3e-4, 64) == pytest.approx(3e-4 * 4)


def test_masked_loss_ignores_padding(rng):
    logits = jnp.asarray(rng.standard_normal((6, 2)), jnp.float32)
    labels = jnp.asarray([0, 1, 0, 1, 0, 1])
    w = jnp.asarray([0.7, 1.9])
    full = weighted_smoothed_cross_entropy(logits[:4], labels[:4], w, 0.05)
    masked = weighted_smoothed_cross_entropy(
        logits, labels, w, 0.05,
        sample_mask=jnp.asarray([1, 1, 1, 1, 0, 0]),
    )
    np.testing.assert_allclose(float(full), float(masked), rtol=1e-6)


def test_async_train_checkpoint_round_trips(rng, tmp_path):
    """block=False must return before the write commits and, after
    wait_for_saves(), restore the identical full state; a second save to
    the same name must drain the first (no overlapping writers)."""
    import optax

    from neural_vit_tpu.core.config import Temporal3DViTConfig
    from neural_vit_tpu.models.vit import Temporal3DViT
    from neural_vit_tpu.training.checkpoint import (
        restore_train_checkpoint,
        save_train_checkpoint,
        wait_for_saves,
    )
    from neural_vit_tpu.training.loop import TrainState

    cfg = Temporal3DViTConfig(
        n_trials=4, freq_size=16, time_size=32,
        patch_trial=2, patch_freq=8, patch_time=8,
        embed_dim=64, n_heads=2, n_layers=2,
        compute_dtype="float32", use_flash_attention=False,
    )
    model = Temporal3DViT(cfg)
    x = jnp.zeros((2, cfg.n_trials, cfg.freq_size, cfg.time_size), jnp.float32)
    state = TrainState.create(
        apply_fn=model.apply,
        params=model.init(jax.random.key(0), x)["params"],
        tx=optax.adamw(1e-3),
    )
    for tag in (1, 2):  # second save drains the first
        save_train_checkpoint(
            str(tmp_path), "latest", state, cfg,
            loop_state={"epoch": tag, "dropout_seed": 0}, block=False,
        )
    wait_for_saves()
    tree, rcfg, loop_state = restore_train_checkpoint(
        str(tmp_path), "latest", state
    )
    assert loop_state["epoch"] == 2 and rcfg == cfg
    jax.tree_util.tree_map(
        np.testing.assert_array_equal,
        jax.device_get(state.params), tree["params"],
    )


def test_train_checkpoint_survives_crash_mid_commit(rng, tmp_path):
    """Full-state saves alternate between two slot dirs so a hard kill
    mid-commit (Orbax force=True rmtree's the target before writing) can
    never destroy the previous checkpoint. Simulate the two crash windows:
    (a) the new slot's tree vanished (killed between rmtree and commit) and
    (b) the sidecar no longer matches the tree (killed between the two
    writes) — both must fall back to the older complete checkpoint."""
    import json
    import shutil

    import optax

    from neural_vit_tpu.core.config import Temporal3DViTConfig
    from neural_vit_tpu.models.vit import Temporal3DViT
    from neural_vit_tpu.training.checkpoint import (
        is_train_checkpoint,
        restore_train_checkpoint,
        save_train_checkpoint,
    )
    from neural_vit_tpu.training.loop import TrainState

    cfg = Temporal3DViTConfig(
        n_trials=4, freq_size=16, time_size=32,
        patch_trial=2, patch_freq=8, patch_time=8,
        embed_dim=64, n_heads=2, n_layers=2,
        compute_dtype="float32", use_flash_attention=False,
    )
    model = Temporal3DViT(cfg)
    x = jnp.zeros((2, cfg.n_trials, cfg.freq_size, cfg.time_size), jnp.float32)
    state = TrainState.create(
        apply_fn=model.apply,
        params=model.init(jax.random.key(0), x)["params"],
        tx=optax.adamw(1e-3),
    )
    save_train_checkpoint(str(tmp_path), "latest", state, cfg,
                          loop_state={"epoch": 1, "dropout_seed": 0})
    state2 = state.replace(step=state.step + 7)
    save_train_checkpoint(str(tmp_path), "latest", state2, cfg,
                          loop_state={"epoch": 2, "dropout_seed": 0})
    slots = sorted(p.name for p in tmp_path.iterdir())
    assert "latest.0" in slots and "latest.1" in slots

    # (a) newest slot's Orbax tree gone: restore must yield epoch-1 state.
    newest = next(p for p in tmp_path.iterdir()
                  if p.is_dir() and json.loads(
                      (tmp_path / f"{p.name}_config.json").read_text()
                  )["_loop"]["epoch"] == 2)
    shutil.rmtree(newest)
    assert is_train_checkpoint(str(tmp_path / "latest"))
    tree, _, loop_state = restore_train_checkpoint(str(tmp_path), "latest", state)
    assert loop_state["epoch"] == 1 and int(tree["step"]) == int(state.step)

    # (b) a fresh save whose sidecar disagrees with its tree (stale sidecar
    # from a lost older save): the global_step cross-check must reject it.
    save_train_checkpoint(str(tmp_path), "latest", state2, cfg,
                          loop_state={"epoch": 3, "dropout_seed": 0})
    side = next(p for p in tmp_path.glob("latest.*_config.json")
                if json.loads(p.read_text())["_loop"]["epoch"] == 3)
    payload = json.loads(side.read_text())
    payload["_loop"]["global_step"] = int(state2.step) + 999
    side.write_text(json.dumps(payload))
    tree, _, loop_state = restore_train_checkpoint(str(tmp_path), "latest", state)
    assert loop_state["epoch"] == 1  # poisoned epoch-3 slot skipped


def test_grad_accum_matches_big_batch(rng):
    """A grad_accum=4 step must produce the SAME updated params, loss, and
    metrics as the plain big-batch step: the scan accumulates loss/weight
    SUMS and normalizes once by the total target-class weight (microbatch
    means would use different denominators under torch's weighted CE).
    Dropout rates are zero so both paths see identical randomness-free
    forwards; masked padding rows exercise the weight-sum path."""
    import optax

    from neural_vit_tpu.core.config import Temporal3DViTConfig
    from neural_vit_tpu.models.vit import Temporal3DViT
    from neural_vit_tpu.training.loop import TrainState, make_step_fns

    cfg = Temporal3DViTConfig(
        n_trials=4, freq_size=16, time_size=32,
        patch_trial=2, patch_freq=8, patch_time=8,
        embed_dim=64, n_heads=2, n_layers=2,
        dropout=0.0, attention_dropout=0.0, drop_path=0.0,
        compute_dtype="float32", use_flash_attention=False,
    )
    model = Temporal3DViT(cfg)
    x = jnp.asarray(
        rng.standard_normal((8, cfg.n_trials, cfg.freq_size, cfg.time_size)),
        jnp.float32,
    )
    y = jnp.asarray(rng.integers(0, 2, 8))
    mask = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    cw = np.array([0.7, 1.9], np.float32)
    key = jax.random.key(3)

    def run(accum):
        step, _ = make_step_fns(model, cw, 0.05, grad_accum=accum)
        state = TrainState.create(
            apply_fn=model.apply,
            # donate_argnums deletes the state's buffers — fresh copies per run
            params=jax.tree_util.tree_map(jnp.copy, params),
            tx=optax.adamw(1e-3),
        )
        state, metrics = step(state, x, y, mask, key)
        return state, jax.device_get(metrics)

    s1, m1 = run(1)
    s4, m4 = run(4)
    for k in ("loss_sum", "correct", "n_valid"):
        np.testing.assert_allclose(m1[k], m4[k], rtol=1e-5)
    np.testing.assert_allclose(m1["probs"], m4["probs"], rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        jax.device_get(s1.params), jax.device_get(s4.params),
    )


def test_ema_matches_hand_computed_shadow(rng, tmp_path):
    """With ema_decay on, the jitted step must advance ema ← d·ema +
    (1−d)·params using the POST-update params each step (hand-recomputed
    here from the param trajectory), and the full-state checkpoint must
    round-trip the shadow so an exact resume continues the same average."""
    import optax

    from neural_vit_tpu.core.config import Temporal3DViTConfig
    from neural_vit_tpu.models.vit import Temporal3DViT
    from neural_vit_tpu.training.checkpoint import (
        restore_train_checkpoint,
        save_train_checkpoint,
    )
    from neural_vit_tpu.training.loop import TrainState, make_step_fns

    cfg = Temporal3DViTConfig(
        n_trials=4, freq_size=16, time_size=32,
        patch_trial=2, patch_freq=8, patch_time=8,
        embed_dim=64, n_heads=2, n_layers=2,
        dropout=0.0, attention_dropout=0.0, drop_path=0.0,
        compute_dtype="float32", use_flash_attention=False,
    )
    model = Temporal3DViT(cfg)
    x = jnp.asarray(
        rng.standard_normal((4, cfg.n_trials, cfg.freq_size, cfg.time_size)),
        jnp.float32,
    )
    y = jnp.asarray(rng.integers(0, 2, 4))
    mask = jnp.ones(4, jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    decay = 0.5  # big (1-d) so drift is far above tolerance
    step, _ = make_step_fns(model, None, 0.0, ema_decay=decay)
    state = TrainState.create(
        apply_fn=model.apply,
        params=jax.tree_util.tree_map(jnp.copy, params),
        tx=optax.adamw(1e-3),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
    )
    expected = jax.device_get(params)
    key = jax.random.key(3)
    for _ in range(3):
        state, _m = step(state, x, y, mask, key)
        expected = jax.tree_util.tree_map(
            lambda e, p: e * decay + p * (1.0 - decay),
            expected, jax.device_get(state.params),
        )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        jax.device_get(state.ema_params), expected,
    )
    # The shadow must actually lag the raw params (it is a distinct tree).
    deltas = jax.tree_util.tree_map(
        lambda e, p: float(np.max(np.abs(e - p))),
        jax.device_get(state.ema_params), jax.device_get(state.params),
    )
    assert max(jax.tree_util.tree_leaves(deltas)) > 1e-6

    save_train_checkpoint(
        str(tmp_path), "latest", state, cfg,
        loop_state={"epoch": 1, "dropout_seed": 0},
    )
    tree, _rcfg, _ls = restore_train_checkpoint(str(tmp_path), "latest", state)
    jax.tree_util.tree_map(
        np.testing.assert_array_equal,
        jax.device_get(state.ema_params), tree["ema_params"],
    )


def test_end_to_end_training_tiny(prepared_splits):
    tmp, out = prepared_splits
    cfg = TrainConfig(
        train_paths=[out["train"]],
        val_paths=[out["val"]],
        test_paths=[out["test"]],
        output_dir=str(tmp / "runs"),
        run_name="testrun",
        epochs=3,
        lr=1e-3,
        n_trials=4,
        stride=2,
        model_size="tiny",
        embed_dim=64,
        n_heads=2,
        n_layers=2,
        patch_trial=2,
        patch_freq=8,
        patch_time=8,
        dropout=0.1,
        attention_dropout=0.0,
        drop_path=0.0,
        loader=DataLoaderConfig(batch_size=16),
        compute_dtype="float32",
        use_flash_attention=False,
        experiment_name=None,
        # TPU-only compile option: must be silently dropped on the CPU
        # backend (the CPU compiler rejects xla_tpu_* options).
        scoped_vmem_limit_kib=26624,
    )
    results = train(cfg)

    hist = results["history"]
    assert len(hist) == 3
    # Loss falls and the model learns the synthetic separation.
    assert hist[-1]["train/loss"] < hist[0]["train/loss"]
    assert results["test_auc"] > 0.8
    assert 0.0 <= results["test_acc"] <= 1.0

    # Checkpoints round-trip.
    params, model_cfg, extra = restore_checkpoint(
        f"{tmp}/runs/testrun/checkpoints", "final"
    )
    assert model_cfg.embed_dim == 64
    n_leaves = len(jax.tree_util.tree_leaves(params))
    assert n_leaves > 10
    assert "best_val_acc" in extra

    # Metrics JSONL parses with the reference schema.
    files = glob.glob(str(tmp / "runs" / "testrun" / "metrics" / "*.jsonl"))
    assert files
    records = [json.loads(l) for l in open(files[0])]
    epoch_recs = [r for r in records if r.get("step") and "train/loss" in r]
    assert len(epoch_recs) == 3
    for key in ("train/loss", "train/acc", "train/auc",
                "val/loss", "val/acc", "val/auc"):
        assert key in epoch_recs[0]
    test_recs = [r for r in records if "test/auc" in r]
    assert len(test_recs) == 1

    # int8 PTQ quality gate on a TRAINED model (random-init logit tests in
    # test_serving.py can't see accumulation error through learned
    # features): quantized test-set probabilities track f32, and the AUC
    # of the served int8 model matches the trained model's.
    from sklearn.metrics import roc_auc_score

    from neural_vit_tpu.data.loader import build_dataloaders
    from neural_vit_tpu.models.vit import Temporal3DViT
    from neural_vit_tpu.serving.quantize import make_quantized_forward

    model = Temporal3DViT(model_cfg.replace(use_flash_attention=False))
    fwd_q, _ = make_quantized_forward(model, params)
    _, _, test_it, _ = build_dataloaders(
        [out["train"]], [out["val"]], [out["test"]],
        n_trials=4, stride=2, loader_cfg=DataLoaderConfig(batch_size=16),
    )
    p_f32, p_int8, labels = [], [], []
    for vol, lab, mask in test_it:
        lf = model.apply({"params": params}, vol, train=False)
        lq = fwd_q(vol)
        keep = mask.astype(bool)
        p_f32.append(np.asarray(jax.nn.softmax(lf, -1))[keep, 1])
        p_int8.append(np.asarray(jax.nn.softmax(lq, -1))[keep, 1])
        labels.append(np.asarray(lab)[keep])
    p_f32, p_int8 = np.concatenate(p_f32), np.concatenate(p_int8)
    labels = np.concatenate(labels)
    assert np.abs(p_f32 - p_int8).max() < 0.05
    auc_f32 = roc_auc_score(labels, p_f32)
    auc_int8 = roc_auc_score(labels, p_int8)
    assert abs(auc_f32 - auc_int8) < 0.02, (auc_f32, auc_int8)


def test_resume_from_checkpoint(prepared_splits):
    tmp, out = prepared_splits
    base = dict(
        train_paths=[out["train"]], val_paths=[out["val"]],
        test_paths=[out["test"]], output_dir=str(tmp / "runs2"),
        epochs=2, lr=1e-3, n_trials=4, stride=2, model_size="tiny",
        embed_dim=64, n_heads=2, n_layers=2,
        patch_trial=2, patch_freq=8, patch_time=8,
        dropout=0.0, attention_dropout=0.0, drop_path=0.0,
        loader=DataLoaderConfig(batch_size=16),
        compute_dtype="float32", use_flash_attention=False,
    )
    r1 = train(TrainConfig(**base, run_name="seed"))
    ckpt = r1["final_checkpoint"]
    r2 = train(TrainConfig(**base, run_name="resumed", resume_from=ckpt))
    # Params-only checkpoint ⇒ warm start: first-epoch train loss is below
    # the cold-start first-epoch loss.
    assert r2["history"][0]["train/loss"] < r1["history"][0]["train/loss"]
    # Mismatched architecture is rejected.
    with pytest.raises(ValueError, match="config does not match"):
        train(TrainConfig(**{**base, "embed_dim": 128},
                          run_name="bad", resume_from=ckpt))


def test_exact_resume_reproduces_uninterrupted_run(prepared_splits):
    """Preemption resume contract: train 4 epochs straight vs train 2 +
    resume from the full-state 'latest' checkpoint — epochs 3/4 metrics must
    be IDENTICAL (optimizer moments, step counter/LR schedule, dropout
    stream, shuffle order, best/patience state all continue)."""
    tmp, out = prepared_splits
    base = dict(
        train_paths=[out["train"]], val_paths=[out["val"]],
        test_paths=[out["test"]], output_dir=str(tmp / "runs3"),
        lr=1e-3, n_trials=4, stride=2, model_size="tiny",
        embed_dim=64, n_heads=2, n_layers=2,
        patch_trial=2, patch_freq=8, patch_time=8,
        # Dropout ON: proves the per-step RNG stream continues exactly.
        dropout=0.1, attention_dropout=0.0, drop_path=0.1,
        use_cosine_schedule=True, warmup_epochs=1,
        loader=DataLoaderConfig(batch_size=16),
        compute_dtype="float32", use_flash_attention=False,
    )
    full = train(TrainConfig(**base, epochs=4, run_name="full"))
    part = train(TrainConfig(**base, epochs=2, run_name="part"))
    assert part["history"][-1]["train/loss"] == full["history"][1]["train/loss"]
    latest = f"{tmp}/runs3/part/checkpoints/latest"
    resumed = train(TrainConfig(
        **base, epochs=4, run_name="part-resumed", resume_from=latest,
    ))
    assert [h["epoch"] for h in resumed["history"]] == [3, 4]
    for h_resumed, h_full in zip(resumed["history"], full["history"][2:]):
        for key in ("train/loss", "train/acc", "train/auc",
                    "val/loss", "val/acc", "val/auc"):
            np.testing.assert_allclose(
                h_resumed[key], h_full[key], rtol=0, atol=0,
                err_msg=f"epoch {h_full['epoch']} {key} diverged on resume",
            )
    assert resumed["best_val_acc"] == full["best_val_acc"]
    assert resumed["test_auc"] == full["test_auc"]


def test_midepoch_preemption_checkpoint_and_step_exact_resume(prepared_splits):
    """Preemption MID-EPOCH (SIGTERM / request_preemption): the loop saves
    the full train state after the in-flight step — including the position
    inside the epoch — and exits without test eval; resuming skips exactly
    the consumed batches and the remainder of training is bit-identical to
    the uninterrupted run (same optimizer/step/dropout/shuffle streams)."""
    from neural_vit_tpu.utils import preemption

    tmp, out = prepared_splits
    base = dict(
        train_paths=[out["train"]], val_paths=[out["val"]],
        test_paths=[out["test"]], output_dir=str(tmp / "runs4"),
        lr=1e-3, n_trials=4, stride=2, model_size="tiny",
        embed_dim=64, n_heads=2, n_layers=2,
        patch_trial=2, patch_freq=8, patch_time=8,
        # Dropout ON: proves the per-step RNG stream continues exactly.
        dropout=0.1, attention_dropout=0.0, drop_path=0.1,
        use_cosine_schedule=True, warmup_epochs=1, epochs=3,
        loader=DataLoaderConfig(batch_size=16),
        compute_dtype="float32", use_flash_attention=False,
    )
    full = train(TrainConfig(**base, run_name="pfull"))

    # The guard is sticky: a request pending before the run starts fires
    # at the first step boundary — deterministic mid-epoch preemption
    # (epoch 1 after exactly 1 batch).
    preemption.request_preemption()
    try:
        pre = train(TrainConfig(**base, run_name="ppart"))
    finally:
        preemption.clear_preemption()
    assert pre.get("preempted") is True
    assert "test_auc" not in pre  # grace window: no test eval
    assert pre["resume_checkpoint"].endswith("/latest")

    resumed = train(TrainConfig(**base, run_name="ppart-resumed",
                                resume_from=pre["resume_checkpoint"]))
    assert [h["epoch"] for h in resumed["history"]] == [1, 2, 3]
    # Epoch-end params are identical despite the interruption ⇒ val metrics
    # match on EVERY epoch; train metrics match from epoch 2 on (the resumed
    # epoch 1's train aggregates only cover the post-resume batches).
    for h_resumed, h_full in zip(resumed["history"], full["history"]):
        keys = ("val/loss", "val/acc", "val/auc")
        if h_full["epoch"] > 1:
            keys += ("train/loss", "train/acc", "train/auc")
        for key in keys:
            np.testing.assert_allclose(
                h_resumed[key], h_full[key], rtol=0, atol=0,
                err_msg=f"epoch {h_full['epoch']} {key} diverged after "
                        f"mid-epoch preemption resume",
            )
    assert resumed["test_auc"] == full["test_auc"]
    assert resumed["test_acc"] == full["test_acc"]


def test_epoch_boundary_preemption_and_flag_clearing(prepared_splits,
                                                     monkeypatch):
    """A preemption request landing DURING the val pass (not at a train-step
    boundary) is consumed at the epoch boundary: full state saved (without
    the best-checkpoint detour), run exits preempted — and the consumed
    flag is CLEARED so the next train() in the same process runs to
    completion. Resume continues at the next epoch bit-exactly."""
    from neural_vit_tpu.training import loop as loop_mod
    from neural_vit_tpu.utils import preemption

    tmp, out = prepared_splits
    base = dict(
        train_paths=[out["train"]], val_paths=[out["val"]],
        test_paths=[out["test"]], output_dir=str(tmp / "runs5"),
        lr=1e-3, n_trials=4, stride=2, model_size="tiny",
        embed_dim=64, n_heads=2, n_layers=2,
        patch_trial=2, patch_freq=8, patch_time=8,
        dropout=0.1, attention_dropout=0.0, drop_path=0.1,
        use_cosine_schedule=True, warmup_epochs=1, epochs=3,
        loader=DataLoaderConfig(batch_size=16),
        compute_dtype="float32", use_flash_attention=False,
    )
    preemption.clear_preemption()
    full = train(TrainConfig(**base, run_name="bfull"))

    # Fire the request from inside the epoch-1 val pass.
    real_evaluate = loop_mod.evaluate
    calls = {"n": 0}

    def evaluate_then_preempt(*args, **kwargs):
        result = real_evaluate(*args, **kwargs)
        calls["n"] += 1
        if calls["n"] == 1:
            preemption.request_preemption()
        return result

    monkeypatch.setattr(loop_mod, "evaluate", evaluate_then_preempt)
    pre = train(TrainConfig(**base, run_name="bpart"))
    monkeypatch.setattr(loop_mod, "evaluate", real_evaluate)

    assert pre.get("preempted") is True
    assert pre["epochs_trained"] == 1
    assert len(pre["history"]) == 1  # epoch 1 metrics were logged
    assert "test_auc" not in pre
    assert pre["resume_checkpoint"].endswith("/latest")
    # The consumed request must not leak into the next run.
    assert not preemption.preemption_requested()

    resumed = train(TrainConfig(**base, run_name="bpart-resumed",
                                resume_from=pre["resume_checkpoint"]))
    assert [h["epoch"] for h in resumed["history"]] == [2, 3]
    for h_resumed, h_full in zip(resumed["history"], full["history"][1:]):
        for key in ("train/loss", "train/acc", "train/auc",
                    "val/loss", "val/acc", "val/auc"):
            np.testing.assert_allclose(
                h_resumed[key], h_full[key], rtol=0, atol=0,
                err_msg=f"epoch {h_full['epoch']} {key} diverged after "
                        f"epoch-boundary preemption resume",
            )
    assert resumed["test_auc"] == full["test_auc"]
    assert resumed["test_acc"] == full["test_acc"]


def test_restore_rejects_ema_decay_mismatch(rng, tmp_path):
    """Toggling ema_decay between save and resume must fail fast with an
    error naming ema_decay — not an opaque Orbax structure error, and never
    a silent fall-through to an older compatible slot."""
    import optax

    from neural_vit_tpu.core.config import Temporal3DViTConfig
    from neural_vit_tpu.models.vit import Temporal3DViT
    from neural_vit_tpu.training.checkpoint import (
        restore_train_checkpoint,
        save_train_checkpoint,
    )
    from neural_vit_tpu.training.loop import TrainState

    cfg = Temporal3DViTConfig(
        n_trials=4, freq_size=16, time_size=32,
        patch_trial=2, patch_freq=8, patch_time=8,
        embed_dim=64, n_heads=2, n_layers=2,
        compute_dtype="float32", use_flash_attention=False,
    )
    model = Temporal3DViT(cfg)
    x = jnp.zeros((2, cfg.n_trials, cfg.freq_size, cfg.time_size), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    with_ema = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adamw(1e-3),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
    )
    without_ema = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adamw(1e-3),
    )
    save_train_checkpoint(str(tmp_path), "latest", with_ema, cfg,
                          loop_state={"epoch": 1, "dropout_seed": 0})
    with pytest.raises(ValueError, match="ema_decay"):
        restore_train_checkpoint(str(tmp_path), "latest", without_ema)
    # The matching config restores fine.
    tree, _, _ = restore_train_checkpoint(str(tmp_path), "latest", with_ema)
    assert "ema_params" in tree

    # And the reverse direction (saved without, resumed with) also names
    # the knob.
    save_train_checkpoint(str(tmp_path / "b"), "latest", without_ema, cfg,
                          loop_state={"epoch": 1, "dropout_seed": 0})
    with pytest.raises(ValueError, match="ema_decay"):
        restore_train_checkpoint(str(tmp_path / "b"), "latest", with_ema)


def test_preemption_watcher_ignores_live_migration():
    """MIGRATE_ON_HOST_MAINTENANCE is survivable: the watcher must log and
    KEEP watching (catching a later TERMINATE) instead of aborting."""
    from neural_vit_tpu.utils.preemption import (
        clear_preemption,
        preemption_requested,
        start_preemption_watcher,
    )

    clear_preemption()
    events = iter(["MIGRATE_ON_HOST_MAINTENANCE", "NONE",
                   "TERMINATE_ON_HOST_MAINTENANCE"])
    t = start_preemption_watcher(poll=lambda: next(events),
                                 interval_s=0.01)
    t.join(timeout=10)
    assert not t.is_alive() and preemption_requested()
    clear_preemption()


def test_preemption_guard_catches_sigterm():
    """The guard installs SIGTERM → request flag and restores the previous
    handler on exit."""
    import os
    import signal

    from neural_vit_tpu.utils.preemption import (
        PreemptionGuard,
        clear_preemption,
        preemption_requested,
    )

    clear_preemption()
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard():
        assert not preemption_requested()
        os.kill(os.getpid(), signal.SIGTERM)
        # Signal delivery is synchronous for a self-kill in CPython (the
        # handler runs before os.kill returns to bytecode).
        assert preemption_requested()
    assert signal.getsignal(signal.SIGTERM) is before
    clear_preemption()
    # Disabled guard is a no-op.
    with PreemptionGuard(enabled=False):
        assert signal.getsignal(signal.SIGTERM) is before


def test_preemption_watcher_poll_paths():
    """The metadata watcher fires on a maintenance event, tolerates
    transient failures, and exits quietly when not on GCE."""
    from neural_vit_tpu.utils.preemption import (
        clear_preemption,
        preemption_requested,
        start_preemption_watcher,
    )

    clear_preemption()
    events = iter(["NONE", None, "TERMINATE_ON_HOST_MAINTENANCE"])
    t = start_preemption_watcher(poll=lambda: next(events),
                                 interval_s=0.01)
    t.join(timeout=10)
    assert not t.is_alive() and preemption_requested()
    clear_preemption()

    # Unreachable metadata server (not on GCE): exits without requesting.
    t = start_preemption_watcher(poll=lambda: None, interval_s=0.01,
                                 max_failures=2)
    t.join(timeout=10)
    assert not t.is_alive() and not preemption_requested()


def test_batch_iterator_skip_next(prepared_splits):
    """skip_next(k) drops exactly the first k batches of the next epoch
    and affects only that epoch."""
    from neural_vit_tpu.data.loader import build_dataloaders

    _, out = prepared_splits
    it, _, _, _ = build_dataloaders(
        [out["train"]], [out["val"]], [out["test"]],
        n_trials=4, stride=2,
        loader_cfg=DataLoaderConfig(batch_size=16),
    )
    it.set_epoch(0)
    ref = [np.asarray(l) for _, l, _ in it]
    it.set_epoch(0)
    it.skip_next(2)
    skipped = [np.asarray(l) for _, l, _ in it]
    assert len(skipped) == len(ref) - 2
    for a, b in zip(skipped, ref[2:]):
        np.testing.assert_array_equal(a, b)
    it.set_epoch(0)  # one-shot: next epoch is complete again
    again = [np.asarray(l) for _, l, _ in it]
    assert len(again) == len(ref)


def test_training_rejects_bad_config():
    with pytest.raises(ValueError):
        train(TrainConfig())
    with pytest.raises(ValueError):
        train(
            TrainConfig(
                train_paths=["x"], val_paths=["x"], test_paths=["x"],
                use_preprocessed=False,
            )
        )
