"""Local preprocessing path, profiling utilities, plots, checkpoints."""

import json
import os

import numpy as np
import pytest

from neural_vit_tpu.data.local import build_dataset, build_trial_sequences
from neural_vit_tpu.data.splits import create_session_splits
from neural_vit_tpu.data.synthetic import synthetic_lfp_frame
from neural_vit_tpu.utils.profiling import StepTimer


def test_local_build_dataset_and_sequences():
    df = synthetic_lfp_frame(n_sessions=4, trials_per_session=10,
                             trace_len=5200, seed=2, as_string=True)
    ds = build_dataset(df, apply_time_window=True, end_time=5.0)
    t0 = ds["trace"].iloc[0]
    assert t0.shape == (5000,)
    # Baseline correction: first-2s mean ≈ 0.
    assert abs(t0[:2000].mean()) < 1e-9

    seqs = build_trial_sequences(ds, n_trials=4, stride=2)
    # 10 trials → starts 0,2,4,6 → 4 windows per session × 4 sessions.
    assert len(seqs) == 16
    s0 = seqs[0]
    assert s0["traces"].shape == (4, 5000)
    assert s0["label"] in (0, 1)
    assert {"session", "start_trial"} <= set(s0)

    # Sequence-level session splits work on these dicts.
    tr, va, te = create_session_splits(seqs, 0.25, 0.25)
    assert len(tr) + len(va) + len(te) == len(seqs)


def test_local_short_sessions_skipped_and_mixed_raises():
    df = synthetic_lfp_frame(n_sessions=2, trials_per_session=3,
                             trace_len=5200, seed=0)
    ds = build_dataset(df)
    assert build_trial_sequences(ds, n_trials=4, stride=2) == []
    ds.loc[ds.index[0], "condition"] = "WT" if ds.condition.iloc[0] == "FMR1" else "FMR1"
    with pytest.raises(ValueError, match="mixed conditions"):
        build_trial_sequences(ds, n_trials=2, stride=1)


def test_step_timer():
    timer = StepTimer()
    with timer.section("a"):
        pass
    with timer.section("a"):
        pass
    with timer.section("b"):
        pass
    s = timer.summary()
    assert s["a_s"] >= 0 and s["b_s"] >= 0
    assert s["a_mean_s"] == pytest.approx(s["a_s"] / 2)
    timer.summary(reset=True)
    assert timer.summary() == {}


def test_plots_from_collected(tmp_path):
    from neural_vit_tpu.evals.collect_runs import collect_runs
    from neural_vit_tpu.evals.plots import (
        plot_hp_scatter,
        plot_run_curves,
        plot_vit_vs_baselines,
        summary_table,
    )

    mdir = tmp_path / "runs" / "temporal-vit-9" / "metrics"
    mdir.mkdir(parents=True)
    with open(mdir / "metrics_a_1.jsonl", "w") as f:
        for e in range(1, 4):
            f.write(json.dumps({
                "step": e, "train/loss": 1.0 / e, "train/acc": 0.5,
                "train/auc": 0.6, "val/loss": 1.1 / e, "val/acc": 0.55,
                "val/auc": 0.65,
            }) + "\n")
        f.write(json.dumps({"step": 4, "test/auc": 0.8, "test/acc": 0.7}) + "\n")
    details = collect_runs(str(tmp_path / "runs"))
    details["runs"]["temporal-vit-9"]["params"] = {"lr": 3e-4}
    baselines = [{
        "model": "log_reg", "timestamp": "x",
        "metrics": {"test": {"auc": 0.88, "accuracy": 0.51}},
    }]
    out = tmp_path / "plots"
    curves = plot_run_curves(details, str(out))
    assert curves and os.path.exists(curves[0])
    bars = plot_vit_vs_baselines(details, baselines, str(out))
    assert bars and os.path.exists(bars)
    scatter = plot_hp_scatter(details, "lr", str(out))
    assert scatter and os.path.exists(scatter)
    table = summary_table(details, baselines)
    assert "log_reg" in table and "temporal-vit-9" in table

    # Sweep-vs-sweep comparison (reference evals.ipynb cell 13): a second
    # "sweep" with two trials, compared against the first.
    from neural_vit_tpu.evals.plots import plot_sweep_comparison

    def fake_sweep(aucs):
        return {"runs": {
            f"trial-{i}": {"metrics": {"test/auc": {"last": a}}}
            for i, a in enumerate(aucs)
        }}

    cmp = plot_sweep_comparison(
        [("run1", details), ("run2", fake_sweep([0.82, 0.9]))], str(out)
    )
    assert cmp and os.path.exists(cmp)
    # Fewer than two sweeps with data → no plot.
    assert plot_sweep_comparison([("only", details)], str(out)) is None


def test_checkpoint_resume_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from neural_vit_tpu.core.config import Temporal3DViTConfig
    from neural_vit_tpu.models.vit import Temporal3DViT
    from neural_vit_tpu.training.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    cfg = Temporal3DViTConfig(
        n_trials=4, freq_size=16, time_size=32, patch_trial=2, patch_freq=8,
        patch_time=8, embed_dim=64, n_heads=2, n_layers=2,
        compute_dtype="float32", use_flash_attention=False,
    )
    model = Temporal3DViT(cfg)
    x = jnp.zeros((1, 4, 16, 32))
    params = model.init(jax.random.key(0), x)["params"]
    save_checkpoint(str(tmp_path), "ck", params, cfg, extra={"epoch": 5})
    restored, rcfg, extra = restore_checkpoint(str(tmp_path), "ck")
    assert rcfg == cfg and extra["epoch"] == 5
    a = model.apply({"params": params}, x)
    b = model.apply({"params": restored}, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_restore_checkpoint_slices_params_from_full_state(tmp_path):
    """Offline eval / serving export pointed at a full-state 'latest'
    checkpoint must get the params subtree, not {params, opt_state, step}."""
    import jax
    import jax.numpy as jnp
    import optax

    from neural_vit_tpu.core.config import Temporal3DViTConfig
    from neural_vit_tpu.models.vit import Temporal3DViT
    from neural_vit_tpu.training.checkpoint import (
        restore_checkpoint,
        save_train_checkpoint,
    )
    from neural_vit_tpu.training.loop import TrainState

    cfg = Temporal3DViTConfig(
        n_trials=4, freq_size=16, time_size=32, patch_trial=2, patch_freq=8,
        patch_time=8, embed_dim=64, n_heads=2, n_layers=2,
        compute_dtype="float32", use_flash_attention=False,
    )
    model = Temporal3DViT(cfg)
    x = jnp.zeros((1, 4, 16, 32))
    params = model.init(jax.random.key(0), x)["params"]
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adamw(1e-3)
    )
    save_train_checkpoint(str(tmp_path), "latest", state, cfg,
                          loop_state={"epoch": 2, "dropout_seed": 1})
    restored, rcfg, _ = restore_checkpoint(str(tmp_path), "latest")
    assert rcfg == cfg
    assert set(restored.keys()) != {"params", "opt_state", "step"}
    a = model.apply({"params": params}, x)
    b = model.apply({"params": restored}, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
