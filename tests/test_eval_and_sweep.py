"""Offline checkpoint evaluation and the in-process HP sweep driver."""

import argparse

import pytest

from neural_vit_tpu.data.loader import DataLoaderConfig
from neural_vit_tpu.data.pipeline import preprocess_splits
from neural_vit_tpu.data.splits import create_session_splits_df
from neural_vit_tpu.data.synthetic import synthetic_lfp_frame
from neural_vit_tpu.ops.spectrogram import SpectrogramConfig
from neural_vit_tpu.training.config import TrainConfig
from neural_vit_tpu.training.eval_checkpoint import evaluate_checkpoint
from neural_vit_tpu.training.hptune import run_sweep
from neural_vit_tpu.training.loop import train

SPEC = SpectrogramConfig(fs=1000, nperseg=126, noverlap=116)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("eval_sweep")
    df = synthetic_lfp_frame(n_sessions=8, trials_per_session=10,
                             trace_len=5200, seed=11)
    tr, va, te = create_session_splits_df(df, 0.25, 0.25)
    out = {}
    for name, d in (("train", tr), ("val", va), ("test", te)):
        raw = str(tmp / f"{name}.parquet")
        d.to_parquet(raw)
        out[name] = str(tmp / f"{name}_pre.parquet")
        out[f"{name}_raw"] = raw
    preprocess_splits(out["train_raw"], out["val_raw"], out["test_raw"],
                      out["train"], out["val"], out["test"],
                      cfg=SPEC, batch_size=64, verbose=False)
    cfg = TrainConfig(
        train_paths=[out["train"]], val_paths=[out["val"]],
        test_paths=[out["test"]], output_dir=str(tmp / "runs"),
        run_name="evalrun", epochs=2, lr=1e-3, n_trials=4, stride=2,
        model_size="tiny", embed_dim=64, n_heads=2, n_layers=2,
        patch_trial=2, patch_freq=8, patch_time=8,
        dropout=0.0, attention_dropout=0.0, drop_path=0.0,
        loader=DataLoaderConfig(batch_size=16),
        compute_dtype="float32", use_flash_attention=False,
    )
    results = train(cfg)
    return tmp, out, results


def test_evaluate_checkpoint_matches_train_eval(trained):
    tmp, out, results = trained
    metrics = evaluate_checkpoint(
        results["final_checkpoint"], [out["test"]],
        n_trials=4, stride=2, batch_size=16,
    )
    assert metrics["n_sequences"] > 0
    # Same params, same data, same unweighted-loss config? train's test eval
    # used class weights+smoothing; here plain CE — acc/auc must still match
    # (they don't depend on the loss).
    assert metrics["acc"] == pytest.approx(results["test_acc"], abs=1e-6)
    assert metrics["auc"] == pytest.approx(results["test_auc"], abs=1e-6)


class _FakeHyperTune:
    """Records report_hyperparameter_tuning_metric calls (stands in for
    cloudml-hypertune, absent in this image)."""

    def __init__(self):
        self.reports = []

    def report_hyperparameter_tuning_metric(
        self, hyperparameter_metric_tag, metric_value, global_step
    ):
        self.reports.append(
            (hyperparameter_metric_tag, float(metric_value), int(global_step))
        )


def test_hptune_reports_val_auc_every_epoch(trained, monkeypatch):
    """The tuner metric must be reported per epoch (reference
    train_hptune.py:460 — Vertex trial early-termination depends on the
    intermediate reports), plus one final test_auc report (:504)."""
    import types

    import neural_vit_tpu.training.hptune as hptune_mod

    recorder = _FakeHyperTune()
    fake_module = types.SimpleNamespace(HyperTune=lambda: recorder)
    monkeypatch.setattr(hptune_mod, "hypertune", fake_module)

    tmp, out, _ = trained
    epochs = 2
    args = argparse.Namespace(
        lr=1e-3, dropout=0.0, attention_dropout=0.0, drop_path=0.0,
        weight_decay=0.01, label_smoothing=0.05, epochs=epochs, batch_size=16,
        n_trials=4, stride=2, early_stopping_patience=0, warmup_epochs=1,
        min_lr=1e-6, output_dir=str(tmp / "hptune_epochs"),
        train_path=out["train"], val_path=out["val"], test_path=out["test"],
        experiment_name=None, project_id=None, location=None,
        model_size="tiny",
    )
    results = hptune_mod.train_with_hptune(args)

    val_reports = [r for r in recorder.reports if r[0] == "val_auc"]
    test_reports = [r for r in recorder.reports if r[0] == "test_auc"]
    assert [step for _, _, step in val_reports] == list(range(1, epochs + 1))
    assert len(test_reports) == 1
    assert test_reports[0][1] == pytest.approx(results["test_auc"])
    assert test_reports[0][2] == epochs + 1


def test_run_sweep_picks_best(trained, capsys):
    tmp, out, _ = trained
    base = argparse.Namespace(
        lr=1e-3, dropout=0.0, attention_dropout=0.0, drop_path=0.0,
        weight_decay=0.01, label_smoothing=0.05, epochs=1, batch_size=16,
        n_trials=4, stride=2, early_stopping_patience=0, warmup_epochs=1,
        min_lr=1e-6, output_dir=str(tmp / "sweep"),
        train_path=out["train"], val_path=out["val"], test_path=out["test"],
        experiment_name=None, project_id=None, location=None,
        model_size="tiny",
    )
    # Two trials concurrently, one per 4-device mesh slice (BASELINE
    # config 5: HP sweep data-parallel across the mesh).
    results = run_sweep(base, [{"lr": 1e-3}, {"lr": 3e-4}], slices=2)
    assert len(results) == 2
    assert all("best_val_auc" in r for r in results)
    assert {r["trial"] for r in results} == {0, 1}
    assert "Best trial" in capsys.readouterr().out


def test_sample_search_space_deterministic_and_bounded():
    import math

    from neural_vit_tpu.training.hptune import sample_search_space

    space = {
        "lr": ("loguniform", 1e-5, 1e-2),
        "dropout": ("uniform", 0.0, 0.5),
        "batch_size": ("choice", [16, 32]),
    }
    a = sample_search_space(space, 20, seed=3)
    assert a == sample_search_space(space, 20, seed=3)
    assert a != sample_search_space(space, 20, seed=4)
    for t in a:
        assert 1e-5 <= t["lr"] <= 1e-2
        assert 0.0 <= t["dropout"] <= 0.5
        assert t["batch_size"] in (16, 32)
    # log-uniform spreads across decades (a plain uniform would cluster in
    # the top decade with overwhelming probability)
    logs = [math.log10(t["lr"]) for t in a]
    assert max(logs) - min(logs) > 1.0
    with pytest.raises(ValueError, match="unknown space kind"):
        sample_search_space({"x": ("normal", 0, 1)}, 1)


def test_successive_halving_promotes_and_resumes():
    """Rung geometry with an injected runner: budgets follow min·eta^k,
    the top 1/eta by val AUC survive each rung, and every promoted trial
    resumes from the checkpoint its previous rung produced."""
    from neural_vit_tpu.training.hptune import run_successive_halving

    calls = []

    def fake_runner(trial, overrides, stop_after, resume_from, mesh):
        calls.append((trial, stop_after, resume_from))
        score = ((trial * 37) % 11) / 11.0  # fixed per-trial quality
        return {
            "best_val_auc": score,
            "resume_checkpoint": f"ckpt-{trial}-e{stop_after}",
        }

    base = argparse.Namespace(epochs=9)
    out = run_successive_halving(
        base, n_trials=9, seed=0, eta=3, min_epochs=1,
        trial_runner=fake_runner,
    )
    assert out["budgets"] == [1, 3, 9]
    rung0 = [c for c in calls if c[1] == 1]
    rung1 = [c for c in calls if c[1] == 3]
    rung2 = [c for c in calls if c[1] == 9]
    assert len(rung0) == 9 and len(rung1) == 3 and len(rung2) == 1
    assert all(c[2] is None for c in rung0)
    # promotion = top-3 scores of rung 0
    score = lambda t: ((t * 37) % 11) / 11.0  # noqa: E731
    top3 = sorted(range(9), key=lambda t: -score(t))[:3]
    assert sorted(c[0] for c in rung1) == sorted(top3)
    # resumed exactly from the prior rung's checkpoint
    assert all(c[2] == f"ckpt-{c[0]}-e1" for c in rung1)
    assert all(c[2] == f"ckpt-{c[0]}-e3" for c in rung2)
    assert out["best"]["trial"] == max(range(9), key=score)
    # every sampled trial keeps its record even when killed at rung 0
    assert len(out["trials"]) == 9


def test_successive_halving_real_loop(trained):
    """End-to-end SH on the real training loop: rung 0 pauses trials via
    stop_after_epoch, the promoted trial resumes its own full-state
    checkpoint, and the final rung completes with a test eval."""
    from neural_vit_tpu.training.hptune import run_successive_halving

    tmp, out, _ = trained
    base = argparse.Namespace(
        lr=1e-3, dropout=0.0, attention_dropout=0.0, drop_path=0.0,
        weight_decay=0.01, label_smoothing=0.05, epochs=2, batch_size=16,
        n_trials=4, stride=2, early_stopping_patience=0, warmup_epochs=1,
        min_lr=1e-6, output_dir=str(tmp / "sh"),
        train_path=out["train"], val_path=out["val"], test_path=out["test"],
        experiment_name=None, project_id=None, location=None,
        model_size="tiny",
    )
    space = {"lr": ("loguniform", 3e-4, 3e-3)}
    res = run_successive_halving(
        base, space, n_trials=2, seed=1, eta=2, min_epochs=1,
    )
    assert res["budgets"] == [1, 2]
    assert len(res["trials"]) == 2
    best = res["best"]
    assert [r["epochs"] for r in best["rungs"]] == [1, 2]
    # final rung ran to completion: test eval happened, 2 epochs total
    assert "test_auc" in best["last"]
    assert best["last"]["epochs_trained"] == 2
    # the killed trial stopped early with a resume point and no test eval
    killed = [t for t in res["trials"] if t is not best][0]
    assert killed["last"].get("stopped_early")
    assert "test_auc" not in killed["last"]
