"""Baselines (log-reg + GBDT) and evals tooling (collectors, split
integrity, class balance, audit) on the synthetic pipeline."""

import json

import numpy as np
import pandas as pd
import pytest

from neural_vit_tpu.baselines import logreg, xgb
from neural_vit_tpu.baselines.common import build_sequence_features
from neural_vit_tpu.data.audit import audit_lfp_dataset, print_audit_report
from neural_vit_tpu.data.loader import SpectrogramDataset
from neural_vit_tpu.data.pipeline import preprocess_splits
from neural_vit_tpu.data.sequences import sequence_feature
from neural_vit_tpu.data.splits import create_session_splits_df
from neural_vit_tpu.data.synthetic import synthetic_lfp_frame
from neural_vit_tpu.evals.check_class_balance import class_balance_report
from neural_vit_tpu.evals.check_split_integrity import check_integrity
from neural_vit_tpu.evals.collect_baselines import collect_baselines
from neural_vit_tpu.evals.collect_runs import collect_runs
from neural_vit_tpu.ops.spectrogram import SpectrogramConfig

SPEC = SpectrogramConfig(fs=1000, nperseg=126, noverlap=116)


@pytest.fixture(scope="module")
def splits(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("base_evals")
    # "easy" profile: these tests assert the pipeline LEARNS (auc
    # thresholds at tiny scale); discrimination is gated by the full-scale
    # demo + test_demo_gate_ordering instead.
    df = synthetic_lfp_frame(
        n_sessions=8, trials_per_session=12, trace_len=5200, seed=3,
        profile="easy",
    )
    tr, va, te = create_session_splits_df(df, 0.25, 0.25)
    out = {}
    for name, d in (("train", tr), ("val", va), ("test", te)):
        raw = str(tmp / f"{name}.parquet")
        d.to_parquet(raw)
        out[name] = str(tmp / f"{name}_pre.parquet")
        out[f"{name}_raw"] = raw
    preprocess_splits(
        out["train_raw"], out["val_raw"], out["test_raw"],
        out["train"], out["val"], out["test"],
        cfg=SPEC, batch_size=64, verbose=False,
    )
    return tmp, out, df


def test_device_features_match_numpy(splits):
    _, out, _ = splits
    ds = SpectrogramDataset.from_parquet([out["val"]], n_trials=4, stride=2)
    for mode in ("trial_stats", "trial_time_stats"):
        feats, labels = build_sequence_features(ds, mode)
        assert feats.shape[0] == len(ds) == labels.shape[0]
        ref = np.stack([
            sequence_feature(ds.sequence(i)[0], mode) for i in range(len(ds))
        ])
        np.testing.assert_allclose(feats, ref, rtol=1e-4, atol=1e-4)


def test_logreg_baseline_runs_and_separates(splits):
    tmp, out, _ = splits
    payload = logreg.run(
        out["train"], out["val"], out["test"],
        n_trials=4, stride=2, feature_mode="trial_time_stats",
        output_dir=str(tmp / "baselines"),
    )
    assert payload["metrics"]["test"]["auc"] > 0.7
    assert "timing" in payload and payload["timing"]["train_s"] > 0


def test_gbdt_baseline_runs(splits):
    tmp, out, _ = splits
    payload = xgb.run(
        out["train"], out["val"], out["test"],
        n_trials=4, stride=2, feature_mode="trial_time_stats",
        output_dir=str(tmp / "baselines"),
        n_estimators=50,
    )
    assert 0.0 <= payload["metrics"]["test"]["auc"] <= 1.0
    assert payload["params"]["backend"] in ("xgboost-hist", "sklearn-histgbdt")


def test_collect_baselines(splits):
    tmp, _, _ = splits
    entries = collect_baselines(str(tmp / "baselines"))
    models = {e["model"] for e in entries}
    assert {"log_reg", "xgboost"} <= models
    for e in entries:
        assert "test" in e["metrics"]


def test_split_integrity_gate_clean_and_leaky(splits, tmp_path):
    _, out, _ = splits
    report = check_integrity(
        {"train": [out["train"]], "val": [out["val"]], "test": [out["test"]]}
    )
    assert not report["leakage"]
    assert report["splits"]["train"]["rows"] > 0
    # Leaky case: same file as train and val.
    leaky = check_integrity(
        {"train": [out["train"]], "val": [out["train"]], "test": [out["test"]]}
    )
    assert leaky["leakage"]


def test_class_balance_report(splits):
    _, out, _ = splits
    r = class_balance_report([out["train"]])
    assert set(r["counts"]) <= {"WT", "FMR1"}
    assert r["total"] == sum(r["counts"].values())


def test_collect_runs_jsonl(tmp_path):
    mdir = tmp_path / "runs" / "temporal-vit-1" / "metrics"
    mdir.mkdir(parents=True)
    with open(mdir / "metrics_x_1.jsonl", "w") as f:
        for e in range(1, 4):
            f.write(json.dumps({
                "step": e, "train/loss": 1.0 / e, "val/auc": 0.5 + 0.1 * e,
            }) + "\n")
        f.write(json.dumps({"step": 4, "test/auc": 0.81}) + "\n")
    result = collect_runs(str(tmp_path / "runs"))
    assert result["n_runs"] == 1
    run = result["runs"]["temporal-vit-1"]
    assert run["metrics"]["val/auc"]["best"] == pytest.approx(0.8)
    assert run["metrics"]["train/loss"]["best"] == pytest.approx(1 / 3)
    assert run["metrics"]["test/auc"]["last"] == pytest.approx(0.81)


def test_param_join_falls_through_sdk_apis():
    """The Vertex param join must survive SDK-surface churn: when the modern
    get_experiment_df API is missing/broken, it falls back to
    ExperimentRun.list, then Experiment().list_runs, extracting params from
    accessor methods, attributes, or raw resource metadata
    (reference collect_run_details.py:230-323)."""
    import types

    from neural_vit_tpu.evals.collect_runs import _load_experiment_params

    class RunWithMethod:
        name = "projects/p/runs/run-a"

        def get_params(self):
            return {"lr": 0.001, "dropout": 0.2}

    class RunWithResource:
        display_name = "run-b"
        _gca_resource = types.SimpleNamespace(
            metadata={"parameters": {"lr": 0.0003}}
        )

    def broken_df(experiment):
        raise AttributeError("get_experiment_df removed in this SDK")

    # Strategy 2: ExperimentRun.list (new-style kwarg, then bare call).
    fake = types.SimpleNamespace(
        init=lambda **kw: None,
        get_experiment_df=broken_df,
        ExperimentRun=types.SimpleNamespace(
            list=lambda **kw: [RunWithMethod(), RunWithResource()]
        ),
    )
    params = _load_experiment_params("exp", "proj", "loc", aiplatform=fake)
    assert params == {
        "run-a": {"lr": 0.001, "dropout": 0.2},
        "run-b": {"lr": 0.0003},
    }

    # Strategy 3: Experiment object with list_runs, when ExperimentRun.list
    # also raises.
    def broken_list(**kw):
        raise RuntimeError("permission denied")

    class FakeExperiment:
        def __init__(self, name):
            pass

        def list_runs(self):
            return [RunWithMethod()]

    fake3 = types.SimpleNamespace(
        init=lambda **kw: None,
        get_experiment_df=broken_df,
        ExperimentRun=types.SimpleNamespace(list=broken_list),
        Experiment=FakeExperiment,
    )
    params = _load_experiment_params("exp", None, None, aiplatform=fake3)
    assert params == {"run-a": {"lr": 0.001, "dropout": 0.2}}

    # Everything broken ⇒ {} (collection still proceeds without params).
    fake_none = types.SimpleNamespace(init=lambda **kw: None)
    assert _load_experiment_params("exp", None, None,
                                   aiplatform=fake_none) == {}


def test_audit_report(splits, capsys):
    _, _, df = splits
    report = audit_lfp_dataset(df, expected_seconds=5.0)
    assert report["n_trials"] == len(df)
    assert report["trace_quality"]["mode_length"] == 5200
    assert report["trace_quality"]["n_parse_errors"] == 0
    assert set(report["conditions"]) == {"WT", "FMR1"}
    print_audit_report(report)
    assert "Trials:" in capsys.readouterr().out


def test_audit_detects_bad_traces():
    df = pd.DataFrame({
        "session": ["a"] * 3, "condition": ["WT"] * 3, "trial_num": [0, 1, 2],
        "trace": ["[1.0, 2.0 ...]", "[1.0, 2.0, 3.0]", ""],
    })
    r = audit_lfp_dataset(df)
    assert r["trace_quality"]["n_truncated_strings"] == 1
    assert r["trace_quality"]["n_parse_errors"] == 1


def test_hptune_cli_and_config():
    from neural_vit_tpu.training.hptune import config_from_args, parse_args

    args = parse_args([
        "--lr", "1e-3", "--batch_size", "64", "--dropout", "0.3",
        "--train_path", "/x/t.parquet", "--val_path", "/x/v.parquet",
        "--test_path", "/x/s.parquet", "--output_dir", "/tmp/o",
    ])
    cfg = config_from_args(args)
    assert cfg.lr == pytest.approx(1e-3 * 4)  # linear scaling 64/16
    assert cfg.use_cosine_schedule and cfg.checkpoint_metric == "val_auc"
    assert cfg.early_stopping_patience == 5
    assert cfg.dropout == 0.3
    assert cfg.train_paths == ["/x/t.parquet"]
    # TPU perf knobs default to reference-parity values...
    assert cfg.gelu == "erf" and cfg.scoped_vmem_limit_kib is None
    # ...and plumb through when set.
    args = parse_args([
        "--train_path", "/x/t.parquet", "--val_path", "/x/v.parquet",
        "--test_path", "/x/s.parquet", "--output_dir", "/tmp/o",
        "--gelu", "quick", "--scoped_vmem_limit_kib", "26624",
    ])
    cfg = config_from_args(args)
    assert cfg.gelu == "quick" and cfg.scoped_vmem_limit_kib == 26624
