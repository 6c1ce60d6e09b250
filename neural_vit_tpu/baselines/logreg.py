"""Logistic-regression baseline on sequence features
(reference `baselines/log_reg_baseline.py`).

StandardScaler + LogisticRegression(lbfgs, class_weight='balanced') with the
reference's convergence-retry (max_iter 500 → 2000 on ConvergenceWarning),
acc/AUC on train/val/test, timing breakdown in the metrics JSON. Runs on
host (sklearn) — this is an AUC-parity gate, not a performance target
(SURVEY §2.1 #25); only the feature build runs on the TPU.
"""

from __future__ import annotations

import argparse
import time
import warnings
from typing import Dict, Optional

from sklearn.exceptions import ConvergenceWarning
from sklearn.linear_model import LogisticRegression
from sklearn.metrics import accuracy_score, roc_auc_score
from sklearn.preprocessing import StandardScaler

from neural_vit_tpu.baselines.common import (
    build_run_metadata,
    class_balance,
    default_paths,
    load_split_features,
    write_metrics,
)


def _metrics_block(model, scaler, x, y) -> Dict[str, float]:
    xs = scaler.transform(x)
    preds = model.predict(xs)
    probs = model.predict_proba(xs)[:, 1]
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
    feature_mode: str = "trial_stats",
    C: Optional[float] = None,
    output_dir: Optional[str] = None,
) -> Dict:
    train_path = train_path or default_paths("train")
    val_path = val_path or default_paths("val")
    test_path = test_path or default_paths("test")

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
    print(f"Features: train {xtr.shape}, val {xva.shape}, test {xte.shape}")

    t0 = time.perf_counter()
    scaler = StandardScaler().fit(xtr)
    xs = scaler.transform(xtr)
    kwargs = dict(
        solver="lbfgs", class_weight="balanced", max_iter=500,
    )
    if C is not None:
        kwargs["C"] = C
    else:
        kwargs["penalty"] = None
    model = LogisticRegression(**kwargs)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always", ConvergenceWarning)
        model.fit(xs, ytr)
        if any(issubclass(w.category, ConvergenceWarning) for w in caught):
            # Convergence retry with a larger budget (reference :154-174).
            print("ConvergenceWarning — retrying with max_iter=2000")
            kwargs["max_iter"] = 2000
            model = LogisticRegression(**kwargs)
            model.fit(xs, ytr)
    timing["train_s"] = time.perf_counter() - t0

    results = {
        "train": _metrics_block(model, scaler, xtr, ytr),
        "val": _metrics_block(model, scaler, xva, yva),
        "test": _metrics_block(model, scaler, xte, yte),
    }
    payload = build_run_metadata(
        "log_reg", [train_path], [val_path], [test_path],
        feature_mode, n_trials, stride,
    )
    payload.update(
        {
            "params": {"C": C, "penalty": kwargs.get("penalty", "l2")},
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
        path = write_metrics(output_dir, "log_reg", payload)
        print(f"Metrics written to {path}")
    return payload


def main():  # pragma: no cover
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_path")
    ap.add_argument("--val_path")
    ap.add_argument("--test_path")
    ap.add_argument("--n_trials", type=int, default=8)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--feature_mode", default="trial_stats")
    ap.add_argument("--C", type=float, default=None)
    ap.add_argument("--output_dir", default="gs://lfp-baselines")
    args = ap.parse_args()
    run(
        args.train_path, args.val_path, args.test_path,
        n_trials=args.n_trials, stride=args.stride,
        feature_mode=args.feature_mode, C=args.C, output_dir=args.output_dir,
    )


if __name__ == "__main__":  # pragma: no cover
    main()
