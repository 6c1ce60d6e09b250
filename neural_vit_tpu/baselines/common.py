"""Shared utilities for classical baselines (parity gate vs the ViT).

Reference: `baselines/common.py`. Baselines run on the *identical*
session-stratified splits and sliding-window sequencing as the ViT; each
(K, F, T) sequence reduces to a feature vector:

  * trial_stats:      concat(mean, std over trial axis) → 2·F·T dims
  * trial_time_stats: time-mean first, then trial mean/std → 2·F dims

TPU twist: the feature reduction is a single jitted batched reduction over
the dataset's gather index instead of a joblib per-session loop — the whole
feature matrix computes in one device call.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from pathlib import Path
from typing import Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neural_vit_tpu.data.loader import SpectrogramDataset

DEFAULT_BUCKET = "lfp_spec_datasets"
DEFAULT_PREFIX = "neural/v2"


def default_paths(split: str) -> str:
    return f"gs://{DEFAULT_BUCKET}/{DEFAULT_PREFIX}/{split}_preprocessed.parquet"


def timestamp() -> str:
    return datetime.now(timezone.utc).strftime("%Y%m%d-%H%M%S")


@jax.jit
def _features_trial_stats(seqs: jax.Array) -> jax.Array:
    """(B, K, F, T) → (B, 2·F·T): mean/std over the trial axis."""
    mean = jnp.mean(seqs, axis=1)
    std = jnp.std(seqs, axis=1)
    b = seqs.shape[0]
    return jnp.concatenate(
        [mean.reshape(b, -1), std.reshape(b, -1)], axis=-1
    )


@jax.jit
def _features_trial_time_stats(seqs: jax.Array) -> jax.Array:
    """(B, K, F, T) → (B, 2·F): time-mean then trial mean/std."""
    reduced = jnp.mean(seqs, axis=3)          # (B, K, F)
    mean = jnp.mean(reduced, axis=1)
    std = jnp.std(reduced, axis=1)
    return jnp.concatenate([mean, std], axis=-1)


_FEATURE_FNS = {
    "trial_stats": _features_trial_stats,
    "trial_time_stats": _features_trial_time_stats,
}


def build_sequence_features(
    dataset: SpectrogramDataset,
    feature_mode: str = "trial_time_stats",
    batch: int = 512,
) -> Tuple[np.ndarray, np.ndarray]:
    """Feature matrix + labels for a split, computed on device in batches."""
    if feature_mode not in _FEATURE_FNS:
        raise ValueError(f"Unknown feature mode: {feature_mode}")
    fn = _FEATURE_FNS[feature_mode]
    specs = dataset.to_device()
    idx = dataset.index.indices
    feats = []
    for start in range(0, idx.shape[0], batch):
        sel = jnp.asarray(idx[start:start + batch])
        seqs = jnp.take(specs, sel, axis=0)
        feats.append(np.asarray(fn(seqs)))
    if not feats:
        raise ValueError(
            "No valid sequences generated. Check n_trials/stride and spectrograms."
        )
    return np.concatenate(feats), np.asarray(dataset.labels)


def load_split_features(
    paths: Iterable[str] | str,
    *,
    n_trials: int,
    stride: int,
    feature_mode: str,
) -> Tuple[np.ndarray, np.ndarray]:
    ds = SpectrogramDataset.from_parquet(
        paths if isinstance(paths, list) else [paths],
        n_trials=n_trials, stride=stride,
    )
    return build_sequence_features(ds, feature_mode)


def class_balance(labels: np.ndarray) -> Dict[str, float]:
    unique, counts = np.unique(labels, return_counts=True)
    total = counts.sum()
    return {str(int(u)): float(c) / float(total) for u, c in zip(unique, counts)}


def build_run_metadata(
    model_name: str,
    train_paths: List[str],
    val_paths: List[str],
    test_paths: List[str],
    feature_mode: str,
    n_trials: int,
    stride: int,
) -> Dict[str, object]:
    return {
        "model": model_name,
        "timestamp": timestamp(),
        "train_paths": train_paths,
        "val_paths": val_paths,
        "test_paths": test_paths,
        "feature_mode": feature_mode,
        "n_trials": n_trials,
        "stride": stride,
        "cwd": os.getcwd(),
    }


def write_metrics(output_dir: str, model_name: str, payload: Dict) -> str:
    """Metrics JSON to local or gs:// (schema consumed by
    evals/collect_baselines)."""
    output_dir = output_dir.rstrip("/")
    path = f"{output_dir}/{model_name}_{payload['timestamp']}.json"
    content = json.dumps(payload, indent=2)
    if path.startswith("gs://"):
        import gcsfs

        fs = gcsfs.GCSFileSystem()
        with fs.open(path, "w") as f:
            f.write(content)
    else:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(content)
    return path
