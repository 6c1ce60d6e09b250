"""Offline evaluation of a saved checkpoint on any split.

The reference planned but never built a checkpoint-loading eval job
(`project_plan.md:115-117` is an unchecked TODO); with Orbax restore it's a
one-screen CLI: load {params, config}, rebuild the model, run the jitted
eval pass, print/emit loss/acc/AUC.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Optional

import numpy as np

from neural_vit_tpu.data.loader import BatchIterator, DataLoaderConfig, SpectrogramDataset
from neural_vit_tpu.models.vit import Temporal3DViT
from neural_vit_tpu.ops.losses import class_weights_from_counts
from neural_vit_tpu.training.checkpoint import restore_checkpoint
from neural_vit_tpu.training.loop import evaluate, make_step_fns


def evaluate_checkpoint(
    checkpoint: str,
    data_paths: List[str],
    *,
    n_trials: Optional[int] = None,
    stride: int = 4,
    batch_size: int = 64,
    spectrogram_column: str = "spectrogram",
    label_smoothing: float = 0.0,
    class_weighted: bool = False,
) -> Dict[str, float]:
    directory, _, name = checkpoint.rpartition("/")
    params, model_cfg, extra = restore_checkpoint(directory, name)
    model = Temporal3DViT(model_cfg)

    ds = SpectrogramDataset.from_parquet(
        data_paths,
        n_trials=n_trials or model_cfg.n_trials,
        stride=stride,
        spectrogram_column=spectrogram_column,
    )
    if ds.freq_size != model_cfg.freq_size or ds.time_size != model_cfg.time_size:
        raise ValueError(
            f"Data dims ({ds.freq_size},{ds.time_size}) don't match checkpoint "
            f"model ({model_cfg.freq_size},{model_cfg.time_size})."
        )
    weights = None
    if class_weighted:
        counts = np.bincount(ds.labels, minlength=model_cfg.n_classes)
        weights = class_weights_from_counts(counts)
    _, eval_step = make_step_fns(model, weights, label_smoothing)
    it = BatchIterator(
        ds, DataLoaderConfig(batch_size=batch_size), shuffle=False
    )
    metrics = evaluate(eval_step, params, it)
    metrics["n_sequences"] = len(ds)
    metrics["checkpoint_extra"] = extra
    return metrics


def main(argv=None):  # pragma: no cover
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="path '<dir>/<name>' of a saved checkpoint")
    ap.add_argument("--data", nargs="+", required=True)
    ap.add_argument("--n_trials", type=int, default=None)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=64)
    args = ap.parse_args(argv)
    m = evaluate_checkpoint(
        args.checkpoint, args.data,
        n_trials=args.n_trials, stride=args.stride, batch_size=args.batch_size,
    )
    print(json.dumps(m, indent=2, default=str))


if __name__ == "__main__":  # pragma: no cover
    main()
