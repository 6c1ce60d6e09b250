"""HP-tuning training entry: CLI hyperparameters, warmup-cosine schedule,
early stopping, Vertex HP-tuning metric reporting.

Capability parity with `training/train_hptune.py` in the reference: the
same argparse surface (:38-97), the linear LR-scaling rule (:230-233), the
warmup+cosine schedule (:192-223), early stopping on val AUC (:401-492),
best-val_auc checkpointing, and `val_auc`/`test_auc` reporting through
cloudml-hypertune (:182-189) — all layered on the shared TPU loop
(`loop.train`). CUDA AMP + GradScaler have no TPU analogue: matmuls run
bf16 natively, no loss scaling required.

HP sweeps across a TPU slice run as embarrassingly-parallel trials —
`run_sweep` partitions the device mesh into disjoint slices and runs one
trial per slice concurrently (the in-process analogue of the reference's
parallel Vertex trials).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

from neural_vit_tpu.data.loader import DataLoaderConfig
from neural_vit_tpu.parallel.mesh import MeshSpec
from neural_vit_tpu.training.config import TrainConfig
from neural_vit_tpu.training.loop import train
from neural_vit_tpu.training.schedule import linear_scaled_lr

try:
    import hypertune
except ImportError:
    hypertune = None


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Temporal 3D ViT training with hyperparameter tuning support."
    )
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--dropout", type=float, default=0.2)
    parser.add_argument("--attention_dropout", type=float, default=0.1)
    parser.add_argument("--drop_path", type=float, default=0.1)
    parser.add_argument("--weight_decay", type=float, default=0.01)
    parser.add_argument("--label_smoothing", type=float, default=0.05)
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--n_trials", type=int, default=8)
    parser.add_argument("--stride", type=int, default=4)
    parser.add_argument("--early_stopping_patience", type=int, default=5)
    parser.add_argument("--warmup_epochs", type=int, default=3)
    parser.add_argument("--min_lr", type=float, default=1e-6)
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--train_path", type=str, default=None)
    parser.add_argument("--val_path", type=str, default=None)
    parser.add_argument("--test_path", type=str, default=None)
    parser.add_argument("--experiment_name", type=str,
                        default="lfp-temporal-vit-hptune")
    parser.add_argument("--project_id", type=str, default="lfp-temporal-vit")
    parser.add_argument("--location", type=str, default="us-central1")
    parser.add_argument("--model_size", type=str, default="small")
    # TPU perf knobs beyond the reference CLI (docs/ROOFLINE.md): the
    # measured-fast activation and the per-compile scoped-VMEM limit.
    parser.add_argument("--gelu", type=str, default="erf",
                        choices=["erf", "tanh", "quick"])
    parser.add_argument("--pool", type=str, default="cls",
                        choices=["cls", "mean", "probe"])
    parser.add_argument("--scoped_vmem_limit_kib", type=int, default=None)
    parser.add_argument("--remat", nargs="?", const="block", default=False,
                        choices=["block", "mlp"],
                        help="rematerialize in backward (fits production-"
                             "dims N=1953 training on one 16 GB chip). "
                             "Bare --remat = 'block' (whole blocks); "
                             "--remat mlp recomputes only the MLP "
                             "sub-block (cheaper, ~half the HBM relief)")
    parser.add_argument("--grad_accum_steps", type=int, default=1,
                        help="split each batch into this many microbatches "
                             "scanned inside the jitted step (activation "
                             "HBM ÷ steps; the update is numerically the "
                             "big-batch update). An alternative/complement "
                             "to --remat for memory-tight configs")
    parser.add_argument("--ema_decay", type=float, default=0.0,
                        help="exponential-moving-average decay for a shadow "
                             "copy of the params (0 = off); val/test/best-"
                             "checkpoints consume the shadow when on")
    parser.add_argument("--device_resident", action="store_true",
                        help="keep the whole split on device; batches are "
                             "jitted gathers (fastest when the split fits "
                             "HBM)")
    # In-repo search (the reference leans on the Vertex tuner for this —
    # launch_hptune.sh:16): 'random' = seeded random search, 'asha' =
    # successive halving with rung promotion/early killing.
    parser.add_argument("--search", default="none",
                        choices=["none", "random", "asha"])
    parser.add_argument("--search_trials", type=int, default=8)
    parser.add_argument("--search_seed", type=int, default=0)
    parser.add_argument("--search_slices", type=int, default=1,
                        help="disjoint mesh slices running trials "
                             "concurrently (run_sweep semantics)")
    parser.add_argument("--search_min_epochs", type=int, default=2,
                        help="asha: rung-0 epoch budget")
    parser.add_argument("--search_eta", type=int, default=3,
                        help="asha: promotion factor (keep top 1/eta)")
    parser.add_argument("--search_space", type=str, default=None,
                        help='JSON space, e.g. {"lr": ["loguniform", '
                             '1e-5, 1e-2], "dropout": ["uniform", 0, 0.5]} '
                             "(default: DEFAULT_SEARCH_SPACE)")
    return parser.parse_args(argv)


def report_metric(hpt, tag: str, value: float, step: int) -> None:
    """Report a trial metric to the Vertex tuner (reference :182-189)."""
    if hpt is not None:
        hpt.report_hyperparameter_tuning_metric(
            hyperparameter_metric_tag=tag,
            metric_value=value,
            global_step=step,
        )


def config_from_args(args: argparse.Namespace) -> TrainConfig:
    bucket, prefix = "lfp_spec_datasets", "neural/v2"
    train_paths = [args.train_path or f"gs://{bucket}/{prefix}/train_preprocessed.parquet"]
    val_paths = [args.val_path or f"gs://{bucket}/{prefix}/val_preprocessed.parquet"]
    test_paths = [args.test_path or f"gs://{bucket}/{prefix}/test_preprocessed.parquet"]
    output_dir = (
        args.output_dir
        or os.environ.get("AIP_MODEL_DIR")
        or os.environ.get("AIP_CHECKPOINT_DIR")
        or "gs://lfp-temporal-vit/hptune-runs"
    )
    effective_lr = linear_scaled_lr(args.lr, args.batch_size)
    return TrainConfig(
        train_paths=train_paths,
        val_paths=val_paths,
        test_paths=test_paths,
        output_dir=output_dir,
        use_preprocessed=True,
        epochs=args.epochs,
        loader=DataLoaderConfig(
            batch_size=args.batch_size,
            device_resident=getattr(args, "device_resident", False),
        ),
        lr=effective_lr,
        weight_decay=args.weight_decay,
        label_smoothing=args.label_smoothing,
        n_trials=args.n_trials,
        stride=args.stride,
        model_size=args.model_size,
        dropout=args.dropout,
        attention_dropout=args.attention_dropout,
        drop_path=args.drop_path,
        use_cosine_schedule=True,
        warmup_epochs=args.warmup_epochs,
        min_lr=args.min_lr,
        early_stopping_patience=args.early_stopping_patience,
        checkpoint_metric="val_auc",
        experiment_name=args.experiment_name,
        project_id=args.project_id,
        location=args.location,
        gelu=getattr(args, "gelu", "erf"),
        pool=getattr(args, "pool", "cls"),
        scoped_vmem_limit_kib=getattr(args, "scoped_vmem_limit_kib", None),
        remat=getattr(args, "remat", False),
        grad_accum_steps=getattr(args, "grad_accum_steps", 1),
        ema_decay=getattr(args, "ema_decay", 0.0),
    )


def train_with_hptune(
    args: argparse.Namespace,
    mesh: Optional[MeshSpec] = None,
    run_name: Optional[str] = None,
) -> Dict:
    hpt = None
    if hypertune is not None:
        try:
            hpt = hypertune.HyperTune()
            print("Hypertune initialized successfully.")
        except Exception as e:  # pragma: no cover
            print(f"Hypertune initialization failed: {e}")
    else:
        print("Hypertune not available, metrics will only be logged locally.")

    cfg = config_from_args(args)
    if mesh is not None:
        cfg = dataclasses.replace(cfg, mesh=mesh)
    if run_name is not None:
        cfg = dataclasses.replace(cfg, run_name=run_name)
    print("=" * 60)
    print("Hyperparameter Tuning Configuration")
    print("=" * 60)
    print(f"  lr (base): {args.lr}")
    print(f"  lr (effective): {cfg.lr} (linear scaling, batch {args.batch_size})")
    for k in ("dropout", "attention_dropout", "drop_path", "weight_decay",
              "label_smoothing", "early_stopping_patience", "warmup_epochs",
              "min_lr", "epochs", "batch_size"):
        print(f"  {k}: {getattr(args, k)}")
    print("=" * 60)

    def on_epoch(epoch: int, metrics: Dict) -> None:
        # Per-epoch val_auc report (reference train_hptune.py:460) — this is
        # what lets the Vertex Bayesian search early-terminate bad trials.
        report_metric(hpt, "val_auc", metrics["val_auc"], epoch)

    results = train(cfg, epoch_callback=on_epoch)
    if results.get("preempted"):
        # The trial was evicted mid-run: there is no test eval, and the
        # grace window is short — exit cleanly so the "latest" checkpoint
        # commit is the last thing this process does.
        print(f"Trial preempted after {results['epochs_trained']} epochs; "
              f"resume from {results.get('resume_checkpoint', 'N/A')}")
        return results
    # Final test AUC report (reference train_hptune.py:504).
    report_metric(hpt, "test_auc", results["test_auc"], cfg.epochs + 1)
    print(f"Training complete. Best val AUC: {results['best_val_auc']:.4f}")
    return results


def run_sweep(
    base_args: argparse.Namespace,
    trial_overrides: List[Dict],
    slices: int = 1,
) -> List[Dict]:
    """In-process HP sweep over mesh slices (the reference's parallel
    Vertex HP-tuning jobs, BASELINE config 5).

    With slices > 1 the device pool partitions into `slices` disjoint
    sub-meshes and trials run concurrently, one per slice — trials never
    communicate, so the sweep is embarrassingly parallel across slices.
    slices == 1 runs trials sequentially on the full mesh.
    """
    import jax

    n_trials = len(trial_overrides)

    def one_trial(i: int, overrides: Dict, mesh: Optional[MeshSpec]) -> Dict:
        args = argparse.Namespace(**{**vars(base_args), **overrides})
        print(f"=== Trial {i + 1}/{n_trials}: {overrides} ===")
        r = train_with_hptune(args, mesh=mesh, run_name=f"hptune-trial-{i}")
        r["trial"] = i
        r["overrides"] = overrides
        return r

    if slices <= 1:
        results = [
            one_trial(i, o, None) for i, o in enumerate(trial_overrides)
        ]
    else:
        devices = jax.devices()
        if len(devices) % slices != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible into {slices} slices"
            )
        per = len(devices) // slices
        meshes = [
            MeshSpec(data=per, model=1,
                     device_indices=tuple(range(s * per, (s + 1) * per)))
            for s in range(slices)
        ]
        results = []
        with ThreadPoolExecutor(max_workers=slices) as pool:
            futures = [
                pool.submit(one_trial, i, o, meshes[i % slices])
                for i, o in enumerate(trial_overrides)
            ]
            results = [f.result() for f in futures]
    best = max(results, key=lambda r: r["best_val_auc"])
    print(f"Best trial: {best['trial']} val_auc={best['best_val_auc']:.4f}")
    return results


# --------------------------------------------------------------- HP search
# The reference outsources search intelligence to the Vertex tuner
# (Bayesian search + bad-trial early termination, configured in the
# gitignored yaml behind scripts/launch_hptune.sh:16 and fed by the
# per-epoch val_auc reports). These drivers provide the in-repo
# equivalent: seeded random search over the same hyperparameter surface,
# and successive halving (ASHA-style rung promotion) that early-kills bad
# trials — both running trials across disjoint mesh slices like
# `run_sweep`.

# The surface the reference tunes (train_hptune.py:45-97 argparse;
# hptune_params_* artifacts record lr/dropout/weight_decay trials).
DEFAULT_SEARCH_SPACE = {
    "lr": ("loguniform", 5e-5, 3e-3),
    "dropout": ("uniform", 0.0, 0.5),
    "weight_decay": ("loguniform", 1e-3, 1e-1),
}


def sample_search_space(space, n_trials: int, seed: int = 0) -> List[Dict]:
    """Seeded random draws from a space spec: each entry is
    ("loguniform", lo, hi) | ("uniform", lo, hi) | ("choice", [values])."""
    import numpy as np

    rng = np.random.default_rng(seed)
    trials = []
    for _ in range(n_trials):
        t = {}
        for name, spec in space.items():
            kind = spec[0]
            if kind == "loguniform":
                t[name] = float(
                    np.exp(rng.uniform(np.log(spec[1]), np.log(spec[2])))
                )
            elif kind == "uniform":
                t[name] = float(rng.uniform(spec[1], spec[2]))
            elif kind == "choice":
                t[name] = spec[1][int(rng.integers(len(spec[1])))]
            else:
                raise ValueError(f"unknown space kind {kind!r} for {name}")
        trials.append(t)
    return trials


def run_random_search(
    base_args: argparse.Namespace,
    space: Optional[Dict] = None,
    n_trials: int = 8,
    slices: int = 1,
    seed: int = 0,
) -> List[Dict]:
    """Random search: sample `n_trials` configs and run them (concurrently
    across mesh slices via `run_sweep`). Returns per-trial results."""
    trials = sample_search_space(space or DEFAULT_SEARCH_SPACE, n_trials, seed)
    return run_sweep(base_args, trials, slices=slices)


def _sh_trial_runner(base_args: argparse.Namespace):
    """Default rung executor: our production `train()` with
    `stop_after_epoch` as the rung budget and full-state resume between
    rungs — a promoted trial's trajectory is one continuous training run
    (optimizer moments, LR-schedule position, and dropout stream all
    carry across the pause)."""

    def runner(trial_idx, overrides, stop_after_epoch, resume_from, mesh):
        args = argparse.Namespace(**{**vars(base_args), **overrides})
        cfg = config_from_args(args)
        cfg = dataclasses.replace(
            cfg,
            run_name=f"sh-trial-{trial_idx}",
            stop_after_epoch=stop_after_epoch,
            resume_from=resume_from,
            latest_checkpoint_every=1,
            checkpoint_metric="val_auc",
        )
        if mesh is not None:
            cfg = dataclasses.replace(cfg, mesh=mesh)
        return train(cfg)

    return runner


def run_successive_halving(
    base_args: argparse.Namespace,
    space: Optional[Dict] = None,
    n_trials: int = 9,
    slices: int = 1,
    seed: int = 0,
    eta: int = 3,
    min_epochs: int = 1,
    trial_runner=None,
) -> Dict:
    """Successive halving over a random-sampled trial set (the ASHA rung
    geometry, run rung-synchronously): rung k trains every surviving trial
    to `min_epochs·eta^k` epochs (final rung: `base_args.epochs`, which
    also runs the test eval), then promotes the top 1/eta by val AUC.
    Early rungs pause trials via `TrainConfig.stop_after_epoch`; promotion
    resumes from the rung's full-state checkpoint.

    Equal-budget accounting: with eta=3 and three rungs, 9 trials cost
    ~9·r + 3·2r + 1·6r ≈ 21r epoch-units — about the budget of 3.5 full
    runs, versus 9 full runs for the same coverage under a fixed grid.

    `trial_runner(trial_idx, overrides, stop_after_epoch, resume_from,
    mesh) -> results` is injectable for tests; the default runs the real
    training loop.
    """
    import math

    max_epochs = base_args.epochs
    budgets = []
    b = max(1, min_epochs)
    while b < max_epochs:
        budgets.append(b)
        b *= eta
    budgets.append(max_epochs)

    trials = sample_search_space(space or DEFAULT_SEARCH_SPACE, n_trials, seed)
    if trial_runner is None:
        trial_runner = _sh_trial_runner(base_args)

    meshes: List[Optional[MeshSpec]] = [None] * max(1, slices)
    if slices > 1:
        import jax

        devices = jax.devices()
        if len(devices) % slices != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible into {slices} slices"
            )
        per = len(devices) // slices
        meshes = [
            MeshSpec(data=per, model=1,
                     device_indices=tuple(range(s * per, (s + 1) * per)))
            for s in range(slices)
        ]

    records = [
        {"trial": i, "overrides": o, "rungs": []}
        for i, o in enumerate(trials)
    ]
    survivors = list(records)
    for rung, budget in enumerate(budgets):
        print(f"=== SH rung {rung}: {len(survivors)} trials → "
              f"{budget} epochs ===")

        def one(k: int, s: Dict) -> Dict:
            resume = (s["last"].get("resume_checkpoint")
                      if s.get("last") else None)
            return trial_runner(
                s["trial"], s["overrides"], budget, resume,
                meshes[k % len(meshes)],
            )

        if slices > 1:
            with ThreadPoolExecutor(max_workers=slices) as pool:
                futures = [pool.submit(one, k, s)
                           for k, s in enumerate(survivors)]
                results = [f.result() for f in futures]
        else:
            results = [one(k, s) for k, s in enumerate(survivors)]
        for s, r in zip(survivors, results):
            s["last"] = r
            s["rungs"].append({
                "rung": rung, "epochs": budget,
                "best_val_auc": r["best_val_auc"],
            })
        if rung < len(budgets) - 1:
            keep = max(1, math.ceil(len(survivors) / eta))
            survivors = sorted(
                survivors, key=lambda s: -s["last"]["best_val_auc"]
            )[:keep]
            print(f"promoted {keep}: trials "
                  f"{[s['trial'] for s in survivors]}")

    best = max(survivors, key=lambda s: s["last"]["best_val_auc"])
    print(f"SH best: trial {best['trial']} overrides={best['overrides']} "
          f"val_auc={best['last']['best_val_auc']:.4f}")
    return {"budgets": budgets, "trials": records, "best": best}


def main():  # pragma: no cover
    args = parse_args()
    if args.search == "none":
        train_with_hptune(args)
        return
    import json as _json

    space = None
    if args.search_space:
        space = {
            k: tuple(v) for k, v in _json.loads(args.search_space).items()
        }
    if args.search == "random":
        run_random_search(args, space, n_trials=args.search_trials,
                          slices=args.search_slices, seed=args.search_seed)
    else:
        run_successive_halving(
            args, space, n_trials=args.search_trials,
            slices=args.search_slices, seed=args.search_seed,
            eta=args.search_eta, min_epochs=args.search_min_epochs,
        )


if __name__ == "__main__":  # pragma: no cover
    main()
