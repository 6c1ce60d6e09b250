"""HP search demo: successive halving vs a fixed grid at EQUAL epoch budget.

The reference's search intelligence lives in the Vertex tuner (Bayesian
trials + bad-trial early termination — launch_hptune.sh:16 yaml,
train_hptune.py:182-189 per-epoch reports). This demo shows the in-repo
equivalent (`training/hptune.py::run_successive_halving`) beating the
fixed-grid protocol at the same total training budget:

  * fixed grid: 4 hand-picked configs × 12 epochs  = 48 epoch-units
  * successive halving: 9 sampled configs, eta=3, rungs 2/6/12 epochs
      → 9·2 + 3·6 + 1·12                           = 48 epoch-units

Same data (calibrated synthetic LFP → seed-42 splits → our preprocessing,
126/58 → (64, 72) volumes, N=289 'tiny'), same val-AUC objective the
reference tunes on. Writes demo_results/hptune_search.json.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/hptune_search_demo.py
      (TPU by default; --platform cpu for a dev box)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sessions", type=int, default=24)
    ap.add_argument("--trials", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workdir", default="/tmp/hptune_search_demo")
    ap.add_argument("--outdir", default="demo_results")
    ap.add_argument("--platform", default=None,
                    help="'cpu' forces the CPU backend (the default uses "
                         "the tunneled TPU)")
    args = ap.parse_args()
    if args.platform and args.platform != "tpu":
        import jax

        jax.config.update("jax_platforms", args.platform)
    from neural_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # Data: reuse the parity experiment's builder (identical protocol).
    from scripts.parity_head_to_head import build_data

    data_args = argparse.Namespace(
        workdir=args.workdir, sessions=args.sessions, trials=args.trials,
        nperseg=126, noverlap=58,
    )
    pre, n_rows = build_data(data_args)
    print(f"data ready: {n_rows} trials", flush=True)

    from neural_vit_tpu.training.hptune import (
        run_successive_halving,
        run_sweep,
    )

    base = argparse.Namespace(
        lr=3e-4, dropout=0.2, attention_dropout=0.1, drop_path=0.1,
        weight_decay=0.01, label_smoothing=0.05, epochs=args.epochs,
        batch_size=args.batch, n_trials=8, stride=4,
        early_stopping_patience=0, warmup_epochs=2, min_lr=1e-6,
        output_dir=f"{args.workdir}/runs",
        train_path=pre["train"], val_path=pre["val"],
        test_path=pre["test"],
        experiment_name=None, project_id=None, location=None,
        model_size="tiny", device_resident=True,
    )

    # Arm 1 — the fixed grid a careful human would sweep by hand
    # (lr × dropout lattice around the reference defaults).
    grid = [
        {"lr": 1e-4, "dropout": 0.1},
        {"lr": 1e-4, "dropout": 0.3},
        {"lr": 1e-3, "dropout": 0.1},
        {"lr": 1e-3, "dropout": 0.3},
    ]
    t0 = time.perf_counter()
    grid_results = run_sweep(base, grid, slices=1)
    grid_wall = time.perf_counter() - t0
    grid_best = max(grid_results, key=lambda r: r["best_val_auc"])

    # Arm 2 — successive halving over 9 random draws, same 48 epoch-units.
    space = {
        "lr": ("loguniform", 5e-5, 3e-3),
        "dropout": ("uniform", 0.0, 0.5),
        "weight_decay": ("loguniform", 1e-3, 1e-1),
    }
    t0 = time.perf_counter()
    sh = run_successive_halving(
        base, space, n_trials=9, seed=0, eta=3, min_epochs=2,
    )
    sh_wall = time.perf_counter() - t0
    sh_best = sh["best"]

    grid_units = len(grid) * args.epochs
    sh_units = sum(
        r["epochs"] for t in sh["trials"] for r in t["rungs"]
    )
    report = {
        "protocol": {
            "sessions": args.sessions, "trials": args.trials,
            "epochs": args.epochs, "batch": args.batch,
            "grid_epoch_units": grid_units, "sh_epoch_units": sh_units,
        },
        "grid": {
            "trials": [
                {"overrides": r["overrides"],
                 "best_val_auc": r["best_val_auc"],
                 "test_auc": r.get("test_auc")}
                for r in grid_results
            ],
            "best_val_auc": grid_best["best_val_auc"],
            "best_test_auc": grid_best.get("test_auc"),
            "best_overrides": grid_best["overrides"],
            "wall_s": round(grid_wall, 1),
        },
        "successive_halving": {
            "budgets": sh["budgets"],
            "trials": [
                {"overrides": t["overrides"], "rungs": t["rungs"]}
                for t in sh["trials"]
            ],
            "best_val_auc": sh_best["last"]["best_val_auc"],
            "best_test_auc": sh_best["last"].get("test_auc"),
            "best_overrides": sh_best["overrides"],
            "wall_s": round(sh_wall, 1),
        },
    }
    report["search_beats_grid"] = bool(
        report["successive_halving"]["best_val_auc"]
        >= report["grid"]["best_val_auc"]
    )
    os.makedirs(args.outdir, exist_ok=True)
    out = f"{args.outdir}/hptune_search.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("protocol", "search_beats_grid")}, indent=2))
    print(f"grid best {report['grid']['best_val_auc']:.4f} vs SH best "
          f"{report['successive_halving']['best_val_auc']:.4f}")
    print(f"report → {out}", flush=True)


if __name__ == "__main__":
    main()
