"""End-to-end HP-sweep artifact demo (the reference's run-1 vs run-2 HP
sweeps, `evals/hptune_run_{1,2}_details.json` + the sweep-comparison cell
of `evals/evals.ipynb`): run two small in-process sweeps via
`run_sweep` on the preprocessed demo splits, aggregate each with the
hptune collector, and render the sweep-vs-sweep comparison plot.

Requires the preprocessed splits from scripts/full_scale_demo.py in
--workdir (run that first).

Run on the TPU chip:
  PYTHONPATH=/root/repo python scripts/hp_sweep_demo.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/full_scale_demo")
    ap.add_argument("--outdir", default="demo_results")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch_size", type=int, default=64)
    args = ap.parse_args()

    from neural_vit_tpu.evals.collect_runs import collect_runs
    from neural_vit_tpu.evals.plots import plot_sweep_comparison
    from neural_vit_tpu.training import hptune

    for split in ("train", "val", "test"):
        p = f"{args.workdir}/{split}_pre.parquet"
        if not os.path.exists(p):
            raise SystemExit(
                f"{p} missing — run scripts/full_scale_demo.py first"
            )

    # Sweep grids mirror the reference's two Vertex HP runs: run 1 searches
    # the LR axis, run 2 the regularization axis around run 1's winner.
    # base --lr is pre-scaling: config_from_args applies the reference's
    # linear rule lr·batch/16 (batch 64 ⇒ ×4).
    sweeps = {
        "run1": [
            {"lr": 0.50e-4},   # effective 2e-4
            {"lr": 0.75e-4},   # effective 3e-4 (the full-demo operating point)
            {"lr": 1.50e-4},   # effective 6e-4
        ],
        "run2": [
            {"lr": 0.75e-4, "dropout": 0.1, "drop_path": 0.05},
            {"lr": 0.75e-4, "dropout": 0.3, "drop_path": 0.15},
        ],
    }

    details = []
    report = {"epochs": args.epochs, "batch_size": args.batch_size,
              "sweeps": {}}
    for name, overrides in sweeps.items():
        out_root = f"{args.workdir}/sweeps/{name}"
        base = hptune.parse_args([
            "--train_path", f"{args.workdir}/train_pre.parquet",
            "--val_path", f"{args.workdir}/val_pre.parquet",
            "--test_path", f"{args.workdir}/test_pre.parquet",
            "--output_dir", out_root,
            "--epochs", str(args.epochs),
            "--batch_size", str(args.batch_size),
            # TPU perf configuration (quality-gated: ROOFLINE.md) + remat
            # so production-dims N=1952 training fits one chip alongside
            # the device-resident split.
            "--gelu", "quick", "--pool", "probe",
            "--remat", "--device_resident",
        ])
        t0 = time.perf_counter()
        results = hptune.run_sweep(base, overrides, slices=1)
        wall = round(time.perf_counter() - t0, 1)

        os.makedirs(f"{args.outdir}", exist_ok=True)
        collected = collect_runs(
            out_root,
            output_path=f"{args.outdir}/hptune_{name}_details.json",
        )
        details.append((name, collected))
        best = max(results, key=lambda r: r.get("test_auc", 0.0))
        report["sweeps"][name] = {
            "wall_s": wall,
            "trials": [
                {"overrides": r["overrides"],
                 "best_val_auc": r.get("best_val_auc"),
                 "test_auc": r.get("test_auc")}
                for r in results
            ],
            "best": {"overrides": best["overrides"],
                     "test_auc": best.get("test_auc")},
        }
        print(f"{name}: best {best['overrides']} → "
              f"test AUC {best.get('test_auc'):.4f} ({wall}s)", flush=True)

    plot = plot_sweep_comparison(details, f"{args.outdir}/plots")
    report["sweep_comparison_plot"] = plot
    out = f"{args.outdir}/hp_sweep_demo.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(f"Report → {out}; plot → {plot}", flush=True)


if __name__ == "__main__":
    main()
