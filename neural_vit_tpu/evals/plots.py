"""Evaluation plots — script equivalent of the reference's `evals.ipynb`
(14 cells: loss/AUC/acc curves per run, ViT-vs-baseline test AUC/acc bars,
summary table, HP-vs-test-AUC scatter).

Consumes the collectors' outputs (`collect_runs` / `collect_baselines`) and
writes PNGs; usable headless on a TPU VM.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _metric_series(run: Dict, key: str):
    """Reconstruct an epoch series for `key` from a run's records if present,
    else fall back to (best, last)."""
    recs = run.get("records")
    if recs:
        pts = [(r["step"], r[key]) for r in recs if key in r and r.get("step")]
        if pts:
            pts.sort()
            return [p[0] for p in pts], [p[1] for p in pts]
    return None, None


def plot_run_curves(run_details: Dict, output_dir: str) -> List[str]:
    """Per-run loss/acc/AUC curves (needs raw records; collectors keep
    summaries only, so this re-reads the JSONL files)."""
    os.makedirs(output_dir, exist_ok=True)
    written = []
    for run_id, run in run_details.get("runs", {}).items():
        series: Dict[str, tuple] = {}
        for path in run.get("files", []):
            if not os.path.exists(path):
                continue
            for line in open(path, encoding="utf-8"):
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                step = rec.get("step")
                if step is None:
                    continue
                for k, v in rec.items():
                    if k == "step" or not isinstance(v, (int, float)):
                        continue
                    series.setdefault(k, ([], []))
                    series[k][0].append(step)
                    series[k][1].append(v)
        if not series:
            continue
        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        for ax, metric in zip(axes, ("loss", "acc", "auc")):
            for key, (xs, ys) in sorted(series.items()):
                if key.endswith("/" + metric):
                    ax.plot(xs, ys, marker="o", ms=3, label=key)
            ax.set_title(metric)
            ax.set_xlabel("epoch")
            ax.legend(fontsize=8)
        fig.suptitle(run_id)
        out = os.path.join(output_dir, f"curves_{run_id}.png")
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        plt.close(fig)
        written.append(out)
    return written


def plot_vit_vs_baselines(
    run_details: Dict, baselines: List[Dict], output_dir: str
) -> Optional[str]:
    """Test AUC/acc bars: each ViT run vs each baseline run."""
    os.makedirs(output_dir, exist_ok=True)
    names, aucs, accs = [], [], []
    for run_id, run in run_details.get("runs", {}).items():
        m = run.get("metrics", {})
        if "test/auc" in m:
            names.append(f"vit:{run_id[-6:]}")
            aucs.append(m["test/auc"]["last"])
            accs.append(m.get("test/acc", {}).get("last", float("nan")))
    for b in baselines:
        t = b.get("metrics", {}).get("test", {})
        if "auc" in t:
            names.append(f"{b['model']}:{(b.get('timestamp') or '')[-6:]}")
            aucs.append(t["auc"])
            accs.append(t.get("accuracy", float("nan")))
    if not names:
        return None
    fig, axes = plt.subplots(1, 2, figsize=(max(8, len(names)), 4))
    for ax, vals, title in ((axes[0], aucs, "test AUC"), (axes[1], accs, "test acc")):
        ax.bar(range(len(names)), vals)
        ax.set_xticks(range(len(names)))
        ax.set_xticklabels(names, rotation=45, ha="right", fontsize=8)
        ax.set_title(title)
        ax.set_ylim(0, 1.05)
    out = os.path.join(output_dir, "vit_vs_baselines.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_hp_scatter(
    run_details: Dict, param: str, output_dir: str
) -> Optional[str]:
    """HP value vs test AUC scatter across trials."""
    os.makedirs(output_dir, exist_ok=True)
    xs, ys = [], []
    for run in run_details.get("runs", {}).values():
        p = run.get("params", {})
        m = run.get("metrics", {})
        if param in p and "test/auc" in m:
            try:
                xs.append(float(p[param]))
                ys.append(m["test/auc"]["last"])
            except (TypeError, ValueError):
                continue
    if not xs:
        return None
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.scatter(xs, ys)
    ax.set_xlabel(param)
    ax.set_ylabel("test AUC")
    out = os.path.join(output_dir, f"hp_{param}_vs_test_auc.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def _sweep_auc_stats(run_details: Dict) -> Optional[Dict]:
    """Per-sweep test-AUC distribution over trials."""
    aucs = [
        run["metrics"]["test/auc"]["last"]
        for run in run_details.get("runs", {}).values()
        if "test/auc" in run.get("metrics", {})
    ]
    if not aucs:
        return None
    n = len(aucs)
    mean = sum(aucs) / n
    var = sum((a - mean) ** 2 for a in aucs) / max(n - 1, 1)
    return {
        "trials": n, "best": max(aucs), "mean": mean,
        "std": var ** 0.5, "min": min(aucs),
    }


def plot_sweep_comparison(
    sweeps: List[tuple], output_dir: str
) -> Optional[str]:
    """HP-sweep-vs-sweep comparison (the reference notebook's run-1 vs run-2
    cell, `evals/evals.ipynb` cell 13): per-sweep best/mean/min test AUC as
    grouped bars, plus a stats line per sweep.

    Args:
        sweeps: list of (label, run_details_dict) — one entry per sweep's
            collector output (e.g. hptune run 1 and run 2).
    """
    os.makedirs(output_dir, exist_ok=True)
    labeled = []
    for label, details in sweeps:
        stats = _sweep_auc_stats(details)
        if stats:
            labeled.append((label, stats))
    if len(labeled) < 2:
        return None
    fig, ax = plt.subplots(figsize=(max(8, 5 * len(labeled)), 5))
    width = 0.25
    xs = range(len(labeled))
    for off, key in ((-width, "best"), (0.0, "mean"), (width, "min")):
        vals = [s[key] for _, s in labeled]
        bars = ax.bar([x + off for x in xs], vals, width, label=key)
        for bar, v in zip(bars, vals):
            ax.annotate(f"{v:.3f}",
                        (bar.get_x() + bar.get_width() / 2, bar.get_height()),
                        xytext=(0, 3), textcoords="offset points",
                        ha="center", fontsize=8)
    ax.set_xticks(list(xs))
    ax.set_xticklabels(
        [f"{label}\n(n={s['trials']}, σ={s['std']:.3f})"
         for label, s in labeled],
        fontsize=9,
    )
    ax.set_ylabel("test AUC")
    ax.set_title("HP sweep comparison")
    ax.legend()
    ax.grid(True, alpha=0.3, axis="y")
    out = os.path.join(output_dir, "sweep_comparison.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def summary_table(run_details: Dict, baselines: List[Dict]) -> str:
    lines = [f"{'run':40s} {'test_acc':>9s} {'test_auc':>9s}"]
    for run_id, run in run_details.get("runs", {}).items():
        m = run.get("metrics", {})
        acc = m.get("test/acc", {}).get("last", float("nan"))
        auc = m.get("test/auc", {}).get("last", float("nan"))
        lines.append(f"{run_id:40s} {acc:9.4f} {auc:9.4f}")
    for b in baselines:
        t = b.get("metrics", {}).get("test", {})
        lines.append(
            f"{b['model']:40s} {t.get('accuracy', float('nan')):9.4f} "
            f"{t.get('auc', float('nan')):9.4f}"
        )
    return "\n".join(lines)


def main(argv=None):  # pragma: no cover
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_details", default="run_details.json")
    ap.add_argument("--baselines", default="baseline_results.json")
    ap.add_argument("--output_dir", default="eval_plots")
    ap.add_argument("--hp_params", nargs="*", default=["lr", "dropout"])
    ap.add_argument(
        "--compare_sweeps", nargs="*", default=[],
        help="label=details.json pairs; ≥2 produce the sweep-vs-sweep plot",
    )
    args = ap.parse_args(argv)
    runs = json.load(open(args.run_details)) if os.path.exists(args.run_details) else {}
    bases = json.load(open(args.baselines)) if os.path.exists(args.baselines) else []
    plot_run_curves(runs, args.output_dir)
    plot_vit_vs_baselines(runs, bases, args.output_dir)
    for p in args.hp_params:
        plot_hp_scatter(runs, p, args.output_dir)
    if args.compare_sweeps:
        sweeps = []
        for spec in args.compare_sweeps:
            label, path = spec.split("=", 1)
            if os.path.exists(path):
                sweeps.append((label, json.load(open(path))))
        plot_sweep_comparison(sweeps, args.output_dir)
    print(summary_table(runs, bases))


if __name__ == "__main__":  # pragma: no cover
    main()
