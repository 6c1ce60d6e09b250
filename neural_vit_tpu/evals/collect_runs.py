"""Aggregate training-run metrics from their JSONL sinks
(reference `evals/collect_run_details.py` and its HP-tune near-duplicate
`collect_hptune_details.py`, unified behind one `kind` switch).

Globs `**/metrics/*.jsonl` under a runs root (local or gs://), parses the
run id from the path, summarizes best/last metrics per run, and optionally
joins Vertex Experiment parameters. Output JSON schema matches the
reference's `run_details.json` consumers.
"""

from __future__ import annotations

import argparse
import json
import math
import os
from glob import glob
from typing import Dict, List, Optional


def _list_metrics_files(root: str) -> List[str]:
    if root.startswith("gs://"):
        import gcsfs

        fs = gcsfs.GCSFileSystem()
        return [f"gs://{p}" for p in fs.glob(f"{root.rstrip('/')}/**/metrics/*.jsonl")]
    return sorted(glob(os.path.join(root, "**", "metrics", "*.jsonl"), recursive=True))


def _read_lines(path: str) -> List[str]:
    if path.startswith("gs://"):
        import gcsfs

        fs = gcsfs.GCSFileSystem()
        with fs.open(path, "r") as f:
            return f.read().splitlines()
    with open(path, encoding="utf-8") as f:
        return f.read().splitlines()


def _run_id_from_path(path: str) -> str:
    # .../<run_id>/metrics/metrics_*.jsonl
    parts = path.rstrip("/").split("/")
    try:
        return parts[parts.index("metrics") - 1]
    except (ValueError, IndexError):
        return os.path.basename(os.path.dirname(path))


def _summarize(records: List[Dict]) -> Dict:
    """Best/last value per metric key (reference `_summarize_metrics`)."""
    summary: Dict[str, Dict] = {}
    last_step = None
    for rec in records:
        step = rec.get("step")
        for key, value in rec.items():
            if key == "step" or not isinstance(value, (int, float)):
                continue
            if isinstance(value, float) and math.isnan(value):
                continue
            entry = summary.setdefault(
                key, {"best": value, "best_step": step, "last": value,
                      "last_step": step},
            )
            better = value < entry["best"] if "loss" in key else value > entry["best"]
            if better:
                entry["best"], entry["best_step"] = value, step
            entry["last"], entry["last_step"] = value, step
        last_step = step
    return {"metrics": summary, "last_step": last_step, "n_records": len(records)}


def _load_experiment_params(
    experiment: str, project: Optional[str], location: Optional[str]
) -> Dict[str, Dict]:
    """Vertex Experiments param join; empty on any failure (the reference's
    defensive multi-API extraction, collect_run_details.py:230-323)."""
    try:
        from google.cloud import aiplatform

        aiplatform.init(project=project, location=location, experiment=experiment)
        df = aiplatform.get_experiment_df(experiment)
        out = {}
        for _, row in df.iterrows():
            run_name = row.get("run_name")
            params = {
                k.replace("param.", ""): v
                for k, v in row.items()
                if isinstance(k, str) and k.startswith("param.")
            }
            if run_name:
                out[str(run_name)] = params
        return out
    except Exception:
        return {}


def collect_runs(
    metrics_root: str,
    experiment: Optional[str] = None,
    project: Optional[str] = None,
    location: Optional[str] = None,
    output_path: Optional[str] = None,
) -> Dict:
    files = _list_metrics_files(metrics_root)
    runs: Dict[str, Dict] = {}
    for path in files:
        run_id = _run_id_from_path(path)
        records = []
        for line in _read_lines(path):
            line = line.strip()
            if not line:
                continue
            try:
                records.append(json.loads(line))
            except json.JSONDecodeError:
                continue
        if not records:
            continue
        entry = runs.setdefault(run_id, {"files": [], "records": []})
        entry["files"].append(path)
        entry["records"].extend(records)

    params_by_run = (
        _load_experiment_params(experiment, project, location) if experiment else {}
    )
    details = {}
    for run_id, entry in runs.items():
        details[run_id] = {
            "run_id": run_id,
            "files": entry["files"],
            **_summarize(entry["records"]),
            "params": params_by_run.get(run_id, {}),
        }
    result = {"metrics_root": metrics_root, "n_runs": len(details), "runs": details}
    if output_path:
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(result, f, indent=2)
        print(f"Wrote {output_path} ({len(details)} runs)")
    return result


def main(argv=None):  # pragma: no cover
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics_root", default="gs://lfp-temporal-vit/vertex-runs")
    ap.add_argument("--experiment", default=None)
    ap.add_argument("--project", default=None)
    ap.add_argument("--location", default=None)
    ap.add_argument("--output", default="run_details.json")
    args = ap.parse_args(argv)
    collect_runs(
        args.metrics_root, args.experiment, args.project, args.location,
        args.output,
    )


if __name__ == "__main__":  # pragma: no cover
    main()
