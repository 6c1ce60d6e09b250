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


# --- defensive Vertex Experiments param join ------------------------------
# The aiplatform SDK's experiment-run surface has churned across versions
# (get_experiment_df / ExperimentRun.list / Experiment.list_runs, params as
# method, property, or raw resource metadata). Like the reference
# (collect_run_details.py:230-323) we walk a chain of strategies and accept
# the first one that yields anything, so a collector built against one SDK
# version keeps working against another.

def _coerce_param_value(v):
    if isinstance(v, (int, float, bool, str)) or v is None:
        return v
    return str(v)


def _params_of_run(run_obj) -> Optional[Dict]:
    """Pull a param dict out of one experiment-run object, whatever its
    vintage: callable accessor, plain attribute, or raw resource metadata."""
    for name in ("get_params", "params", "parameters", "hyperparameters"):
        attr = getattr(run_obj, name, None)
        if attr is None:
            continue
        try:
            value = attr() if callable(attr) else attr
        except Exception:
            continue
        if isinstance(value, dict) and value:
            return {str(k): _coerce_param_value(v) for k, v in value.items()}
    meta = getattr(getattr(run_obj, "_gca_resource", None), "metadata", None)
    if isinstance(meta, dict):
        for key in ("parameters", "params", "hyperparameters"):
            if isinstance(meta.get(key), dict):
                return {str(k): _coerce_param_value(v)
                        for k, v in meta[key].items()}
    return None


def _run_name_of(run_obj) -> Optional[str]:
    for name in ("name", "run_name", "display_name", "resource_name"):
        value = getattr(run_obj, name, None)
        if isinstance(value, str) and value:
            return value.rsplit("/", 1)[-1]
    return None


def _strategy_experiment_df(aiplatform, experiment: str) -> Dict[str, Dict]:
    df = aiplatform.get_experiment_df(experiment)
    out = {}
    for _, row in df.iterrows():
        run_name = row.get("run_name")
        params = {
            k.replace("param.", ""): _coerce_param_value(v)
            for k, v in row.items()
            if isinstance(k, str) and k.startswith("param.")
        }
        if run_name:
            out[str(run_name)] = params
    return out


def _strategy_run_list(aiplatform, experiment: str) -> Dict[str, Dict]:
    lister = aiplatform.ExperimentRun.list
    runs = None
    for kwargs in ({"experiment": experiment}, {}):
        try:
            runs = list(lister(**kwargs))
            break
        except TypeError:
            continue
    out = {}
    for run in runs or []:
        name, params = _run_name_of(run), _params_of_run(run)
        if name and params is not None:
            out[name] = params
    return out


def _strategy_experiment_obj(aiplatform, experiment: str) -> Dict[str, Dict]:
    exp = aiplatform.Experiment(experiment)
    runs = None
    for name in ("list_runs", "get_experiment_runs"):
        method = getattr(exp, name, None)
        if method is None:
            continue
        try:
            runs = list(method())
            break
        except Exception:
            continue
    out = {}
    for run in runs or []:
        name, params = _run_name_of(run), _params_of_run(run)
        if name and params is not None:
            out[name] = params
    return out


def _load_experiment_params(
    experiment: str, project: Optional[str], location: Optional[str],
    aiplatform=None,
) -> Dict[str, Dict]:
    """Vertex Experiments param join across SDK versions; {} only when every
    strategy fails (runs still aggregate, just without joined params).

    `aiplatform` is injectable for tests (the SDK is absent in CI)."""
    if aiplatform is None:
        try:
            from google.cloud import aiplatform
        except ImportError:
            return {}
    try:
        aiplatform.init(project=project, location=location,
                        experiment=experiment)
    except Exception:
        return {}
    for strategy in (_strategy_experiment_df, _strategy_run_list,
                     _strategy_experiment_obj):
        try:
            params = strategy(aiplatform, experiment)
        except Exception:
            continue
        if params:
            return params
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
