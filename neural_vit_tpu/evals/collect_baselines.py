"""Aggregate baseline metrics JSONs
(reference `evals/collect_baseline_results.py:113-186`)."""

from __future__ import annotations

import argparse
import json
import os
from glob import glob
from typing import Dict, List, Optional


def _list_jsons(root: str) -> List[str]:
    if root.startswith("gs://"):
        import gcsfs

        fs = gcsfs.GCSFileSystem()
        return [f"gs://{p}" for p in fs.glob(f"{root.rstrip('/')}/**/*.json")] + [
            f"gs://{p}" for p in fs.glob(f"{root.rstrip('/')}/*.json")
        ]
    return sorted(
        glob(os.path.join(root, "**", "*.json"), recursive=True)
    )


def _read_json(path: str) -> Optional[Dict]:
    try:
        if path.startswith("gs://"):
            import gcsfs

            fs = gcsfs.GCSFileSystem()
            with fs.open(path, "r") as f:
                return json.load(f)
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    except Exception:
        return None


def collect_baselines(root: str, output_path: Optional[str] = None) -> List[Dict]:
    entries = []
    for path in dict.fromkeys(_list_jsons(root)):
        payload = _read_json(path)
        if not payload or "metrics" not in payload:
            continue
        entries.append(
            {
                "source": path,
                "model": payload.get("model", "unknown"),
                "timestamp": payload.get("timestamp"),
                "feature_mode": payload.get("feature_mode"),
                "params": payload.get("params", {}),
                "metrics": payload["metrics"],
                "timing": payload.get("timing", {}),
            }
        )
    entries.sort(key=lambda e: (e["model"], e.get("timestamp") or ""))
    if output_path:
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(entries, f, indent=2)
        print(f"Wrote {output_path} ({len(entries)} baseline runs)")
    return entries


def main(argv=None):  # pragma: no cover
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="gs://lfp-baselines")
    ap.add_argument("--output", default="baseline_results.json")
    args = ap.parse_args(argv)
    collect_baselines(args.root, args.output)


if __name__ == "__main__":  # pragma: no cover
    main()
