"""Split-integrity gate: the leakage test for the session-stratified
protocol (reference `evals/check_split_integrity.py:57-88`).

Per split: row/session counts, class counts, mixed-label sessions.
Across splits: session overlap and duplicate (session, trial_num) keys.
Returns a report dict; `main` prints it and exits nonzero on leakage.
"""

from __future__ import annotations

import argparse
import sys
from itertools import combinations
from typing import Dict, List


from neural_vit_tpu.data.parquet_io import open_dataset


def split_report(paths: List[str]) -> Dict:
    df = open_dataset(paths).to_table(
        columns=["session", "condition", "trial_num"]
    ).to_pandas()
    sessions = df.groupby("session")["condition"].nunique()
    return {
        "rows": int(len(df)),
        "sessions": int(df.session.nunique()),
        "class_counts": df.condition.value_counts().to_dict(),
        "mixed_label_sessions": sessions[sessions > 1].index.tolist(),
        "_keys": set(zip(df.session, df.trial_num)),
        "_sessions": set(df.session),
    }


def check_integrity(split_paths: Dict[str, List[str]]) -> Dict:
    reports = {name: split_report(paths) for name, paths in split_paths.items()}
    overlaps = {}
    for a, b in combinations(reports, 2):
        overlaps[f"{a}~{b}"] = {
            "sessions": sorted(reports[a]["_sessions"] & reports[b]["_sessions"]),
            "trial_keys": len(reports[a]["_keys"] & reports[b]["_keys"]),
        }
    clean = {
        name: {k: v for k, v in r.items() if not k.startswith("_")}
        for name, r in reports.items()
    }
    leakage = any(
        o["sessions"] or o["trial_keys"] for o in overlaps.values()
    ) or any(r["mixed_label_sessions"] for r in clean.values())
    return {"splits": clean, "overlaps": overlaps, "leakage": leakage}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", nargs="+", required=True)
    ap.add_argument("--val", nargs="+", required=True)
    ap.add_argument("--test", nargs="+", required=True)
    args = ap.parse_args(argv)
    report = check_integrity(
        {"train": args.train, "val": args.val, "test": args.test}
    )
    for name, r in report["splits"].items():
        print(f"[{name}] rows={r['rows']} sessions={r['sessions']} "
              f"classes={r['class_counts']} mixed={r['mixed_label_sessions']}")
    for pair, o in report["overlaps"].items():
        print(f"[{pair}] session overlap={o['sessions']} "
              f"duplicate keys={o['trial_keys']}")
    if report["leakage"]:
        print("LEAKAGE DETECTED")
        return 1
    print("Splits are clean.")
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
