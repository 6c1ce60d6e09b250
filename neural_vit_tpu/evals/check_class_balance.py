"""Class-balance gate: streaming per-split label counts
(reference `data/check_class_balance.py:57-98`)."""

from __future__ import annotations

import argparse
from typing import Dict, List

import numpy as np

from neural_vit_tpu.data.parquet_io import open_dataset


def class_balance_report(paths: List[str], label_column: str = "condition") -> Dict:
    counts: Dict[str, int] = {}
    dataset = open_dataset(paths)
    for batch in dataset.scanner(columns=[label_column], batch_size=8192).to_batches():
        for value, n in zip(*np.unique(
            batch.column(0).to_numpy(zero_copy_only=False), return_counts=True
        )):
            counts[str(value)] = counts.get(str(value), 0) + int(n)
    total = sum(counts.values())
    return {
        "counts": counts,
        "percentages": {k: 100.0 * v / total for k, v in counts.items()}
        if total else {},
        "total": total,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--splits", nargs="+", required=True,
                    help="name=path pairs, e.g. train=/x/train.parquet")
    ap.add_argument("--label_column", default="condition")
    args = ap.parse_args(argv)
    for spec in args.splits:
        name, path = spec.split("=", 1)
        r = class_balance_report([path], args.label_column)
        pcts = ", ".join(f"{k}: {v} ({r['percentages'][k]:.1f}%)"
                         for k, v in r["counts"].items())
        print(f"[{name}] total={r['total']} | {pcts}")
    return 0


if __name__ == "__main__":  # pragma: no cover
    main()
