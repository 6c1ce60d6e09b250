"""Per-chip batch-size sweep of the full train step (run on the TPU chip).

The optimum moved before (round-2 sweep found a sharp peak at 128); kernel
cost-structure changes (dropout hash, patch-embed cast) can move it again,
so re-run after any kernel change: `python scripts/perf_batch_sweep.py
--batches 112 128 144 160`.
"""

import argparse

from bench import bench_train_throughput


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[112, 128, 144])
    args = ap.parse_args()
    results = {}
    for b in args.batches:
        results[b] = bench_train_throughput(batch=b)
        print(f"batch {b}: {results[b]:,.1f} volumes/sec/chip", flush=True)
    best = max(results, key=results.get)
    print(f"best: batch {best} at {results[best]:,.1f} v/s", flush=True)


if __name__ == "__main__":
    main()
