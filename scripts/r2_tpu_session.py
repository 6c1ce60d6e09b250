"""One-process TPU measurement session for the round-2 pending A/Bs.

Runs, in order, inside a single process (each stage guarded so a failure
doesn't kill the rest):
  1. bench baseline   — batch 128, quick-GELU, 26 MiB scoped VMEM, steps=N
  2. bench --tiled    — same, with the loader's pre-tiled pair layout
  3. staged-flash     — kernel-isolated fwd/bwd timing of the head-staged
                        experiment vs production (scripts/exp_flash_staged.py)

Why one process: the axon tunnel wedges if a TPU process is killed
mid-operation, and every extra process pays 45-100 s of first-compile —
a single session with value-fetch fences between stages is both faster
and safer.  Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/r2_tpu_session.py \
        [--steps 100] [--skip-staged]
"""

import argparse
import sys
import traceback


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--skip-staged", action="store_true")
    ap.add_argument("--vmem-sweep", action="store_true",
                    help="after the A/B, re-sweep scoped VMEM {24,28} MiB "
                         "on the winning layout")
    args = ap.parse_args()

    import jax
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    import bench

    results = {}
    for name, kw in [
        ("baseline", dict(tiled=False)),
        ("tiled", dict(tiled=True)),
    ]:
        try:
            results[name] = bench.bench_train_throughput(
                batch=128, steps=args.steps, gelu="quick",
                scoped_vmem_kib=26624, **kw)
            log(f"[{name}] {results[name]:,.1f} volumes/sec/chip")
        except Exception:
            log(f"[{name}] FAILED:")
            traceback.print_exc(file=sys.stderr)

    if "baseline" in results and "tiled" in results:
        delta = results["tiled"] / results["baseline"] - 1
        log(f"tiled vs baseline: {100 * delta:+.1f}%")

    if args.vmem_sweep and results:
        win = max(results, key=results.get)
        for kib in (24576, 28672):
            try:
                v = bench.bench_train_throughput(
                    batch=128, steps=args.steps, gelu="quick",
                    scoped_vmem_kib=kib, tiled=(win == "tiled"))
                log(f"[{win} vmem={kib // 1024}MiB] {v:,.1f} v/s")
            except Exception:
                traceback.print_exc(file=sys.stderr)

    if not args.skip_staged:
        try:
            sys.argv = ["exp_flash_staged.py", "--iters", "50"]
            import runpy
            runpy.run_path("scripts/exp_flash_staged.py", run_name="__main__")
        except Exception:
            log("staged-flash experiment FAILED:")
            traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
