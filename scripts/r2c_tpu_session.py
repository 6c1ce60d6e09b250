"""One-process TPU session: validate + bench the dual-hoist fused backward.

Stages (guarded):
  1. full-step bench at the operating point (batch 128, steps=100)
  2. on-chip flash numerics check (scripts/tpu_check_flash_dropout.py —
     fwd out + grad_v vs host-f64 with the bit-exact extracted mask)
  3. mini batch re-sweep {96, 160} — the kernel got faster; confirm the
     128 optimum did not move

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/r2c_tpu_session.py
"""

import runpy
import sys
import traceback


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    import bench

    results = {}
    try:
        results[128] = bench.bench_train_throughput(batch=128, steps=100)
        log(f"[dual-hoist bwd, batch 128] {results[128]:,.1f} v/s")
    except Exception:
        log("bench FAILED:")
        traceback.print_exc(file=sys.stderr)

    try:
        runpy.run_path("scripts/tpu_check_flash_dropout.py",
                       run_name="__main__")
    except Exception:
        log("numerics check FAILED:")
        traceback.print_exc(file=sys.stderr)

    for b in (96, 160):
        try:
            results[b] = bench.bench_train_throughput(batch=b, steps=100)
            log(f"[dual-hoist bwd, batch {b}] {results[b]:,.1f} v/s")
        except Exception:
            log(f"bench batch={b} FAILED:")
            traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
