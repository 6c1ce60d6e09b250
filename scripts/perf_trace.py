"""Profile the bench train step on the real TPU and print a per-kernel time
breakdown (aggregated XLA op/fusion durations from the xplane trace).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/perf_trace.py [--gelu tanh]
"""

import argparse
import glob
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neural_vit_tpu.core.config import CONFIGS
from neural_vit_tpu.models.vit import Temporal3DViT
from neural_vit_tpu.training.loop import TrainState, make_step_fns

BATCH = 256


def build(cfg, batch=BATCH, tiled=False, vmem_kib=0):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, cfg.n_trials, cfg.freq_size, cfg.time_size)), jnp.float32)
    if tiled:
        # the loader's pre-tiled pair layout (DataLoaderConfig.tile_patches)
        x = jnp.asarray(
            np.asarray(x)
            .reshape(batch, cfg.grid_k, cfg.patch_trial, cfg.grid_f,
                     cfg.patch_freq, cfg.grid_t, cfg.patch_time)
            .transpose(0, 1, 3, 5, 2, 4, 6)
            .reshape(batch, cfg.grid_k, cfg.grid_f, cfg.grid_t, cfg.patch_dim),
            jnp.bfloat16,
        )
    y = jnp.asarray(rng.integers(0, 2, batch))
    mask = jnp.ones(batch, jnp.float32)
    key = jax.random.key(1, impl="rbg")
    model = Temporal3DViT(cfg)
    variables = model.init(jax.random.key(0), x)
    tx = optax.adamw(3e-4, weight_decay=0.01)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(vmem_kib)}
            if vmem_kib and jax.default_backend() == "tpu" else None)
    ts, _ = make_step_fns(model, np.array([0.9, 1.1], np.float32), 0.05,
                          compiler_options=opts)
    return ts, state, (x, y, mask, key)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gelu", default="erf")
    ap.add_argument("--norm_dtype", default="float32")
    ap.add_argument("--attn_dropout", type=float, default=0.1)
    ap.add_argument("--dropout", type=float, default=0.2)
    ap.add_argument("--drop_path", type=float, default=0.1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--logdir", default="/tmp/jaxtrace")
    ap.add_argument("--tiled", action="store_true",
                    help="pre-tiled pair-layout input (loader tile_patches)")
    ap.add_argument("--vmem-kib", type=int, default=0,
                    help="xla_tpu_scoped_vmem_limit_kib (0 = default)")
    ap.add_argument("--pool", default="cls", choices=["cls", "mean", "probe"])
    ap.add_argument("--time_size", type=int, default=128)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    cfg = CONFIGS["small"].replace(
        dropout=args.dropout, attention_dropout=args.attn_dropout,
        drop_path=args.drop_path, gelu=args.gelu, norm_dtype=args.norm_dtype,
        pool=args.pool, time_size=args.time_size, remat=args.remat,
    )
    ts, state, (x, y, mask, key) = build(
        cfg, args.batch, tiled=args.tiled, vmem_kib=args.vmem_kib
    )
    t0 = time.perf_counter()
    state, m = ts(state, x, y, mask, key)
    jax.block_until_ready(m["loss_sum"])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(3):
        state, m = ts(state, x, y, mask, key)
    jax.block_until_ready(m["loss_sum"])

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            state, m = ts(state, x, y, mask, key)
        jax.block_until_ready(m["loss_sum"])

    paths = sorted(glob.glob(
        os.path.join(args.logdir, "plugins/profile/*/*.xplane.pb")))
    assert paths, f"no xplane under {args.logdir}"
    data = jax.profiler.ProfileData.from_file(paths[-1])

    # Aggregate device-plane event durations by (cleaned) op name.
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        per_name = defaultdict(float)
        count = defaultdict(int)
        total = 0.0
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip derived/step lines.
            if "step" in lname or "xla modules" in lname:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6  # ms
                per_name[ev.name] += dur
                count[ev.name] += 1
                total += dur
        if not per_name:
            continue
        print(f"\n=== plane: {plane.name} (sum {total:.1f} ms over "
              f"{args.steps} steps; async spans overlap compute and "
              f"double-count) ===")

        # Bucket by op family. Async DMA pairs (copy/slice-start) report
        # SPAN durations that overlap real compute — group them separately
        # so the sync bucket ranking is trustworthy.
        def family(name):
            base = name.lstrip("%").split(" ")[0]
            base = base.split(".")[0]
            return base

        fam_dur, fam_cnt = defaultdict(float), defaultdict(int)
        async_fams = ("copy-start", "slice-start", "copy-done", "slice-done",
                      "dynamic-slice-start", "dynamic-slice-done",
                      "all-reduce-start", "all-reduce-done", "copy")
        for name, dur in per_name.items():
            fam_dur[family(name)] += dur
            fam_cnt[family(name)] += count[name]
        print("--- sync op families (ms/step) ---")
        for fam, dur in sorted(fam_dur.items(), key=lambda kv: -kv[1]):
            tag = " [ASYNC-SPAN]" if fam in async_fams else ""
            print(f"{dur / args.steps:9.3f} ms/step  ×{fam_cnt[fam] // args.steps:<5d} {fam}{tag}")

        print("--- top sync ops ---")
        items = sorted(
            ((n, d) for n, d in per_name.items()
             if family(n) not in async_fams),
            key=lambda kv: -kv[1],
        )
        for name, dur in items[:40]:
            print(f"{dur / args.steps:9.3f} ms/step  ×{count[name] // args.steps:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
