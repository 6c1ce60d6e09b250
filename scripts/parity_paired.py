"""PAIRED head-to-head parity experiment: torch reference vs our JAX loop
with the init-noise and data-order variance terms REMOVED.

The unpaired head-to-head (scripts/parity_head_to_head.py, round 4) failed
the fixed |Δ best-val AUC| ≤ 0.01 bar at Δ=0.018 with per-seed σ≈0.03 —
an experiment that by power analysis only resolves ±0.017 at 6v6 seeds.
This experiment kills the two dominant variance terms per seed:

  1. **Identical init**: the reference's own `build_model` output is
     captured (observationally — a wrapper around the unmodified function)
     and its state_dict transplanted into the flax params
     (`utils/transplant.py`; layouts are deliberately compatible). A
     logit-parity assert on the transplanted weights guards the mapping.
  2. **Identical batch order**: the torch DataLoader's realized sample
     order is recorded per epoch (an observational `__getitem__` wrapper
     on the unmodified reference dataset) and replayed by our train
     iterator (`DataLoaderConfig.order_schedule_path`).

Both arms then train the same protocol as round 4 (tiny model, 126/58
spectrograms → (64, 72) volumes → N=289 tokens, constant LR AdamW 3e-4 /
wd 0.01, class-weighted CE + smoothing 0.05, dropout 0.2/0.1/0.1,
best-val_acc checkpointing, fixed epochs, f32 compute). The ONLY residual
stochastic difference is the dropout/drop-path mask streams (torch global
RNG vs counter-based JAX PRNG) — exactly the term that cannot be aligned
across frameworks and whose per-seed contribution the paired design
averages out.

Per seed the artifact records the PAIRED delta (torch − jax) of best-val
AUC; the gate is |mean paired Δ| ≤ 0.01 over ≥5 seeds (BASELINE.md bar).

Run:  PYTHONPATH=/root/repo python scripts/parity_paired.py \
          [--seeds 0,1,2,3,4] [--jax-platform tpu] [--smoke]

Torch arm ≈25 min/seed on this 1-core CPU box; the JAX arm is minutes on
TPU. Reference files exercised unmodified:
/root/reference/temporal_vit/training/train.py:108-305 (train loop),
data/data_loader.py:80-243 (dataset + loaders), models/model.py:181-323.
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------- torch arm
def run_torch_recorded(pre, args, seed):
    """Run the UNMODIFIED reference train() while recording (a) the initial
    model state_dict and (b) the realized per-epoch train sample order.

    Returns (metrics_entry, dims, init_npz_path, orders_npz_path)."""
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import torch

        import temporal_vit.training.train as ref_train_mod
        from temporal_vit.data import data_loader as ref_dl
        from temporal_vit.data.data_loader import (
            DataLoaderConfig as RefLoaderCfg,
        )
        from temporal_vit.training.config import TrainConfig as RefTrainConfig
    finally:
        sys.path.remove(REFERENCE_ROOT)

    torch.manual_seed(seed)
    out_dir = f"{args.workdir}/torch_runs"
    run_name = f"paired-torch-{seed}"
    cfg = RefTrainConfig(
        train_paths=[pre["train"]], val_paths=[pre["val"]],
        test_paths=[pre["test"]],
        use_preprocessed=True,
        output_dir=out_dir,
        run_name=run_name,
        device="cpu",
        epochs=args.epochs,
        lr=3e-4, weight_decay=0.01, label_smoothing=0.05,
        n_trials=8, stride=4,
        model_size="tiny",
        dropout=0.2, attention_dropout=0.1, drop_path=0.1,
        loader=RefLoaderCfg(batch_size=args.batch, num_workers=0),
    )

    captured = {}
    calls = []
    orig_build = ref_train_mod.build_model
    orig_getitem = ref_dl.ParquetSequenceDataset.__getitem__

    def capturing_build(tcfg, freq_size, time_size):
        model = orig_build(tcfg, freq_size, time_size)
        captured["sd"] = {
            k: v.detach().cpu().numpy().copy()
            for k, v in model.state_dict().items()
        }
        captured["dims"] = (freq_size, time_size)
        return model

    def recording_getitem(self, idx):
        calls.append((id(self), idx))
        return orig_getitem(self, idx)

    ref_train_mod.build_model = capturing_build
    ref_dl.ParquetSequenceDataset.__getitem__ = recording_getitem
    t0 = time.perf_counter()
    try:
        ref_train_mod.train(cfg)
    finally:
        ref_train_mod.build_model = orig_build
        ref_dl.ParquetSequenceDataset.__getitem__ = orig_getitem
    wall = time.perf_counter() - t0

    # --- batch order: the train dataset is the instance with the most
    # __getitem__ calls (1 infer_input_dims probe + epochs × n samples;
    # val/test see only epochs × n_val + n_test eval passes).
    by_inst = {}
    for inst, idx in calls:
        by_inst.setdefault(inst, []).append(idx)
    train_calls = max(by_inst.values(), key=len)
    counts = sorted(len(v) for v in by_inst.values())
    n_train = (len(train_calls) - 1) // args.epochs
    assert len(train_calls) == 1 + args.epochs * n_train, (
        f"unexpected train __getitem__ count {len(train_calls)} "
        f"(per-instance counts {counts})"
    )
    assert train_calls[0] == 0, "first call should be the infer probe"
    orders = np.asarray(train_calls[1:], np.int64).reshape(
        args.epochs, n_train
    )
    want = np.arange(n_train)
    for e in range(args.epochs):
        assert np.array_equal(np.sort(orders[e]), want), (
            f"epoch {e} order is not a permutation of {n_train}"
        )

    os.makedirs(f"{args.workdir}/paired", exist_ok=True)
    init_npz = f"{args.workdir}/paired/init_{seed}.npz"
    orders_npz = f"{args.workdir}/paired/orders_{seed}.npz"
    np.savez(init_npz, **captured["sd"])
    np.savez(orders_npz, orders=orders)

    # --- metric trajectory from the JSONL sink (the reference's record).
    files = sorted(glob.glob(f"{out_dir}/{run_name}/metrics/*.jsonl"))
    rows = []
    for f in files:
        with open(f) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    epochs, final = {}, {}
    for r in rows:
        step = r.pop("step", None)
        m = {k.replace("/", "_"): v for k, v in r.items()}
        if "val_auc" in m:
            epochs[step] = m
        if "test_auc" in m:
            final = m
    history = [dict(epoch=e, **epochs[e]) for e in sorted(epochs)]
    val_aucs = [h["val_auc"] for h in history]
    entry = {
        "seed": seed,
        "wall_s": round(wall, 1),
        "n_train_sequences": int(n_train),
        "history": history,
        "final_val_auc": val_aucs[-1],
        "best_val_auc": max(val_aucs),
        "last5_val_auc": sum(val_aucs[-5:]) / len(val_aucs[-5:]),
        "test_auc": final.get("test_auc", float("nan")),
        "test_acc": final.get("test_acc", float("nan")),
    }
    return entry, captured["dims"], init_npz, orders_npz


# ------------------------------------------------------- transplant + check
def transplant_and_check(pre, args, seed, dims, init_npz, flash=True):
    """torch init → flax params; assert logit parity on real data; save a
    warm-start checkpoint our train() resumes from. Returns its path."""
    import jax
    import jax.numpy as jnp

    from neural_vit_tpu.data.loader import SpectrogramDataset
    from neural_vit_tpu.models.vit import Temporal3DViT
    from neural_vit_tpu.training.checkpoint import save_checkpoint
    from neural_vit_tpu.training.config import TrainConfig
    from neural_vit_tpu.training.loop import build_model_config
    from neural_vit_tpu.utils.transplant import (
        assert_same_tree,
        torch_state_dict_to_flax,
    )

    freq_size, time_size = dims
    sd = dict(np.load(init_npz))
    params = torch_state_dict_to_flax(sd)

    tc = TrainConfig(
        train_paths=[pre["train"]], val_paths=[pre["val"]],
        test_paths=[pre["test"]],
        model_size="tiny", n_trials=8, stride=4,
        dropout=0.2, attention_dropout=0.1, drop_path=0.1,
        gelu="erf", pool="cls", compute_dtype=args.compute_dtype,
        use_flash_attention=flash,
    )
    mcfg = build_model_config(tc, freq_size, time_size)
    model = Temporal3DViT(mcfg)
    sample = jnp.zeros((1, 8, freq_size, time_size), jnp.float32)
    ref_tree = model.init(jax.random.key(0), sample)["params"]
    assert_same_tree(ref_tree, params)

    # Logit parity on REAL preprocessed data: rebuild the torch model from
    # the captured init and compare eval-mode forwards.
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import torch

        from temporal_vit.models.model import (
            CONFIGS as REF_CONFIGS,
            Temporal3DViT as TorchViT,
        )
    finally:
        sys.path.remove(REFERENCE_ROOT)
    import dataclasses as _dc

    tcfg = _dc.replace(
        REF_CONFIGS["tiny"], n_trials=8, freq_size=freq_size,
        time_size=time_size, dropout=0.2, attention_dropout=0.1,
        drop_path=0.1,
    )
    tmodel = TorchViT(tcfg).eval()
    tmodel.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    ds = SpectrogramDataset.from_parquet(
        [pre["val"]], n_trials=8, stride=4
    )
    rows = ds.index.indices[:4]
    x = ds.specs[rows]                                  # (4, 8, F, T)
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x)).numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    err = float(np.max(np.abs(ours - theirs)))
    assert err < 5e-4, f"transplanted logit parity failed: max|Δ|={err}"
    print(f"[seed {seed}] transplant logit parity ok: max|Δ|={err:.2e}",
          flush=True)

    ckpt_dir = f"{args.workdir}/paired/ckpt_{seed}_{args.arm}"
    path = save_checkpoint(ckpt_dir, "transplant", params, mcfg,
                           extra={"source": "torch-init", "seed": seed})
    return path


# ------------------------------------------------------------------ jax arm
def run_jax_paired(pre, args, seed, ckpt_path, orders_npz, flash=True):
    """Our production train() warm-started from the transplanted torch init,
    replaying the torch arm's exact batch order."""
    from neural_vit_tpu.data.loader import DataLoaderConfig
    from neural_vit_tpu.training.config import TrainConfig
    from neural_vit_tpu.training.loop import train

    if getattr(args, "exact_dropout", False):
        # Mechanism-isolation arm: exact jax.random.bernoulli dropout in
        # place of the 8-bit bandwidth-lean path (ops/dropout.py) — same
        # expectation, different realized mask distribution.
        import jax as _jax
        import jax.numpy as _jnp

        import neural_vit_tpu.models.vit as _vit

        def _exact_dropout(x, rate, *, rng=None, deterministic=True):
            if deterministic or rate == 0.0:
                return x
            keep = _jax.random.bernoulli(rng, 1.0 - rate, x.shape)
            return _jnp.where(keep, x / (1.0 - rate), 0).astype(x.dtype)

        _vit.fused_dropout = _exact_dropout

    t0 = time.perf_counter()
    results = train(TrainConfig(
        use_flash_attention=flash,
        prng_impl=getattr(args, "prng_impl", "rbg"),
        train_paths=[pre["train"]], val_paths=[pre["val"]],
        test_paths=[pre["test"]],
        output_dir=f"{args.workdir}/jax_runs",
        run_name=f"paired-{args.arm}-{seed}",
        epochs=args.epochs, lr=3e-4, weight_decay=0.01,
        label_smoothing=0.05,
        n_trials=8, stride=4,
        model_size="tiny",
        dropout=0.2, attention_dropout=0.1, drop_path=0.1,
        gelu="erf", pool="cls",
        compute_dtype=args.compute_dtype,
        use_cosine_schedule=False,           # basic train() has no scheduler
        early_stopping_patience=0,           # fixed epochs, like train.py
        checkpoint_metric="val_acc",         # reference train.py:265
        seed=seed + getattr(args, "seed_offset", 0),
        resume_from=ckpt_path,
        loader=DataLoaderConfig(
            batch_size=args.batch, order_schedule_path=orders_npz
        ),
    ))
    wall = time.perf_counter() - t0
    val_aucs = [h["val/auc"] for h in results["history"]]
    return {
        "seed": seed,
        "compute_dtype": args.compute_dtype,
        "wall_s": round(wall, 1),
        "history": [
            {"epoch": h["epoch"],
             **{k.replace("/", "_"): v for k, v in h.items() if k != "epoch"}}
            for h in results["history"]
        ],
        "final_val_auc": val_aucs[-1],
        "best_val_auc": results["best_val_auc"],
        "last5_val_auc": sum(val_aucs[-5:]) / len(val_aucs[-5:]),
        "test_auc": results["test_auc"],
        "test_acc": results["test_acc"],
    }


# -------------------------------------------------------------------- main
def summarize(report, arm="jax"):
    pairs = [p for p in report["pairs"]
             if p.get("torch") and p.get(arm)]
    if not pairs:
        return
    deltas = [p["torch"]["best_val_auc"] - p[arm]["best_val_auc"]
              for p in pairs]
    d5 = [p["torch"]["last5_val_auc"] - p[arm]["last5_val_auc"]
          for p in pairs]

    def epoch_mean(e):
        aucs = [h["val_auc"] for h in e["history"]]
        return sum(aucs) / len(aucs)

    # Epoch-mean val AUC: best-val is a max over ~15 draws with per-epoch
    # noise σ≈0.03-0.04, so its paired delta stays noisy even with init
    # and data matched; the epoch mean averages that noise and is the
    # sharpest detector of a systematic training-dynamics difference.
    dmean = [epoch_mean(p["torch"]) - epoch_mean(p[arm]) for p in pairs]
    n = len(deltas)
    mean = sum(deltas) / n
    var = (sum((d - mean) ** 2 for d in deltas) / (n - 1)) if n > 1 else 0.0
    sd = var ** 0.5
    sem = sd / n ** 0.5 if n > 1 else float("nan")
    comparison = {
        "arm": arm,
        "design": "paired per seed: identical torch init (transplanted) + "
                  "identical batch order (recorded/replayed); residual "
                  "noise = dropout mask streams only",
        "gate": "|mean paired Δ best_val_auc| <= 0.01 with >=5 paired seeds",
        "n_pairs": n,
        "paired_deltas_best_val_auc": deltas,
        "mean_delta_torch_minus_jax": mean,
        "sd_delta": sd,
        "sem_delta": sem,
        "mean_delta_last5_val_auc": sum(d5) / n,
        "paired_deltas_epoch_mean_val_auc": dmean,
        "mean_delta_epoch_mean_val_auc": sum(dmean) / n,
        "pass": bool(n >= 5 and abs(mean) <= 0.01),
    }
    report.setdefault("comparisons", {})[arm] = comparison
    if arm == "jax":
        report["comparison"] = comparison
    print(json.dumps(comparison, indent=2), flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sessions", type=int, default=32)
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--nperseg", type=int, default=126)
    ap.add_argument("--noverlap", type=int, default=58)
    ap.add_argument("--seeds", default="0,1,2,3,4")
    ap.add_argument("--workdir", default="/tmp/parity_paired")
    ap.add_argument("--outdir", default="demo_results")
    ap.add_argument("--arm", default="jax",
                    help="artifact key for the JAX arm — mechanism "
                         "isolation runs store side arms (e.g. "
                         "'jax_noflash') next to the default without "
                         "touching its pairs")
    ap.add_argument("--no-flash", action="store_true",
                    help="disable the flash-attention kernel (XLA "
                         "attention path): isolates the flash TRAIN path "
                         "(in-kernel counter-hash attention dropout + "
                         "custom-VJP backward) as a mechanism, since eval "
                         "logit parity is exact either way")
    ap.add_argument("--seed-offset", type=int, default=0,
                    help="offset added to the JAX arm's seed (dropout "
                         "stream ONLY — init and batch order stay the "
                         "torch record's): a replicate arm at a nonzero "
                         "offset measures the pure mask-stream noise "
                         "floor of the paired deltas")
    ap.add_argument("--prng-impl", default="rbg",
                    help="JAX PRNG impl for the dropout stream (mechanism "
                         "arm: 'threefry' vs the default hardware 'rbg')")
    ap.add_argument("--exact-dropout", action="store_true",
                    help="mechanism arm: exact bernoulli dropout instead "
                         "of the 8-bit fused path")
    ap.add_argument("--compute-dtype", default="float32",
                    help="JAX-side compute dtype; the torch arm is f32 CPU, "
                         "so the matched config is float32")
    ap.add_argument("--jax-platform", default=None,
                    help="'tpu' runs the JAX arm on the chip (fast; matmul "
                         "precision is forced to 'highest' so f32 stays "
                         "true f32 on the MXU), 'cpu' forces CPU")
    ap.add_argument("--smoke", action="store_true",
                    help="minutes-scale plumbing check (tiny data, 2 epochs)")
    args = ap.parse_args()

    if args.jax_platform and args.jax_platform != "tpu":
        # 'tpu' must stay UNFORCED: the axon tunnel registers as the
        # default backend, while jax_platforms='tpu' selects the local
        # libtpu plugin, which has no device here ("No jellyfish device").
        import jax

        jax.config.update("jax_platforms", args.jax_platform)
    if args.jax_platform != "cpu":
        # On TPU, 'default' matmul precision computes f32 dots via one-pass
        # bf16 — a systematic arm difference the paired design must not
        # carry. 'highest' keeps f32 true f32 (negligible cost at tiny
        # dims). No-op on CPU.
        import jax

        jax.config.update("jax_default_matmul_precision", "highest")
    from neural_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    if args.smoke:
        args.sessions, args.trials, args.epochs = 16, 48, 2
        args.seeds = "0"
        args.workdir += "_smoke"
        # A smoke pass must never seed the real artifact: its 2-epoch
        # entries would make the full run skip those seeds as "done".
        args.outdir = args.outdir.rstrip("/") + "/smoke"

    # Reuse the unpaired experiment's dataset builder (same calibrated
    # synthetic profile, seed-42 splits, our preprocessing for both arms).
    from scripts.parity_head_to_head import build_data

    out_path = f"{args.outdir}/parity_paired.json"
    report = {"pairs": []}
    if os.path.exists(out_path):
        with open(out_path) as f:
            report = json.load(f)
    report["protocol"] = dict(vars(args))

    pre, n_rows = build_data(args)
    print(f"data ready: {n_rows} trials → {pre}", flush=True)

    def save():
        os.makedirs(args.outdir, exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2, default=str)

    by_seed = {p["seed"]: p for p in report["pairs"]}
    for seed in [int(s) for s in args.seeds.split(",")]:
        pair = by_seed.setdefault(seed, {"seed": seed})
        if pair not in report["pairs"]:
            report["pairs"].append(pair)
        if not pair.get("torch"):
            print(f"=== torch arm (recorded), seed {seed} ===", flush=True)
            entry, dims, init_npz, orders_npz = run_torch_recorded(
                pre, args, seed
            )
            pair["torch"] = entry
            pair["dims"] = list(dims)
            pair["init_npz"] = init_npz
            pair["orders_npz"] = orders_npz
            print(json.dumps({k: v for k, v in entry.items()
                              if k != "history"}), flush=True)
            save()
        if not pair.get(args.arm):
            print(f"=== {args.arm} arm (paired), seed {seed} ===",
                  flush=True)
            ckpt = transplant_and_check(
                pre, args, seed, tuple(pair["dims"]), pair["init_npz"],
                flash=not args.no_flash,
            )
            pair[args.arm] = run_jax_paired(
                pre, args, seed, ckpt, pair["orders_npz"],
                flash=not args.no_flash,
            )
            pair[f"delta_best_val_auc_{args.arm}"] = (
                pair["torch"]["best_val_auc"]
                - pair[args.arm]["best_val_auc"]
            )
            print(json.dumps({k: v for k, v in pair[args.arm].items()
                              if k != "history"}), flush=True)
            save()
        summarize(report, args.arm)
        save()
    print(f"report → {out_path}", flush=True)


if __name__ == "__main__":
    main()
