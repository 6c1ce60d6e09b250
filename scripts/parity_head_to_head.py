"""Head-to-head implementation-parity experiment: the REFERENCE's own torch
`train()` (/root/reference/temporal_vit/training/train.py:108) vs our JAX
loop, trained on IDENTICAL preprocessed synthetic splits with matched
hyperparameters, comparing val/test AUC trajectories.

This converts "we match the published margin" into "we match the
implementation" — the strongest parity claim this environment permits
(real BigQuery data is unreachable; VERDICT r2 item 3).

Protocol:
  * one synthetic LFP dataset (calibrated profile, seed 42) → seed-42
    session-stratified splits → OUR fused preprocessing writes the
    preprocessed parquets BOTH implementations consume (preprocessing
    parity vs scipy is covered separately by tests/test_spectrogram.py);
  * spectrogram params 126/58 → (64, 72) volumes → N=289 tokens on the
    'tiny' config: small enough that the torch side is tractable on this
    1-core CPU box (the reference trained on an A100; hardware does not
    change the math);
  * reference config: tiny model, constant LR (the basic train() has no
    scheduler), AdamW 3e-4/wd 0.01, class-weighted CE + smoothing 0.05,
    dropout 0.2/0.1/0.1, best-val_acc checkpointing, fixed epochs;
  * our side runs the SAME config (gelu='erf', pool='cls' — exact torch
    semantics) for several seeds (torch↔JAX RNG streams cannot be aligned,
    so seed spread is the honest noise floor for the comparison).

Writes demo_results/parity_head_to_head.json with both trajectories and a
PASS/FAIL verdict on |Δ val AUC| ≤ 0.01 (and the seed spread next to it).

Run:  PYTHONPATH=/root/repo python scripts/parity_head_to_head.py
      (add --smoke for a minutes-scale plumbing check)
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"


def build_data(args):
    """Synthetic dataset → raw split parquets → preprocessed parquets."""
    from neural_vit_tpu.data.pipeline import preprocess_splits
    from neural_vit_tpu.data.splits import create_session_splits_df
    from neural_vit_tpu.data.synthetic import synthetic_lfp_frame
    from neural_vit_tpu.ops.spectrogram import SpectrogramConfig

    os.makedirs(args.workdir, exist_ok=True)
    df = synthetic_lfp_frame(
        n_sessions=args.sessions, trials_per_session=args.trials,
        trace_len=5200, seed=42,
    )
    tr, va, te = create_session_splits_df(df, 0.15, 0.15)
    raw = {}
    for name, d in (("train", tr), ("val", va), ("test", te)):
        p = f"{args.workdir}/{name}.parquet"
        d.to_parquet(p)
        raw[name] = p
    pre = {n: f"{args.workdir}/{n}_pre.parquet" for n in raw}
    cfg = SpectrogramConfig(fs=1000, nperseg=args.nperseg,
                            noverlap=args.noverlap)
    preprocess_splits(
        raw["train"], raw["val"], raw["test"],
        pre["train"], pre["val"], pre["test"],
        cfg=cfg, stats_output_path=f"{args.workdir}/stats.json",
        keep_trace=False, batch_size=2048, verbose=False, backend="cpu",
    )
    return pre, len(df)


def run_torch_reference(pre, args, seed=0):
    """Train the reference implementation (unmodified, imported from
    /root/reference) on the preprocessed parquets; return its metric
    trajectory parsed from the JSONL sink."""
    sys.path.insert(0, REFERENCE_ROOT)
    import torch

    from temporal_vit.training.config import TrainConfig as RefTrainConfig
    from temporal_vit.data.data_loader import DataLoaderConfig as RefLoaderCfg
    from temporal_vit.training.train import train as ref_train

    torch.manual_seed(seed)
    out_dir = f"{args.workdir}/torch_runs"
    cfg = RefTrainConfig(
        train_paths=[pre["train"]], val_paths=[pre["val"]],
        test_paths=[pre["test"]],
        use_preprocessed=True,
        output_dir=out_dir,
        run_name=f"parity-torch-{seed}",
        device="cpu",
        epochs=args.epochs,
        lr=3e-4, weight_decay=0.01, label_smoothing=0.05,
        n_trials=8, stride=4,
        model_size="tiny",
        dropout=0.2, attention_dropout=0.1, drop_path=0.1,
        loader=RefLoaderCfg(batch_size=args.batch, num_workers=0),
    )
    t0 = time.perf_counter()
    ref_train(cfg)
    wall = time.perf_counter() - t0

    # The reference returns None; its record is the JSONL metric sink
    # (experiment_logging.py:91-96,142-147) — the same contract our
    # collectors consume.
    files = sorted(glob.glob(f"{out_dir}/parity-torch-{seed}/metrics/*.jsonl"))
    rows = []
    for f in files:
        with open(f) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    # JSONL rows are flat: {"step": N, "train/loss": ..., "val/auc": ...}
    # (reference experiment_logging.py:142-147).
    epochs, final = {}, {}
    for r in rows:
        step = r.pop("step", None)
        m = {k.replace("/", "_"): v for k, v in r.items()}
        if "val_auc" in m:
            epochs[step] = m
        if "test_auc" in m:
            final = m
    history = [dict(epoch=e, **epochs[e]) for e in sorted(epochs)]
    val_aucs = [h["val_auc"] for h in history if "val_auc" in h]
    return {
        "seed": seed,
        "wall_s": round(wall, 1),
        "history": history,
        "final_val_auc": val_aucs[-1] if val_aucs else float("nan"),
        "best_val_auc": max(val_aucs) if val_aucs else float("nan"),
        "last5_val_auc": (sum(val_aucs[-5:]) / len(val_aucs[-5:])
                          if val_aucs else float("nan")),
        "test_auc": final.get("test_auc", float("nan")),
        "test_acc": final.get("test_acc", float("nan")),
    }


def run_jax(pre, args, seed):
    """Our loop under the exact reference semantics (cls/erf, constant LR,
    val_acc checkpointing, same optimizer/loss/dropout/batching)."""
    from neural_vit_tpu.data.loader import DataLoaderConfig
    from neural_vit_tpu.training.config import TrainConfig
    from neural_vit_tpu.training.loop import train

    t0 = time.perf_counter()
    results = train(TrainConfig(
        train_paths=[pre["train"]], val_paths=[pre["val"]],
        test_paths=[pre["test"]],
        output_dir=f"{args.workdir}/jax_runs",
        run_name=f"parity-jax-{seed}",
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
        seed=seed,
        loader=DataLoaderConfig(batch_size=args.batch),
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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sessions", type=int, default=32)
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--nperseg", type=int, default=126)
    ap.add_argument("--noverlap", type=int, default=58,
                    help="126/58 → 64×72 volumes → N=289 'tiny' tokens "
                         "(torch-CPU-tractable; same scipy formula as the "
                         "production 126/116 point)")
    ap.add_argument("--jax-seeds", default="0,1,2")
    ap.add_argument("--torch-seeds", default="0",
                    help="torch-side seeds (each ≈25 min CPU); several "
                         "seeds establish the reference's own run-to-run "
                         "noise floor next to the cross-implementation "
                         "delta")
    ap.add_argument("--workdir", default="/tmp/parity_h2h")
    ap.add_argument("--outdir", default="demo_results")
    ap.add_argument("--skip-torch", action="store_true",
                    help="reuse the torch trajectory already in the "
                         "artifact (re-run only the JAX side)")
    ap.add_argument("--skip-jax", action="store_true",
                    help="run only the torch side and merge into the "
                         "artifact")
    ap.add_argument("--reset-jax", action="store_true",
                    help="discard the artifact's prior JAX entries (use "
                         "after a model/loop change that invalidates them)")
    ap.add_argument("--smoke", action="store_true",
                    help="minutes-scale plumbing check (tiny data, 2 epochs)")
    ap.add_argument("--compute-dtype", default="float32",
                    help="JAX-side matmul/activation dtype. The torch "
                         "reference computes f32 (CPU), so the MATCHED "
                         "parity config is float32; pass bfloat16 to "
                         "measure the TPU production dtype's quality cost "
                         "as a separate arm")
    ap.add_argument("--jax-platform", default=None,
                    help="force the JAX backend (e.g. 'cpu' — the "
                         "JAX_PLATFORMS env var is ignored by the axon TPU "
                         "plugin, so this sets jax.config before first use)")
    args = ap.parse_args()
    if args.jax_platform:
        import jax

        jax.config.update("jax_platforms", args.jax_platform)
    from neural_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # re-runs skip the multi-minute step compile
    if args.smoke:
        # 16 sessions: enough that every split draws both classes (8 leaves
        # val/test single-class → roc_auc_score returns NaN).
        args.sessions, args.trials, args.epochs = 16, 48, 2
        args.jax_seeds = "0"
        args.workdir += "_smoke"

    out_path = f"{args.outdir}/parity_head_to_head.json"
    report = {}
    if os.path.exists(out_path) and (args.skip_torch or args.skip_jax):
        with open(out_path) as f:
            report = json.load(f)
    report["protocol"] = {
        k: v for k, v in vars(args).items()
        if k not in ("skip_torch", "skip_jax")
    }

    pre, n_trials = build_data(args)
    print(f"data ready: {n_trials} trials → {pre}", flush=True)

    if not args.skip_torch:
        prior = report.get("torch_reference_per_seed", [])
        if report.get("torch_reference") and not prior:
            prior = [dict(report["torch_reference"], seed=0)]
        done = {e.get("seed") for e in prior}
        for seed in [int(s) for s in args.torch_seeds.split(",")]:
            if seed in done:
                continue
            print(f"=== torch reference (CPU) seed {seed} ===", flush=True)
            prior.append(run_torch_reference(pre, args, seed))
            print(json.dumps({k: v for k, v in prior[-1].items()
                              if k != "history"}), flush=True)
        report["torch_reference_per_seed"] = prior
        report["torch_reference"] = prior[0]

    # Arms are stored under dtype-keyed lists (jax_f32 / jax_bf16) so a
    # bf16 re-run can never silently displace the f32 arm's entries in the
    # rewritten artifact. Migrate any legacy flat "jax" list once.
    def arm_key(dtype):
        return {"float32": "jax_f32", "bfloat16": "jax_bf16"}.get(
            dtype, f"jax_{dtype}"
        )

    if "jax" in report:
        for e in report.pop("jax"):
            k = (arm_key(e["compute_dtype"]) if e.get("compute_dtype")
                 else "jax_untagged")
            report.setdefault(k, []).append(e)

    this_arm = arm_key(args.compute_dtype)
    if not args.skip_jax:
        prior_jax = [] if args.reset_jax else report.get(this_arm, [])
        done_jax = {e.get("seed") for e in prior_jax}
        for seed in [int(s) for s in args.jax_seeds.split(",")]:
            if seed in done_jax:
                continue
            print(f"=== jax seed {seed} ===", flush=True)
            prior_jax.append(run_jax(pre, args, seed))
            print(json.dumps({k: v for k, v in prior_jax[-1].items()
                              if k != "history"}), flush=True)
        report[this_arm] = prior_jax

    if report.get("torch_reference_per_seed") and report.get(this_arm):
        mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
        spread = lambda xs: (max(xs) - min(xs)) if len(xs) > 1 else 0.0  # noqa: E731

        def last5(entry):
            if "last5_val_auc" in entry:
                return entry["last5_val_auc"]
            aucs = [h["val_auc"] for h in entry["history"]]
            return mean(aucs[-5:])

        tor = report["torch_reference_per_seed"]
        jx = report[this_arm]
        stats = {}
        for name, get in (("best_val_auc", lambda e: e["best_val_auc"]),
                          ("last5_val_auc", last5),
                          ("final_val_auc", lambda e: e["final_val_auc"]),
                          ("test_auc", lambda e: e["test_auc"])):
            tv, jv = [get(e) for e in tor], [get(e) for e in jx]
            stats[name] = {
                "torch_per_seed": tv, "jax_per_seed": jv,
                "torch_mean": mean(tv), "jax_mean": mean(jv),
                "delta": abs(mean(tv) - mean(jv)),
                "torch_seed_spread": spread(tv),
                "jax_seed_spread": spread(jv),
            }
        # Primary gate on best val AUC (what both checkpointing protocols
        # track) with the last-5-epoch mean as the smoothed secondary;
        # final-epoch val AUC swings ±0.04 epoch-to-epoch at this scale,
        # so it is reported but not gated alone.
        #
        # Gate (hardened, round 4): the BASELINE.md bar |Δ seed-mean| ≤ 0.01,
        # applied only when each side has ≥ 5 seeds. A seed-bootstrap 95% CI
        # on Δ is reported as supporting evidence (sign ambiguity), never as
        # a substitute for the fixed bar — round 3's max(0.01, max−min seed
        # spread) gate let a one-sided 0.03–0.05 deficit "pass" on the widest
        # possible noise estimator and is gone.
        import random as _random

        def _bootstrap_ci(tv, jv, reps=4000, seed=0):
            r = _random.Random(seed)
            deltas = sorted(
                (sum(r.choices(tv, k=len(tv))) / len(tv))
                - (sum(r.choices(jv, k=len(jv))) / len(jv))
                for _ in range(reps)
            )
            return [deltas[int(0.025 * reps)], deltas[int(0.975 * reps)]]

        tv = stats["best_val_auc"]["torch_per_seed"]
        jv = stats["best_val_auc"]["jax_per_seed"]
        delta_signed = stats["best_val_auc"]["torch_mean"] - stats["best_val_auc"]["jax_mean"]
        ci = _bootstrap_ci(tv, jv)
        enough = len(tv) >= 5 and len(jv) >= 5
        report["comparison"] = {
            **stats,
            "jax_arm": this_arm,
            "jax_arm_compute_dtype": args.compute_dtype,
            "gate": "|mean_torch - mean_jax| (best_val_auc) <= 0.01 with "
                    ">=5 seeds per side; bootstrap CI reported as evidence "
                    "only",
            "delta_signed_torch_minus_jax": delta_signed,
            "bootstrap_ci95_delta": ci,
            "ci_contains_zero": bool(ci[0] <= 0.0 <= ci[1]),
            "n_seeds": {"torch": len(tv), "jax": len(jv)},
            "enough_seeds": enough,
            "pass": bool(enough and abs(delta_signed) <= 0.01),
        }
        print(json.dumps(report["comparison"], indent=2), flush=True)

    os.makedirs(args.outdir, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(f"report → {out_path}", flush=True)


if __name__ == "__main__":
    main()
