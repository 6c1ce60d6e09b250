"""Calibrate the synthetic gate's linear separability (VERDICT round-1 #5).

Runs the real pipeline (fused CPU preprocessing → parquet → log-reg
baseline on trial_stats features, held-out sessions) over a few seeds and
prints the test AUC per seed, so `synthetic_lfp_frame`'s default profile
can be tuned to land the linear baseline at the reference's real margin
(~0.85-0.90 test AUC, `evals/baseline_results.json`) while leaving
nonlinear headroom for the ViT.

CPU-only (the axon TPU tunnel is slow for bulk transfers and must stay
free for training jobs):  PYTHONPATH=/root/repo python scripts/calibrate_synthetic.py
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def one_seed(seed, args):
    from neural_vit_tpu.baselines import logreg
    from neural_vit_tpu.data.pipeline import preprocess_splits
    from neural_vit_tpu.data.splits import create_session_splits_df
    from neural_vit_tpu.data.synthetic import synthetic_lfp_frame
    from neural_vit_tpu.ops.spectrogram import SpectrogramConfig

    df = synthetic_lfp_frame(
        n_sessions=args.sessions,
        trials_per_session=args.trials,
        trace_len=5200,
        seed=seed,
        hum_delta=args.hum_delta,
        hum_sigma=args.hum_sigma,
        hum_amp=args.hum_amp,
        trial_jitter=args.trial_jitter,
        burst_frac=args.burst_frac,
    )
    tr, va, te = create_session_splits_df(df, 0.15, 0.15)
    with tempfile.TemporaryDirectory() as d:
        raw, pre = {}, {}
        for name, part in (("train", tr), ("val", va), ("test", te)):
            raw[name] = f"{d}/{name}.parquet"
            pre[name] = f"{d}/{name}_pre.parquet"
            part.to_parquet(raw[name])
        cfg = SpectrogramConfig(fs=1000, nperseg=126, noverlap=116)
        t0 = time.perf_counter()
        preprocess_splits(
            raw["train"], raw["val"], raw["test"],
            pre["train"], pre["val"], pre["test"],
            cfg=cfg, stats_output_path=f"{d}/stats.json",
            keep_trace=False, batch_size=1024, verbose=False, backend="cpu",
        )
        pre_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        bl = logreg.run(
            pre["train"], pre["val"], pre["test"],
            n_trials=8, stride=4, feature_mode=args.feature_mode,
            output_dir=f"{d}/baselines",
        )
        lr_s = time.perf_counter() - t0
    m = bl["metrics"]
    print(
        f"seed {seed}: logreg({args.feature_mode}) "
        f"train/val/test AUC = {m['train']['auc']:.3f} / "
        f"{m['val']['auc']:.3f} / {m['test']['auc']:.3f} "
        f"(pre {pre_s:.0f}s, logreg {lr_s:.0f}s)",
        flush=True,
    )
    return m["test"]["auc"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=32)
    ap.add_argument("--trials", type=int, default=64)
    ap.add_argument("--seeds", type=int, nargs="+", default=[42, 43, 44])
    ap.add_argument("--hum_delta", type=float, default=0.31)
    ap.add_argument("--hum_sigma", type=float, default=0.03)
    ap.add_argument("--hum_amp", type=float, default=0.65)
    ap.add_argument("--trial_jitter", type=float, default=0.7)
    ap.add_argument("--burst_frac", type=float, default=0.45)
    ap.add_argument("--feature_mode", default="trial_stats")
    args = ap.parse_args()
    aucs = [one_seed(s, args) for s in args.seeds]
    import numpy as np

    print(
        f"hum_delta={args.hum_delta} hum_sigma={args.hum_sigma} "
        f"hum_amp={args.hum_amp} jitter={args.trial_jitter} "
        f"burst={args.burst_frac} → "
        f"test AUC mean {np.mean(aucs):.3f} ± {np.std(aucs):.3f}"
    )


if __name__ == "__main__":
    main()
