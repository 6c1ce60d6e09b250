"""Benchmark: training throughput of the flagship model on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "volumes/sec/chip", "vs_baseline": N}

Measures full training steps (forward + backward + AdamW update) of the
'small' Temporal 3D ViT (384d / 6h / 8L) on (8, 64, 128) spectrogram
volumes under real train conditions — dropout, attention dropout
(in-kernel, flash path), stochastic depth, class-weighted smoothed CE.
The model runs its TPU performance configuration (QuickGELU x·σ(1.702x),
the CLIP/GPT-2 formulation — measured A/B 1,511 vs tanh's 1,502 v/s; and
pool='probe', the MAP-head attention-pool readout of Zhai et al.: no CLS
token, so the blocks' token count is the bare 512-patch grid —
lane-aligned, removing Mosaic's 513→640 pad from every attention plane.
Measured +10% (1,799-1,806 vs 1,638 v/s) AND it beats CLS on the
calibrated quality gate: test AUC 0.9791 vs cls-quick 0.9409, log-reg
0.8908 (demo_results/full_scale_demo_quick_probe.json). The plain
mean-pool readout measured the same speed but FAILED that gate (0.81) and
stays non-default. Exact torch parity: `--gelu erf --pool cls` — see
docs/ROOFLINE.md). vs_baseline is
measured against the north-star target of 5,000 volumes/sec/chip
(BASELINE.json; the reference never measured throughput — SURVEY §6).
NOTE on the target: 5,000 v/s × ~53 GFLOP/volume = ~265 TFLOP/s, which
exceeds v5e's 197 TFLOP/s bf16 peak — the physical ceiling for this model
is ~2,200-3,700 v/s at 60-100% MFU (docs/ROOFLINE.md). The stderr
diagnostics report implied TFLOP/s and MFU so the ratio reads honestly.

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

# Before first jax use: the JAX_PLATFORMS env var is ignored by the axon
# TPU plugin, so a CPU dry-run of the bench (contract-line plumbing,
# wedged-tunnel fallback) needs the config knob. Both argparse spellings
# ('--platform cpu' and '--platform=cpu') must hit this pre-parse sniff —
# a missed '=' form would silently leave the backend unforced.
for _i, _arg in enumerate(sys.argv):
    if _arg == "--platform" and _i + 1 < len(sys.argv):
        jax.config.update("jax_platforms", sys.argv[_i + 1])
    elif _arg.startswith("--platform="):
        jax.config.update("jax_platforms", _arg.split("=", 1)[1])

from neural_vit_tpu.utils import enable_compilation_cache

# On TPU, point the persistent compilation cache INSIDE the repo: the
# driver's round-end capture runs in a fresh container where ~/.cache is
# empty, so the committed cache entries are the only way its cold start
# skips the multi-minute XLA+Mosaic compile of the train step (BENCH_r02
# recorded 831 s of compile for a 2.9 s measured region). TPU executables
# are host-independent, so committing them is safe; CPU entries are NOT
# (AOT code is machine-feature-specific) and keep using ~/.cache.
_REPO_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".xla_cache")
enable_compilation_cache(
    _REPO_CACHE if jax.default_backend() == "tpu" else None
)

# v5e bf16 peak (TFLOP/s) — for the MFU diagnostic.
PEAK_TFLOPS = 197.0


def flops_per_volume(cfg) -> float:
    """Analytic fwd+bwd FLOPs per volume (matmuls + attention; bwd = 2×fwd)
    from the actual config, so MFU stays honest across --pool / model-shape
    flags (N=513 with CLS → 53.2 GF; N=512 mean-pool → 53.1 GF). See
    docs/ROOFLINE.md for the derivation."""
    n, d, L = cfg.seq_len, cfg.embed_dim, cfg.n_layers
    hidden = int(d * cfg.mlp_ratio)
    per_layer = (
        2 * n * d * 3 * d              # qkv projection
        + 2 * (2 * n * n * d)          # QKᵀ + PV (Dh·H = D)
        + 2 * n * d * d                # out projection
        + 2 * (2 * n * d * hidden)     # MLP fc1 + fc2
    )
    patch = 2 * cfg.n_patches * d * cfg.patch_dim
    head = 2 * d * d + 2 * d * cfg.n_classes
    if cfg.pool == "probe":
        # MAP head: k/v projections run over all N tokens — 2·(2·N·D²)
        # (~1.7% of forward at N=512); q/out projections and the 1-row
        # attention itself are negligible but counted for completeness.
        head += 2 * (2 * n * d * d) + 2 * (2 * n * d) + 2 * 2 * d * d
    return 3.0 * (L * per_layer + patch + head)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_train_throughput(batch: int = 128, steps: int = 40, warmup: int = 5,
                           gelu: str = "quick", scoped_vmem_kib: int = 26624,
                           tiled: bool = False, pool: str = "probe",
                           time_size: int = 128, remat: bool = False,
                           model_size: str = "small"):
    # batch 128 is the measured best single-chip operating point
    # (sweep, r2: 64→1345, 96→1394, 128→1456, 192→1278, 256→1409 v/s);
    # under data parallelism the global batch is per-chip × n_chips, so
    # the bench reports the per-chip optimum. time_size=488 (+ --remat,
    # smaller batch) measures the PRODUCTION operating point: the 126/116
    # spectrograms the real pipeline emits → N=1952/1953 tokens.
    from neural_vit_tpu.core.config import CONFIGS
    from neural_vit_tpu.models.vit import Temporal3DViT
    from neural_vit_tpu.training.loop import TrainState, make_step_fns

    cfg = CONFIGS[model_size].replace(
        dropout=0.2, attention_dropout=0.1, drop_path=0.1, gelu=gelu,
        pool=pool, time_size=time_size, remat=remat,
    )
    model = Temporal3DViT(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch, cfg.n_trials, cfg.freq_size, cfg.time_size)),
        jnp.float32,
    )
    if tiled:
        # The loader's pre-tiled pair layout (DataLoaderConfig.tile_patches):
        # batches arrive as bf16 (B, K/pk, F', T', pk·pf·pt) patch tiles and
        # the model's per-step patchify transpose disappears.
        x = jnp.asarray(
            np.asarray(x)
            .reshape(batch, cfg.grid_k, cfg.patch_trial, cfg.grid_f,
                     cfg.patch_freq, cfg.grid_t, cfg.patch_time)
            .transpose(0, 1, 3, 5, 2, 4, 6)
            .reshape(batch, cfg.grid_k, cfg.grid_f, cfg.grid_t,
                     cfg.patch_dim),
            jnp.bfloat16,
        )
    y = jnp.asarray(rng.integers(0, 2, batch))
    mask = jnp.ones(batch, jnp.float32)

    variables = model.init(jax.random.key(0), x)
    tx = optax.adamw(3e-4, weight_decay=0.01)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )
    # Scoped-VMEM limit 26 MiB: XLA's fusion working-set decisions at the
    # default 16 MiB leave ~6% on the table for this model; measured
    # plateau 20-28 MiB ≈ 1,590-1,600 v/s, cliff at 32 MiB (1,459) — see
    # docs/ROOFLINE.md. Sent per-compile (TPU-only XLA_FLAGS would abort
    # the local process over the remote backend).
    # xla_tpu_* options only exist on the TPU compiler — drop the knob when
    # the bench runs on CPU (e.g. dev box, wedged tunnel) so the JSON
    # contract line still prints.
    on_tpu = jax.default_backend() == "tpu"
    train_step, _ = make_step_fns(
        model, class_weights=np.array([0.9, 1.1], np.float32),
        label_smoothing=0.05,
        compiler_options=(
            {"xla_tpu_scoped_vmem_limit_kib": str(scoped_vmem_kib)}
            if (scoped_vmem_kib and on_tpu) else None
        ),
    )
    key = jax.random.key(1, impl="rbg")  # hardware RNG for dropout masks

    t0 = time.perf_counter()
    state, m = train_step(state, x, y, mask, key)
    float(m["loss_sum"])  # value fetch = execution fence
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s")

    for _ in range(warmup):
        state, m = train_step(state, x, y, mask, key)
    float(m["loss_sum"])  # value fetch = execution fence

    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = train_step(state, x, y, mask, key)
    float(m["loss_sum"])  # value fetch: the only reliable execution fence
    dt = time.perf_counter() - t0
    vols_per_sec = batch * steps / dt
    fpv = flops_per_volume(cfg)
    tflops = vols_per_sec * fpv / 1e12
    log(f"config: {model_size} gelu={gelu} pool={pool} (N={cfg.seq_len}, T={time_size}) "
        f"batch={batch} scoped_vmem={scoped_vmem_kib} KiB"
        + (f" remat={remat} (MFU counts useful FLOPs; block remat "
           f"executes ≈ 4/3×)" if remat else ""))
    log(f"batch={batch} steps={steps} time={dt:.3f}s "
        f"→ {vols_per_sec:,.0f} volumes/sec/chip (fwd+bwd+update)")
    log(f"implied {tflops:.1f} TFLOP/s at {fpv / 1e9:.1f} "
        f"GFLOP/volume → {100 * tflops / PEAK_TFLOPS:.1f}% MFU "
        f"(v5e bf16 peak {PEAK_TFLOPS:.0f} TFLOP/s)")
    return vols_per_sec


def bench_inference_throughput(batch: int = 128, steps: int = 60,
                               gelu: str = "quick", pool: str = "probe",
                               time_size: int = 128, int8: bool = False):
    """Serving-side diagnostic: eval-mode forward (no dropout, flash
    attention, bf16 compute) — what the exported StableHLO artifact runs.
    int8=True additionally times the quantized path (serving/quantize.py:
    int8 GEMM weights + dynamic int8 activations; MXU int8 peak is 2×
    bf16). stderr only; the stdout contract stays one JSON line."""
    from neural_vit_tpu.core.config import CONFIGS
    from neural_vit_tpu.models.vit import Temporal3DViT

    cfg = CONFIGS["small"].replace(gelu=gelu, pool=pool,
                                   time_size=time_size)
    model = Temporal3DViT(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch, cfg.n_trials, cfg.freq_size, cfg.time_size)),
        jnp.float32,
    )
    params = model.init(jax.random.key(0), x)["params"]

    @jax.jit
    def infer(params, x):
        return model.apply({"params": params}, x, train=False)

    def timed(fn, *args):
        logits = fn(*args)
        float(logits[0, 0])  # value fetch = execution fence
        t0 = time.perf_counter()
        for _ in range(steps):
            logits = fn(*args)
        float(logits[0, 0])
        return batch * steps / (time.perf_counter() - t0)

    vps = timed(infer, params, x)
    fwd_flops = flops_per_volume(cfg) / 3.0  # bwd ≈ 2× fwd
    log(f"inference (eval fwd, batch {batch}): {vps:,.0f} volumes/sec/chip, "
        f"implied {vps * fwd_flops / 1e12:.1f} TFLOP/s "
        f"({100 * vps * fwd_flops / 1e12 / PEAK_TFLOPS:.1f}% MFU)")
    if int8:
        from neural_vit_tpu.serving.quantize import make_quantized_forward

        fwd_q, _ = make_quantized_forward(model, params)
        vps_q = timed(jax.jit(fwd_q), x)
        log(f"inference int8 (quantized GEMMs, batch {batch}): "
            f"{vps_q:,.0f} volumes/sec/chip "
            f"({100 * (vps_q - vps) / vps:+.1f}% vs bf16; useful-FLOP MFU "
            f"{100 * vps_q * fwd_flops / 1e12 / PEAK_TFLOPS:.1f}% of bf16 "
            f"peak, int8 MXU peak is 2×)")
    return vps


def bench_preprocess_throughput(batch: int = 2048, chain: int = 50):
    """Device throughput of the fused STFT+log+z-norm (production 126/116
    params, 5000-sample traces). The `chain` iterations run INSIDE one
    device program as a lax.fori_loop whose carry feeds each step's input
    from the previous step's output — a single executable call with a data
    dependency through every iteration, so no dispatch-level caching or
    memoization can skip work. Reported on stderr only (the stdout contract
    is one JSON line), with the implied FLOP/s printed next to it and a
    roofline gate: a number implying more than fp32 peak is flagged invalid
    instead of quoted."""
    from neural_vit_tpu.ops.spectrogram import SpectrogramConfig, preprocess_traces

    cfg = SpectrogramConfig(fs=1000, nperseg=126, noverlap=116)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 5000)), jnp.float32)

    # Conv-roofline per trace: frames × taps × (2·freq_bins channels) × 2.
    frames = (5000 - cfg.nperseg) // (cfg.nperseg - cfg.noverlap) + 1
    n_bins = cfg.nperseg // 2 + 1
    flops_per_trace = frames * cfg.nperseg * (2 * n_bins) * 2

    @jax.jit
    def chained(x):
        def body(_, carry):
            spec = preprocess_traces(carry, cfg, -4.0, 1.5, normalize=True)
            # Fold a full reduction of the spectrogram back into the next
            # input: every iteration depends on every output pixel, so no
            # dead-code elimination can narrow the conv.
            return carry + jnp.mean(spec) * 1e-6
        out = jax.lax.fori_loop(0, chain, body, x)
        return out, jnp.sum(out[0, :8])

    # block_until_ready is NOT a reliable fence on the remote transport —
    # only a value fetch is (measured: chained timings were flat in `chain`
    # under block_until_ready, and scaled linearly once a scalar was
    # fetched). Fetch a scalar to force execution, and subtract the
    # fetch round-trip measured on a trivial program.
    tiny = jax.jit(lambda s: s + 1.0)
    s = jnp.float32(0)
    for _ in range(2):
        s = tiny(s)
        float(s)
    t0 = time.perf_counter()
    for _ in range(5):
        s = tiny(s)
        float(s)
    rtt = (time.perf_counter() - t0) / 5

    out, chk = chained(x)
    float(chk)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, chk = chained(out)
        float(chk)
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - rtt, 1e-9)
    sps = batch * chain / dt
    implied_tflops = sps * flops_per_trace / 1e12
    log(f"preprocess (device-resident): {sps:,.0f} spectrograms/sec "
        f"({cfg.nperseg}/{cfg.noverlap}, 5000-sample traces), "
        f"implied {implied_tflops:.2f} TFLOP/s fp32 "
        f"({flops_per_trace / 1e6:.1f} MFLOP/trace)")
    if implied_tflops > PEAK_TFLOPS / 4:  # fp32-HIGHEST ≈ several bf16 passes
        log("preprocess rate EXCEEDS the fp32 conv roofline — measurement "
            "invalid, do not quote")
    return sps


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tiled", action="store_true",
                    help="feed the loader's pre-tiled bf16 patch layout "
                         "(DataLoaderConfig.tile_patches) instead of raw "
                         "(B, K, F, T) volumes")
    ap.add_argument("--model", default="small",
                    choices=["tiny", "small", "base"],
                    help="registry variant to bench (the contract metric "
                         "is always the 'small' default)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--gelu", default="quick", choices=["quick", "tanh", "erf"])
    ap.add_argument("--pool", default="probe",
                    choices=["cls", "mean", "probe"],
                    help="'probe' (default) = MAP-head attention-pool "
                         "readout: 512 tokens (lane-aligned) instead of "
                         "513 — removes Mosaic's 513->640 pad tax from "
                         "attention (+10% v/s) and beats CLS on the "
                         "calibrated quality gate (test AUC 0.979 vs "
                         "0.941); 'cls' = exact reference semantics; "
                         "'mean' = plain average (same speed, fails the "
                         "gate)")
    ap.add_argument("--vmem-kib", type=int, default=26624,
                    help="xla_tpu_scoped_vmem_limit_kib (0 = compiler "
                         "default; re-sweep after layout changes)")
    ap.add_argument("--platform", default=None,
                    help="force the JAX backend (consumed before jax "
                         "init at module top; e.g. 'cpu' for a contract "
                         "dry-run when the TPU tunnel is unavailable)")
    ap.add_argument("--train-only", action="store_true",
                    help="skip the preprocess/inference stderr diagnostics")
    ap.add_argument("--int8", action="store_true",
                    help="also time the int8-quantized serving forward "
                         "(serving/quantize.py) in the inference diagnostic")
    ap.add_argument("--time-size", type=int, default=128,
                    help="spectrogram time bins (488 = the production "
                         "126/116 pipeline output -> N=1952/1953 tokens; "
                         "pair with --remat and a smaller --batch)")
    ap.add_argument("--remat", nargs="?", const="block", default=False,
                    choices=["block", "mlp"],
                    help="rematerialize in backward (required at production "
                         "dims alongside a device-resident dataset). Bare "
                         "--remat = 'block'; 'mlp' recomputes only the MLP "
                         "sub-block (no attention re-run — cheaper)")
    args = ap.parse_args()

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    t_start = time.perf_counter()
    # Contract metric FIRST: the tunneled device occasionally wedges
    # mid-session, and a hang inside a stderr-only diagnostic must not
    # block the one JSON line the driver consumes.
    value = bench_train_throughput(
        batch=args.batch, steps=args.steps, gelu=args.gelu,
        scoped_vmem_kib=args.vmem_kib, tiled=args.tiled, pool=args.pool,
        time_size=args.time_size, remat=args.remat, model_size=args.model,
    )
    # The 5k north-star is defined for the 'small' contract config only
    # (BASELINE.md) — a ratio against it is meaningless for tiny/base.
    target = 5000.0 if args.model == "small" else None
    record = {
        "metric": f"train_throughput_{args.model}_vit_fwd_bwd",
        "value": round(value, 1),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(value / target, 3) if target else None,
    }
    # Print the contract line IMMEDIATELY after the tuned measurement.
    # Round 3's BENCH artifact was lost (rc=124, parsed null) because a
    # second full train-step compile ran before this print; nothing below
    # this line may gate it.
    print(json.dumps(record), flush=True)
    elapsed = time.perf_counter() - t_start
    # When the headline ran the TUNED config (probe/quick — a quality-gated
    # TPU-first redesign), also measure the reference-parity config
    # (cls/erf, exact torch semantics) as a SECOND JSON line so the captured
    # output self-documents the redesign delta. Budget-gated: if the tuned
    # config took long (cold cache), skip rather than risk the driver's
    # overall timeout truncating the capture.
    if ((args.gelu, args.pool) == ("quick", "probe") and args.model == "small"
            and elapsed < 300.0):
        try:
            parity = bench_train_throughput(
                batch=args.batch, steps=min(args.steps, 20), gelu="erf",
                scoped_vmem_kib=args.vmem_kib, tiled=args.tiled, pool="cls",
                time_size=args.time_size, remat=args.remat,
                model_size=args.model,
            )
            # stderr, NOT stdout: the driver parses the LAST stdout JSON
            # line, and round 4's artifact recorded this diagnostic (1,331.7
            # — the deliberately slower exact-torch arm) as the headline.
            # stdout carries exactly one JSON line: the contract record.
            log(json.dumps({
                "metric": "train_throughput_small_vit_fwd_bwd_parity_config",
                "value": round(parity, 1),
                "unit": "volumes/sec/chip",
                "note": "pool=cls gelu=erf (exact reference semantics)",
            }))
        except Exception as exc:  # diagnostics — never break the contract
            log(f"parity-config bench failed: {exc}")
    elif elapsed >= 300.0:
        log(f"skipping parity-config bench: tuned config took {elapsed:.0f}s "
            "(cold cache?) — protecting the driver's time budget")
    if args.train_only:
        return
    try:
        bench_preprocess_throughput()
    except Exception as exc:  # diagnostics only — never break the JSON line
        log(f"preprocess bench failed: {exc}")
    try:
        bench_inference_throughput(gelu=args.gelu, pool=args.pool,
                                   time_size=args.time_size,
                                   int8=args.int8)
    except Exception as exc:
        log(f"inference bench failed: {exc}")


if __name__ == "__main__":
    main()
