"""Round-4 preprocess-throughput attribution (VERDICT r3 item 6).

BENCH_r02 stderr: 740 k specs/s vs docs/ROOFLINE.md's ~2.1 M/s "ceiling".
That ceiling assumed ~33 TF/s effective for fp32-HIGHEST MXU work, but the
STFT lowers to the TPU *conv emitter*, whose measured entitlement on this
op is ~11.5 TF/s (ROOFLINE "STFT as explicit framing" negative result).
740 k × 15.7 MF/trace = 11.6 TF/s — i.e. the pipeline may already be AT the
emitter's entitlement, not 35% of a reachable number.

This script settles it with device-plane evidence (xplane timings come from
the device clock — immune to host CPU contention): profile the same chained
fori_loop program bench.py times, aggregate per-op durations, and report
what fraction of device time the conv actually takes plus its implied
FLOP/s.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH timeout 580 \
        python scripts/r4_preprocess_profile.py
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from neural_vit_tpu.ops.spectrogram import (  # noqa: E402
    SpectrogramConfig,
    preprocess_traces,
)

BATCH = 2048
CHAIN = 20
LOGDIR = "/tmp/jaxtrace_preproc"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log(f"backend: {jax.default_backend()}")
    cfg = SpectrogramConfig(fs=1000, nperseg=126, noverlap=116)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, 5000)), jnp.float32)

    frames = (5000 - cfg.nperseg) // (cfg.nperseg - cfg.noverlap) + 1
    n_bins = cfg.nperseg // 2 + 1
    flops_per_trace = frames * cfg.nperseg * (2 * n_bins) * 2

    @jax.jit
    def chained(x):
        def body(_, carry):
            spec = preprocess_traces(carry, cfg, -4.0, 1.5, normalize=True)
            return carry + jnp.mean(spec) * 1e-6
        out = jax.lax.fori_loop(0, CHAIN, body, x)
        return out, jnp.sum(out[0, :8])

    out, chk = chained(x)
    float(chk)  # warm + fence

    os.makedirs(LOGDIR, exist_ok=True)
    with jax.profiler.trace(LOGDIR):
        out, chk = chained(out)
        float(chk)

    paths = sorted(glob.glob(
        os.path.join(LOGDIR, "plugins/profile/*/*.xplane.pb")))
    assert paths, f"no xplane under {LOGDIR}"
    data = jax.profiler.ProfileData.from_file(paths[-1])

    n_specs = BATCH * CHAIN
    for plane in data.planes:
        if "tpu" not in plane.name.lower():
            continue
        per_name, count, total = defaultdict(float), defaultdict(int), 0.0
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname or "xla modules" in lname:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                per_name[ev.name] += dur
                count[ev.name] += 1
                total += dur
        if not per_name:
            continue
        log(f"\n=== plane: {plane.name} (device-sum {total:.1f} ms for "
            f"{CHAIN} chained batches of {BATCH}) ===")
        conv_ms = 0.0
        for name, dur in sorted(per_name.items(), key=lambda kv: -kv[1])[:25]:
            log(f"{dur:9.3f} ms  ×{count[name]:<4d} {name[:100]}")
            if "conv" in name.lower():
                conv_ms += dur
        if total > 0:
            sps = n_specs / (total / 1e3)
            log(f"\nconv-family device time: {conv_ms:.1f} ms "
                f"({100 * conv_ms / total:.1f}% of device sum)")
            if conv_ms > 0:
                tfs = n_specs * flops_per_trace / (conv_ms / 1e3) / 1e12
                log(f"conv implied rate: {tfs:.1f} TFLOP/s on "
                    f"{flops_per_trace / 1e6:.1f} MF/trace")
            log(f"device-time-implied throughput: {sps:,.0f} specs/s "
                f"(bench's host-fenced number includes dispatch/fetch)")


if __name__ == "__main__":
    main()
