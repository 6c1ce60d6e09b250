"""One-process TPU session for round 3: packed-full kernel validation at
D=192 + production-dims (T=488, N=1952/1953) operating-point sweeps.

Stages (each guarded; select with --stages):
  packed   — on-chip numerics of the packed-full flash mode (D=192: 'tiny'
             and 'small'-at-tp=2 per-shard dims): Mosaic-compiled fwd out
             and packed-qkv grads vs the XLA attention path in f32.
  tiny     — bench the 'tiny' train step with flash (packed mode) vs the
             forced XLA fallback (the round-2 state: 11% MFU).
  prod     — production-dims train-step sweep: --configs
             "batch:remat:vmem_kib[:pool[:gelu]]" comma-list, each timed
             with bench.bench_train_throughput(time_size=488).

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/r3_prod_session.py \
        --stages packed,tiny
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/r3_prod_session.py \
        --stages prod --configs "32:mlp:26624,32:mlp:0,48:mlp:26624"
"""

import argparse
import sys
import traceback

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def stage_packed():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_vit_tpu.ops.attention import xla_attention
    from neural_vit_tpu.ops.flash_attention import (
        flash_attention_qkv,
        supported,
    )

    rng = np.random.default_rng(0)
    for n, tag in ((129, "odd-N"), (488, "prod-ish"), (513, "tiny-default")):
        b, h, dh = 2, 3, 64
        d = h * dh
        assert supported(n, d), f"packed mode must be supported at N={n}"
        q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, dh)),
                               jnp.float32) for _ in range(3))
        qkv = jnp.concatenate([q.reshape(b, n, -1), k.reshape(b, n, -1),
                               v.reshape(b, n, -1)], -1)
        scale = dh ** -0.5

        def loss(x):
            o = flash_attention_qkv(x, n_heads=h, scale=scale)
            return jnp.sum(o * jnp.cos(o))

        def loss_ref(q, k, v):
            o, _ = xla_attention(q, k, v, scale)
            return jnp.sum(o * jnp.cos(o))

        out = jax.jit(lambda x: flash_attention_qkv(
            x, n_heads=h, scale=scale))(qkv)
        ref, _ = jax.jit(lambda q, k, v: xla_attention(q, k, v, scale))(
            q, k, v)
        err = float(jnp.max(jnp.abs(
            out - ref.reshape(b, n, -1)).astype(jnp.float32)))
        g = jax.jit(jax.grad(loss))(qkv)
        gq, gk, gv = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
        gref = jnp.concatenate([gq.reshape(b, n, -1), gk.reshape(b, n, -1),
                                gv.reshape(b, n, -1)], -1)
        gerr = float(jnp.max(jnp.abs((g - gref).astype(jnp.float32))))
        # TPU f32 dot_general runs bf16 passes at default precision —
        # absolute-error gates, not tight relative ones (verify skill).
        log(f"[packed {tag} N={n}] fwd max|err|={err:.2e} "
            f"grad max|err|={gerr:.2e}")
        assert err < 3e-2, f"packed fwd error too large at N={n}"
        assert gerr < 6e-2, f"packed grad error too large at N={n}"
    log("[packed] on-chip numerics OK")


def stage_tiny():
    import bench
    import neural_vit_tpu.ops.flash_attention as fa

    r = {}
    try:
        r["flash"] = bench.bench_train_throughput(
            batch=128, steps=30, model_size="tiny", time_size=128)
        log(f"[tiny flash(packed)] {r['flash']:,.1f} v/s")
    except Exception:
        log("[tiny flash] FAILED:")
        traceback.print_exc(file=sys.stderr)
    orig = fa.supported
    fa.supported = lambda *a, **k: False
    try:
        r["xla"] = bench.bench_train_throughput(
            batch=128, steps=30, model_size="tiny", time_size=128)
        log(f"[tiny xla-fallback] {r['xla']:,.1f} v/s")
    finally:
        fa.supported = orig
    if "flash" in r and "xla" in r:
        log(f"[tiny] packed flash vs xla: {r['flash'] / r['xla']:.2f}x")


def stage_prod(configs):
    import bench

    for spec in configs.split(","):
        parts = spec.strip().split(":")
        batch = int(parts[0])
        remat = parts[1] if len(parts) > 1 else "mlp"
        remat = False if remat in ("0", "none", "False") else remat
        vmem = int(parts[2]) if len(parts) > 2 else 26624
        pool = parts[3] if len(parts) > 3 else "probe"
        gelu = parts[4] if len(parts) > 4 else "quick"
        tag = f"b{batch} remat={remat} vmem={vmem} {pool}/{gelu}"
        try:
            v = bench.bench_train_throughput(
                batch=batch, steps=30, gelu=gelu, pool=pool,
                scoped_vmem_kib=vmem, time_size=488, remat=remat)
            log(f"[prod {tag}] {v:,.1f} v/s")
        except Exception:
            log(f"[prod {tag}] FAILED:")
            traceback.print_exc(file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="packed,tiny")
    ap.add_argument("--configs", default="32:mlp:26624")
    args = ap.parse_args()

    import jax

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    for stage in args.stages.split(","):
        try:
            if stage == "packed":
                stage_packed()
            elif stage == "tiny":
                stage_tiny()
            elif stage == "prod":
                stage_prod(args.configs)
            else:
                log(f"unknown stage {stage}")
        except Exception:
            log(f"stage {stage} FAILED:")
            traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
