"""One-process TPU session: deeper-pipelining flash A/Bs (round 2b).

Stages (each guarded; single process to avoid tunnel wedge + recompiles):
  1. tiny-op tunnel probe
  2. on-chip parity: staged fwd depth 2/3 and dual-hoist bwd must be
     bit-identical to production on a small slice
  3. kernel-isolated timing at the operating point (batch 128, N=513):
     production fwd (depth-1 staged) vs depth-2 vs depth-3;
     production bwd (qk-hoist) vs dual-hoist (qk + do·vᵀ)

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/r2b_tpu_session.py
"""

import sys
import time
import traceback

sys.path.insert(0, "scripts")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    log(f"tunnel probe ok ({time.perf_counter() - t0:.1f}s)")

    import exp_flash_staged as X
    from neural_vit_tpu.ops.flash_attention import (
        _flash_bwd, _flash_fwd, flash_attention_qkv,
    )

    b, n, d, h = 128, 513, 384, 6
    dh = d // h
    scale = dh ** -0.5
    iters = 50
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * d),
                            jnp.bfloat16)
    seed = jnp.array([12345], jnp.int32)

    # ---- parity on chip (small slice) ---------------------------------
    small = qkv[:2]
    do_small = jnp.ones_like(small[..., :d])
    for rate in (0.0, 0.1):
        want, lse_p = _flash_fwd(small, seed, n_heads=h, scale=scale,
                                 dropout_rate=rate, interpret=False)
        for depth in (2, 3):
            got, lse_s = X.staged_fwd(small, seed, n_heads=h, scale=scale,
                                      dropout_rate=rate, interpret=False,
                                      depth=depth)
            assert jnp.array_equal(got, want), f"fwd d={depth} rate={rate}"
            assert jnp.array_equal(lse_s, lse_p), f"lse d={depth} r={rate}"
        bwant = _flash_bwd(small, want, lse_p, do_small, seed, n_heads=h,
                           scale=scale, dropout_rate=rate, interpret=False)
        bgot = X.staged_bwd_fused(small, want, lse_p, do_small, seed,
                                  n_heads=h, scale=scale, dropout_rate=rate,
                                  interpret=False)
        assert jnp.array_equal(bgot, bwant), f"bwd dual-hoist rate={rate}"
        log(f"parity ok on chip (rate={rate})")

    # ---- timing ---------------------------------------------------------
    fwd_fl = 2 * 2 * n * n * dh * h * b
    bwd_fl = 5 * 2 * n * n * dh * h * b

    def glue(x, y):
        s = jnp.mean(y.astype(jnp.float32)) * 1e-6
        return x + s.astype(x.dtype)

    def loop(step):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(
                0, iters, lambda i, xx: glue(xx, step(xx)), x)
        return run

    def timed(jitted, x):
        jax.block_until_ready(jitted(x))
        x2 = jax.block_until_ready(x * jnp.bfloat16(1.0078125))
        t0 = time.perf_counter()
        jax.block_until_ready(jitted(x2))
        return (time.perf_counter() - t0) / iters

    t_base = timed(loop(lambda x: x[..., :d]), qkv)
    log(f"glue baseline: {t_base * 1e3:.3f} ms/iter")

    out_full, lse_full = _flash_fwd(qkv, seed, n_heads=h, scale=scale,
                                    dropout_rate=0.1, interpret=False)
    do_full = jax.random.normal(jax.random.PRNGKey(2), (b, n, d),
                                jnp.bfloat16)

    for rate in (0.1, 0.0):
        try:
            t_p = timed(loop(lambda x, r=rate: flash_attention_qkv(
                x, n_heads=h, scale=scale, dropout_rate=r,
                dropout_rng=jax.random.PRNGKey(1))), qkv) - t_base
            log(f"rate={rate}: fwd prod(d1) {t_p * 1e3:7.3f} ms "
                f"({fwd_fl / t_p / 1e12:5.1f} TF/s)")
            for depth in (2, 3):
                t_s = timed(loop(lambda x, r=rate, dp=depth: X.staged_fwd(
                    x, seed, n_heads=h, scale=scale, dropout_rate=r,
                    interpret=False, depth=dp)[0]), qkv) - t_base
                log(f"rate={rate}: fwd depth={depth} {t_s * 1e3:7.3f} ms "
                    f"({fwd_fl / t_s / 1e12:5.1f} TF/s)  "
                    f"delta {100 * (t_p - t_s) / t_p:+.1f}%")
        except Exception:
            log("fwd timing FAILED:")
            traceback.print_exc(file=sys.stderr)
        try:
            t_bp = timed(loop(lambda x, r=rate: _flash_bwd(
                x, out_full, lse_full, do_full, seed, n_heads=h, scale=scale,
                dropout_rate=r, interpret=False)[..., :d]), qkv) - t_base
            t_bs = timed(loop(lambda x, r=rate: X.staged_bwd_fused(
                x, out_full, lse_full, do_full, seed, n_heads=h, scale=scale,
                dropout_rate=r, interpret=False)[..., :d]), qkv) - t_base
            log(f"rate={rate}: bwd prod {t_bp * 1e3:7.3f} ms "
                f"({bwd_fl / t_bp / 1e12:5.1f} TF/s)   dual-hoist "
                f"{t_bs * 1e3:7.3f} ms ({bwd_fl / t_bs / 1e12:5.1f} TF/s)  "
                f"delta {100 * (t_bp - t_bs) / t_bp:+.1f}%")
        except Exception:
            log("bwd timing FAILED:")
            traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
