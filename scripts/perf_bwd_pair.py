"""A/B: fused single-program flash backward vs the dq/dkv kernel pair at
bench dims (B=128, N=513, D=384, H=6).

The plan picks the fused backward whenever the whole row fits VMEM (it
avoids a second pass and keeps delta in-kernel), but the fused program is
one grid step per batch element — Mosaic cannot overlap q-block work the
way the pair's 2-D grids can. This probe forces the pair at several
(bq, bk) block shapes and times fwd+bwd end to end, kernel-isolated with
the same glue-loop methodology as perf_flash.py.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/perf_bwd_pair.py
"""

import functools
import time

import jax
import jax.numpy as jnp

import neural_vit_tpu.ops.flash_attention as fa
from neural_vit_tpu.ops.flash_attention import flash_attention_qkv


def _timed(jitted, x, iters):
    out = jitted(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jitted(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    b, n, d, h = 128, 513, 384, 6
    dh = d // h
    scale = dh ** -0.5
    iters = 50
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * d),
                            jnp.bfloat16)
    rng = jax.random.PRNGKey(1)
    bwd_fl = 5 * 2 * n * n * dh * h * b

    def attn(x, rate):
        return flash_attention_qkv(
            x, n_heads=h, scale=scale, dropout_rate=rate, dropout_rng=rng)

    def glue(x, y):
        s = jnp.mean(y.astype(jnp.float32)) * 1e-6
        return x + s.astype(x.dtype)

    def loop(step):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(
                0, iters, lambda i, xx: glue(xx, step(xx)), x)
        return run

    grad = jax.grad(
        lambda x, r: jnp.sum(attn(x, r).astype(jnp.float32) ** 2), argnums=0)

    t_base, _ = _timed(loop(lambda x: x[..., :d]), qkv, iters)
    print(f"glue baseline: {t_base*1e3:.3f} ms/iter", flush=True)

    orig_plan = fa._plan

    variants = [("fused (current plan)", None)]
    n_pad = 640
    for bq, bk in ((320, 320), (128, 128), (320, 128)):
        variants.append((f"pair n={n_pad} bq={bq} bk={bk}",
                         (n_pad, bq, bk, False)))

    for rate in (0.0, 0.1):
        for name, plan in variants:
            if plan is None:
                fa._plan = orig_plan
            else:
                fa._plan = lambda _n, _d, _p=plan: _p
            try:
                t_f, _ = _timed(
                    loop(functools.partial(attn, rate=rate)), qkv, iters)
                t_fb, _ = _timed(
                    loop(lambda x, r=rate: grad(x, r)), qkv, iters)
            except Exception as exc:  # VMEM overflow etc.
                print(f"rate={rate} {name}: FAILED {type(exc).__name__}: "
                      f"{str(exc)[:160]}", flush=True)
                continue
            finally:
                fa._plan = orig_plan
            t_b = t_fb - t_f
            print(
                f"rate={rate} {name}: fwd+bwd {(t_fb-t_base)*1e3:7.3f} ms  "
                f"bwd≈{(t_b)*1e3:7.3f} ms "
                f"({bwd_fl/max(t_b,1e-9)/1e12:5.1f} TF/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
