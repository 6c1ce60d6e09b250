"""One-off perf probe (run manually on the TPU chip; sequential, single
process). Measures batch scaling, fwd/bwd split, and the flash kernel in
isolation to direct optimization work."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neural_vit_tpu.core.config import CONFIGS
from neural_vit_tpu.models.vit import Temporal3DViT
from neural_vit_tpu.ops.flash_attention import flash_attention
from neural_vit_tpu.training.loop import TrainState, make_step_fns


def timed(fn, *args, steps=20, warm=3):
    """Time fn with a MUTATING first argument between calls: the remote
    executor memoizes identical (executable, args) calls, so repeated
    same-input loops can read ~0.03 ms regardless of the real cost."""
    def mutate(a):
        leaves, treedef = jax.tree_util.tree_flatten(a)
        leaves = [l + jnp.asarray(1e-6, l.dtype) if hasattr(l, "dtype") else l
                  for l in leaves]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    first, rest = args[0], args[1:]
    out = fn(first, *rest)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    for _ in range(warm):
        first = mutate(first)
        out = fn(first, *rest)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    mutated = [mutate(first) for _ in range(steps)]  # pre-built, off the clock
    t0 = time.perf_counter()
    for m in mutated:
        out = fn(m, *rest)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / steps


def main():
    cfg = CONFIGS["small"].replace(dropout=0.2, attention_dropout=0.1, drop_path=0.1)
    rng = np.random.default_rng(0)
    key = jax.random.key(1, impl="rbg")

    # --- flash kernel standalone (bench shapes, bf16) ---
    b, h, n, dh = 256, 6, 513, 64
    q = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.bfloat16)
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale=0.125))
    dt = timed(f, q, k, v)
    print(f"flash fwd standalone: {dt*1e3:.2f} ms  (×8 layers ≈ {dt*8e3:.1f} ms)")

    g = jax.jit(jax.grad(lambda q: jnp.sum(
        flash_attention(q, k, v, scale=0.125).astype(jnp.float32) ** 2)))
    dt = timed(g, q)
    print(f"flash fwd+bwd standalone: {dt*1e3:.2f} ms")

    # --- model fwd / train step at batch sizes ---
    for batch in (256, 512):
        x = jnp.asarray(
            rng.standard_normal((batch, cfg.n_trials, cfg.freq_size, cfg.time_size)),
            jnp.float32)
        y = jnp.asarray(rng.integers(0, 2, batch))
        mask = jnp.ones(batch, jnp.float32)
        model = Temporal3DViT(cfg)
        variables = model.init(jax.random.key(0), x)
        tx = optax.adamw(3e-4, weight_decay=0.01)
        state = TrainState.create(apply_fn=model.apply,
                                  params=variables["params"], tx=tx)
        ts, _ = make_step_fns(model, np.array([0.9, 1.1], np.float32), 0.05)

        fwd = jax.jit(lambda p: model.apply({"params": p}, x, train=False))
        dt = timed(fwd, state.params)
        print(f"b={batch} fwd-eval: {batch/dt:,.0f} v/s ({dt*1e3:.1f} ms)")

        # donation-safe loop
        state, m = ts(state, x, y, mask, key)
        jax.block_until_ready(m["loss_sum"])
        for _ in range(3):
            state, m = ts(state, x, y, mask, key)
        jax.block_until_ready(m["loss_sum"])
        t0 = time.perf_counter()
        steps = 20
        for _ in range(steps):
            state, m = ts(state, x, y, mask, key)
        jax.block_until_ready(m["loss_sum"])
        dt = (time.perf_counter() - t0) / steps
        print(f"b={batch} train: {batch/dt:,.0f} v/s ({dt*1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
