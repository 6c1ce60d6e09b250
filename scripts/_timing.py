"""Shared loop-on-device timing harness for the flash-kernel perf scripts.

All on-chip A/Bs (perf_flash, exp_flash_staged, exp_flash_fwdbq,
exp_flash_maskhoist) must measure the SAME way or their numbers stop being
comparable. The rules this module encodes:

  * Warm on `x`, then time on a DISTINCT buffer: the remote executor
    memoizes a repeated (executable, operand) call even when the
    executable is a whole 50-iteration loop — timing the same call twice
    reads ~0 ms.
  * Iterations are chained inside ONE jitted `lax.fori_loop` by a thin
    glue dependency (next input = input + mean(output)·1e-6), so every
    iteration must execute and per-call tunnel dispatch latency is
    amortized away.
  * The glue's own cost is measured by a slice-only baseline loop and
    subtracted by the caller.
"""

import time

import jax
import jax.numpy as jnp


def timed(jitted, x, iters):
    """(seconds per iteration, output) of `jitted(x)` under the rules
    above. `jitted` is expected to internally loop `iters` times."""
    jax.block_until_ready(jitted(x))
    x2 = jax.block_until_ready(x * jnp.bfloat16(1.0078125))
    t0 = time.perf_counter()
    out = jax.block_until_ready(jitted(x2))
    return (time.perf_counter() - t0) / iters, out


def glue(x, y):
    """Thin dependency: next input = input + f(this output). Forces every
    iteration to execute while adding only one elementwise pass over x
    (measured by the slice-only baseline loop and subtracted)."""
    s = jnp.mean(y.astype(jnp.float32)) * 1e-6
    return x + s.astype(x.dtype)


def make_loop(iters):
    """loop(step) -> jitted fn chaining `iters` glue-linked step calls."""

    def loop(step):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(
                0, iters, lambda i, xx: glue(xx, step(xx)), x)

        return run

    return loop
