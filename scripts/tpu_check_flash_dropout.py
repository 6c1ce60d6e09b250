"""Decisive check: flash fwd out and grad_v on TPU vs host-f64 computation
with the extracted (bit-exact) kernel mask. Masks mismatching would show
O(1) per-element errors; pure MXU rounding shows ~1e-3."""
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import neural_vit_tpu.ops.flash_attention as fa

assert jax.default_backend() == "tpu"

import os
B, H, N, DH, RATE = 1, 2, int(os.environ.get("FLASH_CHECK_N", "513")), 64, 0.3
SCALE = DH ** -0.5
key = jax.random.key(3)
seed = jax.random.randint(key, (1,), 0, 2 ** 31 - 1, jnp.int32)

rng = np.random.default_rng(0)
q = rng.standard_normal((B, N, H, DH)).astype(np.float32)
k = rng.standard_normal((B, N, H, DH)).astype(np.float32)
v = rng.standard_normal((B, N, H, DH)).astype(np.float32)
w = rng.standard_normal((B, N, H, DH)).astype(np.float32)


def mask_kernel(seed_ref, o_ref, *, rate):
    # Kernel mask semantics: per-(batch, head) seed, global (row, col) hash.
    # Emit the inverted-dropout multiplier {0, 1/(1-rate)} the kernels now
    # apply as select + folded vector rescale.
    bh = pl.program_id(0)
    keep = fa._keep_mask(
        (o_ref.shape[1], o_ref.shape[2]), rate,
        seed_ref[0] + bh, jnp.uint32(0),
    )
    o_ref[0] = jnp.where(keep, 1.0 / (1.0 - rate), 0.0).astype(jnp.bfloat16)


spec = pl.BlockSpec((1, N, N), lambda b, *_: (b, 0, 0))
M = np.asarray(pl.pallas_call(
    functools.partial(mask_kernel, rate=RATE),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B * H,), in_specs=[],
        out_specs=spec),
    out_shape=jax.ShapeDtypeStruct((B * H, N, N), jnp.bfloat16),
    # The mimic dumps a whole (N, N) plane per program — at production N
    # that is ~30 MB of stack, over the default 16 MiB per-kernel limit.
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=min(2 * 2 * N * ((N + 127) // 128 * 128) + 2**24,
                             100 * 2**20),
    ),
)(seed), np.float64)


def f(vv):
    o = fa.flash_attention(jnp.asarray(q), jnp.asarray(k), vv, scale=SCALE,
                           dropout_rate=RATE, dropout_rng=key)
    return o


out_tpu = np.asarray(f(jnp.asarray(v)))
g_tpu = np.asarray(jax.grad(lambda vv: jnp.sum(f(vv) * w))(jnp.asarray(v)))

# Host f64 reference with the extracted mask. seed order: bh = b*H + h.
out_ref = np.zeros_like(out_tpu, np.float64)
g_ref = np.zeros_like(out_tpu, np.float64)
for b in range(B):
    for h in range(H):
        s = (q[b, :, h].astype(np.float64) @ k[b, :, h].astype(np.float64).T) * SCALE
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        pd = p * M[b * H + h]
        out_ref[b, :, h] = pd @ v[b, :, h].astype(np.float64)
        g_ref[b, :, h] = pd.T @ w[b, :, h].astype(np.float64)

for tag, a, r in [("fwd out", out_tpu, out_ref), ("grad_v", g_tpu, g_ref)]:
    err = np.abs(a - r) / (np.abs(r) + 1e-3)
    print(f"{tag}: max_rel={err.max():.2e} mean_rel={err.mean():.2e}", flush=True)
print("masks consistent" if np.abs(g_tpu - g_ref).max() < 0.05 else "MASK MISMATCH",
      flush=True)
