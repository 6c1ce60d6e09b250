"""Train-step ablations on the real TPU: attribute step time to dropout
(in-kernel + XLA), GELU flavor, LayerNorm dtype, and dropout-key impl.
Sequential, single process; each variant recompiles (~20-60 s)."""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neural_vit_tpu.core.config import CONFIGS
from neural_vit_tpu.models.vit import Temporal3DViT
from neural_vit_tpu.training.loop import TrainState, make_step_fns

BATCH, STEPS = 256, 20


def bench_variant(tag, cfg, key_impl="rbg"):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (BATCH, cfg.n_trials, cfg.freq_size, cfg.time_size)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, BATCH))
    mask = jnp.ones(BATCH, jnp.float32)
    key = jax.random.key(1, impl=key_impl)
    model = Temporal3DViT(cfg)
    variables = model.init(jax.random.key(0), x)
    tx = optax.adamw(3e-4, weight_decay=0.01)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    ts, _ = make_step_fns(model, np.array([0.9, 1.1], np.float32), 0.05)
    t0 = time.perf_counter()
    state, m = ts(state, x, y, mask, key)
    float(m["loss_sum"])  # value fetch = execution fence
    compile_s = time.perf_counter() - t0
    for _ in range(4):
        state, m = ts(state, x, y, mask, key)
    float(m["loss_sum"])  # value fetch = execution fence
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = ts(state, x, y, mask, key)
    float(m["loss_sum"])  # value fetch = execution fence
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{tag:46s} {dt*1e3:7.1f} ms/step  {BATCH/dt:7,.0f} v/s  "
          f"(compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrix", default="v2", choices=["v1", "v2"],
                    help="which ablation set to run")
    args = ap.parse_args()
    base = CONFIGS["small"].replace(dropout=0.2, attention_dropout=0.1,
                                    drop_path=0.1)
    if args.matrix == "v1":  # round-1 matrix (erf base)
        bench_variant("baseline (erf, f32 LN, dropouts on)", base)
        bench_variant("attn_dropout=0", base.replace(attention_dropout=0.0))
        bench_variant("dropout=0 drop_path=0 (attn kept)",
                      base.replace(dropout=0.0, drop_path=0.0))
        bench_variant("all dropout off", base.replace(
            dropout=0.0, drop_path=0.0, attention_dropout=0.0))
        bench_variant("gelu=tanh", base.replace(gelu="tanh"))
        bench_variant("norm=bf16", base.replace(norm_dtype="bfloat16"))
        bench_variant("gelu=tanh + norm=bf16", base.replace(
            gelu="tanh", norm_dtype="bfloat16"))
        bench_variant("fast + all dropout off (upper bound)", base.replace(
            gelu="tanh", norm_dtype="bfloat16",
            dropout=0.0, drop_path=0.0, attention_dropout=0.0))
    else:  # v2: qkv-kernel era, tanh base
        fast = base.replace(gelu="tanh")
        bench_variant("tanh base (rbg key, dropouts on)", fast)
        bench_variant("tanh + threefry key", fast, key_impl="threefry2x32")
        bench_variant("tanh + attn_dropout=0",
                      fast.replace(attention_dropout=0.0))
        bench_variant("tanh + xla dropout off",
                      fast.replace(dropout=0.0, drop_path=0.0))
        bench_variant("tanh + all dropout off", fast.replace(
            dropout=0.0, drop_path=0.0, attention_dropout=0.0))
        bench_variant("tanh + norm=bf16", fast.replace(norm_dtype="bfloat16"))
        bench_variant("tanh + all off + norm=bf16 (upper bound)",
                      fast.replace(dropout=0.0, drop_path=0.0,
                                   attention_dropout=0.0,
                                   norm_dtype="bfloat16"))


if __name__ == "__main__":
    main()
