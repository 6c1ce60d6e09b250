"""Round-4 compile-cost attribution (VERDICT r3 item 5): where do the
~831 s of train-step compile go?

BENCH_r02 recorded 831 s of compile for a 2.9 s measured region; the fix so
far is a committed compile cache, but the COST itself was never attributed.
This session times, for each config:

    trace  — jax.jit(...).lower(...)      (local: jaxpr tracing + StableHLO)
    compile — lowered.compile()           (backend: XLA fusion + Mosaic)

over four arms that differ in exactly one dimension each:

    full      — the bench train step as shipped (flash fwd+bwd, AdamW)
    noflash   — same step, use_flash_attention=False (no Mosaic kernels;
                isolates the Mosaic share)
    fwd       — eval forward only, flash on (no backward; isolates the
                bwd/optimizer share)
    smallb    — full step at batch 8 (isolates batch-width-driven fusion
                search cost)

Each arm runs in the SAME process sequentially (one TPU process rule), with
the persistent compile cache DISABLED for this process so every arm pays its
real compile. Results print to stderr as one line per arm; run on a quiet
box (compile happens in the local process for tracing and in the backend
for XLA/Mosaic — concurrent CPU load skews both).

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH timeout 3000 \
        python scripts/r4_compile_audit.py 2>&1 | tee /tmp/compile_audit.log
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

# NO enable_compilation_cache: arms must pay their real compile cost.


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(batch, flash=True):
    from neural_vit_tpu.core.config import CONFIGS
    from neural_vit_tpu.models.vit import Temporal3DViT
    from neural_vit_tpu.training.loop import TrainState, make_step_fns

    cfg = CONFIGS["small"].replace(
        dropout=0.2, attention_dropout=0.1, drop_path=0.1, gelu="quick",
        pool="probe", time_size=128, use_flash_attention=flash,
    )
    model = Temporal3DViT(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch, cfg.n_trials, cfg.freq_size,
                             cfg.time_size)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, batch))
    mask = jnp.ones(batch, jnp.float32)
    variables = model.init(jax.random.key(0), x)
    tx = optax.adamw(3e-4, weight_decay=0.01)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    on_tpu = jax.default_backend() == "tpu"
    train_step, eval_step = make_step_fns(
        model, class_weights=np.array([0.9, 1.1], np.float32),
        label_smoothing=0.05,
        compiler_options=({"xla_tpu_scoped_vmem_limit_kib": "26624"}
                          if on_tpu else None),
    )
    return model, state, train_step, eval_step, x, y, mask


def time_compile(tag, fn, *args):
    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    # cost analysis is free; flop count sanity-checks which arm is which
    log(f"[{tag}] trace {t_trace:.1f}s  compile {t_compile:.1f}s")
    return compiled


def main():
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    # Arm 1: full bench train step (flash, batch 128).
    model, state, train_step, eval_step, x, y, mask = build(128, flash=True)
    key = jax.random.key(1, impl="rbg")
    time_compile("full b128 flash", train_step, state, x, y, mask, key)

    # Arm 2: same step without the Pallas kernels.
    model2, state2, train_step2, _, x2, y2, m2 = build(128, flash=False)
    time_compile("noflash b128", train_step2, state2, x2, y2, m2, key)

    # Arm 3: forward only (eval step), flash on.
    time_compile("fwd-only b128 flash", eval_step, state.params, x, y, mask)

    # Arm 4: full step, batch 8.
    model3, state3, train_step3, _, x3, y3, m3 = build(8, flash=True)
    time_compile("full b8 flash", train_step3, state3, x3, y3, m3, key)

    log("done")


if __name__ == "__main__":
    main()
