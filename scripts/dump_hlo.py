"""Dump the optimized HLO of the bench train step (compile-only).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/dump_hlo.py [out.txt]

Compiles the exact bench operating point (small config, batch 128,
QuickGELU, 26 MiB scoped VMEM) against the live backend and writes the
optimized HLO module text, so fusion contents/layouts can be inspected
offline (e.g. the LayerNorm-family reductions that profile ~9x below HBM
bandwidth).
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neural_vit_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hlo_step.txt"
    from neural_vit_tpu.core.config import CONFIGS
    from neural_vit_tpu.models.vit import Temporal3DViT
    from neural_vit_tpu.training.loop import TrainState, make_step_fns

    batch = 128
    cfg = CONFIGS["small"].replace(
        dropout=0.2, attention_dropout=0.1, drop_path=0.1, gelu="quick",
    )
    model = Temporal3DViT(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch, cfg.n_trials, cfg.freq_size, cfg.time_size)),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(0, 2, batch))
    mask = jnp.ones((batch,), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    tx = optax.adamw(3e-4, weight_decay=0.01)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )
    on_tpu = jax.default_backend() == "tpu"
    train_step, _ = make_step_fns(
        model, class_weights=np.array([0.9, 1.1], np.float32),
        label_smoothing=0.05,
        compiler_options=(
            {"xla_tpu_scoped_vmem_limit_kib": "26624"} if on_tpu else None
        ),
    )
    key = jax.random.key(1, impl="rbg")
    lowered = train_step.lower(state, x, labels, mask, key)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
