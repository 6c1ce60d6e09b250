"""Ahead-of-time serving artifacts via `jax.export` (StableHLO).

The reference has no deployment path: serving a trained Temporal3DViT
means re-importing torch plus the model source and unpickling a `.pt`
(its planned eval-job loader is an unchecked TODO,
`project_plan.md:115-117`). The TPU-native equivalent is ahead-of-time
export: the eval-mode forward is jitted with a *symbolic batch dimension*,
lowered to StableHLO for a chosen set of platforms, and serialized with
the trained weights baked in as constants. The resulting single file is
self-contained — any process with jax installed (no flax, no model code,
no checkpoint tree) deserializes it and serves logits, on CPU or TPU,
with XLA recompiling the portable StableHLO for whatever device it lands
on.

Artifact layout: `<path>` is the serialized `jax.export.Exported` bytes;
`<path>.json` is a sidecar with the model config, input spec, and class
names for inspection/routing (the artifact itself is already
self-describing for execution).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from neural_vit_tpu.core.config import Temporal3DViTConfig

_FORMAT = "neural-vit-tpu-exported-v1"
# Platforms baked into every artifact. A lowering for each is embedded, so
# one file serves both the TPU fleet and CPU canaries/tests.
_PLATFORMS = ("cpu", "tpu")


def _build_exported(params, config: Temporal3DViTConfig,
                    platforms: Sequence[str],
                    quantize: Optional[str] = None) -> "jax_export.Exported":
    """Lower eval-mode apply with weights closed over (→ HLO constants)."""
    from neural_vit_tpu.models.vit import Temporal3DViT

    # Force the XLA attention path: a portable multi-platform artifact can't
    # carry the Pallas TPU kernel's Mosaic custom-call (no CPU lowering), and
    # the pallas_call grid can't take the symbolic batch dimension anyway.
    # XLA recompiles the StableHLO per target device, so TPU serving still
    # gets fused attention from the compiler.
    config = dataclasses.replace(config, use_flash_attention=False)
    model = Temporal3DViT(config)
    params = jax.device_get(params)  # bake host copies, not device buffers

    if quantize == "int8":
        # GEMMs run int8×int8→int32 on the MXU (serving/quantize.py);
        # the intercepted kernels' f32 weights are never traced, so the
        # artifact bakes int8 constants (≈4× smaller, ~2× MXU rate).
        from neural_vit_tpu.serving.quantize import make_quantized_forward

        infer, _ = make_quantized_forward(model, params)
    elif quantize:
        raise ValueError(f"unknown quantize mode {quantize!r} "
                         "(supported: 'int8')")
    else:
        def infer(x):
            return model.apply({"params": params}, x, train=False)

    (b,) = jax_export.symbolic_shape("b")
    x_spec = jax.ShapeDtypeStruct(
        (b, config.n_trials, config.freq_size, config.time_size),
        jnp.float32,
    )
    return jax_export.export(
        jax.jit(infer), platforms=list(platforms)
    )(x_spec)


def save_exported(
    path: str,
    params,
    config: Temporal3DViTConfig,
    *,
    platforms: Sequence[str] = _PLATFORMS,
    class_names: Sequence[str] = ("WT", "FMR1"),
    extra: Optional[dict] = None,
    quantize: Optional[str] = None,
) -> str:
    """Export eval-mode inference to `path` (+ `path.json` sidecar)."""
    exported = _build_exported(params, config, platforms, quantize=quantize)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    sidecar = {
        "format": _FORMAT,
        "platforms": list(platforms),
        "input_shape": ["b", config.n_trials, config.freq_size,
                        config.time_size],
        "output": ["b", config.n_classes],
        "class_names": list(class_names),
        "model_config": dataclasses.asdict(config),
        "bytes": len(data),
        "quantize": quantize,
    }
    if extra:
        sidecar["extra"] = extra
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f, indent=2, default=str)
    return path


class ExportedModel:
    """A deserialized serving artifact: `.predict` → logits,
    `.predict_proba` → class probabilities. Batch size is symbolic — any
    leading dimension works without re-export."""

    def __init__(self, exported: "jax_export.Exported", sidecar: dict):
        self._exported = exported
        self.sidecar = sidecar
        self.class_names = sidecar.get("class_names", [])

    def predict(self, volumes) -> jax.Array:
        x = jnp.asarray(volumes, jnp.float32)
        if x.ndim == 3:  # single volume convenience
            x = x[None]
        return self._exported.call(x)

    def predict_proba(self, volumes) -> np.ndarray:
        logits = self.predict(volumes)
        return np.asarray(jax.nn.softmax(logits, axis=-1))


def load_exported(path: str) -> ExportedModel:
    """Load a serving artifact saved by `save_exported`. Needs only jax —
    no model code, flax, or checkpoint access."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    sidecar = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            sidecar = json.load(f)
    return ExportedModel(exported, sidecar)


def export_checkpoint(
    checkpoint_dir: str,
    name: str,
    out_path: str,
    *,
    platforms: Sequence[str] = _PLATFORMS,
    quantize: Optional[str] = None,
) -> str:
    """Restore `{params, config}` from an Orbax checkpoint (best/final, as
    written by the train loop) and export it for serving."""
    from neural_vit_tpu.training.checkpoint import restore_checkpoint

    params, config, extra = restore_checkpoint(checkpoint_dir, name)
    return save_exported(out_path, params, config, platforms=platforms,
                         quantize=quantize,
                         extra={"checkpoint": f"{checkpoint_dir}/{name}",
                                **({"checkpoint_extra": extra} if extra
                                   else {})})


def main(argv=None):  # pragma: no cover - thin CLI
    import argparse

    ap = argparse.ArgumentParser(
        description="Export a trained checkpoint to a self-contained "
                    "StableHLO serving artifact.")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--name", default="final")
    ap.add_argument("--out", required=True)
    ap.add_argument("--platforms", nargs="+", default=list(_PLATFORMS))
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="post-training quantization of the GEMMs "
                         "(serving/quantize.py): int8 weights + dynamic "
                         "int8 activations, ≈4× smaller artifact")
    args = ap.parse_args(argv)
    path = export_checkpoint(args.checkpoint_dir, args.name, args.out,
                             platforms=args.platforms,
                             quantize=args.quantize)
    print(f"exported: {path} (+ {path}.json)")


if __name__ == "__main__":  # pragma: no cover
    main()
