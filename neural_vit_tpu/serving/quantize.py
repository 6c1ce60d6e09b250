"""Post-training int8 quantization for serving.

The v5e MXU runs int8×int8→int32 at 2× the bf16 rate (394 vs 197 TOPS).
**Measured result at this model's size (D=384, batch 128): int8 serving
is a FOOTPRINT lever, not a latency one** — 6,690 vs bf16's 7,525
volumes/sec (−11.1%), even though the optimized-HLO audit confirms all
34 quantized GEMMs lower to s8×s8→s32 MXU convolutions. The dynamic
per-row activation quantization (VPU absmax reduce + round/clip, plus
the int32→f32 rescale traffic) costs more than the halved MXU time
saves on GEMMs this small; at larger D the balance would flip. What
int8 does buy here is the ≈4× smaller baked-constant artifact and the
served-quality gate (trained-model int8 AUC within 0.02 of f32,
`tests/test_serving.py`). The reference has no deployment path at all
(SURVEY §5); this module extends `serving/export.py`'s StableHLO
artifacts with the quantized variant.

Scheme (standard transformer PTQ):
  * Weights: symmetric per-output-channel int8 — `scale_o = max|W[:,o]|/127`,
    folded once offline. Quantized: the per-block GEMMs (fused qkv
    projection, attention out-proj, MLP fc1/fc2), the patch embedding, and
    the head's hidden Dense. Kept in f32/bf16: biases, LayerNorms,
    positional tables, LayerScale, the MAP-probe attention (tiny), the
    final 2-class logit Dense (negligible FLOPs, keeps logit precision),
    and the attention core itself (softmax/PV run bf16 exactly as in
    training).
  * Activations: dynamic symmetric per-row int8 — absmax over the
    contracted axis at runtime. No calibration pass needed, robust to the
    post-LN activation distributions this model feeds its GEMMs.

Mechanics: the quantized tables ride a `flax.linen.intercept_methods`
interceptor that replaces the intercepted modules' `__call__` with the
int8 GEMM — the f32 kernels are never traced, so an export bakes int8
constants (≈4× smaller artifact) and the same unmodified model code
serves both precisions.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Dense module names whose kernels get int8 weights. "qkv" is the fused
# QKVProjection (kernel (D, 3, D)); the rest are plain nn.Dense.
_QUANT_NAMES = ("patch_embed", "qkv", "proj", "fc1", "fc2", "head_fc1")


def _quantize_weight(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel int8 for a 2-D (in, out) kernel."""
    w = np.asarray(w, np.float32)
    amax = np.max(np.abs(w), axis=0)
    scale = np.maximum(amax, 1e-12) / 127.0
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_dense_tree(params) -> Dict[str, dict]:
    """Build the path→{w_q, scale, bias} table for every quantized GEMM.

    Keys are '/'-joined module paths as seen by the apply-time interceptor
    (e.g. 'block_3/attn/qkv'). QKVProjection kernels (D, 3, D) flatten to
    the byte-identical (D, 3D) Dense form before quantization.
    """
    table: Dict[str, dict] = {}

    def walk(tree, path):
        if not isinstance(tree, dict):
            return
        if "kernel" in tree and path and path[-1] in _QUANT_NAMES:
            kernel = np.asarray(tree["kernel"], np.float32)
            bias = tree.get("bias")
            if kernel.ndim == 3:  # QKVProjection (D, 3, D)
                kernel = kernel.reshape(kernel.shape[0], -1)
                if bias is not None:
                    bias = np.asarray(bias, np.float32).reshape(-1)
            w_q, scale = _quantize_weight(kernel)
            table["/".join(path)] = {
                "w_q": jnp.asarray(w_q),
                "scale": jnp.asarray(scale),
                "bias": (jnp.asarray(np.asarray(bias, np.float32))
                         if bias is not None else None),
            }
            return
        for key, sub in tree.items():
            walk(sub, path + (key,))

    walk(jax.device_get(params), ())
    return table


def _int8_gemm(x: jax.Array, entry: dict, out_dtype) -> jax.Array:
    """Dynamic per-row activation quant + int8×int8→int32 MXU dot."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    xq = jnp.clip(jnp.rint(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, entry["w_q"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * entry["scale"])
    if entry["bias"] is not None:
        y = y + entry["bias"]
    return y.astype(out_dtype)


def _make_interceptor(table: Dict[str, dict]) -> Callable:
    from neural_vit_tpu.models.vit import QKVProjection

    def interceptor(next_fun, args, kwargs, context):
        if context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        module = context.module
        key = "/".join(module.path)
        entry = table.get(key)
        if entry is None:
            return next_fun(*args, **kwargs)
        if isinstance(module, nn.Dense):
            return _int8_gemm(args[0], entry, module.dtype)
        if isinstance(module, QKVProjection):
            grouped = kwargs.get("grouped", args[1] if len(args) > 1
                                 else False)
            if grouped:  # TP serving path stays unquantized
                return next_fun(*args, **kwargs)
            return _int8_gemm(args[0], entry, module.dtype)
        return next_fun(*args, **kwargs)

    return interceptor


def make_quantized_forward(
    model,
    params,
    table: Optional[Dict[str, dict]] = None,
):
    """Eval-mode forward with the model's GEMMs swapped for int8.

    Returns `(forward, table)`. The forward traces only the quantized
    weights for intercepted modules (their f32 kernels are never read), so
    jitting or exporting it bakes int8 constants.
    """
    if table is None:
        table = quantize_dense_tree(params)
    interceptor = _make_interceptor(table)

    def forward(x):
        with nn.intercept_methods(interceptor):
            return model.apply({"params": params}, x, train=False)

    return forward, table
