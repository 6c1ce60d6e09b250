"""Multi-head scaled-dot-product attention with a Pallas flash kernel path.

The reference materializes the full O(N²) attention matrix per head
(`models/model.py:106-119`). On TPU we dispatch between:

  * `flash`: a Pallas blockwise-softmax kernel (`ops/flash_attention.py`)
    that never materializes N² in HBM — used on TPU when no attention-weight
    readout is requested (the XLA path OOMs at production batch sizes).
  * `xla`: a reference einsum + softmax path — used on CPU, for parity
    tests, and when per-head attention maps are requested (interpretability
    parity with `get_attention_maps`, reference `models/model.py:325-350`).

Operand layout is heads-last (B, N, H, Dh) on both paths: q/k/v arrive as
plain slices of the fused qkv projection with no transpose copies.
Both paths produce identical math (verified in tests/test_flash_attention.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    return_weights: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Reference attention. q/k/v: (B, N, H, Dh) heads-last.

    Returns (out (B, N, H, Dh), weights (B, H, N, N) or None).
    """
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    attn = weights.astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out, (weights if return_weights else None)


def multi_head_attention_qkv(
    qkv: jax.Array,
    *,
    n_heads: int,
    scale: float,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    use_flash: bool = True,
    return_weights: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Dispatching attention core over the packed (B, N, 3D) qkv projection.

    The flash path consumes the packed array directly (zero layout ops, see
    `ops/flash_attention.py`); the XLA path unpacks to heads-last q/k/v.

    Returns (out (B, N, D), weights (B, H, N, N) or None).
    """
    b, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    use_flash = use_flash and not return_weights and _on_tpu()
    if use_flash:
        from neural_vit_tpu.ops.flash_attention import (
            flash_attention_qkv,
            supported,
        )

        # No VMEM block plan at this (N, D) → XLA attention below.
        use_flash = supported(n, d)
    if use_flash:
        out = flash_attention_qkv(
            qkv, n_heads=n_heads, scale=scale,
            dropout_rate=dropout_rate if not deterministic else 0.0,
            dropout_rng=dropout_rng,
        )
        return out, None
    qkv = qkv.reshape(b, n, 3, n_heads, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    out, weights = xla_attention(
        q, k, v, scale, dropout_rate, deterministic, dropout_rng,
        return_weights,
    )
    return out.reshape(b, n, d), weights


def tp_multi_head_attention_qkv3(
    qkv3: jax.Array,
    *,
    mesh,
    n_heads: int,
    scale: float,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    use_flash: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Head-parallel attention over the mesh's 'model' axis via shard_map.

    GSPMD cannot partition a Pallas custom call, so under tensor parallelism
    the attention core is placed with `shard_map`: each model-shard holds a
    whole group of heads — its slice of the (B, N, 3, D) projection output,
    contiguous because the qkv projection is a DenseGeneral with a
    (D, 3, D) kernel column-sharded on the LAST dim (`parallel/mesh.py`
    `_TP_RULES`) — reshapes it to the packed (B, N, 3·D/tp) layout the
    kernel consumes, and runs the unchanged flash kernel on its local
    heads. Attention is embarrassingly parallel over heads (Megatron), so
    the only collective in the block remains the proj row-split psum that
    XLA already inserts.

    Args:
        qkv3: (B, N, 3, D) projection output, head-major inside D. B must
            divide the mesh's 'data' size, D its 'model' size.
        mesh: the ('data', 'model') jax.sharding.Mesh the step runs under.
        dropout_rng: folded with the model-shard index inside the map, so
            head groups draw independent masks (dropout masks are a random
            draw, not a parity surface).
        interpret: force the Pallas kernel in interpreter mode (CPU tests
            of this exact path; otherwise CPU falls back to XLA attention).

    Returns:
        (B, N, D) attention output, sharded ('data', None, 'model').
    """
    # Varying-mesh-axis checking can't see through the Pallas custom call —
    # disable it (check_vma on jax>=0.8's jax.shard_map, check_rep on the
    # legacy experimental API).
    try:
        from jax import shard_map as _shard_map  # jax >= 0.8

        def shard_map(f, **kw):
            return _shard_map(f, check_vma=False, **kw)
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _shard_map_legacy

        def shard_map(f, **kw):
            return _shard_map_legacy(f, check_rep=False, **kw)
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape["model"]
    b, n, three, d = qkv3.shape
    if three != 3:
        raise ValueError(f"qkv3 must be (B, N, 3, D), got {qkv3.shape}")
    if n_heads % tp != 0:
        raise ValueError(f"{n_heads} heads not divisible by model={tp}")
    h_local = n_heads // tp
    if use_flash and _on_tpu():
        from neural_vit_tpu.ops.flash_attention import supported

        if not supported(n, d // tp):
            # Loud, not silent: this is a per-shard perf cliff, not an error.
            import warnings

            warnings.warn(
                f"flash attention unsupported at per-shard dims (N={n}, "
                f"D/tp={d // tp}): non-128-aligned D/tp uses the "
                "packed-full kernel mode, which needs whole (N, 3·D/tp) "
                "rows to fit VMEM — beyond that every TP shard takes the "
                "XLA attention path. See docs/SCALING.md.",
                stacklevel=2,
            )
    if dropout_rng is None:
        dropout_rng = jax.random.key(0)  # unused: deterministic or rate 0

    def local(q3, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("model"))
        lb, ln = q3.shape[0], q3.shape[1]
        qkv_l = q3.reshape(lb, ln, 3 * q3.shape[-1])
        if interpret:
            from neural_vit_tpu.ops.flash_attention import flash_attention_qkv

            return flash_attention_qkv(
                qkv_l, n_heads=h_local, scale=scale,
                dropout_rate=dropout_rate if not deterministic else 0.0,
                dropout_rng=rng, interpret=True,
            )
        out, _ = multi_head_attention_qkv(
            qkv_l, n_heads=h_local, scale=scale,
            dropout_rate=dropout_rate, deterministic=deterministic,
            dropout_rng=rng, use_flash=use_flash,
        )
        return out

    return shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None, None, "model"), P()),
        out_specs=P("data", None, "model"),
    )(qkv3, dropout_rng)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    use_flash: bool = True,
    return_weights: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Dispatching attention core. q/k/v: (B, N, H, Dh) heads-last."""
    if return_weights or not use_flash or not _on_tpu():
        return xla_attention(
            q, k, v, scale, dropout_rate, deterministic, dropout_rng,
            return_weights,
        )
    from neural_vit_tpu.ops.flash_attention import flash_attention

    out = flash_attention(
        q, k, v, scale=scale,
        dropout_rate=dropout_rate if not deterministic else 0.0,
        dropout_rng=dropout_rng,
    )
    return out, None
