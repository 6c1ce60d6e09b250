"""Temporal 3D Vision Transformer, TPU-first in flax.linen.

Same math as the reference `Temporal3DViT` (`models/model.py:181-350`):
3D patch embedding over (trial, freq, time) volumes, factorized positional
embeddings, CLS token, pre-LN transformer blocks with LayerScale and
linearly-decayed stochastic depth, and a GELU-MLP classification head —
re-designed for XLA/TPU:

  * Patch embedding is a reshape + single Dense (einsum) instead of Conv3d —
    identical math (kernel=stride conv ≡ per-patch linear), but XLA lowers it
    straight to one large MXU matmul with no im2col.
  * Factorized positional embeddings are a broadcast add of three small
    tables — XLA fuses this into the embedding epilogue.
  * The attention core dispatches to a Pallas flash kernel on TPU
    (`ops/attention.py`); attention-map readout for interpretability parity
    (`get_attention_maps`, reference `models/model.py:325-350`) uses the XLA
    path and `nn.Module.sow`.
  * Matmuls run in `config.compute_dtype` (bfloat16 on TPU); parameters and
    LayerNorm statistics stay float32.

Stochastic regularization threads explicit PRNG state: pass
`rngs={'dropout': key}` with `train=True`.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from neural_vit_tpu.core.config import Temporal3DViTConfig
from neural_vit_tpu.ops.attention import (
    multi_head_attention_qkv,
    tp_multi_head_attention_qkv3,
)
from neural_vit_tpu.ops.dropout import dropout as fused_dropout
from neural_vit_tpu.ops.layernorm import layer_norm as fused_layer_norm

# torch nn.init.trunc_normal_(std=0.02) truncates at ±2 ABSOLUTE — ±100σ at
# this std, i.e. effectively untruncated — so the exact-parity initializer is
# a plain normal. (jax truncated_normal(0.02) truncates at ±2σ, shrinking the
# realized std to ~0.88·0.02: a 12% narrower init everywhere, one of the
# systematic torch-vs-jax deltas found in the round-4 parity audit.)
trunc_init = nn.initializers.normal(stddev=0.02)


def _conv3d_default_init(key, shape, dtype):
    """torch Conv3d DEFAULT weight init, for the patch embedding.

    The reference's `_init_weights` re-initializes only nn.Linear and
    nn.LayerNorm (`models/model.py:268-274`) — its Conv3d patch embed keeps
    torch's default kaiming_uniform(a=√5): U(±√(1/fan_in)) with
    fan_in = in_channels·∏kernel = patch_dim (std ≈ 0.051 at patch_dim=128,
    2.5× wider than trunc_normal(0.02)). Matching it matters: this is the
    input layer, and the head-to-head parity runs train small models for
    few epochs."""
    fan_in = shape[0]
    bound = (1.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _conv3d_default_bias_init(fan_in: int):
    """torch Conv3d default bias: U(±1/√fan_in) — NOT zeros (the reference
    zeroes only Linear biases, `models/model.py:271`)."""
    bound = (1.0 / fan_in) ** 0.5

    def init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _gelu(x, kind: str = "erf"):
    # torch nn.GELU() default is the exact erf formulation; "tanh" is the
    # standard cheap approximation; "quick" is x·σ(1.702x) (the CLIP/GPT-2
    # "QuickGELU") — the cheapest on the VPU: one exp + one reciprocal vs
    # the tanh path's polynomial (config.gelu — a VPU-cost knob).
    if kind == "quick":
        return x * jax.nn.sigmoid(jnp.asarray(1.702, x.dtype) * x)
    return jax.nn.gelu(x, approximate=(kind == "tanh"))


class Dropout(nn.Module):
    """Inverted dropout via the bandwidth-lean 8-bit path (`ops/dropout.py`)
    — same expectation semantics as `nn.Dropout` with a quarter of the RNG
    traffic and no stored backward mask."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        return fused_dropout(
            x, self.rate, rng=self.make_rng("dropout"), deterministic=False
        )


class LayerNorm(nn.Module):
    """LayerNorm with `nn.LayerNorm`'s param names/shapes (scale, bias)
    backed by the Pallas fused kernel (`ops/layernorm.py`) on TPU.

    NOT used by Temporal3DViT: measured 16 % SLOWER than XLA's LayerNorm
    at the bench shapes (C=384, M=131k — XLA fuses the norm into
    neighboring ops; the opaque kernel forfeits that and pays full
    boundary HBM traffic). Kept as a library module for models with
    larger channel counts where XLA's reduction fusions lose."""

    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        fused = jax.default_backend() == "tpu"
        return fused_layer_norm(x, scale, bias, eps=self.eps, fused=fused)


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference `models/model.py:57-71`):
    drop the entire residual branch for a sample with prob `rate`, rescale
    survivors by 1/keep_prob."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep_prob = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        keep = jax.random.bernoulli(rng, keep_prob, shape)
        return jnp.where(keep, x / keep_prob, 0.0).astype(x.dtype)


class LayerScale(nn.Module):
    """Learnable per-channel residual scaling γ (reference `model.py:74-82`)."""

    dim: int
    init_value: float = 1e-4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        return x * gamma.astype(x.dtype)


class QKVProjection(nn.Module):
    """Fused qkv projection with a (D, 3, D) kernel / (3, D) bias.

    Byte- and math-identical to a Dense(3D) whose columns pack [q | k | v],
    but the kernel's LAST dim is the head-major D, so the Megatron column
    split (`parallel/mesh.py` P(None, None, 'model')) gives every
    model-shard a contiguous [q_heads | k_heads | v_heads] group — the
    per-shard packing the flash kernel consumes under shard_map.

    Two emission forms of the same math:
      * grouped=False (single mesh / replicated): the param reshapes to
        (D, 3D) — a free bitcast of a replicated input — and the matmul is
        the plain (B·N, D)@(D, 3D) GEMM. This keeps the HLO byte-identical
        to a Dense(3D): XLA's fusion choices at the tuned 26 MiB
        scoped-VMEM operating point are HLO-sensitive, and the
        DenseGeneral-form dot_general alone measured −9 % on the bench.
      * grouped=True (TP): dot_general against the 3-D kernel, keeping the
        sharded last dim separate — output (B, N, 3, D) lands sharded
        P('data', None, None, 'model') with zero resharding into the
        shard_map'd attention core.
    """

    d: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array, grouped: bool) -> jax.Array:
        kernel = self.param(
            "kernel", trunc_init, (self.d, 3, self.d), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (3, self.d), self.param_dtype
        )
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        b = bias.astype(self.dtype)
        if grouped:
            y = jax.lax.dot_general(
                x, k, (((x.ndim - 1,), (0,)), ((), ()))
            )
            return y + b                                # (B, N, 3, D)
        return x @ k.reshape(self.d, 3 * self.d) + b.reshape(3 * self.d)


class Attention(nn.Module):
    """Multi-head self-attention with fused qkv projection
    (reference `models/model.py:85-119`).

    Under tensor parallelism (`mesh` attribute with model axis > 1) the
    attention core runs head-parallel via shard_map
    (`ops/attention.py::tp_multi_head_attention_qkv3`) — GSPMD cannot
    partition the Pallas kernel by itself."""

    config: Temporal3DViTConfig
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool,
        store_attention: bool = False,
    ) -> jax.Array:
        cfg = self.config
        b, n, d = x.shape
        h, dh = cfg.n_heads, cfg.head_dim
        dtype = jnp.dtype(cfg.compute_dtype)

        tp = self.mesh.shape["model"] if self.mesh is not None else 1
        use_tp = tp > 1 and not store_attention and h % tp == 0
        qkv = QKVProjection(
            d=d, dtype=dtype, param_dtype=jnp.dtype(cfg.param_dtype),
            name="qkv",
        )(x, grouped=use_tp)
        # The packed projection output goes straight into the attention
        # core: the flash kernel slices heads internally via lane offsets,
        # so q/k/v never materialize as separate tensors and no
        # transpose/pad copies exist between the two projections.

        dropout_rng = None
        if cfg.attention_dropout > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        if use_tp:
            out = tp_multi_head_attention_qkv3(
                qkv,
                mesh=self.mesh,
                n_heads=h,
                scale=dh ** -0.5,
                dropout_rate=cfg.attention_dropout,
                deterministic=deterministic,
                dropout_rng=dropout_rng,
                use_flash=cfg.use_flash_attention,
            )
            weights = None
        else:
            out, weights = multi_head_attention_qkv(
                qkv,
                n_heads=h,
                scale=dh ** -0.5,
                dropout_rate=cfg.attention_dropout,
                deterministic=deterministic,
                dropout_rng=dropout_rng,
                use_flash=cfg.use_flash_attention and not store_attention,
                return_weights=store_attention,
            )
        if store_attention and weights is not None:
            # Pre-dropout softmax maps, as in the reference's
            # get_attention_maps (model.py:345-347).
            self.sow("intermediates", "attention", weights)

        out = nn.Dense(
            d, kernel_init=trunc_init, dtype=dtype,
            param_dtype=jnp.dtype(cfg.param_dtype), name="proj",
        )(out)
        out = Dropout(cfg.dropout)(out, deterministic)
        return out


class MLP(nn.Module):
    """Dense → GELU → Dropout → Dense → Dropout (reference `model.py:122-148`)."""

    config: Temporal3DViTConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        cfg = self.config
        d = x.shape[-1]
        hidden = int(d * cfg.mlp_ratio)
        dtype = jnp.dtype(cfg.compute_dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        x = nn.Dense(hidden, kernel_init=trunc_init, dtype=dtype,
                     param_dtype=pdtype, name="fc1")(x)
        x = _gelu(x, cfg.gelu)
        x = Dropout(cfg.dropout)(x, deterministic)
        x = nn.Dense(d, kernel_init=trunc_init, dtype=dtype,
                     param_dtype=pdtype, name="fc2")(x)
        x = Dropout(cfg.dropout)(x, deterministic)
        return x


class TransformerBlock(nn.Module):
    """Pre-LN block: x + DP(LS(Attn(LN x))) ; x + DP(LS(MLP(LN x)))
    (reference `models/model.py:151-178`)."""

    config: Temporal3DViTConfig
    drop_path_rate: float
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool, store_attention: bool = False
    ) -> jax.Array:
        cfg = self.config
        ls = cfg.layer_scale_init
        # XLA LayerNorm: measured FASTER than the Pallas fused LN at these
        # shapes (1409 vs 1183 v/s) — XLA fuses the norm into neighboring
        # producers/consumers, which an opaque kernel forfeits. The fused
        # op stays available in ops/layernorm.py for shapes where XLA's
        # fusion loses.
        norm = lambda name: nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.dtype(cfg.norm_dtype),
            param_dtype=jnp.dtype(cfg.param_dtype), name=name,
        )
        y = norm("norm1")(x).astype(jnp.dtype(cfg.compute_dtype))
        y = Attention(cfg, mesh=self.mesh, name="attn")(
            y, deterministic, store_attention
        )
        if ls > 0:
            y = LayerScale(cfg.embed_dim, ls, name="ls1")(y)
        y = DropPath(self.drop_path_rate, name="drop_path1")(y, deterministic)
        x = x + y

        y = norm("norm2")(x).astype(jnp.dtype(cfg.compute_dtype))
        # remat='mlp': recompute only fc1/GELU/fc2 in the backward pass.
        # The MLP's two hidden (N, 4D) planes dominate activation HBM,
        # while the flash-attention custom VJP already recomputes the
        # attention internals from (qkv, o, lse) — so block-level remat's
        # extra flash-forward re-run buys almost no memory that this
        # doesn't, at several times the recompute cost.
        mlp_cls = (nn.remat(MLP, static_argnums=(2,))
                   if cfg.remat == "mlp" else MLP)
        y = mlp_cls(cfg, name="mlp")(y, deterministic)
        if ls > 0:
            y = LayerScale(cfg.embed_dim, ls, name="ls2")(y)
        y = DropPath(self.drop_path_rate, name="drop_path2")(y, deterministic)
        return x + y


class Temporal3DViT(nn.Module):
    """Full Temporal 3D ViT (reference `models/model.py:181-323`).

    `mesh`: pass the training step's ('data', 'model') mesh when its model
    axis is >1 — attention then runs head-parallel under shard_map (GSPMD
    cannot partition the Pallas kernel by itself); all other TP splits stay
    pure sharding annotations (`parallel/mesh.py`)."""

    config: Temporal3DViTConfig
    mesh: Optional[Mesh] = None

    def setup(self):
        self.config.validate()

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        store_attention: bool = False,
    ) -> jax.Array:
        """Args:
            x: (B, K, F, T) or (B, 1, K, F, T) spectrogram volumes — or
                pre-tiled patches (B, K', F', T', patch_dim) as produced by
                the loader's pair-tile storage mode (`loader.pair_tiles`):
                the per-step patchify transpose then disappears entirely
                (the tiling happened once at dataset load). Patch-vector
                element order is (pk, pf, pt) in both layouts, so the same
                `patch_embed` weights apply and logits are bit-identical.
            train: enables dropout/drop-path (requires 'dropout' rng).
            store_attention: sow per-layer softmax maps into 'intermediates'
                (forces the XLA attention path).

        Returns:
            (B, n_classes) float32 logits.
        """
        cfg = self.config
        deterministic = not train
        dtype = jnp.dtype(cfg.compute_dtype)
        pdtype = jnp.dtype(cfg.param_dtype)

        gk, gf, gt = cfg.grid_k, cfg.grid_f, cfg.grid_t
        pk, pf, pt = cfg.patch_trial, cfg.patch_freq, cfg.patch_time
        tiled_shape = (gk, gf, gt, cfg.patch_dim)
        pre_tiled = x.ndim == 5 and x.shape[1:] == tiled_shape
        if x.ndim == 5 and not pre_tiled:  # (B, 1, K, F, T) → (B, K, F, T)
            if x.shape[1] != 1:
                raise ValueError(
                    f"5-D input {x.shape[1:]} is neither (1, K, F, T) nor "
                    f"the pre-tiled patch layout {tiled_shape}"
                )
            x = x[:, 0]
        b = x.shape[0]

        # Patch embedding: reshape to per-patch vectors + one Dense. The
        # (pk, pf, pt) ordering matches Conv3d's kernel layout so checkpoints
        # are interchangeable with the reference's conv weights. Cast to the
        # compute dtype BEFORE the 7-D transpose: the Dense rounds its input
        # to bf16 anyway, and moving the cast ahead of the shuffle halves its
        # HBM traffic (measured 2.83 → 1.32 ms at bench dims, bit-identical
        # output; scripts/perf_patch_embed.py). Pre-tiled input skips the
        # transpose altogether — the embed is a bare reshape + matmul.
        if pre_tiled:
            x = x.astype(dtype).reshape(b, cfg.n_patches, cfg.patch_dim)
        else:
            x = x.astype(dtype).reshape(b, gk, pk, gf, pf, gt, pt)
            x = x.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
                b, cfg.n_patches, cfg.patch_dim
            )
        x = nn.Dense(
            cfg.embed_dim, kernel_init=_conv3d_default_init,
            bias_init=_conv3d_default_bias_init(cfg.patch_dim), dtype=dtype,
            param_dtype=pdtype, name="patch_embed",
        )(x)

        # Factorized positional embeddings (reference `model.py:276-285`):
        # three learned tables broadcast-summed over the (K', F', T') grid.
        pos_k = self.param("pos_embed_k", trunc_init, (gk, cfg.embed_dim), pdtype)
        pos_f = self.param("pos_embed_f", trunc_init, (gf, cfg.embed_dim), pdtype)
        pos_t = self.param("pos_embed_t", trunc_init, (gt, cfg.embed_dim), pdtype)
        pos = (
            pos_k[:, None, None, :] + pos_f[None, :, None, :]
            + pos_t[None, None, :, :]
        ).reshape(1, cfg.n_patches, cfg.embed_dim)
        x = x + pos.astype(dtype)

        if cfg.pool == "cls":
            cls = self.param(
                "cls_token", trunc_init, (1, 1, cfg.embed_dim), pdtype
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(dtype), (b, 1, cfg.embed_dim)),
                 x],
                axis=1,
            )
        # pool == "mean"/"probe": no CLS token — the sequence stays the bare
        # patch grid (512 tokens at default dims): lane-aligned, so Mosaic
        # pads nothing and every attention matmul/softmax plane shrinks
        # 640→512.
        x = Dropout(cfg.dropout)(x, deterministic)

        # Linear stochastic-depth decay (reference `model.py:227`).
        dpr = np.linspace(0.0, cfg.drop_path, cfg.n_layers)
        block_cls = TransformerBlock
        if cfg.remat in (True, "block"):
            # Recompute each block in the backward pass instead of saving
            # its activations (jax.checkpoint): O(n_layers) less HBM.
            # (cfg.remat == "mlp" is handled inside TransformerBlock.)
            block_cls = nn.remat(TransformerBlock, static_argnums=(2, 3))
        for i in range(cfg.n_layers):
            x = block_cls(
                cfg, drop_path_rate=float(dpr[i]), mesh=self.mesh,
                name=f"block_{i}",
            )(x, deterministic, store_attention)

        x = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.dtype(cfg.norm_dtype),
            param_dtype=pdtype, name="norm",
        )(x)

        # Classification head (reference `model.py:247-252` reads the CLS
        # token; pool='mean' reads the mean-pooled tokens, pool='probe' a
        # learned single-query multi-head attention pool — the MAP head).
        if cfg.pool == "cls":
            clsf = x[:, 0].astype(dtype)
        elif cfg.pool == "probe":
            probe = self.param(
                "probe", trunc_init, (1, 1, cfg.embed_dim), pdtype
            )
            # One query row against N keys/values. The k/v projections
            # are O(N·D²) (~1.7% of a forward at N=512 — counted in
            # bench.py's FLOPs model); the attention itself is one row.
            # It keeps the blocks' sequence at the bare lane-aligned
            # patch grid.
            pooled = nn.MultiHeadDotProductAttention(
                num_heads=cfg.n_heads, dtype=dtype, param_dtype=pdtype,
                kernel_init=trunc_init, deterministic=True,
                name="probe_attn",
            )(jnp.broadcast_to(probe.astype(dtype),
                               (b, 1, cfg.embed_dim)), x.astype(dtype))
            clsf = pooled[:, 0]
        else:
            clsf = jnp.mean(x, axis=1).astype(dtype)
        clsf = nn.Dense(cfg.embed_dim, kernel_init=trunc_init, dtype=dtype,
                        param_dtype=pdtype, name="head_fc1")(clsf)
        clsf = _gelu(clsf, cfg.gelu)
        clsf = Dropout(cfg.dropout)(clsf, deterministic)
        logits = nn.Dense(cfg.n_classes, kernel_init=trunc_init,
                          dtype=jnp.float32, param_dtype=pdtype,
                          name="head_fc2")(clsf)
        return logits.astype(jnp.float32)


def attention_maps(
    model: Temporal3DViT,
    variables,
    x: jax.Array,
):
    """Per-layer softmax attention maps for interpretability — functional
    equivalent of the reference's `get_attention_maps` (model.py:325-350).

    Returns a list of (B, H, N, N) arrays, one per transformer block
    (eval mode: no dropout, pre-dropout weights).
    """
    _, state = model.apply(
        variables, x, train=False, store_attention=True,
        mutable=["intermediates"],
    )
    inter = state["intermediates"]
    maps = []
    i = 0
    while f"block_{i}" in inter:
        maps.append(inter[f"block_{i}"]["attn"]["attention"][0])
        i += 1
    return maps
