"""Model configuration and size registry.

Capability parity with the reference's config surface
(`temporal_vit/models/model.py:7-55` in anthonylu23/neural-vit): same field
names, defaults, derived properties, and tiny/small/base variants — but as a
*frozen, hashable* dataclass so it can be passed as a static argument to
`jax.jit` and used as a cache key for compiled train steps.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Union


@dataclass(frozen=True)
class Temporal3DViTConfig:
    """Configuration for the Temporal 3D ViT.

    Input volumes are (trials K, frequency F, time T) token grids; patches are
    3D blocks of size (patch_trial, patch_freq, patch_time).
    """

    # Input dimensions
    n_trials: int = 8          # Trials per sequence (K)
    freq_size: int = 64        # Frequency bins (F)
    time_size: int = 128       # Time bins (T)

    # Patch dimensions
    patch_trial: int = 2
    patch_freq: int = 8
    patch_time: int = 8

    # Model dimensions
    embed_dim: int = 384
    n_heads: int = 6
    n_layers: int = 8
    mlp_ratio: float = 4.0

    # Regularization
    dropout: float = 0.1
    attention_dropout: float = 0.1
    drop_path: float = 0.1     # Stochastic depth (linearly decayed over depth)

    # Output
    n_classes: int = 2         # WT vs FMR1

    # Training
    layer_scale_init: float = 1e-4

    # TPU execution knobs (no analogue in the reference; compute-path only,
    # never change the math beyond dtype of intermediate matmuls).
    use_flash_attention: bool = True   # Pallas kernel when available
    compute_dtype: str = "bfloat16"    # matmul/activation dtype on TPU
    param_dtype: str = "float32"       # parameter storage dtype
    remat: Union[bool, str] = False    # rematerialize in backward:
                                       # False/off, True/"block" = whole
                                       # transformer blocks (max HBM relief,
                                       # ~24% step cost at production dims —
                                       # and it re-runs the flash fwd kernel
                                       # even though the fused backward
                                       # already recomputes attention probs
                                       # internally); "mlp" = only the MLP
                                       # sub-block (fc1/GELU/fc2 — the 8·D
                                       # hidden planes, which dominate
                                       # activation HBM; no attention
                                       # recompute, measured far cheaper)
    gelu: str = "erf"                  # "erf" = exact torch parity;
                                       # "tanh" = standard fast approximation
                                       # (far fewer VPU ops; the usual ViT
                                       # training choice, quality-neutral);
                                       # "quick" = x·σ(1.702x) (QuickGELU,
                                       # cheapest on the VPU)
    norm_dtype: str = "float32"        # LayerNorm compute dtype. "bfloat16"
                                       # keeps the normalized stream in bf16
                                       # (mean/var still accumulate f32 via
                                       # XLA reduction semantics)
    pool: str = "cls"                  # "cls" = classify the CLS token
                                       # (exact reference semantics);
                                       # "mean" = no CLS token, classify the
                                       # mean-pooled tokens (SimpleViT-style);
                                       # "probe" = no CLS token, classify a
                                       # learned single-query multi-head
                                       # attention pool over the tokens (the
                                       # MAP head of Zhai et al., "Scaling
                                       # Vision Transformers").
                                       # On TPU "mean"/"probe" make the token
                                       # count the bare patch grid (512 at
                                       # default dims, vs 513) — a
                                       # lane-aligned sequence that removes
                                       # Mosaic's 513→640 padding tax from
                                       # every attention matmul and softmax
                                       # plane in all n_layers blocks; the
                                       # probe's own cross-attention is one
                                       # query row (~0.3% of step FLOPs).

    # ---- derived ----
    @property
    def grid_k(self) -> int:
        return self.n_trials // self.patch_trial

    @property
    def grid_f(self) -> int:
        return self.freq_size // self.patch_freq

    @property
    def grid_t(self) -> int:
        return self.time_size // self.patch_time

    @property
    def n_patches(self) -> int:
        return self.grid_k * self.grid_f * self.grid_t

    @property
    def patch_dim(self) -> int:
        return self.patch_trial * self.patch_freq * self.patch_time

    @property
    def seq_len(self) -> int:
        """Token count (includes the CLS token under pool='cls')."""
        return self.n_patches + (1 if self.pool == "cls" else 0)

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.n_heads

    def validate(self) -> "Temporal3DViTConfig":
        """Divisibility validation (reference `models/model.py:189-194`)."""
        if self.n_trials % self.patch_trial != 0:
            raise ValueError("n_trials must be divisible by patch_trial.")
        if self.freq_size % self.patch_freq != 0:
            raise ValueError("freq_size must be divisible by patch_freq.")
        if self.time_size % self.patch_time != 0:
            raise ValueError("time_size must be divisible by patch_time.")
        if self.embed_dim % self.n_heads != 0:
            raise ValueError("embed_dim must be divisible by n_heads.")
        if self.pool not in ("cls", "mean", "probe"):
            raise ValueError(
                f"pool must be 'cls', 'mean' or 'probe', got {self.pool!r}"
            )
        if self.remat not in (False, True, "block", "mlp"):
            raise ValueError(
                f"remat must be False, True, 'block' or 'mlp', "
                f"got {self.remat!r}"
            )
        return self

    def replace(self, **kwargs) -> "Temporal3DViTConfig":
        return dataclasses.replace(self, **kwargs)


# Model variants (reference `models/model.py:51-55`).
CONFIGS = {
    "tiny": Temporal3DViTConfig(embed_dim=192, n_heads=3, n_layers=4),
    "small": Temporal3DViTConfig(embed_dim=384, n_heads=6, n_layers=8),
    "base": Temporal3DViTConfig(embed_dim=512, n_heads=8, n_layers=12),
}


def build_vit_config(
    model_size: str = "small",
    *,
    n_trials: int = 8,
    freq_size: int = 64,
    time_size: int = 128,
    patch_trial: Optional[int] = None,
    patch_freq: Optional[int] = None,
    patch_time: Optional[int] = None,
    embed_dim: Optional[int] = None,
    n_heads: Optional[int] = None,
    n_layers: Optional[int] = None,
    mlp_ratio: Optional[float] = None,
    dropout: float = 0.2,
    attention_dropout: float = 0.1,
    drop_path: float = 0.1,
    **extra,
) -> Temporal3DViTConfig:
    """Size preset merged with per-field overrides.

    Mirrors the layered override scheme of the reference's `build_model`
    (`training/train.py:53-74`): a named preset provides architecture
    defaults; any explicitly provided field wins.
    """
    base = CONFIGS[model_size]
    cfg = base.replace(
        n_trials=n_trials,
        freq_size=freq_size,
        time_size=time_size,
        patch_trial=patch_trial or base.patch_trial,
        patch_freq=patch_freq or base.patch_freq,
        patch_time=patch_time or base.patch_time,
        embed_dim=embed_dim or base.embed_dim,
        n_heads=n_heads or base.n_heads,
        n_layers=n_layers or base.n_layers,
        mlp_ratio=mlp_ratio or base.mlp_ratio,
        dropout=dropout,
        attention_dropout=attention_dropout,
        drop_path=drop_path,
        **extra,
    )
    return cfg.validate()
