"""neural_vit_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for multi-trial
LFP classification with a Temporal 3D Vision Transformer.

Re-designed TPU-first with the capabilities of the `anthonylu23/neural-vit`
reference (see SURVEY.md): fused spectrogram preprocessing (STFT + log-power +
train-only z-normalization) as a single XLA program, a Temporal 3D ViT with
Pallas flash attention, a jit/pjit data-parallel training loop with
class-weighted smoothed cross-entropy, warmup-cosine AdamW, Orbax
checkpointing, triple-sink experiment logging, HP-tune sweeps across the
device mesh, and classical baselines + eval gates on identical
session-stratified splits.
"""

__version__ = "0.1.0"

from neural_vit_tpu.core.config import (  # noqa: F401
    CONFIGS,
    Temporal3DViTConfig,
)
