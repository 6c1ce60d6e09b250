"""Learning-rate schedules with the reference's epoch-granular semantics.

The reference steps its LambdaLR once per epoch
(`train_hptune.py:192-223,487`): linear warmup over `warmup_epochs` (scale
(e+1)/warmup), then cosine decay from 1 to min_lr/base_lr. We reproduce the
exact epoch-staircase (not a smooth per-step curve) so training dynamics
match. warmup_epochs=0 means cosine-only from epoch 0, exactly like the
reference's lr_lambda; the plain `train.py` constant-lr behavior is reached
via `TrainConfig.use_cosine_schedule=False` → `constant_schedule`.
"""

from __future__ import annotations

import math


def warmup_cosine_epoch_schedule(
    base_lr: float,
    *,
    warmup_epochs: int,
    total_epochs: int,
    min_lr: float,
    steps_per_epoch: int,
):
    """optax-compatible step→lr schedule with per-epoch granularity."""

    def scale_for_epoch(epoch: int) -> float:
        if warmup_epochs <= 0:
            return 1.0 if total_epochs <= 0 else _cosine(epoch)
        if epoch < warmup_epochs:
            return (epoch + 1) / warmup_epochs
        return _cosine(epoch)

    def _cosine(epoch: int) -> float:
        progress = (epoch - warmup_epochs) / max(1, total_epochs - warmup_epochs)
        cosine_decay = 0.5 * (1.0 + math.cos(math.pi * progress))
        min_scale = min_lr / base_lr
        return min_scale + (1.0 - min_scale) * cosine_decay

    def schedule(step):
        import jax.numpy as jnp

        epoch = jnp.asarray(step) // max(1, steps_per_epoch)
        # Static table indexed by epoch (clipped) — jit-friendly.
        table = jnp.asarray(
            [base_lr * scale_for_epoch(e) for e in range(max(1, total_epochs) + 1)]
        )
        return table[jnp.clip(epoch, 0, total_epochs)]

    return schedule


def constant_schedule(base_lr: float):
    def schedule(step):
        return base_lr

    return schedule


def linear_scaled_lr(base_lr: float, batch_size: int, base_batch: int = 16) -> float:
    """Linear LR scaling rule (reference `train_hptune.py:230-233`)."""
    return base_lr * batch_size / base_batch
