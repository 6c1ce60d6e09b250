"""Classification losses with exact PyTorch `CrossEntropyLoss` semantics.

The reference trains with class-weighted, label-smoothed cross entropy
(`training/train.py:157-170`). Torch's weighted+smoothed CE (verified
empirically against torch 2.13, see tests/test_losses.py):

    q_c       = (1 - ε) · 1[c = y] + ε / C
    loss_i    = -Σ_c q_c · w_c · log p_c(x_i)
    mean loss = Σ_i loss_i / Σ_i w_{y_i}     (weighted-mean reduction)

The subtle part is the denominator: Σ of the *target-class* weights, not the
batch size.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def class_weights_from_counts(counts: np.ndarray) -> np.ndarray:
    """Inverse-frequency class weights, zeroed for absent classes
    (reference `training/train.py:161-166`): w_c = N / (count_c · C)."""
    counts = np.asarray(counts, dtype=np.float32)
    n_classes = counts.shape[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        weights = counts.sum() / (counts * n_classes)
    return np.where(counts > 0, weights, 0.0).astype(np.float32)


def weighted_smoothed_cross_entropy_sums(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array] = None,
    label_smoothing: float = 0.0,
    sample_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Un-normalized form: (Σ_i loss_i, Σ_i w_{y_i}).

    The sums are what gradient accumulation needs — summing them across
    microbatches and dividing once reproduces the big-batch weighted mean
    (and its gradient) exactly, which per-microbatch means would not
    (torch's weighted-mean denominator is the Σ of target-class weights,
    so microbatch means have different denominators)."""
    n_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
    q = (1.0 - label_smoothing) * onehot + label_smoothing / n_classes
    if class_weights is None:
        per_sample = -jnp.sum(q * logp, axis=-1)
        sample_w = jnp.ones(logits.shape[0], jnp.float32)
    else:
        w = jnp.asarray(class_weights, dtype=jnp.float32)
        per_sample = -jnp.sum(q * w[None, :] * logp, axis=-1)
        sample_w = w[labels]
    if sample_mask is not None:
        m = sample_mask.astype(jnp.float32)
        per_sample = per_sample * m
        sample_w = sample_w * m
    return jnp.sum(per_sample), jnp.sum(sample_w)


def weighted_smoothed_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array] = None,
    label_smoothing: float = 0.0,
    sample_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean weighted label-smoothed softmax cross-entropy (torch semantics).

    Args:
        logits: (B, C) float logits.
        labels: (B,) int class indices.
        class_weights: optional (C,) per-class weights.
        label_smoothing: ε ∈ [0, 1).
        sample_mask: optional (B,) {0,1} validity mask — padded samples
            (jit-stable final batches) contribute nothing to loss or
            normalization.

    Returns:
        scalar loss.
    """
    loss_sum, weight_sum = weighted_smoothed_cross_entropy_sums(
        logits, labels, class_weights, label_smoothing, sample_mask
    )
    return loss_sum / jnp.maximum(weight_sum, 1e-12)


def accuracy_and_probs(
    logits: jax.Array, labels: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(#correct, P(class=1)) — probabilities for host-side ROC-AUC
    (the reference computes AUC with sklearn on host, `train.py:96-104`)."""
    preds = jnp.argmax(logits, axis=-1)
    correct = jnp.sum(preds == labels)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]
    return correct, probs
