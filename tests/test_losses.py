"""Loss parity against torch.nn.functional.cross_entropy (CPU torch is the
gold standard for the reference's training semantics, `train.py:157-170`)."""

import numpy as np
import pytest

from neural_vit_tpu.ops.losses import (
    accuracy_and_probs,
    class_weights_from_counts,
    weighted_smoothed_cross_entropy,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("smoothing", [0.0, 0.05, 0.3])
@pytest.mark.parametrize("weighted", [False, True])
def test_matches_torch(rng, smoothing, weighted):
    B, C = 17, 2
    logits = rng.standard_normal((B, C)).astype(np.float32) * 3
    labels = rng.integers(0, C, size=B)
    w = rng.uniform(0.2, 3.0, size=C).astype(np.float32) if weighted else None

    ours = float(
        weighted_smoothed_cross_entropy(logits, labels, w, smoothing)
    )
    ref = F.cross_entropy(
        torch.tensor(logits),
        torch.tensor(labels),
        weight=torch.tensor(w) if w is not None else None,
        label_smoothing=smoothing,
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_class_weights_match_reference_formula():
    counts = np.array([30, 10])
    w = class_weights_from_counts(counts)
    # torch formulation: weights = counts.sum() / (counts * n_classes)
    np.testing.assert_allclose(w, [40 / 60, 40 / 20])
    # absent class zeroed
    w = class_weights_from_counts(np.array([5, 0]))
    assert w[1] == 0.0 and w[0] > 0


def test_accuracy_and_probs(rng):
    logits = np.array([[2.0, -1.0], [0.0, 3.0], [1.0, 1.5]], np.float32)
    labels = np.array([0, 1, 0])
    correct, probs = accuracy_and_probs(logits, labels)
    assert int(correct) == 2
    sm = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(probs), sm[:, 1], rtol=1e-5)
