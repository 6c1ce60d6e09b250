"""Session-stratified splits (host-side, sklearn, seed-42 deterministic).

Split determinism is a hard parity requirement (SURVEY §7): the reference's
`StratifiedGroupKFold`-based protocol (`data/session_splits.py`) defines
which sessions land in train/val/test, and the baselines and the split
integrity gate both assume it. The logic is offline and tiny, so it stays on
host with sklearn; only the chosen-fold selection rule must match the
reference exactly (pick the fold whose test fraction is nearest the
requested size, first-best wins on ties).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from sklearn.model_selection import StratifiedGroupKFold


def stratified_group_split(
    labels: Sequence,
    groups: Sequence,
    test_size: float,
    random_state: int = 42,
) -> Tuple[np.ndarray, np.ndarray]:
    """One train/test split of row indices, grouped by `groups` and
    stratified by `labels` (reference `session_splits.py:5-31`).

    Scans the K folds of a shuffled StratifiedGroupKFold (K ≈ 1/test_size,
    clipped to the group count) and keeps the fold whose held-out fraction is
    closest to `test_size`.
    """
    if not 0 < test_size < 1:
        raise ValueError("test_size must be between 0 and 1.")
    labels = np.asarray(labels)
    groups = np.asarray(groups)
    unique_groups = np.unique(groups)
    if unique_groups.size < 2:
        raise ValueError("Need at least 2 groups to split.")

    n_splits = max(2, int(round(1.0 / test_size)))
    n_splits = min(n_splits, unique_groups.size)

    sgkf = StratifiedGroupKFold(
        n_splits=n_splits, shuffle=True, random_state=random_state
    )
    best = None
    for train_idx, test_idx in sgkf.split(np.zeros(labels.shape[0]), labels, groups):
        diff = abs(len(test_idx) / len(labels) - test_size)
        if best is None or diff < best[0]:
            best = (diff, train_idx, test_idx)
    assert best is not None
    return best[1], best[2]


def create_session_splits_df(df, test_size: float, val_size: float, random_state: int = 42):
    """3-way session-disjoint split of a trials DataFrame with 'session' and
    'condition' columns (reference `session_splits.py:89-140`).

    Returns (train_df, val_df, test_df); asserts session disjointness.
    """
    if not 0 < val_size < 1:
        raise ValueError("val_size must be between 0 and 1.")
    val_ratio = val_size / (1.0 - test_size)
    if not 0 < val_ratio < 1:
        raise ValueError("val_size is too large relative to test_size.")

    train_val_idx, test_idx = stratified_group_split(
        df["condition"].values, df["session"].values, test_size, random_state
    )
    train_val = df.iloc[train_val_idx].copy()
    test_df = df.iloc[test_idx].copy()

    train_idx, val_idx = stratified_group_split(
        train_val["condition"].values,
        train_val["session"].values,
        val_ratio,
        random_state,
    )
    train_df = train_val.iloc[train_idx].copy()
    val_df = train_val.iloc[val_idx].copy()

    _assert_disjoint(train_df["session"], val_df["session"], test_df["session"])
    return train_df, val_df, test_df


def create_session_splits(
    sequences: List[dict], test_size: float, val_size: float, random_state: int = 42
):
    """Same protocol over a list of sequence dicts with 'session'/'label'
    keys (reference `session_splits.py:34-86`)."""
    if not 0 < val_size < 1:
        raise ValueError("val_size must be between 0 and 1.")
    val_ratio = val_size / (1.0 - test_size)
    if not 0 < val_ratio < 1:
        raise ValueError("val_size is too large relative to test_size.")

    labels = np.array([s["label"] for s in sequences])
    groups = np.array([s["session"] for s in sequences])
    train_val_idx, test_idx = stratified_group_split(
        labels, groups, test_size, random_state
    )
    train_val = [sequences[i] for i in train_val_idx]
    test_seqs = [sequences[i] for i in test_idx]

    train_idx, val_idx = stratified_group_split(
        labels[train_val_idx], groups[train_val_idx], val_ratio, random_state
    )
    train_seqs = [train_val[i] for i in train_idx]
    val_seqs = [train_val[i] for i in val_idx]

    _assert_disjoint(
        np.array([s["session"] for s in train_seqs]),
        np.array([s["session"] for s in val_seqs]),
        np.array([s["session"] for s in test_seqs]),
    )
    return train_seqs, val_seqs, test_seqs


def create_kfold_splits(sequences: List[dict], n_splits: int = 5, random_state: int = 42):
    """Session-level K-fold CV (reference `session_splits.py:143-156`)."""
    sessions = [s["session"] for s in sequences]
    labels = [s["label"] for s in sequences]
    sgkf = StratifiedGroupKFold(
        n_splits=n_splits, shuffle=True, random_state=random_state
    )
    folds = []
    for train_idx, test_idx in sgkf.split(sequences, labels, sessions):
        folds.append(
            ([sequences[i] for i in train_idx], [sequences[i] for i in test_idx])
        )
    return folds


def _assert_disjoint(*session_cols) -> None:
    sets = [set(np.asarray(c).tolist()) for c in session_cols]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            overlap = sets[i] & sets[j]
            assert not overlap, f"session leakage across splits: {overlap}"
