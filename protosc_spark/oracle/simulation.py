"""Synthetic feature-matrix generators with planted ground truth —
re-derivations of the reference's simulation fixtures
(protosc/simulation.py:5-133) used for selection-parity tests
(FIXTURES.md F2/F3/F4).

The legacy ``np.random`` call ORDER is part of the contract: with the
same global seed these produce the same matrices the reference's
generators would, so ground-truth-recovery assertions transfer
(reference tests/test_fold_models.py pins seed 1928374).
"""

from __future__ import annotations

import numpy as np


def make_independent(
    n_features: int = 400,
    n_samples: int = 500,
    n_true: int = 25,
    min_dev: float = 0.25,
    max_dev: float = 0.5,
):
    """Planted mean-shift features, binary labels (reference
    create_independent_data, protosc/simulation.py:5-32)."""
    n_one = n_samples // 2
    y = np.append(np.ones(n_one, dtype=int), np.zeros(n_samples - n_one, dtype=int))
    np.random.shuffle(y)
    ones = np.where(y == 1)[0]
    X = np.random.randn(n_samples, n_features)

    planted_bias = np.linspace(min_dev, max_dev, n_true) * (-1.0) ** np.arange(n_true)
    true_ids = np.random.choice(n_features, size=n_true, replace=False)
    biases = np.zeros(n_features)
    biases[true_ids] = planted_bias
    for fid in true_ids:
        X[ones, fid] += biases[fid]
    return X, y, {"selected_features": true_ids, "biases": biases}


def make_correlated(
    n_base_features: int = 200,
    n_samples: int = 500,
    n_true: int = 10,
    n_corr: int = 5,
    min_dev: float = 0.25,
    max_dev: float = 0.5,
    corr_frac: float = 0.9,
):
    """Base features with correlated copies + planted signal in the
    first n_true base groups (reference create_correlated_data,
    protosc/simulation.py:35-80). Ground truth includes cluster ids.
    """
    n_features = n_base_features * n_corr
    n_one = n_samples // 2
    y = np.append(np.ones(n_one, dtype=int), np.zeros(n_samples - n_one, dtype=int))
    np.random.shuffle(y)
    ones = np.where(y == 1)[0]

    base = np.random.randn(n_samples, n_base_features)
    X = np.empty((n_samples, n_features))
    for i in range(n_corr):
        X[:, i::n_corr] = corr_frac * base + (1 - corr_frac) * np.random.randn(
            n_samples, n_base_features
        )

    planted = np.linspace(min_dev, max_dev, n_true) * (-1.0) ** np.arange(n_true)
    bias_per_col = np.zeros(n_features)
    cluster_of_col = (np.arange(n_features) / n_corr).astype(int)
    for b in range(n_true):
        cols = slice(b * n_corr, (b + 1) * n_corr)
        X[ones, cols] += planted[b]
        bias_per_col[cols] = planted[b]

    is_true = np.zeros(n_features, dtype=bool)
    is_true[: n_true * n_corr] = True

    reorder = np.random.permutation(n_features)
    X = X[:, reorder]
    truth = {
        "selected_features": np.where(is_true[reorder])[0],
        "biases": bias_per_col[reorder],
        "clusters": cluster_of_col[reorder],
    }
    return X, y, truth


def make_categorical(
    n_features: int = 500,
    n_samples: int = 500,
    n_true: int = 25,
    n_categories: int = 5,
    min_dev: float = 0.25,
    max_dev: float = 0.5,
):
    """Multi-class variant (reference create_categorical_data,
    protosc/simulation.py:96-133) — pins the multi-group H path."""
    y = (n_categories * np.arange(n_samples) / n_samples).astype(int)
    masks = [(y == c).astype(int) for c in range(n_categories)]
    X = np.random.randn(n_samples, n_features)

    biases = np.zeros(n_features)
    biases[:n_true] = np.linspace(min_dev, max_dev, n_true) * (-1.0) ** np.arange(
        n_true
    )
    is_true = np.zeros(n_features, dtype=bool)
    is_true[:n_true] = True

    for fid in range(n_features):
        if biases[fid] == 0:
            continue
        frac = np.random.rand(n_categories)
        frac = (n_categories / 2) * frac / frac.sum()
        for c in range(n_categories):
            X[np.where(masks[c])[0], fid] += biases[fid] * frac[c]

    f_reorder = np.random.permutation(n_features)
    s_reorder = np.random.permutation(n_samples)
    X = X[:, f_reorder][s_reorder, :]
    y = y[s_reorder]
    return X, y, {
        "selected_features": np.where(is_true[f_reorder])[0],
        "biases": biases[f_reorder],
    }


def selection_quality(selected: list[int], truth: dict) -> dict:
    """Precision / recall / bias recovery (reference compare_results,
    protosc/simulation.py:136-148)."""
    sel = np.asarray(selected, dtype=int)
    total_bias = np.sum(np.abs(truth["biases"]))
    found_bias = np.sum(np.abs(truth["biases"][sel])) if len(sel) else 0.0
    n_correct = int(np.sum(truth["biases"][sel] != 0)) if len(sel) else 0
    return {
        "precision": n_correct / len(sel) if len(sel) else 0.0,
        "recall": n_correct / len(truth["selected_features"]),
        "bias_recovered": found_bias / total_bias,
    }
