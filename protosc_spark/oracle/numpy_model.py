"""Pure-numpy filter model — the parity oracle.

Computes exactly what the Spark FilterModel computes, with single-node
numpy in place of the distributed stages:

* per-feature Kruskal–Wallis via numerics.kruskal_h (loop over
  features, like reference protosc/model/utils.py:56-89)
* correlation via np.corrcoef
* identical driver-side selection (select.py is shared)
* identical classifier, fold assignment and null-permutation protocol

Engine == oracle is asserted feature-ID-exact in tests/test_filter_model.py.
"""

from __future__ import annotations

import numpy as np

from protosc_spark.folds import balanced_fold_assignment
from protosc_spark.numerics import kruskal_h, linear_classifier_accuracy
from protosc_spark.select import (
    final_feature_selection,
    select_from_stats,
)

QUANTIZE_DECIMALS = 9


def oracle_chisquare(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    classes = np.unique(y)
    out = np.empty(X.shape[1])
    for f in range(X.shape[1]):
        out[f] = kruskal_h(*[X[y == c, f] for c in classes])
    return out


def null_accuracy_distribution(
    X_tr: np.ndarray,
    y_tr: np.ndarray,
    X_val: np.ndarray,
    y_val: np.ndarray,
    seed: int,
    n: int = 100,
) -> list[float]:
    """100 label-permutation accuracies (reference
    compute_null_accuracy, protosc/model/utils.py:92-97) with an
    explicit per-fold rng — shared verbatim by engine and oracle."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append(
            linear_classifier_accuracy(
                X_tr, rng.permutation(y_tr), X_val, rng.permutation(y_val)
            )
        )
    return out


def quantize(a: np.ndarray) -> np.ndarray:
    """Round to 1e-9: collapses cross-backend float-summation noise so
    argsort/threshold decisions are identical between the distributed
    and numpy paths."""
    return np.round(a, QUANTIZE_DECIMALS)


def oracle_filter_model(
    X: np.ndarray,
    y: np.ndarray,
    n_fold: int = 8,
    fold_seed: int | None = None,
    seed: int = 0,
) -> dict:
    """Full filter model: balanced folds -> per-fold selection +
    accuracy -> null distributions -> cross-fold final selection.

    Returns {"selected": [...], "fold_results": [...], "folds": array}.
    """
    fold_id = balanced_fold_assignment(
        y, k=n_fold, rng=np.random.default_rng(fold_seed)
    )
    rng = np.random.default_rng(seed)
    fold_seeds = [int(rng.integers(0, 2**31 - 1)) for _ in range(n_fold)]

    fold_results, null_dists = [], []
    for i in range(n_fold):
        tr = (fold_id >= 0) & (fold_id != i)
        va = fold_id == i
        chisq = quantize(oracle_chisquare(X[tr], y[tr]))
        selected, _ = select_from_stats(
            chisq,
            lambda fs: quantize(np.corrcoef(X[tr][:, fs], rowvar=False)),
            n_samples=int(tr.sum()),
        )
        X_tr, X_va = X[tr][:, selected], X[va][:, selected]
        acc = linear_classifier_accuracy(X_tr, y[tr], X_va, y[va])
        fold_results.append({"features": selected, "accuracy": acc})
        null_dists.append(
            null_accuracy_distribution(X_tr, y[tr], X_va, y[va], fold_seeds[i])
        )

    selected = final_feature_selection(fold_results, null_dists)
    return {
        "selected": selected,
        "fold_results": fold_results,
        "null_distributions": null_dists,
        "fold_id": fold_id,
    }
