"""Pure-numpy filter model — the parity oracle.

Computes exactly what the Spark FilterModel computes, with single-node
numpy in place of the distributed stages:

* per-feature Kruskal–Wallis via numerics.kruskal_h (loop over
  features, like reference protosc/model/utils.py:56-89)
* correlation via stats.corrcoef_guarded (np.corrcoef + the shared
  zero-variance-channel := 0 rule)
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


def oracle_chisquare_grouped(
    X: np.ndarray, y: np.ndarray, col_groups: list[list[int]]
) -> np.ndarray:
    """Per-logical-feature H with the reference's multi-channel
    flattened tuple-max quirk (protosc/model/utils.py:70-78); mirrors
    stats.chisquare_features_grouped."""
    from protosc_spark.numerics import kruskal_h_p

    classes = np.unique(y)
    out = np.empty(len(col_groups))
    for i, g in enumerate(col_groups):
        if len(g) == 1:
            out[i] = kruskal_h(*[X[y == c, g[0]] for c in classes])
        else:
            pairs = np.array(
                [kruskal_h_p(*[X[y == c, col] for c in classes]) for col in g]
            )
            out[i] = np.max(pairs)
    return out


def null_accuracy_distribution(
    X_tr: np.ndarray,
    y_tr: np.ndarray,
    X_val: np.ndarray,
    y_val: np.ndarray,
    seed: int,
    n: int = 100,
    scorer=None,
) -> list[float]:
    """100 label-permutation accuracies (reference
    compute_null_accuracy, protosc/model/utils.py:92-97) with an
    explicit per-fold rng — shared verbatim by engine and oracle."""
    scorer = scorer or linear_classifier_accuracy
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append(
            scorer(X_tr, rng.permutation(y_tr), X_val, rng.permutation(y_val))
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
    col_groups: list[list[int]] | None = None,
    scorer=None,
) -> dict:
    """Full filter model: balanced folds -> per-fold selection +
    accuracy -> null distributions -> cross-fold final selection.

    ``col_groups``: logical-feature channel grouping (reference
    rev_lookup_table); selection ids are logical features and the
    classifier sees the expanded channel columns.
    ``scorer``: accuracy function (X_tr, y_tr, X_va, y_va) -> float;
    default ridge (numerics.linear_classifier_accuracy). Passing
    numerics.linear_svm_accuracy reproduces the reference's SVC choice
    for the substitution-gap study.

    Returns {"selected": [...], "fold_results": [...], "folds": array}.
    """
    scorer = scorer or linear_classifier_accuracy
    from protosc_spark.stats import blockmax_reduce, corrcoef_guarded

    fold_id = balanced_fold_assignment(
        y, k=n_fold, rng=np.random.default_rng(fold_seed)
    )
    rng = np.random.default_rng(seed)
    fold_seeds = [int(rng.integers(0, 2**31 - 1)) for _ in range(n_fold)]

    def _expand(feature_ids):
        if col_groups is None:
            return [int(f) for f in feature_ids]
        return [int(c) for f in feature_ids for c in col_groups[int(f)]]

    def _corr(Xtr, fs):
        # corrcoef_guarded, NOT raw np.corrcoef: a dead (zero-variance)
        # channel must correlate 0 on BOTH the oracle and Gramian paths
        r = corrcoef_guarded(Xtr[:, _expand(fs)])
        if col_groups is None:
            return r
        return blockmax_reduce(r, [len(col_groups[int(f)]) for f in fs])

    fold_results, null_dists = [], []
    for i in range(n_fold):
        tr = (fold_id >= 0) & (fold_id != i)
        va = fold_id == i
        if col_groups is None:
            chisq = quantize(oracle_chisquare(X[tr], y[tr]))
        else:
            chisq = quantize(oracle_chisquare_grouped(X[tr], y[tr], col_groups))
        selected, _ = select_from_stats(
            chisq,
            lambda fs: quantize(_corr(X[tr], fs)),
            n_samples=int(tr.sum()),
        )
        sel_cols = _expand(selected)
        X_tr, X_va = X[tr][:, sel_cols], X[va][:, sel_cols]
        acc = scorer(X_tr, y[tr], X_va, y[va])
        fold_results.append({"features": selected, "accuracy": acc})
        null_dists.append(
            null_accuracy_distribution(
                X_tr, y[tr], X_va, y[va], fold_seeds[i], scorer=scorer
            )
        )

    selected = final_feature_selection(fold_results, null_dists)
    return {
        "selected": selected,
        "fold_results": fold_results,
        "null_distributions": null_dists,
        "fold_id": fold_id,
    }
