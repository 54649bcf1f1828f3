"""Cluster-search model family: wrapper (greedy forward selection),
random and pseudo-random baselines, combined per-fold runner.

Semantics re-derived from the reference (protosc/model/wrapper.py:10-285,
random.py:8-24, pseudo_random.py:7-34, combined_fold.py:12-79).

Tiering (matches SURVEY.md §3.2 analysis): the DISTRIBUTED layer
produces the per-fold chi-square vector, the correlation clusters and
the fold assignment (stats.py / select.py / folds.py); the search loop
itself evaluates hundreds of tiny classifiers over <= max_features
columns, which is inherently iterative driver-side work — the reference
runs it per fold in a process pool (protosc/parallel.py), we run it on
the collected per-fold submatrix. At 10^12-turn scale the model-search
tier operates on an aggregated/sampled matrix by construction; the raw
turn table never leaves the cluster.
"""

from __future__ import annotations

import numpy as np

from protosc_spark.numerics import linear_classifier_accuracy


def _expand(feature_ids, col_groups) -> list[int]:
    """Logical feature ids -> physical channel columns (reference
    get_slice expansion, protosc/feature_matrix.py:140-177); identity
    on single-channel registries."""
    if col_groups is None:
        return [int(f) for f in feature_ids]
    return [int(c) for f in feature_ids for c in col_groups[int(f)]]


def _accuracy(fold, feature_ids, col_groups=None, scorer=None) -> float:
    """Reference compute_accuracy (protosc/model/utils.py:23-41):
    empty selection scores 0. The classifier sees the EXPANDED channel
    columns of the selected logical features. ``scorer`` swaps the
    classifier (default: the engine-wide ridge; the scorer-agreement
    study passes the deterministic linear SVM)."""
    if len(feature_ids) == 0:
        return 0.0
    X_tr, y_tr, X_va, y_va = fold
    ids = _expand(feature_ids, col_groups)
    fn = scorer if scorer is not None else linear_classifier_accuracy
    return fn(X_tr[:, ids], y_tr, X_va[:, ids], y_va)


class ClusteredSelection:
    """Selected-cluster set with +/- algebra and bounded search space
    (reference protosc/model/wrapper.py:208-285)."""

    def __init__(self, all_clusters, clusters=None):
        self.all_clusters = [list(c) for c in all_clusters]
        self.clusters = list(clusters) if clusters is not None else []

    @property
    def features(self) -> list[int]:
        out: list[int] = []
        for ci in self.clusters:
            out.extend(self.all_clusters[ci])
        return out

    def search_space(self, fraction: float, exclude=()) -> list[int]:
        pool = [
            i
            for i in range(len(self.all_clusters))
            if i not in self.clusters and i not in exclude
        ]
        return pool[: max(1, int(len(pool) * fraction))]

    def copy(self) -> "ClusteredSelection":
        return ClusteredSelection(self.all_clusters, list(self.clusters))

    def __add__(self, ci: int) -> "ClusteredSelection":
        out = self.copy()
        out.clusters.append(ci)
        return out

    def __sub__(self, other):
        out = self.copy()
        if isinstance(other, ClusteredSelection):
            out.clusters = list(set(out.clusters) - set(other.clusters))
        else:
            out.clusters.remove(other)
        return out

    def __len__(self) -> int:
        return len(self.clusters)


def wrapper_fold(
    fold,
    clusters,
    max_features: int = 25,
    search_fraction: float = 0.15,
    reversed_clusters: bool = True,
    greedy: bool = False,
    exclusion_step: bool = False,
    max_nop_rounds: int = 10,
    col_groups=None,
    scorer=None,
) -> dict:
    """One fold of greedy forward cluster selection (reference
    WrapperModel._execute_fold, protosc/model/wrapper.py:117-176).
    ``col_groups``: multi-channel registry — cluster ids / max_features
    stay LOGICAL, classifiers see expanded channel columns."""
    order = (
        range(len(clusters)) if reversed_clusters else reversed(range(len(clusters)))
    )
    selection = ClusteredSelection(clusters)
    accuracy = 0.0
    n_nop = 0

    for ci in order:
        if n_nop == max_nop_rounds or len(selection.features) >= max_features:
            break
        if ci in selection.clusters:
            continue
        space = selection.search_space(search_fraction)
        if greedy:
            new_sel, new_acc = _add_direct(
                space, selection, accuracy, fold, col_groups, scorer
            )
        else:
            new_sel, new_acc = _add_max(
                space, selection, accuracy, fold, col_groups, scorer
            )
        if len(new_sel) - len(selection):
            n_nop = 0
        else:
            n_nop += 1
        selection, accuracy = new_sel, new_acc

    if exclusion_step:
        selection, accuracy = _remove_procedure(
            fold, selection, accuracy, search_fraction, col_groups, scorer
        )
    return {"features": selection.features, "accuracy": accuracy}


def _add_direct(space, selection, accuracy, fold, col_groups=None, scorer=None):
    """Greedy: accept every cluster that STRICTLY improves accuracy —
    on a tie the incumbent selection is kept (reference
    wrapper.py:180-190 uses the same strict >), so earlier clusters
    win ties at any scorer. Pinned in tests/test_scorer_agreement.py."""
    best = accuracy
    for ci in space:
        cand = selection + ci
        acc = _accuracy(fold, cand.features, col_groups, scorer)
        if acc > best:
            selection, best = cand, acc
    return selection, best


def _add_max(space, selection, accuracy, fold, col_groups=None, scorer=None):
    """Non-greedy: add only the single best-improving cluster. Strict
    > means ties resolve to the FIRST cluster in search-space order —
    deterministic at any scorer (pinned in test_scorer_agreement)."""
    best, best_ci = accuracy, -1
    for ci in space:
        acc = _accuracy(fold, (selection + ci).features, col_groups, scorer)
        if acc > best:
            best, best_ci = acc, ci
    if best > accuracy:
        return selection + best_ci, best
    return selection, best


def _remove_procedure(fold, selection, accuracy, search_fraction,
                      col_groups=None, scorer=None):
    """Exclusion/replacement pass (reference wrapper.py:72-115)."""
    exclude: list[int] = []
    if len(selection) < 1:
        return selection, accuracy
    for ci in list(selection.clusters):
        reduced = selection - ci
        acc = _accuracy(fold, reduced.features, col_groups, scorer)
        if acc > accuracy:
            accuracy = acc
            exclude.append(ci)
            selection = reduced
        else:
            cands = selection.search_space(search_fraction, exclude=exclude)
            new_sel, new_acc = _add_max(
                cands, reduced, accuracy, fold, col_groups, scorer
            )
            diff = new_sel - reduced
            if len(diff):
                accuracy = new_acc
                exclude.extend([ci, diff.clusters[0]])
                selection = new_sel
    return selection, accuracy


def random_fold(
    fold, clusters, selected_features, rng: np.random.Generator, col_groups=None
) -> dict:
    """Shuffled-cluster control: take clusters until the selection is at
    least as large as the filter's (reference random.py:14-24)."""
    shuffled = [list(c) for c in clusters]
    rng.shuffle(shuffled)
    chosen: list[int] = []
    for cluster in shuffled:
        if len(chosen) >= len(selected_features):
            break
        chosen.extend(cluster)
    return {"features": chosen, "accuracy": _accuracy(fold, chosen, col_groups)}


def pseudo_random_fold(
    fold, clusters, selected_features, wrapper_features, col_groups=None
) -> dict:
    """Control excluding filter- and wrapper-chosen features
    (reference pseudo_random.py:21-34)."""
    banned = set(selected_features) | set(wrapper_features)
    chosen: list[int] = []
    for cluster in clusters:
        if len(chosen) >= len(selected_features):
            break
        for f in cluster:
            if f not in banned:
                chosen.append(f)
    return {"features": chosen, "accuracy": _accuracy(fold, chosen, col_groups)}


def combined_fold(
    fold, selected_features, clusters, rng: np.random.Generator, col_groups=None
) -> dict:
    """All five models on one fold, sharing one select_features result
    (reference combined_fold.py:37-69)."""
    out = {}
    out["filter"] = {
        "features": list(selected_features),
        "accuracy": _accuracy(fold, selected_features, col_groups),
    }
    n_sel = len(selected_features)
    out["fast_wrapper"] = wrapper_fold(
        fold, clusters, max_features=n_sel, greedy=True, exclusion_step=False,
        col_groups=col_groups,
    )
    out["slow_wrapper"] = wrapper_fold(
        fold, clusters, max_features=n_sel, greedy=True, exclusion_step=True,
        col_groups=col_groups,
    )
    out["random"] = random_fold(
        fold, clusters, selected_features, rng, col_groups
    )
    out["pseudo_random"] = pseudo_random_fold(
        fold, clusters, selected_features, out["fast_wrapper"]["features"],
        col_groups,
    )
    return out
