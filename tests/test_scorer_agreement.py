"""Classifier-substitution gap study (round-1 VERDICT 'What's missing
#1'): the engine scores fold accuracy with a closed-form ridge because
sklearn's SVC is not in the container. This suite bounds that
substitution by running the FULL filter model twice — once with the
ridge scorer, once with a from-scratch deterministic linear SVM
(Pegasos-style full-batch subgradient, numerics.linear_svm_accuracy,
the same StandardScaler+linear-SVM shape as the reference's
train_xvalidate, protosc/model/utils.py:11-20) — on the reference's
easy-data regimes (its e2e fixtures use min_dev=20..30 where tests
assert set(selection) == truth, reference tests/test_fold_models.py:
14-19,52) and asserting the SELECTIONS are identical.

Conclusion this pins: the selection logic (chi-square -> clusters ->
cumsum -> cross-fold significance) is insensitive to the scorer choice
on the regimes the reference's own tests certify, so 'ridge instead of
SVC' does not change which features the filter model selects there.

Agreement table (regime -> selections identical):
  correlated easy  (min_dev=20, max_dev=30, the reference fixture) yes
  independent easy (min_dev=5,  max_dev=8)                         yes
  correlated moderate (min_dev=2, max_dev=4)                       yes
"""

import numpy as np
import pytest

from protosc_spark.numerics import linear_svm_accuracy
from protosc_spark.oracle.numpy_model import oracle_filter_model
from protosc_spark.oracle.simulation import make_correlated, make_independent


def _agree(X, y, truth=None, n_fold=8):
    ridge = oracle_filter_model(X, y, n_fold=n_fold, fold_seed=42, seed=0)
    svm = oracle_filter_model(
        X, y, n_fold=n_fold, fold_seed=42, seed=0, scorer=linear_svm_accuracy
    )
    assert sorted(ridge["selected"]) == sorted(svm["selected"])
    if truth is not None:
        assert set(ridge["selected"]) <= set(
            truth["selected_features"].tolist()
        )
    return ridge["selected"]


def test_svm_scorer_separates_planted_data():
    np.random.seed(5)
    X, y, _ = make_independent(
        n_features=10, n_samples=120, n_true=4, min_dev=3.0, max_dev=4.0
    )
    acc = linear_svm_accuracy(X[:80], y[:80], X[80:], y[80:])
    assert acc >= 0.9  # easy data: the SVM actually learns


def test_agreement_correlated_easy_reference_fixture():
    """The regime of the reference's own e2e certification
    (tests/test_fold_models.py uses seed 1928374 + large deviations)."""
    np.random.seed(1928374)
    X, y, truth = make_correlated(
        n_base_features=10, n_true=5, n_samples=100,
        min_dev=20, max_dev=30, n_corr=2,
    )
    sel = _agree(X, y, truth)
    assert len(sel) > 0


def test_agreement_independent_easy():
    np.random.seed(24601)
    X, y, truth = make_independent(
        n_features=30, n_samples=150, n_true=6, min_dev=5.0, max_dev=8.0
    )
    sel = _agree(X, y, truth)
    assert len(sel) > 0


def test_agreement_correlated_moderate():
    np.random.seed(7777)
    X, y, _ = make_correlated(
        n_base_features=12, n_true=4, n_samples=140,
        min_dev=2.0, max_dev=4.0, n_corr=2,
    )
    _agree(X, y)


def test_svm_is_deterministic():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(100, 8))
    y = rng.integers(0, 3, size=100)
    a1 = linear_svm_accuracy(X[:70], y[:70], X[70:], y[70:])
    a2 = linear_svm_accuracy(X[:70], y[:70], X[70:], y[70:])
    assert a1 == a2


# ---------------------------------------------------------------------------
# Round-3 verdict #9: the wrapper's greedy add/remove path is where a
# scorer substitution is likeliest to flip a selection (per-step
# accuracy comparisons; ties resolved by strict >). Pin (a) agreement
# between ridge and SVM scorers through the FULL wrapper loop on the
# reference's certified regime, and (b) the tie-break rule itself.
# ---------------------------------------------------------------------------


def _wrapper_fixture():
    from protosc_spark.oracle.numpy_model import oracle_chisquare, quantize
    from protosc_spark.select import select_from_stats

    np.random.seed(1928374)
    X, y, truth = make_correlated(
        n_base_features=10, n_true=5, n_samples=100,
        min_dev=20, max_dev=30, n_corr=2,
    )
    rng = np.random.default_rng(3)
    tr = rng.permutation(len(y))[:80]
    va = np.setdiff1d(np.arange(len(y)), tr)
    fold = (X[tr], y[tr], X[va], y[va])
    chisq = quantize(oracle_chisquare(X[tr], y[tr]))
    _, clusters = select_from_stats(
        chisq,
        lambda fs: quantize(np.corrcoef(X[tr][:, fs], rowvar=False)),
        n_samples=len(tr),
    )
    return fold, clusters, truth


@pytest.mark.parametrize("greedy", [True, False])
@pytest.mark.parametrize("exclusion", [True, False])
def test_wrapper_scorer_agreement(greedy, exclusion):
    """Ridge vs deterministic linear SVM through the whole wrapper
    loop (add + exclusion) on the reference's correlated easy regime:
    identical selected features AND identical selection ORDER (the
    greedy path is order-sensitive, so order equality is the stronger
    pin)."""
    from protosc_spark.models.search import wrapper_fold

    fold, clusters, truth = _wrapper_fixture()
    kw = dict(
        max_features=10, search_fraction=1.0,
        greedy=greedy, exclusion_step=exclusion,
    )
    ridge = wrapper_fold(fold, clusters, **kw)
    svm = wrapper_fold(fold, clusters, scorer=linear_svm_accuracy, **kw)
    assert ridge["features"] == svm["features"]
    true = set(truth["selected_features"].tolist())
    assert len(set(ridge["features"]) & true) >= 2


def test_wrapper_tie_break_first_cluster_wins():
    """Two clusters with EXACTLY tied accuracy: strict > keeps the
    first in search-space order for _add_max, and _add_direct accepts
    the first then rejects the equal-scoring second — independent of
    scorer. Pinned with a stub scorer so the tie is exact."""
    from protosc_spark.models.search import (
        ClusteredSelection,
        _add_direct,
        _add_max,
    )

    X = np.zeros((4, 3))
    fold = (X, np.array([0, 1, 0, 1]), X, np.array([0, 1, 0, 1]))
    # feature-set -> accuracy: cluster 0 ({0}) and cluster 1 ({1}) tie
    table = {(0,): 0.9, (1,): 0.9, (2,): 0.1, (0, 1): 0.9, (0, 2): 0.1}

    # exact-tie harness: stub _accuracy itself, keyed on selected ids
    import protosc_spark.models.search as search_mod

    orig = search_mod._accuracy

    def fake_accuracy(fold, feature_ids, col_groups=None, scorer=None):
        return table.get(tuple(sorted(int(f) for f in feature_ids)), 0.0)

    search_mod._accuracy = fake_accuracy
    try:
        sel = ClusteredSelection([[0], [1], [2]])
        out_max, acc_max = _add_max([0, 1, 2], sel, 0.0, fold)
        assert out_max.clusters == [0] and acc_max == 0.9
        out_dir, acc_dir = _add_direct([0, 1, 2], sel, 0.0, fold)
        assert out_dir.clusters == [0] and acc_dir == 0.9
        # reversed search order: the OTHER cluster wins the tie —
        # proving the rule is positional, not value-based
        out_rev, _ = _add_max([1, 0, 2], sel, 0.0, fold)
        assert out_rev.clusters == [1]
    finally:
        search_mod._accuracy = orig
