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
