"""Numeric kernels: rank/H/beta correctness against known values and
hypothesis-style randomized self-checks."""

import numpy as np

from protosc_spark.numerics import (
    average_ranks,
    betainc_reg,
    correlation_pvalues,
    kruskal_h,
    linear_classifier_accuracy,
    tie_correction,
)


def test_average_ranks_ties():
    x = np.array([3.0, 1.0, 3.0, 2.0])
    assert average_ranks(x).tolist() == [3.5, 1.0, 3.5, 2.0]


def test_average_ranks_matches_scalar_reference():
    """The vectorized tie-run ranking must be BIT-identical to the
    scalar definition (positions i..j share rank 0.5*(i+j)+1) — the
    filter-model selections are frozen oracles, so even 1-ulp rank
    drift would shift H statistics and break the gate."""

    def scalar_ranks(x):
        order = np.argsort(x, kind="mergesort")
        ranks = np.empty(len(x))
        sx = x[order]
        i = 0
        while i < len(sx):
            j = i
            while j + 1 < len(sx) and sx[j + 1] == sx[i]:
                j += 1
            ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
            i = j + 1
        return ranks

    rng = np.random.default_rng(7)
    for trial in range(100):
        n = int(rng.integers(1, 60))
        x = (
            rng.integers(0, 6, n).astype(float)  # heavy ties
            if trial % 2
            else rng.random(n)  # no ties
        )
        assert np.array_equal(average_ranks(x), scalar_ranks(x))
    assert average_ranks(np.array([])).size == 0
    assert average_ranks(np.array([5.0])).tolist() == [1.0]


def test_tie_correction():
    x = np.array([1.0, 1.0, 2.0, 3.0])
    # one tie group of 2: 1 - (8-2)/(64-4) = 0.9
    assert abs(tie_correction(x) - 0.9) < 1e-12


def test_kruskal_known_value():
    # textbook example: H for three clearly separated groups
    g1 = np.array([1.0, 2.0, 3.0])
    g2 = np.array([4.0, 5.0, 6.0])
    g3 = np.array([7.0, 8.0, 9.0])
    # ranks are 1..9 exactly; H = 12/(9*10) * (6^2/3 + 15^2/3 + 24^2/3) - 30
    want = 12 / 90 * (36 / 3 + 225 / 3 + 576 / 3) - 30
    assert abs(kruskal_h(g1, g2, g3) - want) < 1e-12


def test_kruskal_invariance_under_monotone():
    rng = np.random.default_rng(0)
    a, b = rng.normal(size=40), rng.normal(size=35) + 0.5
    h1 = kruskal_h(a, b)
    h2 = kruskal_h(np.exp(a), np.exp(b))  # rank statistic: monotone-invariant
    assert abs(h1 - h2) < 1e-9


def test_betainc_reference_values():
    # I_x(a,b) identities: I_x(1,1) = x; I_x(a,b) = 1 - I_{1-x}(b,a)
    for x in [0.01, 0.3, 0.5, 0.77, 0.99]:
        assert abs(betainc_reg(1.0, 1.0, x) - x) < 1e-12
    for a, b, x in [(2.5, 1.5, 0.3), (5.0, 0.5, 0.9), (0.5, 0.5, 0.25)]:
        assert abs(
            betainc_reg(a, b, x) - (1.0 - betainc_reg(b, a, 1.0 - x))
        ) < 1e-10
    # I_{0.25}(0.5, 0.5) = 2/pi * arcsin(sqrt(0.25)) = 1/3
    assert abs(betainc_reg(0.5, 0.5, 0.25) - 1.0 / 3.0) < 1e-10


def test_correlation_pvalue_behavior():
    p_strong = correlation_pvalues(np.array([0.95]), 100)[0]
    p_weak = correlation_pvalues(np.array([0.05]), 100)[0]
    assert p_strong < 1e-10
    assert p_weak > 0.5
    # clip path
    assert np.isfinite(correlation_pvalues(np.array([1.0]), 100)[0])


def test_classifier_separable():
    rng = np.random.default_rng(1)
    X0 = rng.normal(-2, 0.5, size=(50, 3))
    X1 = rng.normal(2, 0.5, size=(50, 3))
    X = np.vstack([X0, X1])
    y = np.array([0] * 50 + [1] * 50)
    acc = linear_classifier_accuracy(X, y, X, y)
    assert acc == 1.0


def test_classifier_deterministic():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(80, 5))
    y = rng.integers(0, 3, size=80)
    a1 = linear_classifier_accuracy(X[:60], y[:60], X[60:], y[60:])
    a2 = linear_classifier_accuracy(X[:60].copy(), y[:60].copy(), X[60:], y[60:])
    assert a1 == a2
