"""SMO dual SVM (numerics._smo_solve / smo_svm_accuracy) — the
libsvm-faithful scorer for SURVEY §2.5 #29 (reference
protosc/model/utils.py:11-20, StandardScaler + SVC).

Verification strategy (libsvm itself is absent, so every pin is
independent): (a) hand-derived analytic max-margin solutions, (b) an
EXHAUSTIVE active-set enumeration of the C-SVC dual on tiny fixtures
(the exact optimum, computed by a completely different algorithm),
(c) KKT optimality conditions at libsvm's tolerance, (d) agreement of
filter/wrapper selections across ridge / Pegasos / SMO scorers on the
reference-certified regimes, and (e) a fixture where the 600-iteration
Pegasos approximation scores DIFFERENTLY while SMO matches the
converged optimum — the gap the SMO path closes."""

import itertools

import numpy as np
import pytest

from protosc_spark.numerics import (
    _smo_solve,
    linear_svm_accuracy,
    smo_svm_accuracy,
)


def _dual_objective(K, y, a):
    Q = (y[:, None] * y[None, :]) * K
    return 0.5 * a @ Q @ a - a.sum()


def _enumerate_dual(K, y, C):
    """Exact C-SVC dual optimum by enumerating every active-set
    configuration (each point at 0, free, or C) and solving the KKT
    system — exponential, but exact and algorithm-independent."""
    n = len(y)
    Q = (y[:, None] * y[None, :]) * K
    best, best_obj = None, np.inf
    for states in itertools.product((0, 1, 2), repeat=n):
        a = np.zeros(n)
        free = [i for i, s in enumerate(states) if s == 1]
        at_c = [i for i, s in enumerate(states) if s == 2]
        for i in at_c:
            a[i] = C
        m = len(free)
        A = np.zeros((m + 1, m + 1))
        rhs = np.zeros(m + 1)
        for r, i in enumerate(free):
            A[r, :m] = Q[i, free]
            A[r, m] = y[i]
            rhs[r] = 1.0 - Q[i, at_c].sum() * C if at_c else 1.0
        A[m, :m] = y[free]
        rhs[m] = -C * y[at_c].sum() if at_c else 0.0
        try:
            sol = np.linalg.solve(A, rhs)
        except np.linalg.LinAlgError:
            continue
        a[free] = sol[:m]
        if np.any(a < -1e-9) or np.any(a > C + 1e-9):
            continue
        if abs(y @ a) > 1e-9:
            continue
        if m:
            b = sol[m]
            G = Q @ a - 1.0
            ok = True
            for i, s in enumerate(states):
                gi = G[i] + y[i] * b
                if (s == 0 and gi < -1e-7) or (s == 2 and gi > 1e-7):
                    ok = False
                    break
            if not ok:
                continue
        obj = _dual_objective(K, y, a)
        if obj < best_obj - 1e-12:
            best_obj, best = obj, a.copy()
    return best, best_obj


def test_two_point_analytic():
    """+1 at (1,0), -1 at (-1,0): max-margin w=(1,0), rho=0,
    alpha=(1/2, 1/2) (hand-derived from y_i f(x_i) = 1 at the SVs)."""
    X = np.array([[1.0, 0.0], [-1.0, 0.0]])
    y = np.array([1.0, -1.0])
    a, rho = _smo_solve(X @ X.T, y, C=10.0)
    assert np.allclose(a, [0.5, 0.5], atol=1e-6)
    assert abs(rho) < 1e-6


def test_three_point_analytic_with_interior_point():
    """+1 at {3, 5}, -1 at {1} (1-D): boundary at x=2, w=1, rho=2;
    x=5 is strictly interior so alpha_2 = 0."""
    X = np.array([[3.0], [5.0], [1.0]])
    y = np.array([1.0, 1.0, -1.0])
    a, rho = _smo_solve(X @ X.T, y, C=100.0)
    assert np.allclose(a, [0.5, 0.0, 0.5], atol=1e-6)
    assert abs(rho - 2.0) < 1e-6


@pytest.mark.parametrize("seed", [12, 3, 7, 21])
@pytest.mark.parametrize("C", [1.0, 0.1])
def test_smo_matches_enumerated_exact_optimum(seed, C):
    """SMO's dual objective equals the exhaustively-enumerated exact
    optimum on random 7-point problems (box-bounded), and the alphas
    agree — an algorithm-independent exactness pin."""
    r = np.random.default_rng(seed)
    X = r.normal(size=(7, 2))
    y = np.where(r.random(7) > 0.45, 1.0, -1.0)
    if len(np.unique(y)) < 2:
        y[0] = -y[0]
    K = X @ X.T
    a_enum, obj_enum = _enumerate_dual(K, y, C)
    assert a_enum is not None
    # libsvm's default eps=1e-3 stops within ~1e-6 of the optimum;
    # tighten eps here to pin convergence TO the enumerated optimum
    a_smo, _rho = _smo_solve(K, y, C=C, eps=1e-8)
    assert _dual_objective(K, y, a_smo) - obj_enum < 1e-9
    assert np.abs(a_enum - a_smo).max() < 1e-4
    # and the default tolerance lands within its advertised gap
    a_def, _ = _smo_solve(K, y, C=C)
    assert _dual_objective(K, y, a_def) - obj_enum < 1e-4


def test_kkt_conditions_at_libsvm_tolerance():
    """On a 160-point soft-margin problem: y'a = 0 exactly, box
    respected, and the maximal KKT violating pair gap < eps=1e-3
    (libsvm's stopping rule)."""
    rng = np.random.default_rng(0)
    X = np.vstack([rng.normal(1, 2, (80, 5)), rng.normal(-1, 2, (80, 5))])
    y = np.array([1.0] * 80 + [-1.0] * 80)
    K = X @ X.T
    a, _ = _smo_solve(K, y, C=1.0)
    G = ((y[:, None] * y[None, :] * K) @ a) - 1.0
    up = ((y > 0) & (a < 1)) | ((y < 0) & (a > 0))
    low = ((y > 0) & (a > 0)) | ((y < 0) & (a < 1))
    assert np.max(-y[up] * G[up]) + np.max(y[low] * G[low]) < 1e-3
    assert abs((y * a).sum()) < 1e-9
    assert (a >= 0).all() and (a <= 1).all()


def test_rbf_kernel_solves_nonlinear_xor():
    """Linear SVM cannot separate XOR; the RBF path (sklearn
    gamma='scale' convention) must."""
    X = np.array(
        [[1.0, 1.0], [-1.0, -1.0], [1.0, -1.0], [-1.0, 1.0]] * 10
    ) + np.random.default_rng(4).normal(0, 0.05, (40, 2))
    y = np.array([1, 1, 0, 0] * 10)
    assert smo_svm_accuracy(X, y, X, y, kernel="rbf") == 1.0
    assert smo_svm_accuracy(X, y, X, y, kernel="linear") < 0.8


def test_smo_is_deterministic():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(100, 8))
    y = rng.integers(0, 3, size=100)
    a1 = smo_svm_accuracy(X[:70], y[:70], X[70:], y[70:])
    a2 = smo_svm_accuracy(X[:70], y[:70], X[70:], y[70:])
    assert a1 == a2


def test_pegasos_diverges_where_smo_matches_exact_dual():
    """The gap the SMO scorer closes (round-4 verdict #4): on a noisy
    low-margin fixture the Pegasos stand-in scores a DIFFERENT
    validation accuracy (it also regularizes the bias, which libsvm
    does not), while SMO's accuracy equals the one derived end-to-end
    from the ENUMERATED exact dual optimum (alphas + libsvm's rho
    rule) — proving SMO, not Pegasos, carries the libsvm semantics."""
    r = np.random.default_rng(4)
    n, p = 8, 2
    X = r.normal(size=(n, p)) * r.uniform(0.3, 4, size=p)
    y = r.integers(0, 2, size=n)
    Xv = r.normal(size=(30, p)) * r.uniform(0.3, 4, size=p)
    yv = r.integers(0, 2, size=30)

    peg = linear_svm_accuracy(X, y, Xv, yv)
    smo = smo_svm_accuracy(X, y, Xv, yv)
    assert peg != smo  # the substitution gap is real on this fixture

    # independent end-to-end: standardize, enumerate the exact dual,
    # rho = mean y_t G_t over free SVs, libsvm predict rule
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd = np.where(sd == 0, 1.0, sd)
    Xt, Xvs = (X - mu) / sd, (Xv - mu) / sd
    y_pm = np.where(y == 0, 1.0, -1.0)  # first sorted class -> +1
    K = Xt @ Xt.T
    a, _ = _enumerate_dual(K, y_pm, 1.0)
    G = ((y_pm[:, None] * y_pm[None, :] * K) @ a) - 1.0
    free = (a > 1e-9) & (a < 1.0 - 1e-9)
    rho = float((y_pm * G)[free].mean())
    dec = (a * y_pm) @ (Xt @ Xvs.T) - rho
    pred = np.where(dec > 0, 0, 1)
    assert float(np.mean(pred == yv)) == smo


# ---------------------------------------------------------------------------
# selection agreement: the SMO scorer through the FULL filter model and
# wrapper loop on the reference-certified regimes — selections must
# match the engine default (ridge), like the Pegasos study already pins
# ---------------------------------------------------------------------------


def _smo_filter_agrees(X, y, n_fold=8):
    from protosc_spark.oracle.numpy_model import oracle_filter_model

    ridge = oracle_filter_model(X, y, n_fold=n_fold, fold_seed=42, seed=0)
    smo = oracle_filter_model(
        X, y, n_fold=n_fold, fold_seed=42, seed=0, scorer=smo_svm_accuracy
    )
    assert sorted(ridge["selected"]) == sorted(smo["selected"])


def test_filter_agreement_correlated_easy_reference_fixture():
    from protosc_spark.oracle.simulation import make_correlated

    np.random.seed(1928374)
    X, y, _ = make_correlated(
        n_base_features=10, n_true=5, n_samples=100,
        min_dev=20, max_dev=30, n_corr=2,
    )
    _smo_filter_agrees(X, y)


def test_filter_agreement_independent_easy():
    from protosc_spark.oracle.simulation import make_independent

    np.random.seed(42)
    X, y, _ = make_independent(
        n_features=12, n_samples=120, n_true=4, min_dev=5, max_dev=8
    )
    _smo_filter_agrees(X, y)


@pytest.mark.parametrize("exclusion", [True, False])
def test_wrapper_smo_agreement(exclusion):
    """SMO scorer through the whole greedy wrapper loop on the
    reference's certified regime: identical features in identical
    order vs the ridge default."""
    from tests.test_scorer_agreement import _wrapper_fixture

    from protosc_spark.models.search import wrapper_fold

    fold, clusters, truth = _wrapper_fixture()
    kw = dict(
        max_features=10, search_fraction=1.0,
        greedy=True, exclusion_step=exclusion,
    )
    ridge = wrapper_fold(fold, clusters, **kw)
    smo = wrapper_fold(fold, clusters, scorer=smo_svm_accuracy, **kw)
    assert ridge["features"] == smo["features"]
    true = set(truth["selected_features"].tolist())
    assert len(set(ridge["features"]) & true) >= 2
