"""Wrapper / Random / PseudoRandom / Combined models on the
reference's easy-data fixture (tests/test_fold_models.py analog):
ground-truth recovery for the informative models, chance-level
baselines for the controls, determinism."""

import numpy as np
import pandas as pd
import pytest

from protosc_spark.models.combined import (
    CombinedFoldModel,
    PseudoRandomModel,
    RandomModel,
    WrapperModel,
)
from protosc_spark.models.search import (
    ClusteredSelection,
    wrapper_fold,
)
from protosc_spark.oracle.simulation import make_correlated


@pytest.fixture(scope="module")
def easy(spark):
    np.random.seed(1928374)
    X, y, truth = make_correlated(
        n_base_features=10, n_true=5, n_samples=100,
        min_dev=20, max_dev=30, n_corr=2,
    )
    pdf = pd.DataFrame(
        {
            "sample_id": np.arange(len(y), dtype=np.int64),
            "features": list(X.astype(np.float64)),
            "y": y.astype(np.int32),
        }
    )
    return spark.createDataFrame(pdf).cache(), X, y, truth


def test_clustered_selection_algebra():
    cs = ClusteredSelection([[0, 1], [2], [3, 4]])
    cs2 = cs + 0 + 2
    assert sorted(cs2.features) == [0, 1, 3, 4]
    cs3 = cs2 - 0
    assert cs3.features == [3, 4]
    assert len(cs) == 0  # original untouched
    assert cs2.search_space(1.0) == [1]
    assert cs2.search_space(0.1) == [1]  # at least one candidate


@pytest.mark.parametrize("greedy", [True, False])
@pytest.mark.parametrize("exclusion", [True, False])
def test_wrapper_fold_recovers_signal(easy, greedy, exclusion):
    _, X, y, truth = easy
    rng = np.random.default_rng(3)
    tr = rng.permutation(len(y))[:80]
    va = np.setdiff1d(np.arange(len(y)), tr)
    fold = (X[tr], y[tr], X[va], y[va])
    from protosc_spark.oracle.numpy_model import oracle_chisquare, quantize
    from protosc_spark.select import select_from_stats

    chisq = quantize(oracle_chisquare(X[tr], y[tr]))
    _, clusters = select_from_stats(
        chisq, lambda fs: quantize(np.corrcoef(X[tr][:, fs], rowvar=False)),
        n_samples=len(tr),
    )
    res = wrapper_fold(
        fold, clusters, max_features=10, search_fraction=1.0,
        greedy=greedy, exclusion_step=exclusion,
    )
    true = set(truth["selected_features"].tolist())
    assert res["accuracy"] >= 0.9
    assert len(set(res["features"]) & true) >= 2


def test_wrapper_model_selects_only_true_features(easy):
    df, X, y, truth = easy
    sel = WrapperModel(n_fold=3, max_features=10, search_fraction=1.0).execute(
        df, fold_seed=1298374, seed=0
    )
    true = set(truth["selected_features"].tolist())
    assert len(sel) > 0
    assert set(sel) <= true


def test_random_model_runs_and_differs_from_truth(easy):
    """On this fixture the planted bias is enormous (20-30 sigma), so a
    random control that happens to include a true cluster still scores
    high — the reference's own semantics. The pinnable property is that
    the random selection is NOT the exact planted set (it drags noise
    features in) and the run is deterministic."""
    df, X, y, truth = easy
    sel = RandomModel(n_fold=3).execute(df, fold_seed=1298374, seed=0)
    true = set(truth["selected_features"].tolist())
    assert set(sel) != true
    sel2 = RandomModel(n_fold=3).execute(df, fold_seed=1298374, seed=0)
    assert sel == sel2


def test_combined_model_all_strategies(easy):
    df, X, y, truth = easy
    out = CombinedFoldModel(n_fold=3).execute(df, fold_seed=1298374, seed=0)
    assert set(out) == {
        "filter", "fast_wrapper", "slow_wrapper", "random", "pseudo_random"
    }
    true = set(truth["selected_features"].tolist())
    assert set(out["filter"]) == true
    assert len(out["fast_wrapper"]) > 0 and set(out["fast_wrapper"]) <= true
    # pseudo-random excludes filter+wrapper picks by construction, so it
    # can never contain a planted feature here (filter found them all)
    assert len(set(out["pseudo_random"]) & true) == 0


def test_combined_deterministic(easy):
    df, _, _, _ = easy
    a = CombinedFoldModel(n_fold=3).execute(df, fold_seed=7, seed=1)
    b = CombinedFoldModel(n_fold=3).execute(df, fold_seed=7, seed=1)
    assert a == b


# ---------------------------------------------------------------------------
# multi-channel registry through the search tier (round-2 VERDICT gap)
# ---------------------------------------------------------------------------


def _mc_fixture():
    rng = np.random.default_rng(1928)
    n = 120
    X = rng.normal(size=(n, 16))
    y = rng.integers(0, 2, size=n)
    for g in range(3):  # plant signal in logical features 0..2
        X[y == 1, 2 * g] += 1.5 + 0.3 * g
        X[y == 1, 2 * g + 1] += 1.0
    groups = [[2 * i, 2 * i + 1] for i in range(8)]
    return X, y, groups


def _oracle_wrapper_multichannel(
    X, y, groups, n_fold, fold_seed, seed, **params
):
    """Numpy-statistics replica of _SearchFoldModel.execute for a
    multi-channel registry — same shared driver code (wrapper_fold,
    select_from_stats, final_feature_selection), numpy in place of the
    distributed chi-square / Gramian stages."""
    from protosc_spark.folds import balanced_fold_assignment
    from protosc_spark.models.search import _expand, wrapper_fold
    from protosc_spark.numerics import linear_classifier_accuracy
    from protosc_spark.oracle.numpy_model import (
        oracle_chisquare_grouped,
        quantize,
    )
    from protosc_spark.select import (
        final_feature_selection,
        select_from_stats,
    )
    from protosc_spark.stats import blockmax_reduce, corrcoef_guarded

    fold_id = balanced_fold_assignment(
        y, k=n_fold, rng=np.random.default_rng(fold_seed)
    )
    rng = np.random.default_rng(seed)
    fold_seeds = [int(rng.integers(0, 2**31 - 1)) for _ in range(n_fold)]
    fold_results, null_dists = [], []
    for i in range(n_fold):
        tr = (fold_id >= 0) & (fold_id != i)
        va = fold_id == i

        def corr(fs, _tr=tr):
            exp = [c for f in fs for c in groups[int(f)]]
            return quantize(
                blockmax_reduce(
                    corrcoef_guarded(X[_tr][:, exp]),
                    [len(groups[int(f)]) for f in fs],
                )
            )

        chisq = quantize(oracle_chisquare_grouped(X[tr], y[tr], groups))
        _, clusters = select_from_stats(chisq, corr, n_samples=int(tr.sum()))
        fold = (X[tr], y[tr], X[va], y[va])
        frng = np.random.default_rng(fold_seeds[i])
        res = wrapper_fold(fold, clusters, col_groups=groups, **params)
        ids = _expand(res["features"], groups)
        nulls = []
        for _ in range(100):
            if ids:
                nulls.append(
                    linear_classifier_accuracy(
                        fold[0][:, ids], frng.permutation(fold[1]),
                        fold[2][:, ids], frng.permutation(fold[3]),
                    )
                )
            else:
                nulls.append(0.0)
        fold_results.append(res)
        null_dists.append(nulls)
    return final_feature_selection(fold_results, null_dists)


def _mc_df(spark, X, y):
    pdf = pd.DataFrame(
        {
            "sample_id": np.arange(len(y), dtype=np.int64),
            "features": list(X.astype(np.float64)),
            "y": y.astype(np.int32),
        }
    )
    return spark.createDataFrame(pdf)


def test_wrapper_model_multichannel_matches_numpy_oracle(spark):
    """WrapperModel over a two-channel registry == the numpy-statistics
    oracle, feature-ID-exact: ids stay logical, classifiers see the
    expanded channel columns (reference get_slice expansion)."""
    X, y, groups = _mc_fixture()
    df = _mc_df(spark, X, y).cache()
    params = dict(max_features=6, search_fraction=1.0)
    got = WrapperModel(n_fold=3, **params).execute(
        df, fold_seed=5, seed=1, col_groups=groups
    )
    want = _oracle_wrapper_multichannel(
        X, y, groups, n_fold=3, fold_seed=5, seed=1, **params
    )
    assert sorted(got) == sorted(want)
    assert all(0 <= f < len(groups) for f in got)  # logical ids
    assert len(set(got) & {0, 1, 2}) >= 1  # recovers planted groups


def test_combined_model_multichannel_all_strategies(spark):
    """CombinedFoldModel accepts col_groups: all five strategies return
    LOGICAL ids, filter recovers the planted groups, deterministic."""
    X, y, groups = _mc_fixture()
    df = _mc_df(spark, X, y).cache()
    out = CombinedFoldModel(n_fold=3).execute(
        df, fold_seed=5, seed=1, col_groups=groups
    )
    assert set(out) == {
        "filter", "fast_wrapper", "slow_wrapper", "random", "pseudo_random"
    }
    for sel in out.values():
        assert all(0 <= f < len(groups) for f in sel)
    # cross-fold significance keeps a subset of the planted groups (the
    # weakest, 1.5-sigma group 0 can drop at the null gate)
    assert len(out["filter"]) >= 2
    assert set(out["filter"]) <= {0, 1, 2}
    out2 = CombinedFoldModel(n_fold=3).execute(
        df, fold_seed=5, seed=1, col_groups=groups
    )
    assert out == out2
