"""FilterModel parity: the distributed engine's selection equals the
pure-numpy oracle EXACTLY (feature ids), and both recover the planted
ground truth on the reference's own easy-data configuration
(reference tests/test_fold_models.py:14-19,50-52 — seed 1928374,
correlated data with 5 planted base features x 2 copies)."""

import numpy as np
import pandas as pd
import pytest

from protosc_spark.models.filter_model import FilterModel
from protosc_spark.oracle.numpy_model import (
    oracle_chisquare,
    oracle_filter_model,
    quantize,
)
from protosc_spark.oracle.simulation import (
    make_correlated,
    selection_quality,
)
from protosc_spark.select import select_from_stats


@pytest.fixture(scope="module")
def easy_data():
    np.random.seed(1928374)
    return make_correlated(
        n_base_features=10, n_true=5, n_samples=100,
        min_dev=20, max_dev=30, n_corr=2,
    )


def _to_df(spark, X, y):
    pdf = pd.DataFrame(
        {
            "sample_id": np.arange(len(y), dtype=np.int64),
            "features": list(X.astype(np.float64)),
            "y": y.astype(np.int32),
        }
    )
    return spark.createDataFrame(pdf)


def test_single_selection_engine_equals_oracle(spark, easy_data):
    X, y, _ = easy_data
    df = _to_df(spark, X, y).cache()
    from protosc_spark.stats import chisquare_features, correlation_submatrix

    chisq_d = quantize(chisquare_features(df, n_features=X.shape[1]))
    sel_d, clusters_d = select_from_stats(
        chisq_d,
        lambda fs: quantize(correlation_submatrix(df, fs)),
        n_samples=X.shape[0],
    )
    chisq_l = quantize(oracle_chisquare(X, y))
    sel_l, clusters_l = select_from_stats(
        chisq_l,
        lambda fs: quantize(np.corrcoef(X[:, fs], rowvar=False)),
        n_samples=X.shape[0],
    )
    assert np.array_equal(chisq_d, chisq_l)
    assert sel_d == sel_l
    assert clusters_d == clusters_l


def test_filter_model_engine_equals_oracle(spark, easy_data):
    X, y, truth = easy_data
    df = _to_df(spark, X, y)
    engine_sel = FilterModel(n_fold=8).execute(
        df, fold_seed=1298374, seed=0, mode="distributed"
    )
    oracle = oracle_filter_model(X, y, n_fold=8, fold_seed=1298374, seed=0)
    assert engine_sel == oracle["selected"]

    # ground-truth recovery, like reference tests/test_fold_models.py:52
    q = selection_quality(engine_sel, truth)
    assert set(engine_sel) == set(truth["selected_features"].tolist())
    assert q["precision"] == 1.0 and q["recall"] == 1.0


def test_filter_model_deterministic_across_partitionings(spark, easy_data):
    X, y, _ = easy_data
    a = FilterModel(n_fold=3).execute(
        _to_df(spark, X, y), fold_seed=11, seed=5, mode="distributed"
    )
    b = FilterModel(n_fold=3).execute(
        _to_df(spark, X, y).repartition(13), fold_seed=11, seed=5,
        mode="distributed",
    )
    assert a == b


def test_local_mode_equals_distributed(spark, easy_data):
    """The small-data fast path (one collect + shared numpy pipeline)
    must return exactly the distributed path's selection — it IS the
    parity oracle, so this is equality by construction, pinned."""
    X, y, _ = easy_data
    d = FilterModel(n_fold=3).execute(
        _to_df(spark, X, y), fold_seed=11, seed=5, mode="distributed"
    )
    l = FilterModel(n_fold=3).execute(
        _to_df(spark, X, y), fold_seed=11, seed=5, mode="local"
    )
    auto = FilterModel(n_fold=3).execute(
        _to_df(spark, X, y), fold_seed=11, seed=5
    )
    assert d == l == auto
