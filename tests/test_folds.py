"""Balanced k-fold invariants (reference tests/test_feature_matrix.py:
83-93 and tests/test_fold_utils.py semantics)."""

import numpy as np
from pyspark.sql import functions as F

from protosc_spark.folds import balanced_fold_assignment, with_fold_id


def test_balanced_folds_unbalanced_classes():
    rng = np.random.default_rng(42)
    y = np.array([0] * 70 + [1] * 30)
    fold = balanced_fold_assignment(y, k=5, rng=rng)
    # subsampled to min class count: 30 per class kept
    assert (fold >= 0).sum() == 60
    for i in range(5):
        sel = fold == i
        # each fold balanced across classes
        assert (y[sel] == 0).sum() == (y[sel] == 1).sum()
    # all kept indices unique & every fold non-empty
    assert all((fold == i).sum() > 0 for i in range(5))


def test_fold_sizes_remainder_distribution():
    rng = np.random.default_rng(0)
    y = np.array([0, 1] * 26)  # 26 blocks of stride 2, k=8 -> 2 blocks + rem 10... .
    fold = balanced_fold_assignment(y, k=8, rng=rng)
    sizes = [(fold == i).sum() for i in range(8)]
    # earlier folds get the remainder blocks, monotone non-increasing
    assert sizes == sorted(sizes, reverse=True)
    assert sum(sizes) == 52


def test_deterministic_given_seed():
    y = np.array([0, 1, 2] * 30)
    a = balanced_fold_assignment(y, k=4, rng=np.random.default_rng(7))
    b = balanced_fold_assignment(y, k=4, rng=np.random.default_rng(7))
    assert np.array_equal(a, b)


def test_with_fold_id_matches_local(spark):
    import pandas as pd

    y = np.array([0] * 40 + [1] * 25)
    pdf = pd.DataFrame(
        {"sample_id": np.arange(len(y), dtype=np.int64), "y": y, "features": [[0.0]] * len(y)}
    )
    df = spark.createDataFrame(pdf)
    got = (
        with_fold_id(df, "sample_id", k=4, fold_seed=123)
        .orderBy("sample_id")
        .select("fold_id")
        .toPandas()["fold_id"]
        .to_numpy()
    )
    want = balanced_fold_assignment(y, k=4, rng=np.random.default_rng(123))
    assert np.array_equal(got, want)
