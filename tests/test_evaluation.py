"""Evaluation metrics (evaluation.py): exact AUC via the score-value
histogram collapse, calibration bins + ECE."""

import itertools

import pytest
from pyspark.sql import functions as F

from protosc_spark.evaluation import auc_exact, calibration_bins
from protosc_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_evaluation")


def _auc_bruteforce(pairs):
    """P(random positive outranks random negative), ties half."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    wins = sum(
        1.0 if p > n else 0.5 if p == n else 0.0
        for p, n in itertools.product(pos, neg)
    )
    return wins / (len(pos) * len(neg))


def test_auc_matches_bruteforce_with_ties(spark):
    pairs = [
        (3, 1), (3, 0), (3, 1), (2, 0), (2, 1), (5, 1), (1, 0),
        (1, 0), (4, 0), (4, 1), (4, 1), (2, 0), (5, 0),
    ]
    df = spark.createDataFrame(pairs, "s long, y int")
    r = auc_exact(df, "s", "y").collect()[0]
    assert r.n_pos == 6 and r.n_neg == 7
    assert abs(r.auc - _auc_bruteforce(pairs)) < 1e-12


def test_auc_extremes_and_degenerate(spark):
    sep = spark.createDataFrame(
        [(10, 1), (11, 1), (1, 0), (2, 0)], "s long, y int"
    )
    assert auc_exact(sep, "s", "y").collect()[0].auc == 1.0
    rev = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 0), (11, 0)], "s long, y int"
    )
    assert auc_exact(rev, "s", "y").collect()[0].auc == 0.0
    tie = spark.createDataFrame(
        [(7, 1), (7, 0), (7, 1), (7, 0)], "s long, y int"
    )
    assert abs(auc_exact(tie, "s", "y").collect()[0].auc - 0.5) < 1e-12
    onecls = spark.createDataFrame([(1, 1), (2, 1)], "s long, y int")
    assert auc_exact(onecls, "s", "y").collect()[0].auc is None


def test_calibration_bins_and_ece(spark):
    """Hand fixture: bin 0 holds scores .05/.05 with labels 1,0
    (conf .05, rate .5); score 1.0 folds into bin 9 (conf 1, rate 1);
    ECE recomputed in python."""
    rows = [(0.05, 1), (0.05, 0), (1.0, 1), (0.95, 1), (0.52, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = {r.bin: r for r in
           calibration_bins(df, "s", "y", n_bins=10).collect()}
    assert set(out) == {0, 5, 9}
    assert out[0].n == 2 and abs(out[0].conf - 0.05) < 1e-12
    assert abs(out[0].rate - 0.5) < 1e-12
    assert out[9].n == 2  # 1.0 folded down + 0.95
    ece = (2 / 5) * abs(0.5 - 0.05) + (1 / 5) * abs(0.0 - 0.52) \
        + (2 / 5) * abs(1.0 - 0.975)
    assert abs(out[0].ece - ece) < 1e-12


def test_evaluation_plan_no_python(spark):
    df = spark.createDataFrame([(1, 1)], "s long, y int")
    for out in (
        auc_exact(df, "s", "y"),
        calibration_bins(df, "s", "y"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
