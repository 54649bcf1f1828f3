"""Key-skew diagnostics (skew.py): Gini via the count-of-counts
collapse must equal the classic sorted-rank formula."""

import pytest
from pyspark.sql import functions as F

from protosc_spark.session import get_spark
from protosc_spark.skew import key_skew_stats


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_skew")


def _df(spark, counts):
    rows = [
        (f"k{i}",) for i, c in enumerate(counts) for _ in range(c)
    ]
    return spark.createDataFrame(rows, "k string")


def _gini_reference(counts):
    c = sorted(counts)
    n, s = len(c), sum(c)
    t = sum((i + 1) * ci for i, ci in enumerate(c))
    return 2 * t / (n * s) - (n + 1) / n


def test_gini_matches_sorted_rank_formula(spark):
    """Mixed distribution WITH frequency ties (the collapse's hard
    case: tied frequencies share rank mass m(m+1)/2)."""
    counts = [1, 1, 1, 2, 2, 5, 5, 5, 40, 100]
    r = key_skew_stats(_df(spark, counts), "k").collect()[0]
    assert r.n_rows == sum(counts) and r.n_keys == len(counts)
    assert r.max_count == 100
    assert abs(r.max_share - 100 / sum(counts)) < 1e-12
    assert abs(r.gini - _gini_reference(counts)) < 1e-12


def test_gini_uniform_zero_and_degenerate(spark):
    """All keys equal frequency: gini 0 exactly. Single key: gini
    NULL (undefined), max_share 1."""
    r = key_skew_stats(_df(spark, [7] * 6), "k").collect()[0]
    assert abs(r.gini - 0.0) < 1e-12
    one = key_skew_stats(_df(spark, [9]), "k").collect()[0]
    assert one.gini is None and one.max_share == 1.0


def test_null_keys_count_as_a_key(spark):
    df = spark.createDataFrame(
        [("a",), (None,), (None,), (None,)], "k string"
    )
    r = key_skew_stats(df, "k").collect()[0]
    assert r.n_keys == 2 and r.max_count == 3


def test_skew_plan_no_python(spark):
    plan = (
        key_skew_stats(_df(spark, [1, 2]), "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
