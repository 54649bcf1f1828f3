"""Mergeable HyperLogLog sketches (protosc_spark.sketches): accuracy
vs exact distinct counts, sketch/direct-path agreement, register-wise
merge semantics, partitioning independence, and plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from protosc_spark.sketches import (
    hll_distinct,
    hll_error_bound,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _vals(spark, n_rows, n_distinct, g="a"):
    return spark.range(n_rows).select(
        F.lit(g).alias("g"),
        F.concat(
            F.lit(g), F.lit("v"), (F.col("id") % n_distinct).cast("string")
        ).alias("v"),
    )


@pytest.mark.parametrize("n_distinct", [500, 5000, 20000])
def test_hll_estimate_within_error_bound(spark, n_distinct):
    df = _vals(spark, 3 * n_distinct, n_distinct)
    est = hll_distinct(df, "g", "v").collect()[0].hll_distinct
    rel = abs(est - n_distinct) / n_distinct
    assert rel < 3 * hll_error_bound(), (est, n_distinct, rel)


def test_hll_linear_counting_small_range(spark):
    """Tiny cardinalities hit the linear-counting correction and are
    near-exact (the raw HLL formula would be badly biased here)."""
    df = _vals(spark, 1000, 100)
    est = hll_distinct(df, "g", "v").collect()[0].hll_distinct
    assert abs(est - 100) / 100 < 0.02, est


def test_hll_sketch_path_matches_direct_path(spark):
    df = _vals(spark, 10000, 4000)
    direct = hll_distinct(df, "g", "v").collect()[0].hll_distinct
    via_sketch = (
        hll_sketch(df, "g", "v")
        .select(hll_estimate("sketch").alias("e"))
        .collect()[0]
        .e
    )
    assert abs(direct - via_sketch) < 1e-6


def test_hll_merge_equals_sketch_of_union(spark):
    """The incremental-rollup contract: sketches of disjoint halves,
    merged register-wise, are IDENTICAL (array-exact, not just close)
    to the sketch of the union — so stored daily sketches answer
    range queries without rescanning raw rows."""
    a = _vals(spark, 6000, 3000, "x").where(F.col("id") < 3000)
    b = _vals(spark, 6000, 3000, "x").where(F.col("id") >= 3000)
    union = a.unionByName(b)
    sk_union = hll_sketch(union, "g", "v").collect()[0].sketch
    merged = hll_merge(
        hll_sketch(a, "g", "v").unionByName(hll_sketch(b, "g", "v")),
        "g",
    ).collect()[0].sketch
    assert list(merged) == list(sk_union)


def test_hll_partitioning_independence(spark):
    df = _vals(spark, 8000, 2500)
    e1 = hll_distinct(df.repartition(1), "g", "v").collect()[0].hll_distinct
    e2 = hll_distinct(df.repartition(17), "g", "v").collect()[0].hll_distinct
    assert e1 == e2


def test_hll_plan_no_python_no_cartesian(spark):
    df = _vals(spark, 100, 50)
    p = (
        hll_distinct(df, "g", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
