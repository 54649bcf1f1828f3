"""As-of join: both implementations vs a per-conversation pandas
merge_asof oracle (FIXTURES.md F5), plus strict-past edge cases."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from protosc_spark.asof import asof_join, asof_join_grouped
from protosc_spark.datagen import generate_attribute_updates


@pytest.fixture(scope="module")
def updates(spark):
    return generate_attribute_updates(spark, n_conversations=120, seed=42).cache()


def _oracle(left_pdf, right_pdf, allow_exact):
    left_pdf = left_pdf.sort_values(["ts", "conv_id"], kind="mergesort")
    right_pdf = right_pdf.sort_values(["ts", "conv_id"], kind="mergesort")
    out = pd.merge_asof(
        left_pdf,
        right_pdf,
        on="ts",
        by="conv_id",
        direction="backward",
        allow_exact_matches=allow_exact,
    )
    return out.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("impl", [asof_join, asof_join_grouped])
def test_asof_matches_pandas_oracle(impl, transcripts, updates):
    got = (
        impl(transcripts, updates, on="ts", by="conv_id")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    want = _oracle(transcripts.toPandas(), updates.toPandas(), allow_exact=False)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_strict_past_exact_ts_invisible(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["a", "a"],
                "turn_idx": [0, 1],
                "ts": pd.to_datetime(["2025-01-01 00:00:10", "2025-01-01 00:01:00"]),
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["a", "a"],
                "ts": pd.to_datetime(["2025-01-01 00:00:10", "2025-01-01 00:00:30"]),
                "attr_value": [1.0, 2.0],
            }
        )
    )
    for impl in (asof_join, asof_join_grouped):
        got = (
            impl(left, right).orderBy("turn_idx").select("attr_value").toPandas()
        )
        # update AT 00:00:10 is not visible at the 00:00:10 turn
        assert pd.isna(got["attr_value"][0])
        assert got["attr_value"][1] == 2.0
    # with exact matches allowed it becomes visible
    got = (
        asof_join(left, right, allow_exact_matches=True)
        .orderBy("turn_idx")
        .select("attr_value")
        .toPandas()
    )
    assert got["attr_value"][0] == 1.0


def test_no_updates_means_null(transcripts, updates):
    joined = asof_join(transcripts, updates)
    convs_without = (
        transcripts.select("conv_id")
        .distinct()
        .join(updates.select("conv_id").distinct(), "conv_id", "left_anti")
    )
    n_rows_without = transcripts.join(convs_without, "conv_id", "left_semi").count()
    assert n_rows_without > 0
    n_null = joined.where(F.col("attr_value").isNull()).join(
        convs_without, "conv_id", "left_semi"
    ).count()
    assert n_null == n_rows_without


def test_asof_deterministic_vs_grouped_on_skew(spark, transcripts, updates):
    # the skew-tail conversation goes through both paths identically
    a = (
        asof_join(transcripts, updates)
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    b = (
        asof_join_grouped(transcripts, updates, n_buckets=7)
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert a == b
