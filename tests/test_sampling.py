"""Deterministic split / sample operators: engine vs DuckDB oracle,
stability contracts, plan shape."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from protosc_spark.sampling import (
    N_BUCKETS,
    hash_bucket,
    hash_split,
    split_oracle_sql,
    stratified_sample,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    return con.execute(sql).df()


def test_split_matches_duckdb_oracle(docs):
    got = (
        hash_split(docs, ["doc_id"], WEIGHTS)
        .select("doc_id", "split")
        .orderBy("doc_id")
        .toPandas()
    )
    case = split_oracle_sql("doc_id::VARCHAR", WEIGHTS)
    want = _duck(
        f"SELECT doc_id, {case} AS split FROM documents ORDER BY doc_id"
    )
    pd.testing.assert_frame_equal(got, want)


def test_split_fractions_and_totality(docs):
    counts = {
        r["split"]: r["count"]
        for r in hash_split(docs, ["doc_id"], WEIGHTS)
        .groupBy("split")
        .count()
        .collect()
    }
    n = sum(counts.values())
    assert n == docs.count()  # every row assigned exactly one split
    assert set(counts) == set(WEIGHTS)
    # 500 docs: binomial tolerance, generous
    assert abs(counts["train"] / n - 0.9) < 0.06
    assert abs(counts["val"] / n - 0.05) < 0.04
    assert abs(counts["test"] / n - 0.05) < 0.04


def test_split_stability_is_per_row(docs):
    """Removing other rows never moves a surviving row's split."""
    full = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, ["doc_id"], WEIGHTS).collect()
    }
    subset = docs.where(F.col("doc_id") % 3 == 0)
    sub = {
        r["doc_id"]: r["split"]
        for r in hash_split(subset, ["doc_id"], WEIGHTS).collect()
    }
    assert sub == {k: v for k, v in full.items() if k % 3 == 0}


def test_split_salt_changes_assignment(docs):
    a = hash_split(docs, ["doc_id"], WEIGHTS, salt="v1")
    b = hash_split(docs, ["doc_id"], WEIGHTS, salt="v2")
    joined = a.select("doc_id", F.col("split").alias("sa")).join(
        b.select("doc_id", F.col("split").alias("sb")), "doc_id"
    )
    n_diff = joined.where(F.col("sa") != F.col("sb")).count()
    assert n_diff > 0


def test_split_weights_must_sum_to_one(docs):
    with pytest.raises(ValueError):
        hash_split(docs, ["doc_id"], {"a": 0.5, "b": 0.6})


def test_stratified_sample_monotone_nested(docs):
    s10 = {r["doc_id"] for r in stratified_sample(docs, 0.10, ["doc_id"]).collect()}
    s25 = {r["doc_id"] for r in stratified_sample(docs, 0.25, ["doc_id"]).collect()}
    assert s10 <= s25  # nested: smaller fraction is a subset
    n = docs.count()
    assert abs(len(s25) / n - 0.25) < 0.08


def test_stratified_sample_deterministic_across_partitioning(docs):
    a = {r["doc_id"] for r in stratified_sample(docs, 0.2, ["doc_id"]).collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(17), 0.2, ["doc_id"]
        ).collect()
    }
    assert a == b


def test_bucket_range(docs):
    mm = docs.select(hash_bucket(["doc_id"]).alias("b")).agg(
        F.min("b"), F.max("b")
    ).first()
    assert mm[0] >= 0 and mm[1] < N_BUCKETS


def test_split_plan_has_no_shuffle_or_python(docs):
    plan = hash_split(docs, ["doc_id"], WEIGHTS)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
