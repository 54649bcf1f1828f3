"""Physical-plan shape regression tests.

Throughput claims live in BENCH/; these tests pin the PLAN properties
the claims rest on, so a refactor that silently de-broadcasts a join,
breaks scan pruning, or adds a shuffle fails CI rather than only
showing up as a slower benchmark. (The reference has no optimizer to
test; this suite is the engine's analog of its operator-contract
unit tests.)
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from protosc_spark.extract import extract
from protosc_spark.features.text import default_text_extractors
from protosc_spark.windows import rolling_agg, sessionize, with_lag_lead

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    """Physical plan text, truncated at the first cache boundary —
    InMemoryRelation prints its (already materialized) child plan,
    whose exchanges are not re-executed."""
    p = df._jdf.queryExecution().executedPlan().toString()
    idx = p.find("InMemoryRelation")
    return p if idx < 0 else p[:idx]


def n_shuffles(p: str) -> int:
    return p.count("Exchange hashpartitioning") + p.count(
        "Exchange rangepartitioning"
    )


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


def test_q1_pushes_filter_and_prunes_columns(spark, queries):
    p = plan(queries["q1_pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # scan reads only the 7 needed columns of 16
    read = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read and "l_partkey" not in read


def test_q3_joins_broadcast_not_sortmerge(spark, queries):
    p = plan(queries["q3_order_revenue"](spark, SF))
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_extract_is_narrow_single_python_stage(spark, transcripts):
    out, _ = extract(
        transcripts, list(default_text_extractors()), keep_cols=["conv_id"]
    )
    p = plan(out)
    # both pandas UDFs batched into ONE Arrow exchange, no shuffle at all
    assert p.count("ArrowEvalPython") == 1
    assert n_shuffles(p) == 0


def test_window_chain_single_shuffle(spark, transcripts):
    df = transcripts.withColumn(
        "nt", F.size(F.split("text", " ")).cast("double")
    )
    df = with_lag_lead(df, {"x": "nt"}, order="turn_idx")
    df = rolling_agg(df, {"rm": F.avg("nt")}, n_rows=5, order="turn_idx")
    df = sessionize(df, gap_seconds=1800, order=["turn_idx"])
    # lag + rolling + sessionize all ride ONE conv_id exchange — and
    # when the input is already hash-partitioned on conv_id (the cached
    # fixture is, because datagen itself windows on conv_id), ZERO
    assert n_shuffles(plan(df)) <= 1


def test_flagship_shuffle_budget(spark, transcripts):
    from protosc_spark.pipeline import flagship_features

    out, _ = flagship_features(transcripts, dedup=True)
    p = plan(out)
    # dedup + every window feature share one conv_id exchange; the
    # cached-input boundary appears as at most one more
    assert n_shuffles(p) <= 2
    assert p.count("ArrowEvalPython") == 1
    assert "CartesianProduct" not in p


def test_jaccard_single_pair_shuffle_no_nested_loop(spark, queries):
    p = plan(queries["dedup_ngram_jaccard"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    # one hash shuffle for the pair aggregate; per-doc count joins are
    # broadcast (the trailing rangepartitioning is the oracle orderBy)
    assert p.count("Exchange hashpartitioning") == 1


def test_asof_window_impl_single_shuffle(spark, queries):
    p = plan(queries["asof_join_purchase"](spark, SF))
    assert n_shuffles(p) == 1
    assert "SortMergeJoin" not in p  # it's a union + window, not a join
