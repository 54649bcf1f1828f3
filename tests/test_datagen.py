"""Datagen invariants: determinism, schema, skew tail, dedup roundtrip.

Mirrors the reference's determinism-under-parallelism precedent
(reference tests/test_parallel.py:8-37 pins identical output at
n_jobs=1 vs 3) at the partitioning level.
"""

from pyspark.sql import functions as F

from protosc_spark.datagen import (
    generate_attribute_updates,
    generate_transcripts,
    generate_transcripts_dirty,
)
from protosc_spark.ordering import stable_dedup


def test_schema(transcripts):
    assert [(f.name, f.dataType.simpleString()) for f in transcripts.schema] == [
        ("conv_id", "string"),
        ("turn_idx", "int"),
        ("role", "string"),
        ("text", "string"),
        ("tool", "string"),
        ("ts", "timestamp"),
    ]


def test_deterministic_across_partitionings(spark, transcripts):
    again = generate_transcripts(spark, n_conversations=120, seed=42, partitions=3)
    a = transcripts.orderBy("conv_id", "turn_idx").collect()
    b = again.orderBy("conv_id", "turn_idx").collect()
    assert a == b


def test_unique_turn_key_and_monotone_ts(transcripts):
    n = transcripts.count()
    assert transcripts.select("conv_id", "turn_idx").distinct().count() == n
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    bad = (
        transcripts.withColumn("prev", F.lag("ts").over(w))
        .where(F.col("prev").isNotNull() & (F.col("ts") <= F.col("prev")))
        .count()
    )
    assert bad == 0


def test_skew_tail_exists(transcripts):
    counts = transcripts.groupBy("conv_id").count()
    mx = counts.agg(F.max("count")).first()[0]
    med = counts.approxQuantile("count", [0.5], 0.01)[0]
    assert mx >= 20 * med


def test_tool_only_on_tool_turns(transcripts):
    assert transcripts.where((F.col("role") != "tool") & F.col("tool").isNotNull()).count() == 0
    assert transcripts.where((F.col("role") == "tool") & F.col("tool").isNull()).count() == 0


def test_dirty_dedup_roundtrip(spark, transcripts):
    dirty = generate_transcripts_dirty(spark, n_conversations=120, seed=42)
    assert dirty.count() > transcripts.count()
    back = stable_dedup(dirty).orderBy("conv_id", "turn_idx").collect()
    assert back == transcripts.orderBy("conv_id", "turn_idx").collect()


def test_attribute_updates(spark):
    u = generate_attribute_updates(spark, n_conversations=120, seed=42)
    assert u.columns == ["conv_id", "ts", "attr_value"]
    # some conversations intentionally have no updates
    n_conv_with = u.select("conv_id").distinct().count()
    assert 0 < n_conv_with < 120
