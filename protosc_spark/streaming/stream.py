"""Structured Streaming surface of the engine.

The reference is strictly batch/in-memory (one `execute()` pass over a
list of files — reference protosc/pipeline.py:18-32); streaming is a
north-rule addition with no reference counterpart. Three operator
families, all expressed on the streaming DataFrame API so the SAME
feature definitions serve batch backfill and live ingestion:

1. **Stateless per-turn features** — the extractor framework
   (protosc_spark.extract) emits pure column expressions / Arrow-batch
   pandas UDFs, so `extract()` works verbatim on a streaming frame:
   one micro-batch = one bounded DataFrame.
2. **Watermarked gap sessionization** — `F.session_window(ts, gap)`
   grouped per conv_id. Boundary semantics vs the batch
   `windows.sessionize`: batch starts a new session when
   gap > gap_seconds (strict), streaming merges overlapping
   [ts, ts+gap) windows, so a gap of EXACTLY gap_seconds splits in
   streaming but not in batch; identical for all non-degenerate gaps.
3. **Custom stateful per-conversation operator** —
   `applyInPandasWithState` keeping (n_turns, sum_tokens) running
   state per conv_id: the streaming analog of the batch cumulative
   window features. State lives in the default HDFS-backed state
   store (RocksDB-free per the north rule) under the query's
   checkpointLocation, which is also what makes the stream resumable.

Scale notes: session_window + watermark is a streaming aggregation
whose state is pruned by the watermark — without `withWatermark`
Spark rejects append-mode session aggs (unbounded state). Grouping
key is conv_id, so state distributes by the same hash the batch
engine shuffles on.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a transcript parquet directory.

    In production the source is an Iceberg table stream / Kafka; the
    file source has identical semantics for the operators here.
    ``max_files_per_trigger`` forces multi-micro-batch execution in
    tests (state must carry across batches).
    """
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_turn_features(stream_df: DataFrame) -> DataFrame:
    """Stateless per-turn features on a stream — same extractors as batch."""
    from protosc_spark.extract import extract
    from protosc_spark.features.text import default_text_extractors

    out, _registry = extract(
        stream_df,
        list(default_text_extractors()),
        keep_cols=["conv_id", "turn_idx", "ts"],
    )
    return out


def stream_session_counts(
    stream_df: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    idx_col: str | None = "turn_idx",
) -> DataFrame:
    """Watermarked gap-sessionization: one row per closed session.

    Emission rule (pinned by tests + the driver oracle): append mode
    emits a session once its window end (last event ts + gap) is at or
    below the final watermark (max event ts − delay)."""
    aggs = [F.count(F.lit(1)).alias("n_turns")]
    sels = [
        F.col(entity_col),
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_turns",
    ]
    if idx_col is not None:
        aggs += [
            F.min(idx_col).alias("first_turn"),
            F.max(idx_col).alias("last_turn"),
        ]
        sels += ["first_turn", "last_turn"]
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(entity_col),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds"),
        )
        .agg(*aggs)
        .select(*sels)
    )


_STATE_SCHEMA = StructType(
    [StructField("n_turns", LongType()), StructField("sum_tokens", DoubleType())]
)
_CONV_STATE_OUT = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("turns_so_far", LongType()),
        StructField("mean_tokens_so_far", DoubleType()),
    ]
)


def _conv_state_fn(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
):
    """Running (count, token-sum) per conversation across micro-batches.

    Emits one row per input turn with the cumulative turn count and
    mean token count INCLUDING the current turn. Rows within a batch
    are processed in (turn_idx, ts) order so the output is
    deterministic regardless of source file order.
    """
    (conv_id,) = key
    n_turns, sum_tokens = state.get if state.exists else (0, 0.0)
    frames = []
    for pdf in batches:
        pdf = pdf.sort_values(["turn_idx", "ts"], kind="mergesort")
        tokens = pdf["text"].str.split(" ").str.len().astype("float64")
        cum_n = n_turns + pd.RangeIndex(1, len(pdf) + 1)
        cum_sum = sum_tokens + tokens.cumsum().to_numpy()
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": pdf["turn_idx"].to_numpy(),
                    "turns_so_far": cum_n.to_numpy(),
                    "mean_tokens_so_far": cum_sum / cum_n.to_numpy(),
                }
            )
        )
        n_turns = int(cum_n[-1]) if len(pdf) else n_turns
        sum_tokens = float(cum_sum[-1]) if len(pdf) else sum_tokens
    state.update((n_turns, sum_tokens))
    if frames:
        yield pd.concat(frames, ignore_index=True)


def stream_conversation_state(stream_df: DataFrame) -> DataFrame:
    """Custom stateful operator: per-conversation running stats."""
    return stream_df.groupBy("conv_id").applyInPandasWithState(
        _conv_state_fn,
        outputStructType=_CONV_STATE_OUT,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_parquet_sink(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain all available input into a parquet file sink.

    Unlike the memory sink this one SUPPORTS checkpoint recovery:
    restarting with the same checkpoint_dir resumes from the committed
    offsets and restores operator state from the state store — the
    streaming side of the engine's resumability contract
    (tests/test_streaming.py pins kill-and-restart equivalence)."""
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory_sink(
    df: DataFrame,
    name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drain all available input into an in-memory table; return it.

    Test/sandbox harness: trigger(availableNow) + processAllAvailable
    gives a bounded run with real streaming execution (micro-batches,
    state store, watermark advancement).
    """
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = df.sparkSession
    return spark.table(name)
