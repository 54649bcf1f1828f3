"""Structured Streaming surface of the engine.

The reference is strictly batch/in-memory (one `execute()` pass over a
list of files — reference protosc/pipeline.py:18-32); streaming is a
north-rule addition with no reference counterpart. Five operator
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
4. **Streaming strict-past as-of join** — `stream_asof_join`:
   applyInPandasWithState buffering out-of-order (turn | update)
   events per entity; a turn finalizes once the watermark passes it
   and gets the latest strictly-earlier update, row-atomically. A
   bounded run with a heartbeat row equals the batch as-of EXACTLY
   (shares the driver's DuckDB ASOF oracle).
5. **Streaming exact dedup** — `dropDuplicatesWithinWatermark` over
   re-delivered turns, state pruned by the watermark.

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

from protosc_spark.windows import _epoch_us
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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


# ---------------------------------------------------------------------------
# streaming as-of join (stateful, watermark-finalized)
# ---------------------------------------------------------------------------

_ASOF_STATE = StructType(
    [
        StructField("turn_ids", ArrayType(LongType())),
        StructField("turn_ts", ArrayType(LongType())),     # microseconds
        StructField("upd_ts", ArrayType(LongType())),      # microseconds
        StructField("upd_vals", ArrayType(DoubleType())),
    ]
)
_ASOF_OUT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("purchase_value", DoubleType()),
    ]
)


def _asof_state_fn(key: tuple, batches: Iterable[pd.DataFrame], state: GroupState):
    """Per-entity streaming as-of: buffer out-of-order (turn | update)
    events; a TURN is finalized once the watermark passes its event
    time (any event still in flight then has ts >= watermark >= turn
    ts, hence invisible under strict-past), and emitted with the
    latest buffered update value strictly before it — NULL values
    included (NaN-encoded in state). Duplicate-ts updates resolve
    value-ascending-nulls-first, last wins — the batch kernels'
    struct tiebreak.

    State compaction: after emission only updates that can still serve
    a pending or future turn survive — everything at or after
    min(pending turn ts, watermark), plus the single latest update
    before that threshold.
    """
    import numpy as np

    (user_id,) = key
    if state.exists:
        t_ids, t_ts, u_ts, u_vals = (list(x) for x in state.get)
    else:
        t_ids, t_ts, u_ts, u_vals = [], [], [], []

    if not state.hasTimedOut:
        for pdf in batches:
            is_turn = pdf["kind"] == "turn"
            t_ids.extend(int(v) for v in pdf.loc[is_turn, "event_id"])
            t_ts.extend(int(v) for v in pdf.loc[is_turn, "ts_us"])
            # heartbeats (kind tagged explicitly upstream) advance the
            # watermark but carry no state; NULL-VALUED UPDATES ARE
            # REAL UPDATES buffered with their NULL (encoded NaN in the
            # double-array state) so batch and stream agree when the
            # most recent prior row carries NULL (round-2 ADVICE)
            is_upd = pdf["kind"] == "update"
            u_ts.extend(int(v) for v in pdf.loc[is_upd, "ts_us"])
            u_vals.extend(
                float(v) if pd.notna(v) else float("nan")
                for v in pdf.loc[is_upd, "value"]
            )

    wm_us = state.getCurrentWatermarkMs() * 1000

    # sorted update view; duplicate ts -> value-ascending-NULLS-FIRST,
    # last wins (the batch kernels' struct tiebreak: non-null beats
    # null at equal ts, else max value). NaN encodes NULL, so sort on
    # a -inf key while keeping NaN for emission.
    if u_ts:
        ua = np.array(u_ts, dtype=np.int64)
        va = np.array(u_vals, dtype=np.float64)
        sort_key = np.where(np.isnan(va), -np.inf, va)
        order = np.lexsort((sort_key, ua))
        ua, va = ua[order], va[order]
        last_of_ts = np.append(ua[1:] != ua[:-1], True)
        ua, va = ua[last_of_ts], va[last_of_ts]
    else:
        ua = np.empty(0, dtype=np.int64)
        va = np.empty(0, dtype=np.float64)

    emit_ids, emit_ts, emit_vals, keep_ids, keep_ts = [], [], [], [], []
    for tid, tts in sorted(zip(t_ids, t_ts), key=lambda p: (p[1], p[0])):
        if tts <= wm_us:
            j = int(np.searchsorted(ua, tts, side="left")) - 1  # strict past
            emit_ids.append(tid)
            emit_ts.append(tts)
            if j < 0 or np.isnan(va[j]):
                emit_vals.append(None)  # no prior row / NULL-valued row
            else:
                emit_vals.append(float(va[j]))
        else:
            keep_ids.append(tid)
            keep_ts.append(tts)

    threshold = min(keep_ts) if keep_ts else max(wm_us, 0)
    j = int(np.searchsorted(ua, threshold, side="left")) - 1
    keep_from = max(j, 0)
    new_u_ts = [int(v) for v in ua[keep_from:]]
    new_u_vals = [float(v) for v in va[keep_from:]]

    state.update((keep_ids, keep_ts, new_u_ts, new_u_vals))
    if keep_ts:
        state.setTimeoutTimestamp(max(min(keep_ts) // 1000, wm_us // 1000 + 1))

    if emit_ids:
        yield pd.DataFrame(
            {
                "event_id": pd.array(emit_ids, dtype="int64"),
                "user_id": pd.array([int(user_id)] * len(emit_ids), dtype="int64"),
                "ts": pd.to_datetime(np.array(emit_ts, dtype="int64") * 1000),
                "purchase_value": pd.array(emit_vals, dtype="float64"),
            }
        )


def stream_asof_join(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    turn_filter: str = "event_type = 'click'",
    update_filter: str = "event_type = 'purchase'",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark: str = "0 seconds",
    heartbeat_filter: str | None = None,
) -> DataFrame:
    """Streaming strict-past as-of join over ONE interleaved event
    stream: rows matching ``turn_filter`` get the latest prior value of
    rows matching ``update_filter`` for the same entity.

    The batch equivalent (asof.asof_join on the filtered frames) is
    this operator's oracle: with a bounded availableNow run the final
    watermark reaches max(ts), so every turn finalizes and the output
    equals the batch as-of exactly — INCLUDING NULL-valued updates,
    which are buffered and carried like any other update (a turn whose
    most recent prior update has a NULL value gets NULL, the batch
    kernels' row-atomic rule; pinned on a planted NULL purchase in
    tests/test_streaming.py). Caveat of the NaN state encoding: a
    genuine NaN update value is emitted as NULL. State is per-entity
    and watermark-compacted.

    ``heartbeat_filter`` marks liveness rows EXPLICITLY: they advance
    the watermark but are neither turns nor updates. (Heartbeats used
    to be inferred from NULL update values, which silently diverged
    from batch on data with real NULL updates — round-2 ADVICE.)
    """
    # NOTE on finalizing the tail of a BOUNDED stream: the watermark
    # only reaches max(ts of rows that SURVIVE the filters) — Catalyst
    # legally pushes the type filter below the watermark node — and it
    # is millisecond-truncated, so the very last turn/update can never
    # finalize itself. The production-faithful remedy is a HEARTBEAT:
    # append one row matching heartbeat_filter stamped past the data's
    # max ts (stream sources emit such liveness markers routinely).
    # Watermarks need TIMESTAMP (UTC tz -> no NTZ shift).
    hb = heartbeat_filter or "false"
    tagged = (
        events.withColumn("__ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("__ts", watermark)
        .where(f"({turn_filter}) OR ({update_filter}) OR ({hb})")
        .select(
            F.col(entity_col).cast("long").alias("user_id"),
            F.col(id_col).cast("long").alias("event_id"),
            F.col("__ts").alias("ts"),
            # heartbeat tagged FIRST: a liveness row may also match the
            # update filter shape
            F.when(F.expr(hb), F.lit("heartbeat"))
            .when(F.expr(turn_filter), F.lit("turn"))
            .otherwise(F.lit("update"))
            .alias("kind"),
            F.col(value_col).cast("double").alias("value"),
            _epoch_us(F.col(ts_col)).alias("ts_us"),  # NTZ-safe
        )
    )
    return tagged.groupBy("user_id").applyInPandasWithState(
        _asof_state_fn,
        outputStructType=_ASOF_OUT,
        stateStructType=_ASOF_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_exact_dedup(
    stream_df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key; repeated
    deliveries within the watermark horizon are dropped and the
    dedup state itself is watermark-pruned (bounded memory — the
    property plain dropDuplicates lacks on streams)."""
    return stream_df.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def write_time_sliced_source(
    df: DataFrame,
    out_dir: str,
    n_slices: int = 4,
    ts_col: str = "ts",
    scramble_col: str | None = None,
) -> None:
    """Materialize a bounded DataFrame as a file-stream source whose
    files arrive in EVENT-TIME order (one file per time slice, strictly
    increasing modification times), with rows scrambled inside each
    slice. This is the realistic arrival model watermarking is designed
    for: disorder bounded within a slice (the operator sorts), zero
    late data across slices — so `watermark="0 seconds"` finalizes
    everything in a bounded availableNow run. Random file splits
    instead create unbounded lateness and the watermark DROPS rows;
    that is Spark's documented contract, not an operator bug."""
    import time as _time

    us = _epoch_us(F.col(ts_col))
    qs = [i / n_slices for i in range(1, n_slices)]
    bounds = [
        r[0]
        for r in df.select(
            F.explode(
                F.percentile(us, F.array(*[F.lit(q) for q in qs]))
            ).alias("b")
        ).collect()
    ]
    lo = None
    for hi in bounds + [None]:
        s = df
        if lo is not None:
            s = s.where(us > lo)
        if hi is not None:
            s = s.where(us <= hi)
        order = F.xxhash64(scramble_col) if scramble_col else F.xxhash64(*df.columns[:1])
        s.orderBy(order).coalesce(1).write.mode("append").parquet(out_dir)
        _time.sleep(1.05)  # strictly increasing file mtimes = arrival order
        lo = hi


_DECAY_STATE = StructType(
    [
        StructField("prev_us", LongType()),   # -1 = nothing processed
        StructField("acc_c", DoubleType()),
        StructField("acc_s", DoubleType()),
        StructField("buf_idx", ArrayType(LongType())),
        StructField("buf_us", ArrayType(LongType())),
        StructField("buf_v", ArrayType(DoubleType())),
    ]
)
_DECAY_OUT = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", LongType()),
        StructField("ts", TimestampType()),
        StructField("decayed_count", DoubleType()),
        StructField("decayed_value", DoubleType()),
    ]
)


def _mk_decay_state_fn(lam_per_us: float):
    import math

    def _fn(key, batches, state: GroupState):
        """Per-conversation streaming exponential-decay features: turns
        buffer until the watermark passes them, then run through the
        SAME recurrence as the batch fold (windows.time_decay_features)
        in (turn_idx, ts) order, the accumulator surviving in state —
        so a bounded run with a trailing heartbeat equals the batch
        operator to the last shared digit (pinned at 1e-9 in tests;
        JVM vs libm exp differ at most 1 ulp). Contract: within a
        conversation, turn_idx order must agree with ts order (the
        clean-table invariant; stable_dedup dirty streams upstream),
        because a turn finalizes once no earlier-ts row can still
        arrive. NULL values contribute zero, as in batch."""
        import numpy as np
        import pandas as pd

        (conv_id,) = key
        if state.exists:
            prev_us, acc_c, acc_s, bi, bu, bv = state.get
            bi, bu, bv = list(bi), list(bu), list(bv)
        else:
            prev_us, acc_c, acc_s, bi, bu, bv = -1, 0.0, 0.0, [], [], []

        if not state.hasTimedOut:
            for pdf in batches:
                turns = pdf[pdf["kind"] == "turn"]
                bi.extend(int(v) for v in turns["turn_idx"])
                bu.extend(int(v) for v in turns["ts_us"])
                bv.extend(
                    float(v) if pd.notna(v) else 0.0
                    for v in turns["value"]
                )

        wm_us = state.getCurrentWatermarkMs() * 1000
        order = sorted(range(len(bi)), key=lambda k: (bi[k], bu[k], bv[k]))
        out_idx, out_us, out_c, out_v = [], [], [], []
        kept = []
        for k in order:
            if bu[k] <= wm_us:
                if prev_us < 0:
                    decay = 1.0
                    prev = bu[k]
                else:
                    prev = prev_us
                decay = math.exp(-lam_per_us * float(bu[k] - prev))
                dc = acc_c * decay
                dv = acc_s * decay
                out_idx.append(bi[k])
                out_us.append(bu[k])
                out_c.append(dc)
                out_v.append(dv)
                acc_c = dc + 1.0
                acc_s = dv + bv[k]
                prev_us = bu[k]
            else:
                kept.append(k)

        state.update(
            (
                int(prev_us),
                float(acc_c),
                float(acc_s),
                [bi[k] for k in kept],
                [bu[k] for k in kept],
                [bv[k] for k in kept],
            )
        )
        if kept:
            state.setTimeoutTimestamp(
                max(min(bu[k] for k in kept) // 1000, wm_us // 1000 + 1)
            )

        if out_idx:
            yield pd.DataFrame(
                {
                    "conv_id": [str(conv_id)] * len(out_idx),
                    "turn_idx": pd.array(out_idx, dtype="int64"),
                    "ts": pd.to_datetime(
                        np.array(out_us, dtype="int64") * 1000
                    ),
                    "decayed_count": pd.array(out_c, dtype="float64"),
                    "decayed_value": pd.array(out_v, dtype="float64"),
                }
            )

    return _fn


def stream_decay_features(
    stream_df: DataFrame,
    value_expr: str = "CAST(size(split(text, ' ')) AS DOUBLE)",
    half_life_s: float = 3600.0,
    entity_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
    watermark: str = "0 seconds",
    heartbeat_filter: str | None = None,
) -> DataFrame:
    """Streaming counterpart of :func:`windows.time_decay_features`:
    per-turn exponentially decayed prior-turn count/value mass,
    computed live with per-conversation state (the running
    accumulator + a watermark-bounded buffer of not-yet-final turns).
    A bounded availableNow run with a trailing heartbeat equals the
    batch fold — same recurrence, same (turn_idx, ts) order, same
    NULL-contributes-zero rule — to the last shared digit (JVM exp vs
    libm exp can differ at 1 ulp; pinned stream==batch at 1e-9 in
    tests/test_streaming.py, and the gate's round-6 contract is far
    inside that). Heartbeat rows advance the watermark
    but are neither buffered nor emitted."""
    import math

    hb = heartbeat_filter or "false"
    lam = math.log(2.0) / (float(half_life_s) * 1e6)
    tagged = (
        stream_df.withColumn("__ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("__ts", watermark)
        .select(
            F.col(entity_col).cast("string").alias("conv_id"),
            F.col(idx_col).cast("long").alias("turn_idx"),
            F.when(F.expr(hb), F.lit("heartbeat"))
            .otherwise(F.lit("turn"))
            .alias("kind"),
            F.expr(value_expr).cast("double").alias("value"),
            _epoch_us(F.col(ts_col)).alias("ts_us"),
            F.col("__ts"),
        )
    )
    return tagged.groupBy("conv_id").applyInPandasWithState(
        _mk_decay_state_fn(lam),
        outputStructType=_DECAY_OUT,
        stateStructType=_DECAY_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
