"""Deterministic synthetic transcript generator (Spark-native).

Produces the engine's primary input table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` entirely with JVM-side expressions (``xxhash64`` as the
randomness source), so the SAME rows are produced at any parallelism /
partitioning — the invariant the reference pins for its process pool in
tests/test_parallel.py (identical output at n_jobs=1 vs 3) and that our
local[8]-vs-local[32] scaling evidence relies on.

Design notes for scale:
* generation is ``spark.range(n_conv)`` -> per-conversation expressions
  -> ``explode(sequence(...))`` into turns; no driver-side loops, no RNG
  state, linear in output size.
* ~1% of conversations get a 50-100x turn count (skew tail) to exercise
  salt-bucketing / AQE skew handling downstream.
* every 17th turn index injects a >30min gap so gap-sessionization
  boundaries land at known places.
* ``text`` is a pure function of (conv_id, turn_idx, seed) — the
  "per-turn text equality under stable turn ordering" parity invariant:
  dedup/reordering can never change a turn's text.

The reference has no data generator of this shape; its synthetic
generators live in protosc/simulation.py:5-133 (feature matrices) and
are mirrored in protosc_spark/oracle/simulation.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

EPOCH = "2025-01-01 00:00:00"
ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "exec", "read", "write"]
VOCAB = 997  # token vocabulary size (prime, so hash mixing is decent)
GAP_SESSION_EVERY = 17  # turn_idx % 17 == 13 -> >30min gap
MAX_TOKENS = 48


def _h(seed: int, *cols: Column | str, mod: int) -> Column:
    """Deterministic hash in [0, mod) from (seed, cols...)."""
    return F.pmod(F.xxhash64(F.lit(seed), *cols), F.lit(mod))


def generate_transcripts(
    spark: SparkSession,
    n_conversations: int = 2000,
    seed: int = 42,
    median_turns: int = 20,
    skew_fraction: float = 0.01,
    skew_multiplier: int = 60,
    partitions: int | None = None,
) -> DataFrame:
    """Build the transcript table deterministically from ``seed``.

    Returns a DataFrame with exactly the BASELINE input_hint schema.
    """
    n_part = partitions or spark.sparkContext.defaultParallelism
    conv = (
        spark.range(0, n_conversations, 1, n_part)
        .select(
            F.format_string("c%08d", F.col("id")).alias("conv_id"),
            F.col("id").alias("conv_num"),
        )
        # turn count: uniform-ish 4..2*median, with a skewed 1% tail
        .withColumn(
            "base_turns",
            (F.lit(4) + _h(seed, "conv_id", mod=max(2 * median_turns - 4, 1))).cast(
                "int"
            ),
        )
        .withColumn(
            "is_skew",
            _h(seed + 1, "conv_id", mod=int(round(1 / max(skew_fraction, 1e-9))))
            == 0,
        )
        .withColumn(
            "n_turns",
            F.when(
                F.col("is_skew"), F.col("base_turns") * F.lit(skew_multiplier)
            ).otherwise(F.col("base_turns")),
        )
        # conversation start: epoch + hash-chosen offset within ~30 days
        .withColumn(
            "start_s", _h(seed + 2, "conv_id", mod=30 * 24 * 3600)
        )
    )

    turns = conv.select(
        "conv_id",
        "start_s",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    # per-turn deterministic attributes ------------------------------------
    role_ix = F.pmod(
        F.col("turn_idx") + _h(seed + 3, "conv_id", mod=3), F.lit(3)
    ).cast("int")
    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), role_ix + 1)

    tool_ix = _h(seed + 4, "conv_id", "turn_idx", mod=len(TOOLS)).cast("int")
    tool = F.when(
        role == "tool", F.element_at(F.array(*[F.lit(t) for t in TOOLS]), tool_ix + 1)
    ).otherwise(F.lit(None).cast("string"))

    n_tokens = (F.lit(1) + _h(seed + 5, "conv_id", "turn_idx", mod=MAX_TOKENS)).cast(
        "int"
    )
    # text = pure function of (conv_id, turn_idx, token position, seed)
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_tokens - 1),
            lambda i: F.concat(
                F.lit("tok"),
                F.pmod(
                    F.xxhash64(F.lit(seed + 6), F.col("conv_id"), F.col("turn_idx"), i),
                    F.lit(VOCAB),
                ),
            ),
        ),
        " ",
    )

    # inter-turn gap: 1..600s, every 17th (idx%17==13) turn jumps >30min
    gap = F.when(F.col("turn_idx") == 0, F.lit(0)).otherwise(
        F.when(
            F.pmod(F.col("turn_idx"), F.lit(GAP_SESSION_EVERY)) == 13,
            F.lit(2100) + _h(seed + 7, "conv_id", "turn_idx", mod=600),
        ).otherwise(F.lit(1) + _h(seed + 7, "conv_id", "turn_idx", mod=600))
    )

    w = W.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    out = (
        turns.withColumn("gap_s", gap)
        .withColumn("off_s", F.sum("gap_s").over(w))
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            role.alias("role"),
            text.alias("text"),
            tool.alias("tool"),
            (
                F.to_timestamp(F.lit(EPOCH))
                + F.make_interval(secs=(F.col("start_s") + F.col("off_s")).cast("double"))
            ).alias("ts"),
        )
    )
    return out


def generate_transcripts_dirty(
    spark: SparkSession,
    n_conversations: int = 2000,
    seed: int = 42,
    dup_fraction_mod: int = 11,
    **kwargs,
) -> DataFrame:
    """Clean table + injected duplicates with perturbed later ``ts``.

    Roughly 1/``dup_fraction_mod`` of turns are emitted twice: once with
    the true timestamp and once with ts+[1..30]s (same conv_id/turn_idx/
    text). Stable-ordering dedup (ordering.stable_dedup) must keep the
    FIRST occurrence per (conv_id, turn_idx) by (ts, role) order, after
    which the table is row-identical to the clean variant.
    """
    clean = generate_transcripts(spark, n_conversations, seed, **kwargs)
    dups = (
        clean.where(_h(seed + 8, "conv_id", "turn_idx", mod=dup_fraction_mod) == 0)
        .withColumn(
            "ts",
            F.col("ts")
            + F.make_interval(
                secs=(1 + _h(seed + 9, "conv_id", "turn_idx", mod=30)).cast("double")
            ),
        )
    )
    return clean.unionByName(dups)


def generate_attribute_updates(
    spark: SparkSession,
    n_conversations: int = 2000,
    seed: int = 42,
    updates_per_conv: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Right side for the as-of join: sparse per-conversation attribute
    updates ``(conv_id, ts, attr_value)`` (FIXTURES.md F5).

    Includes conversations with no updates (1 in 7 conv_ids skipped) and
    update streams that extend beyond/before the conversation window, so
    backfill-null and strict-past edge cases are exercised.
    """
    n_part = partitions or spark.sparkContext.defaultParallelism
    base = (
        spark.range(0, n_conversations, 1, n_part)
        .select(F.format_string("c%08d", F.col("id")).alias("conv_id"))
        .where(_h(seed + 10, "conv_id", mod=7) != 0)
        .select(
            "conv_id",
            F.explode(F.sequence(F.lit(0), F.lit(updates_per_conv - 1))).alias("u"),
        )
    )
    off = _h(seed + 11, "conv_id", "u", mod=35 * 24 * 3600)
    val = (_h(seed + 12, "conv_id", "u", mod=100000).cast("double") / 100.0)
    return base.select(
        "conv_id",
        (F.to_timestamp(F.lit(EPOCH)) + F.make_interval(secs=off.cast("double"))).alias(
            "ts"
        ),
        val.alias("attr_value"),
    )
