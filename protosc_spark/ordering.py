"""Stable turn ordering and deduplication.

The engine's core invariant (BASELINE input_hint): *per-turn text
equality under stable turn ordering*. Ingested transcripts may contain
duplicated ``(conv_id, turn_idx)`` rows (retries, replays) and
out-of-order timestamps; every downstream operator assumes one row per
(conv_id, turn_idx) with a total order.

The reference has no notion of ordering or keys at all — label/sample
alignment is positional (reference examples/nimstim.py:74-83). We
replace positional alignment with explicit keys, which is what makes
any of this shard-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

TURN_KEY = ["conv_id", "turn_idx"]
STABLE_ORDER = ["ts", "role"]


def stable_dedup(df: DataFrame, key=None, order=None) -> DataFrame:
    """Keep exactly one row per key, chosen by a deterministic total order.

    Default: first occurrence per (conv_id, turn_idx) ordered by
    (ts, role) — the "stable turn ordering" rule. Implemented as a
    single window ``row_number`` (one shuffle on the key); no
    ``dropDuplicates`` (whose survivor is partitioning-dependent —
    non-deterministic across cluster sizes) and no
    ``monotonically_increasing_id`` anywhere.

    The default turn-key case partitions the window by conv_id ONLY
    (ordering by turn_idx first): same result, but the exchange it
    creates is the exact hash(conv_id) distribution every downstream
    window feature needs, so the whole pipeline pays ONE shuffle for
    dedup + lag + rolling + sessionization.
    """
    key = key or TURN_KEY
    order = order or STABLE_ORDER
    if key == TURN_KEY:
        w = W.partitionBy("conv_id").orderBy(
            F.col("turn_idx").asc(),
            *[F.col(c).asc_nulls_last() for c in order],
        )
        prev_turn = F.lag("turn_idx").over(w)
        return (
            df.withColumn(
                "__keep",
                prev_turn.isNull() | (prev_turn != F.col("turn_idx")),
            )
            .where(F.col("__keep"))
            .drop("__keep")
        )
    w = W.partitionBy(*key).orderBy(*[F.col(c).asc_nulls_last() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def with_salt(df: DataFrame, n_salt: int = 32, col: str = "conv_id") -> DataFrame:
    """Attach a deterministic salt bucket for skew-spreading.

    ``pmod(xxhash64(col), n_salt)`` — stable across runs/partitionings,
    unlike ``spark_partition_id``. Used by operators that can process a
    conversation in independent pieces and re-merge.
    """
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(col)), F.lit(n_salt)).cast("int")
    )


def range_partition_conversations(
    df: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """Range-partition by (conv_id, turn_idx) so each conversation is
    contiguous and partition-local sorts are cheap (sort-merge windows
    without an extra exchange). At 10^12-turn scale this is the layout
    an Iceberg table would give via ``bucket(conv_id)`` + sorted files.
    """
    if num_partitions:
        return df.repartitionByRange(num_partitions, "conv_id", "turn_idx")
    return df.repartitionByRange("conv_id", "turn_idx")


def conversation_texts(
    df: DataFrame,
    entity: str = "conv_id",
    order: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Assemble ONE row per conversation: the full transcript as a
    single role-prefixed text in stable turn order — the projection
    that lets every document-level corpus operator (exact dedup,
    MinHash/LSH near-dup, quality scoring, BM25) run at CONVERSATION
    granularity, which is the dedup unit that matters for agent-
    transcript training data (retried/replayed conversations, shared
    boilerplate sessions).

    Determinism: the per-group ordering comes from sort_array over
    (order, role, text) structs, not from any upstream sort — the
    output is partitioning- and input-order-independent, so it is
    freezable and safe downstream of any shuffle.

    Scale shape: one map-side-combined groupBy on the conversation
    key; a conversation's turns are bounded (the input contract the
    as-of/window kernels already rely on), so the assembled text is
    bounded too. All JVM built-ins — no Python.
    """
    return df.groupBy(entity).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col(order).alias("i"),
                            F.col(role_col).alias("r"),
                            F.col(text_col).alias("t"),
                        )
                    )
                ),
                lambda s: F.concat(s["r"], F.lit(": "), s["t"]),
            ),
            "\n",
        ).alias("text"),
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
    )
