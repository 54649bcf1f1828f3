"""Post-training data preparation over transcript tables.

The three operators an SFT / preference-tuning data pipeline runs
between "clean transcripts" and "training shards" — all pure
DataFrame plans (zero Python in the hot path):

* :func:`conversation_sizes` — per-conversation render/loss token
  accounting under a fixed chat template (role tag + text + end tag
  per turn; assistant text + end tag is the trainable span).
* :func:`sft_pack` — conversation-ATOMIC sequence packing into
  ``max_len``-token bins (a conversation never spans two bins, unlike
  the GPT-style document packing in
  :func:`protosc_spark.textops.pack_sequences` where crossing bins is
  the point).  Packing is embarrassingly parallel per hash bucket: the
  next-fit fold runs as ONE Catalyst ``aggregate`` over each bucket's
  (bounded) conversation array, so there is no global sequential
  state, no driver loop, and the result is identical at any
  parallelism.
* :func:`dpo_pairs` — (chosen, rejected) preference pairs per shared
  prompt, built from min/max STRUCT aggregates only (no per-prompt
  ``collect_list``), so a viral prompt with 10^6 candidate responses
  is partially aggregated map-side and can never make one reducer a
  straggler.
* :func:`split_leakage` — conversation-integrity hash split plus the
  audit that matters at 100 TB: exact count of response texts shared
  across splits (the cross-split contamination that silently inflates
  eval scores when the same conversation is ingested twice under two
  ids).

The reference (UtrechtUniversity/protosc) has no training-data
pipeline surface; these follow the engine's transcript conventions
(`datagen.py` schema, md5-bucket split rule in `sampling.py`,
whitespace tokens as in `textops._tokens`).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_split

# chat-template accounting: every turn renders as
#   <|role|> text... <|end|>
# i.e. text tokens + 2 tag tokens; the trainable (loss-masked-IN) span
# of an assistant turn is its text + the end tag = text tokens + 1.
TURN_TAG_TOKENS = 2
MASK_TAG_TOKENS = 1


def _n_text_tokens(col: str = "text") -> Column:
    # whitespace tokens, same rule as textops._tokens (split on ' ')
    return F.size(F.split(F.col(col), " ")).cast("bigint")


def conversation_sizes(
    tr: DataFrame, assistant_role: str = "assistant"
) -> DataFrame:
    """Per-conversation token accounting under the chat template.

    Output: (conv_id, n_turns, n_tokens, mask_tokens) where
    ``n_tokens`` is the full rendered length (text + 2 tag tokens per
    turn) and ``mask_tokens`` the trainable span (assistant text + end
    tag).  One hash aggregation — partial map-side combine makes the
    skewed 60x conversations in the generator a non-event.
    """
    return tr.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(_n_text_tokens() + F.lit(TURN_TAG_TOKENS))
        .cast("bigint")
        .alias("n_tokens"),
        F.sum(
            F.when(
                F.col("role") == assistant_role,
                _n_text_tokens() + F.lit(MASK_TAG_TOKENS),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("mask_tokens"),
    )


def sft_pack(
    tr: DataFrame,
    max_len: int = 1024,
    bucket_width: int = 64,
    assistant_role: str = "assistant",
    n_buckets: int | None = None,
) -> DataFrame:
    """Pack whole conversations into ``max_len``-token training bins.

    Semantics: conversations are ATOMIC — each lands in exactly one
    bin at one offset; a conversation longer than ``max_len`` is
    truncated to ``max_len`` (``truncated`` flag) and fills a bin of
    its own.  Within a bucket, conversations are taken in the
    deterministic (xxhash64(conv_id), conv_id) order and packed
    next-fit: a conversation that does not fit in the current bin
    opens the next one.

    Scale shape: a GLOBAL next-fit is inherently sequential, so the
    stream is first salted into ``ceil(n_conv / bucket_width)`` hash
    buckets (bucket membership and within-bucket order are pure
    functions of conv_id — identical at any parallelism, any
    partitioning) and each bucket packs INDEPENDENTLY via one Catalyst
    ``aggregate`` fold over its collected (bounded, ~bucket_width-row)
    conversation array.  Bins are bucket-local by design —
    (pack_bucket, bin_id) is the shard key — which is exactly how a
    1000-executor packing job wants to run: no cross-partition state,
    no driver loop, per-bucket waste bounded by one conversation per
    bin seam.

    Output: (conv_id, pack_bucket, bin_id, bin_offset, n_turns,
    n_tokens, mask_tokens, packed_tokens, truncated).
    """
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    sizes = conversation_sizes(tr, assistant_role)
    # bucket count: pass it explicitly at production scale (the
    # packing job knows ~n_conv, and any value of the same order
    # works — it only sets the fold width), keeping this a single
    # pass; when omitted it is derived with one extra count
    # aggregation over the conversation rollup.
    if n_buckets is not None:
        sized = sizes.withColumn(
            "__nb", F.lit(max(int(n_buckets), 1)).cast("long")
        )
    else:
        n_row = sizes.agg(F.count(F.lit(1)).alias("__n_conv"))
        sized = sizes.crossJoin(F.broadcast(n_row)).withColumn(
            "__nb",
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("__n_conv") / F.lit(bucket_width)),
            ),
        )
    sized = (
        sized.withColumn("__key", F.xxhash64("conv_id"))
        .withColumn(
            "pack_bucket", F.pmod(F.col("__key"), F.col("__nb")).cast("int")
        )
        .withColumn(
            "packed_tokens",
            F.least(F.col("n_tokens"), F.lit(max_len).cast("long")),
        )
        .withColumn("truncated", F.col("n_tokens") > F.lit(max_len))
    )

    elem_t = (
        "array<struct<conv_id:string,bin_id:int,bin_offset:bigint,"
        "n_turns:bigint,n_tokens:bigint,mask_tokens:bigint,"
        "packed_tokens:bigint,truncated:boolean>>"
    )

    def _step(st: Column, x: Column) -> Column:
        pt = x["packed_tokens"]
        opens_new = (st["fill"] > 0) & (st["fill"] + pt > F.lit(max_len))
        new_bin = F.when(opens_new, st["bin"] + 1).otherwise(st["bin"])
        off = F.when(opens_new, F.lit(0).cast("long")).otherwise(st["fill"])
        elem = F.struct(
            x["conv_id"].alias("conv_id"),
            new_bin.cast("int").alias("bin_id"),
            off.alias("bin_offset"),
            x["n_turns"].alias("n_turns"),
            x["n_tokens"].alias("n_tokens"),
            x["mask_tokens"].alias("mask_tokens"),
            pt.alias("packed_tokens"),
            x["truncated"].alias("truncated"),
        )
        return F.struct(
            new_bin.cast("int").alias("bin"),
            (off + pt).alias("fill"),
            F.concat(st["out"], F.array(elem)).alias("out"),
        )

    packed = (
        sized.groupBy("pack_bucket")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "__key",
                        "conv_id",
                        "n_turns",
                        "n_tokens",
                        "mask_tokens",
                        "packed_tokens",
                        "truncated",
                    )
                )
            ).alias("convs")
        )
        .select(
            "pack_bucket",
            F.explode(
                F.aggregate(
                    F.col("convs"),
                    F.struct(
                        F.lit(0).cast("int").alias("bin"),
                        F.lit(0).cast("long").alias("fill"),
                        F.array().cast(elem_t).alias("out"),
                    ),
                    _step,
                    lambda st: st["out"],
                )
            ).alias("p"),
        )
    )
    return packed.select(
        "p.conv_id",
        "pack_bucket",
        "p.bin_id",
        "p.bin_offset",
        "p.n_turns",
        "p.n_tokens",
        "p.mask_tokens",
        "p.packed_tokens",
        "p.truncated",
    )


def dpo_pairs(
    tr: DataFrame,
    user_role: str = "user",
    assistant_role: str = "assistant",
) -> DataFrame:
    """(chosen, rejected) preference pairs per shared prompt.

    Conversation rollup (one shuffle on conv_id): prompt = text of the
    earliest user turn (min over (turn_idx, ts, text) — deterministic
    under duplicate turn_idx from dirty ingests); response = assistant
    texts concatenated in (turn_idx, ts, text) order; score = response
    whitespace-token count (the deterministic quality stand-in — swap
    in any per-conversation score column upstream and the pair algebra
    is unchanged).

    Pair build (one shuffle on md5(prompt)): chosen/rejected are the
    max/min of a (score, md5(response), conv_id) STRUCT — pure min/max
    aggregates with map-side partial combine, NEVER a per-prompt
    collect_list, so a prompt with a million candidate responses costs
    two structs per map partition, not one reducer-side array.  Groups
    emit a pair only when the chosen response is STRICTLY better
    (margin > 0) and textually different; singleton prompts and exact
    ties drop.

    Output: (prompt_key, n_candidates, chosen_conv_id,
    rejected_conv_id, chosen_score, rejected_score, margin).
    """
    is_user = F.col("role") == user_role
    is_asst = F.col("role") == assistant_role
    conv = (
        tr.groupBy("conv_id")
        .agg(
            F.min(
                F.when(is_user, F.struct("turn_idx", "ts", "text"))
            ).alias("__p"),
            F.array_sort(
                F.collect_list(
                    F.when(is_asst, F.struct("turn_idx", "ts", "text"))
                )
            ).alias("__a"),
        )
        .where(F.col("__p").isNotNull() & (F.size("__a") > 0))
        .select(
            "conv_id",
            F.col("__p.text").alias("prompt"),
            F.array_join(
                F.transform(F.col("__a"), lambda t: t["text"]), " "
            ).alias("response"),
        )
        .withColumn("score", _n_text_tokens("response"))
    )
    cand = F.struct(
        F.col("score"),
        F.md5("response").alias("rmd5"),
        F.col("conv_id"),
    )
    pairs = (
        conv.groupBy(F.md5("prompt").alias("prompt_key"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.max(cand).alias("__c"),
            F.min(cand).alias("__r"),
        )
        .where(
            (F.col("n_candidates") >= 2)
            & (F.col("__c.score") > F.col("__r.score"))
            & (F.col("__c.rmd5") != F.col("__r.rmd5"))
        )
    )
    return pairs.select(
        "prompt_key",
        "n_candidates",
        F.col("__c.conv_id").alias("chosen_conv_id"),
        F.col("__r.conv_id").alias("rejected_conv_id"),
        F.col("__c.score").alias("chosen_score"),
        F.col("__r.score").alias("rejected_score"),
        (F.col("__c.score") - F.col("__r.score")).alias("margin"),
    )


def split_leakage(
    tr: DataFrame,
    weights: Mapping[str, float] | None = None,
    key_cols: Sequence[str] = ("conv_id",),
    text_col: str = "text",
    salt: str = "v1",
) -> DataFrame:
    """Conversation-integrity split + cross-split text-leakage audit.

    Split assignment is the engine's md5-bucket rule
    (:func:`protosc_spark.sampling.hash_split`) on ``key_cols``
    (default conv_id, so a conversation can never straddle splits —
    the transcript-specific leak-free guarantee).  The audit counts,
    per split, the EXACT number of distinct turn texts that also
    appear in some other split — the contamination left behind when
    the same conversation is ingested twice under different ids and
    the copies hash to different splits.

    Shape: one distinct on (split, md5(text)) — 16 bytes per distinct
    text per split — then a count-per-hash aggregate and one
    equi-join back; every stage is partially aggregated and
    hash-partitioned, nothing is row-order dependent.

    Output: (split, n_convs, n_turns, n_distinct_texts, leaked_texts),
    one row per configured split.
    """
    s = hash_split(tr, list(key_cols), weights=weights, salt=salt)
    stats = s.groupBy("split").agg(
        F.count_distinct("conv_id").cast("bigint").alias("n_convs"),
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
    )
    # NULL texts carry no content to leak — they are excluded from
    # the audit (md5(NULL) would otherwise make NULL a "shared text")
    d = (
        s.where(F.col(text_col).isNotNull())
        .select("split", F.md5(text_col).alias("__h"))
        .distinct()
    )
    per_hash = d.groupBy("__h").agg(
        F.count(F.lit(1)).cast("bigint").alias("__ns")
    )
    per_split = d.join(per_hash, "__h").groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_texts"),
        F.sum((F.col("__ns") > 1).cast("bigint"))
        .cast("bigint")
        .alias("leaked_texts"),
    )
    return (
        stats.join(per_split, "split", "left")
        .select(
            "split",
            "n_convs",
            "n_turns",
            F.coalesce("n_distinct_texts", F.lit(0).cast("bigint")).alias(
                "n_distinct_texts"
            ),
            F.coalesce("leaked_texts", F.lit(0).cast("bigint")).alias(
                "leaked_texts"
            ),
        )
        .orderBy("split")
    )


def pack_audit(packed: DataFrame, max_len: int) -> DataFrame:
    """Packing-efficiency audit over :func:`sft_pack` output — the
    numbers a training job reads before shipping shards: per bucket,
    conversations, bins opened, packed token mass, capacity
    (bins x max_len), waste at bin seams, fill rate, and the
    truncation loss (token mass cut from oversize conversations).
    One aggregation over the (already conversation-sized) packing
    table; emits one row per pack bucket.
    """
    per = packed.groupBy("pack_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_convs"),
        F.count_distinct("bin_id").cast("bigint").alias("n_bins"),
        F.sum("packed_tokens").cast("bigint").alias("packed_tokens"),
        F.sum(F.col("truncated").cast("int"))
        .cast("bigint")
        .alias("n_truncated"),
        F.sum(F.col("n_tokens") - F.col("packed_tokens"))
        .cast("bigint")
        .alias("tokens_truncated"),
    )
    cap = F.col("n_bins") * F.lit(int(max_len))
    return per.select(
        "pack_bucket",
        "n_convs",
        "n_bins",
        "packed_tokens",
        cap.cast("bigint").alias("capacity"),
        (cap - F.col("packed_tokens")).cast("bigint").alias("waste"),
        F.round(
            F.col("packed_tokens").cast("double") / cap.cast("double"),
            6,
        ).alias("fill_rate"),
        "n_truncated",
        "tokens_truncated",
    ).orderBy("pack_bucket")
