"""Post-training data prep: conversation-atomic SFT packing, DPO
preference pairs, split-leakage audit (protosc_spark/posttrain.py).

Pins: hand-computed fixtures (exact bins/offsets, exact pair choice),
packing invariants (atomicity, capacity, truncation), determinism at
two parallelism levels, and the leakage audit on a planted
duplicate-conversation corpus.
"""

import pytest
from pyspark.sql import functions as F

from protosc_spark.posttrain import (
    conversation_sizes,
    dpo_pairs,
    sft_pack,
    split_leakage,
)


def _tr(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )


TS = __import__("datetime").datetime(2025, 1, 1)


def _turn(c, i, role, text):
    return (c, i, role, text, None, TS)


# --------------------------------------------------------------- sizes
def test_conversation_sizes_exact(spark):
    tr = _tr(
        spark,
        [
            _turn("a", 0, "user", "hi there"),          # 2 tok + 2
            _turn("a", 1, "assistant", "hello you two"), # 3 tok + 2
            _turn("a", 2, "tool", "x"),                  # 1 tok + 2
            _turn("b", 0, "assistant", "one"),           # 1 tok + 2
        ],
    )
    out = {
        r["conv_id"]: r
        for r in conversation_sizes(tr).collect()
    }
    assert out["a"]["n_turns"] == 3
    assert out["a"]["n_tokens"] == (2 + 2) + (3 + 2) + (1 + 2)
    # mask = assistant text + end tag
    assert out["a"]["mask_tokens"] == 3 + 1
    assert out["b"]["n_tokens"] == 3 and out["b"]["mask_tokens"] == 2


# ---------------------------------------------------------------- pack
def _mk_sized(spark, sizes):
    """One conversation per (conv_id, n_user_tokens): a single user
    turn whose text has exactly n-2 tokens, so n_tokens == n."""
    rows = []
    for cid, n in sizes:
        rows.append(_turn(cid, 0, "user", " ".join(["t"] * (n - 2))))
    return _tr(spark, rows)


def test_sft_pack_hand_fixture(spark):
    # single bucket (bucket_width >= n_conv) -> one deterministic
    # next-fit stream in (xxhash64, conv_id) order.
    tr = _mk_sized(spark, [("a", 60), ("b", 50), ("c", 40), ("d", 30)])
    out = sft_pack(tr, max_len=100, bucket_width=64)
    rows = {r["conv_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert all(r["pack_bucket"] == 0 for r in rows.values())
    # replay next-fit in the engine's order
    order = sorted(
        rows, key=lambda c: (rows[c]["n_tokens"] * 0,)  # placeholder
    )
    got = sorted(
        rows.values(), key=lambda r: (r["bin_id"], r["bin_offset"])
    )
    fill, bin_id = 0, 0
    for r in got:
        if fill > 0 and fill + r["packed_tokens"] > 100:
            bin_id, fill = bin_id + 1, 0
        assert r["bin_id"] == bin_id and r["bin_offset"] == fill
        fill += r["packed_tokens"]
    # capacity + totals
    assert sum(r["packed_tokens"] for r in rows.values()) == 180
    assert not any(r["truncated"] for r in rows.values())


def test_sft_pack_invariants_and_truncation(spark):
    from protosc_spark.datagen import generate_transcripts

    tr = generate_transcripts(spark, n_conversations=90, seed=11)
    out = sft_pack(tr, max_len=256, bucket_width=16).collect()
    assert len(out) == 90  # every conversation exactly once
    assert len({r["conv_id"] for r in out}) == 90
    by_bin = {}
    for r in out:
        assert r["packed_tokens"] == min(r["n_tokens"], 256)
        assert r["truncated"] == (r["n_tokens"] > 256)
        assert 0 <= r["bin_offset"] <= 256 - r["packed_tokens"]
        assert r["mask_tokens"] <= r["n_tokens"]
        key = (r["pack_bucket"], r["bin_id"])
        by_bin.setdefault(key, []).append(r)
    # within every bin: contiguous non-overlapping spans from 0
    for spans in by_bin.values():
        spans.sort(key=lambda r: r["bin_offset"])
        pos = 0
        for r in spans:
            assert r["bin_offset"] == pos
            pos += r["packed_tokens"]
        assert pos <= 256


def test_sft_pack_parallelism_invariant(spark):
    from protosc_spark.datagen import generate_transcripts

    tr = generate_transcripts(spark, n_conversations=70, seed=5)
    a = sft_pack(tr.repartition(1), max_len=200, bucket_width=8)
    b = sft_pack(tr.repartition(13, "turn_idx"), max_len=200,
                 bucket_width=8)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_sft_pack_oversize_owns_a_bin(spark):
    tr = _mk_sized(spark, [("big", 500), ("s1", 10), ("s2", 10)])
    rows = {r["conv_id"]: r for r in
            sft_pack(tr, max_len=100, bucket_width=64).collect()}
    big = rows["big"]
    assert big["truncated"] and big["packed_tokens"] == 100
    assert big["bin_offset"] == 0
    # nothing shares big's bin
    assert all(
        r["bin_id"] != big["bin_id"] or r["conv_id"] == "big"
        for r in rows.values()
    )


# ---------------------------------------------------------------- dpo
def test_dpo_pairs_hand_fixture(spark):
    tr = _tr(
        spark,
        [
            # prompt P1: three candidates, scores 3 / 2 / 1
            _turn("c1", 0, "user", "P one"),
            _turn("c1", 1, "assistant", "a b c"),
            _turn("c2", 0, "user", "P one"),
            _turn("c2", 1, "assistant", "a b"),
            _turn("c3", 0, "user", "P one"),
            _turn("c3", 1, "assistant", "a"),
            # prompt P2: singleton -> dropped
            _turn("c4", 0, "user", "P two"),
            _turn("c4", 1, "assistant", "x y z"),
            # prompt P3: exact tie (same score, different text) -> dropped
            _turn("c5", 0, "user", "P three"),
            _turn("c5", 1, "assistant", "m n"),
            _turn("c6", 0, "user", "P three"),
            _turn("c6", 1, "assistant", "o p"),
            # no assistant turn -> excluded from candidates
            _turn("c7", 0, "user", "P one"),
        ],
    )
    out = dpo_pairs(tr).collect()
    assert len(out) == 1
    r = out[0]
    assert r["chosen_conv_id"] == "c1" and r["rejected_conv_id"] == "c3"
    assert r["chosen_score"] == 3 and r["rejected_score"] == 1
    assert r["margin"] == 2 and r["n_candidates"] == 3


def test_dpo_pairs_multiturn_order_and_dirty_dups(spark):
    # assistant response concatenates in turn order; a duplicated
    # turn_idx (dirty ingest) resolves deterministically by (ts, text)
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    t1 = dt.datetime(2025, 1, 1, 0, 1)
    rows = [
        ("c1", 0, "user", "Q", None, t0),
        ("c1", 1, "assistant", "first part", None, t0),
        ("c1", 3, "assistant", "second", None, t1),
        ("c2", 0, "user", "Q", None, t0),
        ("c2", 1, "assistant", "short", None, t0),
    ]
    tr = _tr(spark, rows)
    out = dpo_pairs(tr).collect()
    assert len(out) == 1
    assert out[0]["chosen_conv_id"] == "c1"  # 3 tokens vs 1
    assert out[0]["chosen_score"] == 3


def test_dpo_pairs_parallelism_invariant(spark):
    from protosc_spark.datagen import generate_transcripts

    base = generate_transcripts(spark, n_conversations=80, seed=9)
    # plant shared prompts: rewrite turn 0 as a user turn drawn from
    # 12 prompt templates keyed by conv number
    num = F.substring("conv_id", 2, 8).cast("int")
    tr = base.withColumn(
        "role", F.when(F.col("turn_idx") == 0, "user").otherwise(F.col("role"))
    ).withColumn(
        "text",
        F.when(
            F.col("turn_idx") == 0,
            F.format_string("shared prompt %d", F.pmod(num, F.lit(12))),
        ).otherwise(F.col("text")),
    )
    a = sorted(map(tuple, dpo_pairs(tr.repartition(1)).collect()))
    b = sorted(map(tuple, dpo_pairs(tr.repartition(17, "text")).collect()))
    assert a == b and len(a) > 0


# ------------------------------------------------------------- leakage
def test_split_leakage_planted_duplicates(spark):
    from protosc_spark.datagen import generate_transcripts

    clean = generate_transcripts(spark, n_conversations=60, seed=3)
    # re-ingest 60 conversations under new ids: every duplicated text
    # whose twin hashes to a DIFFERENT split is a leak
    dup = clean.withColumn("conv_id", F.concat(F.lit("d"), "conv_id"))
    both = clean.unionByName(dup)
    out = {r["split"]: r for r in split_leakage(
        both, weights={"train": 0.5, "test": 0.5}).collect()}
    assert set(out) == {"train", "test"}
    total_convs = sum(r["n_convs"] for r in out.values())
    assert total_convs == 120
    # duplicates exist across splits unless the md5 rule put every
    # (orig, dup) pair on the same side — astronomically unlikely
    assert out["train"]["leaked_texts"] > 0
    assert out["test"]["leaked_texts"] > 0
    # leaked counts are symmetric per text pair here (texts unique per
    # (conv, turn) in the clean table): each leaked hash appears in
    # both splits exactly once
    assert out["train"]["leaked_texts"] == out["test"]["leaked_texts"]


def test_split_leakage_clean_is_leak_free(spark):
    from protosc_spark.datagen import generate_transcripts

    clean = generate_transcripts(spark, n_conversations=60, seed=3)
    out = split_leakage(clean, weights={"train": 0.8, "test": 0.2})
    rows = out.collect()
    assert sum(r["leaked_texts"] for r in rows) == 0
    assert sum(r["n_turns"] for r in rows) == clean.count()
    # conversation integrity: split is a function of conv_id
    s = __import__("protosc_spark.sampling", fromlist=["hash_split"])
    split_df = s.hash_split(clean, ["conv_id"],
                            weights={"train": 0.8, "test": 0.2})
    spans = (
        split_df.groupBy("conv_id")
        .agg(F.count_distinct("split").alias("k"))
        .where("k > 1")
        .count()
    )
    assert spans == 0


def test_sft_pack_explicit_bucket_count_single_pass(spark):
    # production path: caller supplies n_buckets so no extra count
    # aggregation is needed; invariants identical
    from protosc_spark.datagen import generate_transcripts

    tr = generate_transcripts(spark, n_conversations=50, seed=2)
    out = sft_pack(tr, max_len=300, n_buckets=5).collect()
    assert len(out) == 50
    assert len({r["conv_id"] for r in out}) == 50
    assert {r["pack_bucket"] for r in out} <= set(range(5))
    by_bin = {}
    for r in out:
        by_bin.setdefault((r["pack_bucket"], r["bin_id"]), []).append(r)
    for spans in by_bin.values():
        spans.sort(key=lambda r: r["bin_offset"])
        pos = 0
        for r in spans:
            assert r["bin_offset"] == pos
            pos += r["packed_tokens"]
        assert pos <= 300


# ------------------------------------------------------ property tests
from hypothesis import HealthCheck, given, settings, strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


@given(
    sizes=st.lists(
        st.integers(min_value=3, max_value=40), min_size=1, max_size=25
    ),
    max_len=st.integers(min_value=8, max_value=64),
)
@settings(**_SETTINGS)
def test_sft_pack_nextfit_properties(spark, sizes, max_len):
    """Order-free next-fit certificate: conservation, atomicity,
    contiguous fill, and every bin break JUSTIFIED (the conversation
    that opened bin b+1 must not have fit in bin b — otherwise the
    packing wasn't next-fit)."""
    tr = _mk_sized(
        spark, [(f"c{i:03d}", n) for i, n in enumerate(sizes)]
    )
    out = sft_pack(tr, max_len=max_len, n_buckets=2).collect()
    assert len(out) == len(sizes)  # every conversation exactly once
    by_bucket = {}
    for r in out:
        assert r["packed_tokens"] == min(r["n_tokens"], max_len)
        assert r["truncated"] == (r["n_tokens"] > max_len)
        by_bucket.setdefault(r["pack_bucket"], []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: (r["bin_id"], r["bin_offset"]))
        fill, bin_id = 0, 0
        for r in rows:
            if r["bin_id"] != bin_id:
                # break must be justified: r did not fit in bin_id
                assert r["bin_id"] == bin_id + 1
                assert fill > 0 and fill + r["packed_tokens"] > max_len
                bin_id, fill = r["bin_id"], 0
            assert r["bin_offset"] == fill
            fill += r["packed_tokens"]
            assert fill <= max_len


@given(
    assign=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # prompt group
            st.integers(min_value=1, max_value=6),  # response tokens
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(**_SETTINGS)
def test_dpo_pairs_matches_python_replay(spark, assign):
    import hashlib

    rows = []
    convs = {}
    for i, (g, ntok) in enumerate(assign):
        cid = f"c{i:03d}"
        resp = " ".join(f"w{i}t{j}" for j in range(ntok))
        rows.append(_turn(cid, 0, "user", f"prompt {g}"))
        rows.append(_turn(cid, 1, "assistant", resp))
        convs[cid] = (g, resp, ntok)
    out = {
        r["prompt_key"]: r for r in dpo_pairs(_tr(spark, rows)).collect()
    }
    # python replay: per group, max/min of (score, md5(resp), conv_id)
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    groups = {}
    for cid, (g, resp, ntok) in convs.items():
        groups.setdefault(g, []).append((ntok, md5(resp), cid))
    expect = {}
    for g, cands in groups.items():
        if len(cands) < 2:
            continue
        c, r = max(cands), min(cands)
        if c[0] > r[0] and c[1] != r[1]:
            expect[md5(f"prompt {g}")] = (c[2], r[2], c[0], r[0])
    assert set(out) == set(expect)
    for k, (cc, rc, cs, rs) in expect.items():
        r = out[k]
        assert (r["chosen_conv_id"], r["rejected_conv_id"]) == (cc, rc)
        assert (r["chosen_score"], r["rejected_score"]) == (cs, rs)


def test_split_leakage_null_texts_not_counted(spark):
    rows = [
        ("a", 0, "user", None, None, TS),
        ("b", 0, "user", None, None, TS),
        ("a", 1, "user", "same text", None, TS),
        ("b", 1, "user", "same text", None, TS),
    ]
    out = split_leakage(
        _tr(spark, rows), weights={"x": 0.5, "y": 0.5}, salt="s9"
    ).collect()
    # the only possible leak is "same text"; NULLs never count
    assert sum(r["leaked_texts"] for r in out) <= 2
    assert all(r["n_distinct_texts"] <= 1 for r in out)


def test_pack_audit_hand_fixture(spark):
    from protosc_spark.posttrain import pack_audit

    tr = _mk_sized(spark, [("a", 60), ("b", 50), ("c", 40), ("d", 30)])
    packed = sft_pack(tr, max_len=100, bucket_width=64)
    out = pack_audit(packed, max_len=100).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_convs"] == 4 and r["packed_tokens"] == 180
    assert r["capacity"] == r["n_bins"] * 100
    assert r["waste"] == r["capacity"] - 180
    assert r["fill_rate"] == round(180 / r["capacity"], 6)
    assert r["n_truncated"] == 0 and r["tokens_truncated"] == 0


def test_pack_audit_truncation_accounting(spark):
    from protosc_spark.posttrain import pack_audit

    tr = _mk_sized(spark, [("big", 500), ("s1", 10)])
    packed = sft_pack(tr, max_len=100, bucket_width=64)
    r = pack_audit(packed, max_len=100).collect()[0]
    assert r["n_truncated"] == 1
    assert r["tokens_truncated"] == 400
    assert r["packed_tokens"] == 110
