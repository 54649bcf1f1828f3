"""Dedup family: exact dedup vs duckdb; MinHash estimate vs exact
Jaccard; SimHash candidate completeness; pandas oracles for the
approximate paths."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from protosc_spark.dedup import (
    exact_dedup,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
    simhash64,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    """Documents + exact copies of some + near-copies of others."""
    docs = spark.read.parquet(DOCS)
    exact_copies = docs.where(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    near_copies = (
        docs.where(F.col("doc_id") % 10 == 1)
        .withColumn("doc_id", F.col("doc_id") + 20000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zzz")))
    )
    return docs.unionByName(exact_copies).unionByName(near_copies).cache()


def test_exact_dedup_groups(docs_with_dups):
    groups = exact_dedup_groups(docs_with_dups).toPandas()
    dup_groups = groups[groups["n_docs"] > 1]
    assert len(dup_groups) == 50  # 500/10 exact copies
    assert (dup_groups["n_docs"] == 2).all()
    # survivor is always the lower (original) id
    assert (dup_groups["survivor_id"] < 10000).all()


def test_exact_dedup_rows(docs_with_dups):
    kept = exact_dedup(docs_with_dups)
    assert kept.count() == 500 + 50  # originals + near-copies survive
    assert kept.where(F.col("doc_id").between(10000, 19999)).count() == 0


def test_ngram_jaccard_finds_near_dups(docs_with_dups):
    pairs = ngram_jaccard_pairs(docs_with_dups, tau=0.8).toPandas()
    near = pairs[(pairs["doc_b"] >= 20000)]
    # every near-copy pairs with its original at high jaccard
    assert len(near[near["doc_a"] == near["doc_b"] - 20000]) == 50
    exact = pairs[(pairs["doc_b"] >= 10000) & (pairs["doc_b"] < 20000)]
    assert (exact["jaccard"] == 1.0).sum() == 50


def test_ngram_jaccard_vs_pandas_oracle(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "a b c d e",
                "a b c d e f",
                "x y z w q",
                "a b c q w",
                "x y z w q extra",
                "totally different words here now",
            ],
        }
    )
    got = (
        ngram_jaccard_pairs(spark.createDataFrame(pdf), tau=0.0, w=3)
        .orderBy("doc_a", "doc_b")
        .toPandas()
    )

    def sh(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = []
    for i in range(6):
        for j in range(i + 1, 6):
            a, b = sh(pdf["text"][i]), sh(pdf["text"][j])
            inter = len(a & b)
            if inter:
                want.append((i, j, round(inter / len(a | b), 6)))
    want = pd.DataFrame(want, columns=["doc_a", "doc_b", "jaccard"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ngram_jaccard_df_cap_bounds_hot_shingle(spark):
    """One viral shingle shared by every doc: uncapped, the self-join
    is quadratic (every pair is a candidate); with max_df, the hot
    shingle is dropped from every set and candidates collapse to the
    genuinely-similar pairs. Jaccard is exact on the capped sets."""
    n = 40
    rows = [(i, f"common viral shingle unique{i} tok{i} end{i}") for i in range(n)]
    rows += [(1000, "common viral shingle unique1 tok1 end1")]  # dup of doc 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = ngram_jaccard_pairs(df, tau=0.0, w=3).toPandas()
    assert len(uncapped) == n * (n + 1) // 2  # all pairs share the hot shingle

    capped = ngram_jaccard_pairs(df, tau=0.0, w=3, max_df=5).toPandas()
    # only the true duplicate pair survives: every capped set keeps the
    # doc-unique shingles plus none of the viral ones
    assert len(capped) == 1
    assert (capped.iloc[0]["doc_a"], capped.iloc[0]["doc_b"]) == (1, 1000)
    assert capped.iloc[0]["jaccard"] == 1.0  # capped sets are identical


def test_ngram_jaccard_cap_inactive_matches_uncapped(docs_with_dups):
    """A cap above every shingle's document frequency must be a no-op
    (this is why the sf0.1 driver query stays oracle-exact)."""
    base = (
        ngram_jaccard_pairs(docs_with_dups, tau=0.8)
        .orderBy("doc_a", "doc_b").toPandas()
    )
    capped = (
        ngram_jaccard_pairs(docs_with_dups, tau=0.8, max_df=10**9)
        .orderBy("doc_a", "doc_b").toPandas()
    )
    pd.testing.assert_frame_equal(base, capped, check_dtype=False)


def test_minhash_estimates_jaccard(docs_with_dups):
    pairs = minhash_lsh_pairs(docs_with_dups, tau=0.5).toPandas()
    # exact duplicates: every signature slot agrees (other same-bucket
    # pairs may legitimately appear — the corpus shares a tiny vocab)
    exact = pairs[
        (pairs["doc_b"] >= 10000)
        & (pairs["doc_b"] < 20000)
        & (pairs["doc_a"] == pairs["doc_b"] - 10000)
    ]
    assert len(exact) == 50
    assert (exact["est_jaccard"] == 1.0).all()
    # near-copies: high estimate for original<->copy pairs that surfaced
    near = pairs[
        (pairs["doc_b"] >= 20000) & (pairs["doc_a"] == pairs["doc_b"] - 20000)
    ]
    assert len(near) >= 40  # LSH at tau .5, b=16/r=4: recall ~1 for j>.8
    assert (near["est_jaccard"] >= 0.5).all()


def test_simhash_exact_dup_distance_zero(docs_with_dups):
    sh = simhash64(docs_with_dups).toPandas().set_index("doc_id")["simhash"]
    for base_id in range(0, 500, 10):
        assert sh[base_id] == sh[base_id + 10000]


def test_simhash_neardup_pairs(docs_with_dups):
    pairs = simhash_neardup_pairs(docs_with_dups, max_hamming=3).toPandas()
    dup_pairs = pairs[
        (pairs["doc_b"] >= 10000)
        & (pairs["doc_b"] < 20000)
        & (pairs["doc_a"] == pairs["doc_b"] - 10000)
    ]
    assert len(dup_pairs) == 50
    assert (dup_pairs["hamming"] == 0).all()
    assert (pairs["hamming"] <= 3).all()


@pytest.mark.parametrize("max_hamming", [3, 7])
def test_simhash_recall_is_total_within_guarantee(docs_with_dups, max_hamming):
    """The band guarantee must cover the query threshold: every pair at
    Hamming <= max_hamming (exact, brute force on collected signatures)
    must be emitted — recall 1.0, the round-1 contract violation."""
    sh = simhash64(docs_with_dups).toPandas().sort_values("doc_id")
    ids = sh["doc_id"].to_numpy()
    sig = sh["simhash"].to_numpy().astype(np.uint64)
    x = sig[:, None] ^ sig[None, :]
    ham = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    iu, ju = np.where(np.triu(ham <= max_hamming, 1))
    want = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(iu, ju)
    }
    got_pdf = simhash_neardup_pairs(
        docs_with_dups, max_hamming=max_hamming
    ).toPandas()
    got = set(zip(got_pdf["doc_a"].astype(int), got_pdf["doc_b"].astype(int)))
    assert got == want  # recall AND precision both exact


def test_simhash_rejects_impossible_band_contract():
    with pytest.raises(ValueError):
        simhash_neardup_pairs(None, max_hamming=8, bands=4)


def test_exact_groups_vs_duckdb(docs_with_dups):
    got = (
        exact_dedup_groups(docs_with_dups)
        .orderBy("text_md5")
        .toPandas()
        .reset_index(drop=True)
    )
    pdf = docs_with_dups.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(
        """
        SELECT md5(text) AS text_md5, count(*)::BIGINT AS n_docs,
               min(doc_id) AS survivor_id
        FROM documents GROUP BY 1 ORDER BY 1
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# connected components / survivors / line dedup
# ---------------------------------------------------------------------------

def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["doc_a", "doc_b"]).astype("int64")
    )


def _uf_oracle(pairs):
    """Plain-python union-find: comp = min id per component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted((x, find(x)) for x in list(parent))


def test_cc_chain_converges_logarithmically(spark):
    from protosc_spark.dedup import connected_components

    chain = [(i, i + 1) for i in range(63)]  # 64-node path, diameter 63
    cc = connected_components(_pairs_df(spark, chain))
    rows = sorted(map(tuple, cc.collect()))
    assert rows == [(i, 0) for i in range(64)]
    # pointer jumping: O(log diameter) rounds, not O(diameter)
    assert cc._cc_iterations <= 8


def test_cc_matches_union_find_on_random_graph(spark):
    from protosc_spark.dedup import connected_components

    rng = np.random.default_rng(7)
    pairs = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in rng.integers(0, 200, size=(150, 2))
        if a != b
    }
    pairs = sorted(pairs)
    cc = connected_components(_pairs_df(spark, pairs))
    assert sorted(map(tuple, cc.collect())) == _uf_oracle(pairs)


def test_cc_clique_and_empty(spark):
    from protosc_spark.dedup import connected_components

    clique = [(a, b) for a in range(10) for b in range(a + 1, 10)]
    cc = connected_components(_pairs_df(spark, clique))
    assert sorted(map(tuple, cc.collect())) == [(i, 0) for i in range(10)]
    assert cc._cc_iterations <= 3

    empty = _pairs_df(spark, [(1, 2)]).where(F.col("doc_a") < 0)
    assert connected_components(empty).count() == 0


def test_cc_nonconvergence_raises(spark):
    from protosc_spark.dedup import connected_components

    chain = [(i, i + 1) for i in range(63)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs_df(spark, chain), max_iter=2)


def test_dedup_survivors_end_to_end(spark, docs_with_dups):
    """pairs -> components -> one survivor per cluster; untouched rows
    kept. The near-copy clusters are (orig, orig+20000): survivor is
    always the original."""
    from protosc_spark.dedup import dedup_survivors

    pairs = ngram_jaccard_pairs(docs_with_dups, tau=0.8)
    kept = dedup_survivors(docs_with_dups, pairs)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # exact oracle: union-find over the same pairs
    pair_rows = [
        (r["doc_a"], r["doc_b"]) for r in pairs.select("doc_a", "doc_b").collect()
    ]
    losers = {i for i, c in _uf_oracle(pair_rows) if i != c}
    all_ids = {r["doc_id"] for r in docs_with_dups.select("doc_id").collect()}
    assert ids == all_ids - losers
    # every clone (exact at +10000, near at +20000) is removed: its
    # original has the smaller id in the same component
    assert not {i for i in ids if i >= 10000}


def test_line_dedup_hand_fixture(spark):
    """Cross-doc dup keeps the (min doc, min line_idx) instance;
    within-doc repeats collapse; a fully-duplicated doc survives with
    empty text_clean."""
    from protosc_spark.dedup import line_dedup

    rows = [
        (0, "alpha\nboiler\nbeta"),
        (1, "boiler\ngamma\nboiler"),   # within-doc repeat too
        (2, "boiler"),                  # fully deduped away
        (3, "delta\ndelta"),            # within-doc only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["text_clean"])
        for r in line_dedup(df).collect()
    }
    assert out[0] == (3, 3, "alpha\nboiler\nbeta")
    assert out[1] == (3, 1, "gamma")
    assert out[2] == (1, 0, "")
    assert out[3] == (2, 1, "delta")


def test_line_dedup_total_instance_accounting(spark):
    """Across the corpus each distinct line contributes exactly one
    kept instance: sum(n_kept) == #distinct lines."""
    from protosc_spark.dedup import line_dedup

    docs = spark.read.parquet(DOCS)
    toks = F.split("text", " ")
    relined = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(
                    F.lit(0), F.ceil(F.size(toks) / F.lit(8)).cast("int") - 1
                ),
                lambda i: F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
            ),
            "\n",
        ).alias("text"),
    )
    out = line_dedup(relined).toPandas()
    n_distinct = (
        relined.select(F.explode(F.split("text", "\n")).alias("l"))
        .select("l").distinct().count()
    )
    assert int(out["n_kept"].sum()) == n_distinct
    assert (out["n_kept"] <= out["n_lines"]).all()


def test_cross_split_contamination_planted(spark):
    """A test doc quoting a train doc's 4-gram is flagged with the
    right shared-shingle count; clean docs are not; train-train and
    test-test overlap is never reported."""
    from protosc_spark.dedup import cross_split_contamination

    rows = [
        (0, "train", "the quick brown fox jumps over the lazy dog"),
        (1, "train", "completely unrelated content here today ok"),
        (2, "test", "he said the quick brown fox jumps again"),   # 2 shared 4-grams
        (3, "test", "nothing in common with training data"),
        (4, "test", "completely unrelated content here today ok"), # verbatim copy
        (5, "val", "the quick brown fox jumps over whatever"),     # val ignored
    ]
    df = spark.createDataFrame(rows, "doc_id long, split string, text string")
    got = {
        (r["test_doc_id"], r["train_doc_id"]): r["n_shared"]
        for r in cross_split_contamination(df, w=4).collect()
    }
    # doc2 shares 'the quick brown fox' and 'quick brown fox jumps'
    assert got[(2, 0)] == 2
    # verbatim copy: all 3 distinct 4-grams of the 7-token doc shared
    assert got[(4, 1)] == 3
    assert set(got) == {(2, 0), (4, 1)}
    # min_shared raises the bar
    got2 = {
        (r["test_doc_id"], r["train_doc_id"])
        for r in cross_split_contamination(df, w=4, min_shared=3).collect()
    }
    assert got2 == {(4, 1)}


def test_incremental_dedup_equals_plain_antijoin(spark):
    """The Bloom prefilter is plan optimization only: kept rows must
    equal the plain anti-join exactly, true dups always caught (no
    false negatives), and the maybe-rate stays near the true-dup rate
    (bounded FPR)."""
    from protosc_spark.dedup import _bloom_positions, incremental_dedup

    docs = spark.read.parquet(DOCS)
    existing = docs.where(F.col("doc_id") < 400).cache()
    dups = (
        docs.where((F.col("doc_id") % 8 == 0) & (F.col("doc_id") < 400))
        .withColumn("doc_id", F.col("doc_id") + 10000)
    )
    incoming = docs.where(F.col("doc_id") >= 400).unionByName(dups).cache()

    kept = incremental_dedup(existing, incoming)
    got = {r["doc_id"] for r in kept.select("doc_id").collect()}
    want = {
        r["doc_id"]
        for r in incoming.join(
            existing.select("text").distinct(), "text", "left_anti"
        ).select("doc_id").collect()
    }
    assert got == want
    # every planted dup is dropped
    assert not {i for i in got if i >= 10000 and (i - 10000) % 8 == 0}

    # FPR bound: among genuinely-new incoming rows, the fraction that
    # still needed the verify join must be small (theory ~0.24% at 16
    # bits/item, 4 hashes; allow 5%)
    import numpy as np
    n = existing.count()
    m = 8
    while m < max(64, n * 16):
        m *= 2
    # recompute maybe flags via the same positions + a collected bitmap
    pos_rows = existing.select(
        F.explode(_bloom_positions("text", m, 4)).alias("p")
    ).collect()
    bloom = np.zeros(m // 8, dtype=np.uint8)
    for r in pos_rows:
        p = r["p"]
        bloom[p >> 3] |= np.uint8(1 << (p & 7))
    inc = incoming.select(
        "doc_id", _bloom_positions("text", m, 4).alias("pos")
    ).collect()
    truly_new_and_flagged = 0
    truly_new = 0
    dup_texts_missing = 0
    existing_texts = {
        r["text"] for r in existing.select("text").collect()
    }
    inc_rows = {r["doc_id"]: r for r in inc}
    texts = {r["doc_id"]: r["text"] for r in incoming.collect()}
    for did, r in inc_rows.items():
        maybe = all(bloom[p >> 3] & (1 << (p & 7)) for p in r["pos"])
        if texts[did] in existing_texts:
            if not maybe:
                dup_texts_missing += 1  # would be a false negative
        else:
            truly_new += 1
            truly_new_and_flagged += int(maybe)
    assert dup_texts_missing == 0
    assert truly_new_and_flagged / truly_new < 0.05


def test_incremental_dedup_undersized_bloom_zero_false_negatives(spark):
    """Round-3 verdict #3: the bitmap is hard-capped by max_bloom_bytes.
    With a deliberately absurd cap (8 bytes = 64 bits for 400 history
    rows — the filter saturates, FPR -> ~1) the result must STILL equal
    the plain anti-join: a saturated Bloom degrades to 'verify
    everything', never to a wrong answer."""
    from protosc_spark.dedup import incremental_dedup

    docs = spark.read.parquet(DOCS)
    existing = docs.where(F.col("doc_id") < 400).cache()
    dups = (
        docs.where((F.col("doc_id") % 8 == 0) & (F.col("doc_id") < 400))
        .withColumn("doc_id", F.col("doc_id") + 10000)
    )
    incoming = docs.where(F.col("doc_id") >= 400).unionByName(dups).cache()

    kept = incremental_dedup(existing, incoming, max_bloom_bytes=8)
    got = {r["doc_id"] for r in kept.select("doc_id").collect()}
    want = {
        r["doc_id"]
        for r in incoming.join(
            existing.select("text").distinct(), "text", "left_anti"
        ).select("doc_id").collect()
    }
    assert got == want


def test_line_dedup_metacharacter_separator(spark):
    """line_sep is treated LITERALLY even when it is a regex
    metacharacter ('|'): split and reassembly must be symmetric."""
    from protosc_spark.dedup import line_dedup

    df = spark.createDataFrame(
        [(0, "keep|shared|tail"), (1, "shared|only here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["text_clean"])
        for r in line_dedup(df, line_sep="|").collect()
    }
    assert out[0] == (3, 3, "keep|shared|tail")
    assert out[1] == (2, 1, "only here")  # 'shared' kept only in doc 0


class TestDuplicatedSpans:
    """Exact duplicated-span stats (Lee et al. 2021-style substring
    dedup signal): planted cross-doc boilerplate, within-doc repeats,
    short-doc edge, and EXACT coverage vs a brute-force python union
    oracle."""

    @staticmethod
    def _docs(spark):
        boiler = " ".join(f"b{i}" for i in range(10))  # 10-token block
        rows = [
            (0, boiler + " " + " ".join(f"u0x{i}" for i in range(20))),
            (1, " ".join(f"u1x{i}" for i in range(15)) + " " + boiler),
            (2, " ".join(f"u2x{i}" for i in range(30))),  # clean
            (3, "tiny doc"),  # < l tokens
            # within-doc repetition: the same 8-token phrase twice
            (4, " ".join(f"p{i}" for i in range(8)) + " mid "
                + " ".join(f"p{i}" for i in range(8))),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_planted_boilerplate_and_edges(self, spark):
        from protosc_spark.dedup import duplicated_span_stats

        got = {
            r["doc_id"]: r
            for r in duplicated_span_stats(self._docs(spark), l=8).collect()
        }
        # doc 3: shorter than l -> no windows, frac 0
        assert got[3]["n_windows"] == 0 and got[3]["dup_frac"] == 0.0
        # doc 2: clean -> no duplicated windows
        assert got[2]["n_dup_windows"] == 0 and got[2]["dup_frac"] == 0.0
        # docs 0,1 share the 10-token boilerplate -> 3 duplicated
        # 8-token windows each, covering exactly the 10 boiler tokens
        for d in (0, 1):
            assert got[d]["n_dup_windows"] == 3
            assert got[d]["dup_tokens"] == 10
        # doc 4: phrase repeated WITHIN the doc -> both copies flagged
        assert got[4]["n_dup_windows"] == 2
        assert got[4]["dup_tokens"] == 16

    def test_coverage_matches_bruteforce_union(self, spark):
        """Random docs with injected repeats: dup_tokens equals the
        exact union-of-intervals size computed in plain python."""
        import numpy as np

        from protosc_spark.dedup import duplicated_span_stats

        rng = np.random.default_rng(3)
        L = 5
        vocab = [f"w{i}" for i in range(30)]  # small vocab -> collisions
        docs = [
            (i, " ".join(rng.choice(vocab, rng.integers(3, 60)).tolist()))
            for i in range(40)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in duplicated_span_stats(df, l=L).collect()
        }

        # brute-force oracle
        from collections import Counter

        wins = {}
        cnt = Counter()
        for i, t in docs:
            toks = t.split(" ")
            ws = [
                " ".join(toks[p : p + L])
                for p in range(len(toks) - L + 1)
            ] if len(toks) >= L else []
            wins[i] = ws
            cnt.update(ws)
        for i, t in docs:
            dup_pos = [p for p, w in enumerate(wins[i]) if cnt[w] >= 2]
            covered = set()
            for p in dup_pos:
                covered.update(range(p, p + L))
            assert got[i]["n_dup_windows"] == len(dup_pos), i
            assert got[i]["dup_tokens"] == len(covered), i

    def test_filter_keeps_clean_docs(self, spark):
        from protosc_spark.dedup import filter_duplicated_spans

        kept = {
            r["doc_id"]
            for r in filter_duplicated_spans(
                self._docs(spark), max_frac=0.3, l=8
            ).collect()
        }
        # docs 0 (10/30 dup), 1 (10/25) and 4 (16/17) exceed 0.3 and
        # drop; the clean and short docs stay
        assert kept == {2, 3}, kept


# --- conversation-level dedup ---


def test_conversation_texts_assembly_and_order_independence(spark):
    from protosc_spark.ordering import conversation_texts

    rows = [
        ("a", 1, "assistant", "hello"),
        ("a", 0, "user", "hi"),
        ("a", 2, "user", "bye"),
        ("b", 0, "user", "solo"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = conversation_texts(df).orderBy("conv_id").toPandas()
    assert got.iloc[0]["text"] == "user: hi\nassistant: hello\nuser: bye"
    assert got.iloc[0]["n_turns"] == 3
    assert got.iloc[1]["text"] == "user: solo"
    # partitioning/order independence: shuffled input, same output
    got2 = (
        conversation_texts(df.orderBy(F.desc("turn_idx")).repartition(7))
        .orderBy("conv_id")
        .toPandas()
    )
    assert got.equals(got2)


def test_conversation_dedup_planted_recovery(spark):
    """The gate composition at a smaller size: every planted re-keyed
    exact replay must vanish at the exact stage; every planted
    truncated replay that actually lost turns must pair with its
    source conversation in the near-dup output."""
    from protosc_spark.datagen import generate_transcripts
    from protosc_spark.dedup import exact_dedup, minhash_lsh_pairs
    from protosc_spark.ordering import conversation_texts

    tr = generate_transcripts(spark, n_conversations=40, seed=11)
    exact_r = tr.where(
        F.pmod(F.xxhash64("conv_id"), F.lit(5)) == 0
    ).withColumn("conv_id", F.concat("conv_id", F.lit("r")))
    nmax = tr.groupBy("conv_id").agg(F.max("turn_idx").alias("mx"))
    near_r = (
        tr.where(F.pmod(F.xxhash64("conv_id"), F.lit(7)) == 1)
        .join(F.broadcast(nmax), "conv_id")
        .where(F.col("turn_idx") <= F.ceil(F.col("mx") * 0.9))
        .drop("mx")
        .withColumn("conv_id", F.concat("conv_id", F.lit("n")))
    )
    corpus = tr.unionByName(exact_r).unionByName(near_r)
    texts = conversation_texts(corpus).withColumnRenamed("conv_id", "doc_id")
    survivors = exact_dedup(texts.select("doc_id", "text"))
    surv_ids = {r.doc_id for r in survivors.select("doc_id").collect()}

    planted_exact = {
        r.conv_id for r in exact_r.select("conv_id").distinct().collect()
    }
    assert planted_exact, "fixture must plant exact replays"
    # every re-keyed exact replay loses to its original (min doc_id)
    assert not (planted_exact & surv_ids)

    # truncated replays that genuinely lost >=2 turns must pair with
    # their source at est_jaccard >= 0.7
    pairs = minhash_lsh_pairs(survivors, tau=0.7).collect()
    pair_set = {(r.doc_a, r.doc_b) for r in pairs}
    n_by_conv = {r.conv_id: r.mx for r in nmax.collect()}
    import math

    planted_near = {
        r.conv_id
        for r in near_r.select("conv_id").distinct().collect()
    }
    for cid in planted_near:
        src = cid[:-1]
        mx = n_by_conv[src]
        kept = math.ceil(mx * 0.9) + 1
        if mx + 1 - kept >= 2 and cid in surv_ids:
            assert (src, cid) in pair_set or (cid, src) in pair_set, (
                f"{src} / {cid} (dropped {mx + 1 - kept} turns) "
                "missing from near-dup pairs"
            )


# ---------------------------------------------------------------------------
# edit_distance_pairs
# ---------------------------------------------------------------------------

def _lev(a, b):
    import numpy as np

    d = np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[0], i
        for j, cb in enumerate(b, 1):
            cur = min(d[j] + 1, d[j - 1] + 1,
                      prev + (ca != cb))
            prev, d[j] = d[j], cur
    return int(d[len(b)])


def test_edit_distance_matches_bruteforce(spark):
    from protosc_spark.dedup import edit_distance_pairs

    docs = [
        (1, "kitten"), (2, "sitting"), (3, "kitten"), (4, "mitten"),
        (5, "flaw"), (6, "lawn"), (7, "completely different text"),
        (8, "kittens"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    for md in (1, 2, 3):
        got = {
            (r.doc_a, r.doc_b): r.dist
            for r in edit_distance_pairs(df, max_dist=md).collect()
        }
        want = {
            (a_id, b_id): _lev(a, b)
            for a_id, a in docs
            for b_id, b in docs
            if a_id < b_id and _lev(a, b) <= md
        }
        assert got == want, (md, got, want)


def test_edit_distance_blocking_lossless_across_bands(spark):
    """Pairs whose lengths straddle a band boundary (len W-1 vs W+1,
    landing in adjacent buckets) must still meet — the adjacent-
    bucket explode is what makes length banding lossless."""
    from protosc_spark.dedup import edit_distance_pairs

    w = 16  # default band for max_dist=2 is max(16, 12) = 16
    a = "x" * (w - 1)
    b = "x" * (w + 1)        # dist 2, different buckets (0 vs 1)
    c = "x" * (w - 1) + "yy"  # dist 2 from a, bucket 1
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id bigint, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.dist
        for r in edit_distance_pairs(df, max_dist=2).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 2, (2, 3): 2}


def test_edit_distance_band_validation(spark):
    from protosc_spark.dedup import edit_distance_pairs

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        edit_distance_pairs(df, max_dist=5, band=4)


# ---------------------------------------------------------------------------
# triangle_stats
# ---------------------------------------------------------------------------

def test_triangles_k4_plus_pendant(spark):
    from protosc_spark.dedup import triangle_stats

    # K4 (every node in 3 triangles) + pendant 5; reversed and
    # duplicate edges must collapse
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (2, 1), (3, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r for r in triangle_stats(df).collect()}
    for n in (1, 2, 3):
        assert (got[n].degree, got[n].triangles) == (3, 3)
        assert got[n].clustering == 1.0
    assert (got[4].degree, got[4].triangles) == (4, 3)
    assert got[4].clustering == 0.5
    assert got[5].triangles == 0 and got[5].clustering is None


def test_triangles_match_bruteforce_on_random_graph(spark):
    import itertools

    import numpy as np
    from protosc_spark.dedup import triangle_stats

    rng = np.random.default_rng(13)
    nodes = list(range(40))
    edges = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.15
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r for r in triangle_stats(df).collect()}
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    for n in nodes:
        if not adj[n]:
            assert n not in got
            continue
        t = sum(
            1
            for v, w in itertools.combinations(sorted(adj[n]), 2)
            if w in adj[v]
        )
        assert got[n].degree == len(adj[n])
        assert got[n].triangles == t, n
        d = len(adj[n])
        if d >= 2:
            assert abs(
                got[n].clustering - 2.0 * t / (d * (d - 1))
            ) < 1e-12


def test_triangles_skew_orientation_caps_wedges(spark):
    from protosc_spark.dedup import triangle_stats

    # star graph: hub degree 50, NO triangles — and the oriented
    # wedge join must not generate hub-centered wedges (every edge
    # points INTO the hub, out-degree 0 there)
    edges = [(0, i) for i in range(1, 51)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r for r in triangle_stats(df).collect()}
    assert got[0].degree == 50 and got[0].triangles == 0
    assert got[0].clustering == 0.0
    assert all(got[i].triangles == 0 for i in range(1, 51))


def test_triangles_empty_edges(spark):
    from protosc_spark.dedup import triangle_stats

    df = spark.createDataFrame([], "src long, dst long")
    assert triangle_stats(df).count() == 0


# degree_assortativity ----------------------------------------------


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_assortativity_star_is_minus_one(spark):
    from protosc_spark.dedup import degree_assortativity

    star = [(0, i) for i in range(1, 8)]
    r = degree_assortativity(_edges_df(spark, star)).collect()[0]
    assert r.n_nodes == 8 and r.n_edges == 7
    assert r.assortativity == -1.0
    assert r.mean_degree == 14.0 / 8.0


def test_assortativity_regular_graph_undefined(spark):
    from protosc_spark.dedup import degree_assortativity

    cycle = [(i, (i + 1) % 6) for i in range(6)]
    r = degree_assortativity(_edges_df(spark, cycle)).collect()[0]
    # every degree 2: zero variance, r undefined
    assert r.assortativity is None and r.mean_degree == 2.0


def test_assortativity_brute_force_pearson(spark):
    from protosc_spark.dedup import degree_assortativity

    import random

    rng = random.Random(19)
    pairs = set()
    while len(pairs) < 40:
        a, b = rng.randint(0, 14), rng.randint(0, 14)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    # feed duplicates and reversed copies: must collapse
    noisy = list(pairs) + [(b, a) for a, b in list(pairs)[:10]]
    r = degree_assortativity(
        _edges_df(spark, noisy)
    ).collect()[0]
    from collections import Counter

    deg = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    stubs = []
    for a, b in pairs:
        stubs.append((deg[a], deg[b]))
        stubs.append((deg[b], deg[a]))
    m = len(stubs)
    sx = sum(x for x, _ in stubs)
    sxx = sum(x * x for x, _ in stubs)
    sxy = sum(x * y for x, y in stubs)
    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    assert r.n_edges == len(pairs)
    assert r.assortativity == float(num) / float(den)


# -------------------------------------------------- tf-idf cosine
class TestTfidfCosinePairs:
    def _run(self, spark, texts, **kw):
        from protosc_spark.dedup import tfidf_cosine_pairs

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        return {
            (r["doc_a"], r["doc_b"]): r
            for r in tfidf_cosine_pairs(df, **kw).collect()
        }

    def test_hand_computed_cosine(self, spark):
        import math

        texts = ["rare shared", "rare shared", "other words"]
        out = self._run(spark, texts, min_sim=0.0)
        # docs 0,1 identical -> sim 1.0 (both tokens df=2, same w)
        assert out[(0, 1)]["sim"] == 1.0
        assert out[(0, 1)]["n_shared"] == 2
        # no token shared with doc 2
        assert (0, 2) not in out and (1, 2) not in out

    def test_idf_downweights_boilerplate(self, spark):
        # pair sharing only the everywhere-token scores far below the
        # pair sharing the rare token
        texts = [
            "the unique1",   # 0
            "the unique2",   # 1  (share boilerplate 'the')
            "the gemstone",  # 2
            "the gemstone",  # 3  (share rare 'gemstone' + 'the')
        ]
        out = self._run(spark, texts, min_sim=0.0)
        assert out[(2, 3)]["sim"] == 1.0
        assert out[(0, 1)]["sim"] < 0.5

    def test_max_df_drops_boilerplate_tokens(self, spark):
        texts = ["the a1", "the a2", "the a3", "the a4"]
        # 'the' has df=4; cap at 3 removes it -> no shared tokens left
        out = self._run(spark, texts, min_sim=0.0, max_df=3)
        assert out == {}

    def test_parallelism_invariant(self, spark, sf_dir):
        from protosc_spark.dedup import tfidf_cosine_pairs

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = tfidf_cosine_pairs(docs.repartition(1), min_sim=0.8)
        b = tfidf_cosine_pairs(docs.repartition(13), min_sim=0.8)
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )
