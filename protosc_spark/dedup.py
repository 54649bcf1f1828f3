"""Corpus deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

No reference analog (image-only reference); first-class
training-data-pipeline operators. Design targets the 100 TB case:

* exact dedup — one shuffle on a text digest, survivor chosen
  deterministically (min doc_id), never ``dropDuplicates``.
* n-gram Jaccard — explode to (doc, shingle) pairs, self-join on
  shingle, count intersections: all JVM, all shuffle-parallel; the
  classic candidate-pair plan whose cost scales with shared shingles,
  not |docs|^2. Exact (oracle-checkable in SQL).
* MinHash+LSH — Arrow-vectorized signatures, band-bucket join for
  candidates whose cost scales with collisions; estimates Jaccard from
  signature agreement. The approximate scale path of the same problem.
* SimHash — 64-bit signature; near-dups = small Hamming distance,
  candidates via 4x16-bit band equality, verified with bit_count(xor).
* connected components — closes near-dup pairs into clusters
  (hash-min + pointer jumping, O(log diameter) rounds); survivor
  selection on top (``dedup_survivors``).
* line-level dedup — CCNet-style corpus-wide paragraph dedup
  (boilerplate removal below document granularity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from protosc_spark.features.text import _fnv1a

SHINGLE_W = 3
MINHASH_K = 64
MINHASH_BANDS = 16
_MERSENNE = (1 << 61) - 1


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Duplicate groups by content digest: (text_md5, n_docs,
    survivor_id). md5 is available in both Spark and DuckDB, making
    this oracle-checkable; a production run would use xxhash64."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("survivor_id"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one deterministic survivor row per distinct text."""
    from pyspark.sql import Window as W

    w = W.partitionBy(F.md5(F.col(text_col))).orderBy("doc_id")
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _shingles(text_col: str = "text", w: int = SHINGLE_W):
    """Distinct w-token shingles as strings (JVM expression)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(w - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, w), " "))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    tau: float = 0.5,
    text_col: str = "text",
    w: int = SHINGLE_W,
    max_df: int | None = None,
) -> DataFrame:
    """EXACT token-w-gram Jaccard similarity for every doc pair sharing
    at least one shingle, filtered to jaccard >= tau.

    Plan: doc->shingle explode (distinct), self-join on shingle
    (equi-join, shuffle on shingle, AQE handles hot shingles), count
    per pair, then |A∪B| from per-doc shingle counts. Output:
    (doc_a, doc_b, jaccard) with doc_a < doc_b.

    ``max_df``: document-frequency cap (standard in the dedup
    literature, e.g. prefix filtering) — shingles appearing in more
    than ``max_df`` docs are removed from EVERY document's set before
    pair generation, bounding the hottest bucket's self-join at
    max_df^2 instead of going quadratic on one viral shingle. With the
    cap, jaccard is the exact Jaccard of the CAPPED sets (per-doc set
    sizes are recounted post-cap). ``None`` (default) = no cap, exact
    vs the SQL oracle. At corpus scale always set it: a cap of ~1000
    loses only boilerplate shingles that carry no dedup signal.
    """
    shingle_arr = _shingles(text_col, w)
    # join on xxhash64(shingle), not the string: 8-byte fixed-width keys
    # cut the self-join's shuffle bytes ~2.5x and compare faster
    # (measured ~16% at sf0.1; grows with shingle length). A hash
    # collision could only merge two shingles across a doc pair
    # (P ~ |distinct|^2 / 2^64 per pair) — negligible against tau.
    sh = df.select(
        "doc_id",
        F.explode(
            F.transform(shingle_arr, lambda s: F.xxhash64(s))
        ).alias("shingle"),
    )
    if max_df is not None:
        # The HOT-shingle list is tiny by construction (few shingles
        # exceed the cap), so the anti-join broadcasts it — never the
        # per-doc table.
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_"))
            .where(F.col("df_") > max_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
        # post-cap set sizes need a real count over the kept pairs
        counts = sh.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("int").alias("n_sh")
        )
    else:
        # per-doc set size WITHOUT an explode+groupBy pass:
        # |shingles(doc)| = size of the distinct array, a 1-row-per-doc
        # projection. (Do NOT carry n_sh through the explode instead:
        # the optimizer inlines the size() into a post-Generate
        # projection and re-evaluates the whole shingle array once per
        # exploded row — a measured 40x regression.)
        counts = df.select("doc_id", F.size(shingle_arr).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    # Plain equi-joins for the per-doc counts: |docs|-row tables must
    # NOT be force-broadcast (at billions of docs that OOMs every
    # executor); AQE broadcasts them automatically when small.
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= tau)
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of the undirected duplicate-pair graph:
    the stage every web-scale dedup pipeline needs between pair
    generation (LSH / Jaccard / SimHash) and survivor selection —
    near-dup similarity is not transitive, so pairs must be closed
    into clusters before "keep one per cluster" is well-defined.

    Returns ``(id, comp)`` where ``comp`` is the smallest node id in
    the component (so ``id == comp`` marks the canonical survivor).

    Algorithm: hash-min label propagation WITH pointer jumping — each
    round ``comp'(v) = min(comp(v), min_{u~v} comp(u), comp(comp(v)))``.
    The jump term short-cuts label chains, so rounds grow like
    O(log diameter) instead of O(diameter) (a pinned 64-node path
    converges in <= 7 rounds, tests/test_dedup.py); duplicate clusters
    are near-cliques, which converge in 2-3 rounds. Per round: two
    equi-joins + one min-aggregation (3 hash shuffles), all JVM;
    ``localCheckpoint`` cuts lineage so plans stay O(1) per round.
    Convergence is detected from an exact decimal SUM(comp) (labels
    only ever decrease, so an unchanged sum == fixpoint; decimal(38)
    cannot overflow at any realistic id range, unlike sum over int64).

    Raises RuntimeError if not converged within ``max_iter`` — at
    corpus scale a silently-unconverged labeling is data corruption.
    """
    # materialize `pairs` ONCE before anything else: it is usually an
    # expensive plan (an LSH/Jaccard self-join), every round joins
    # against the edges, and the symmetrization union alone would
    # execute the plan twice (unmaterialized input measured 5x slower
    # end-to-end on the sf0.1 Jaccard graph). The flipped side below
    # reads the materialized partitions, not the plan.
    fwd = pairs.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=True)
    edges = fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )

    def _state(lb: DataFrame):
        row = lb.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        return (row["s"], row["n"])

    prev = _state(labels)
    for it in range(max_iter):
        nbr = edges.join(labels.withColumnRenamed("id", "u"), "u").select(
            F.col("v").alias("id"), "comp"
        )
        jump = labels.join(
            labels.select(
                F.col("id").alias("comp"), F.col("comp").alias("jc")
            ),
            "comp",
        ).select("id", F.col("jc").alias("comp"))
        labels = (
            labels.unionByName(nbr)
            .unionByName(jump)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        cur = _state(labels)
        if cur == prev:
            labels._cc_iterations = it + 1  # exposed for convergence tests
            return labels
        prev = cur
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    line_sep: str = "\n",
) -> DataFrame:
    """CCNet-style corpus-wide line/paragraph deduplication: every
    line keeps exactly ONE instance across the whole corpus — the one
    with the smallest (doc_id, line_idx) — and all other instances are
    dropped; documents are reassembled in original line order. This is
    the stage that strips boilerplate (headers, nav bars, license
    blurbs) that exact and near-dup DOC-level dedup cannot see.

    Returns (doc_id, n_lines, n_kept, text_clean); a fully-deduped
    document survives with text_clean = '' so the caller decides the
    drop policy.

    Scale shape: posexplode -> ONE window over the line content (at
    production scale partition by xxhash64(line) — same groups, fixed
    8-byte shuffle keys) -> per-doc reassembly via sort_array over
    collected (line_idx, line) structs (collect_list order is
    partition-dependent; the sort makes it deterministic). Skew note:
    a viral line (billions of instances) hot-spots its window
    partition; production caps instances per line with a pre-count cap
    like ngram_jaccard's max_df. Exact DuckDB oracle at the gate.
    """
    from pyspark.sql import Window as W

    # F.split takes a Java REGEX but array_join reassembles with the
    # LITERAL separator — escape the split side so a metacharacter
    # separator ('|', '.', ...) splits literally and the round trip is
    # symmetric. re.escape emits Java-regex-compatible escapes.
    import re as _re

    lines = df.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), _re.escape(line_sep))).alias(
            "line_idx", "line"
        ),
    )
    w = W.partitionBy("line").orderBy("doc_id", "line_idx")
    kept = (
        lines.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("line_idx", "line"))
                    ),
                    lambda s: s["line"],
                ),
                line_sep,
            ).alias("text_clean"),
        )
    )
    totals = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines")
    )
    return (
        totals.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0).cast("bigint")).alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """End-to-end near-dup removal: close ``pairs`` into components,
    drop every non-canonical member, keep all untouched rows. One
    left-anti join against the (small relative to corpus) loser set."""
    cc = connected_components(pairs, src=src, dst=dst)
    losers = cc.where(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE31 = (1 << 31) - 1


def _minhash_params(k: int = MINHASH_K, seed: int = 97):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE31, size=k, dtype=np.int64)
    b = rng.integers(0, _MERSENNE31, size=k, dtype=np.int64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    k: int = MINHASH_K,
    w: int = SHINGLE_W,
    seed: int = 97,
) -> DataFrame:
    """(doc_id, sig array<long>[k]) via universal hashing of FNV shingle
    hashes — Arrow-vectorized numpy, one pass, no shuffle.

    Hash universe is 31-bit so ``a·h + b`` stays inside int64 and the
    whole (shingles × k) permutation matrix is one vectorized numpy
    expression (61-bit universes force object-dtype bigint math — a
    measured ~5x slowdown for no collision-rate benefit at corpus
    scale: P(collision per pair) ≈ 2^-31 per slot)."""
    a, b = _minhash_params(k, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.fillna(""):
            toks = t.split(" ")
            if len(toks) >= w:
                sh = {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}
            else:
                sh = {" ".join(toks)}
            hs = np.array([_fnv1a(s) & 0x7FFFFFFF for s in sh], dtype=np.int64)
            m = ((hs[:, None] * a[None, :] + b[None, :]) % _MERSENNE31).min(axis=0)
            out.append(m)
        return pd.Series(out)

    return df.select("doc_id", sig_udf(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    tau: float = 0.5,
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    seed: int = 97,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH, scored by the
    MinHash Jaccard estimate (fraction of agreeing signature slots).

    Returns (doc_a, doc_b, est_jaccard >= tau), doc_a < doc_b. The
    band join is the scale path: cost follows bucket collisions.
    """
    assert k % bands == 0
    r = k // bands
    sigs = minhash_signatures(df, text_col, k, seed=seed).cache()

    banded = sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.xxhash64(
                    bi, F.array_join(F.slice("sig", bi * r + 1, r), ",")
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    ) / F.lit(float(k))
    return cand.select(
        "doc_a", "doc_b", F.round(est, 6).alias("est_jaccard")
    ).where(F.col("est_jaccard") >= tau)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over token FNV hashes (Arrow-vectorized)."""

    @F.pandas_udf(T.LongType())
    def sim_udf(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts.fillna("")):
            acc = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for tok in t.split(" "):
                h = np.uint64(_fnv1a(tok))
                bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
                acc += np.where(bits == 1, 1, -1)
            v = 0
            for bit in np.nonzero(acc > 0)[0]:
                v |= 1 << int(bit)
            # keep in signed-int64 range
            if v >= 1 << 63:
                v -= 1 << 64
            out[i] = v
        return pd.Series(out)

    return df.select("doc_id", sim_udf(F.col(text_col)).alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    bands: int | None = None,
) -> DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming, verified with
    bit_count(xor).

    Candidate generation: split the 64-bit signature into ``bands``
    equal chunks; by pigeonhole, a pair within Hamming distance
    ``bands - 1`` shares at least one EXACT band, so candidates =
    band-equality join. ``bands=None`` auto-picks the smallest
    power-of-two band count > max_hamming, which makes the guarantee
    match the query's threshold (recall = 1.0 by construction, pinned
    in tests/test_dedup.py). More bands = wider recall window but
    hotter buckets (chunk width 64/bands bits -> random-collision rate
    2^-(64/bands) per band), so don't pass more than the threshold
    needs.
    """
    if bands is None:
        bands = 1
        while bands <= max_hamming:
            bands *= 2
    if 64 % bands != 0 or bands > 64:
        raise ValueError("bands must divide 64")
    if bands <= max_hamming:
        raise ValueError(
            f"bands={bands} cannot guarantee recall for "
            f"max_hamming={max_hamming} (need bands > max_hamming)"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    sh = simhash64(df, text_col).cache()
    banded = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", i * width).bitwiseAND(F.lit(mask))
                    for i in range(bands)
                ]
            )
        ).alias("band", "chunk"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def cross_split_contamination(
    df: DataFrame,
    split_col: str = "split",
    train: str = "train",
    test: str = "test",
    w: int = SHINGLE_W,
    min_shared: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: find (test doc, train doc) pairs
    sharing >= ``min_shared`` distinct w-token shingles — the standard
    n-gram-overlap check run before training so that evaluation data
    is not memorized verbatim (GPT-3-style 13-gram decontamination;
    use a large ``w`` in production, the mechanics are w-independent).

    Output: (test_doc_id, train_doc_id, n_shared). Plan: one shingle
    explode per side from the SAME scan (the split filter prunes
    before the join), equi-join on xxhash64(shingle) — identical scale
    shape to ngram_jaccard_pairs, cost follows shared shingles, never
    |test| x |train|. Hot boilerplate shingles can be capped exactly
    like ngram_jaccard's max_df if a viral shingle appears.
    """
    sh = df.select(
        "doc_id",
        F.col(split_col),
        F.explode(
            F.transform(_shingles(text_col, w), lambda s: F.xxhash64(s))
        ).alias("shingle"),
    )
    te = sh.where(F.col(split_col) == test).select(
        F.col("doc_id").alias("test_doc_id"), "shingle"
    )
    tr = sh.where(F.col(split_col) == train).select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    return (
        te.join(tr, "shingle")
        .groupBy("test_doc_id", "train_doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def _bloom_positions(text_col: str, m: int, k: int):
    """k bit positions per row, JVM-side: pmod(xxhash64(i, md5(text)), m).
    Identical expression on the build and probe sides by construction."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), F.md5(F.col(text_col))), F.lit(m))
            for i in range(k)
        ]
    )


def incremental_dedup(
    existing: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    bits_per_item: int = 16,
    n_hashes: int = 4,
    max_bloom_bytes: int = 64 * 2**20,
) -> DataFrame:
    """Ingest-time dedup: drop every incoming row whose text already
    exists in the historical corpus — WITHOUT joining the whole batch
    against the (enormous) history. The streaming-ingest companion to
    the batch dedup family.

    1. Build a Bloom filter over the existing texts: bit positions are
       computed JVM-side, each partition folds its positions into ONE
       m/8-byte bitmap (mapInPandas), and the driver ORs one bitmap
       per partition — never a collect of positions. m is sized at
       ``bits_per_item`` bits per existing row (16 bits/4 hashes ->
       ~0.24% theoretical FPR), the standard RAM-for-join trade.
    2. Probe the incoming batch against the closure-broadcast bitmap:
       rows with any unset bit are GUARANTEED new (Bloom has no false
       negatives) and skip the join entirely.
    3. Only the maybe-duplicates (true dups + FPR-rate survivors) are
       exact-verified with a left-anti join against the history ON THE
       TEXT COLUMN ITSELF — never on a digest. (md5(a)==md5(b) does
       not imply a==b, and md5 collisions are constructible for
       adversarial web text; a digest-only verify could silently drop
       a genuinely-new doc. The anti-join's shuffle carries the
       history's distinct texts either way — joining on a digest
       column would not reduce the number of shuffled rows.)

    Result is EXACTLY the plain anti-join (pinned in tests); the Bloom
    is pure plan optimization, so the gate oracle is plain SQL.

    Driver-memory bound (round-3 verdict #3): the bitmap is sized at
    ``bits_per_item`` bits per existing row but HARD-CAPPED at
    ``max_bloom_bytes`` (default 64 MB — 5.4e8 bits, power-of-two
    rounded), so driver + per-executor footprint is constant no matter
    how large the history grows. Past the cap the FPR rises (at 1e11
    history rows and 64 MB, the filter saturates and ~everything
    becomes a "maybe"), which costs only verify-join traffic — never
    correctness, because Bloom filters have no false negatives and the
    exact anti-join absorbs every false positive. Callers at extreme
    history sizes raise the budget or shard the filter per partition.
    """
    n = existing.count()  # index-build action, like sq8_train/ivf_train
    m = 8
    while m < max(64, n * bits_per_item) and m < max_bloom_bytes * 8:
        m *= 2
    pos = _bloom_positions(text_col, m, n_hashes)

    n_bytes = m // 8

    def to_bitmap(batches):
        bm = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            p = pdf["p"].to_numpy()
            np.bitwise_or.at(
                bm, p >> 3, (np.uint8(1) << (p & 7).astype(np.uint8))
            )
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = (
        existing.select(F.explode(pos).alias("p"))
        .mapInPandas(to_bitmap, "bm binary")
        .collect()
    )
    bloom = np.zeros(n_bytes, dtype=np.uint8)
    for r in parts:
        bloom |= np.frombuffer(r["bm"], dtype=np.uint8)

    @F.pandas_udf(T.BooleanType())
    def might_contain(pos_s: pd.Series) -> pd.Series:
        P = np.array(pos_s.tolist(), dtype=np.int64)  # [batch, k]
        bits = (bloom[P >> 3] >> (P & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    probed = incoming.withColumn("__maybe", might_contain(pos))
    certain_new = probed.where(~F.col("__maybe")).drop("__maybe")
    maybes = probed.where(F.col("__maybe")).drop("__maybe")
    verified_new = maybes.join(
        existing.select(F.col(text_col)).distinct(),
        on=text_col,
        how="left_anti",
    )
    return certain_new.unionByName(verified_new)


def duplicated_span_stats(
    df: DataFrame,
    l: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated-SPAN statistics per document — the signal
    behind exact-substring deduplication (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"):
    boilerplate, licence blocks and templated text recur VERBATIM
    across (and within) documents at spans shorter than the whole
    document, so document-level dedup never sees them. Every l-token
    window is hashed; a window whose hash occurs >= min_count times
    CORPUS-WIDE (same-doc repeats included — boilerplate repeats
    inside a page too) is duplicated, and the duplicated-token
    coverage is the exact size of the UNION of duplicated windows
    (interval merge via one lag window: each window contributes
    min(l, pos - prev_pos) tokens).

    Returns (id, n_tokens, n_windows, n_dup_windows, dup_tokens,
    dup_frac). Documents shorter than l tokens have zero windows and
    frac 0. Tokenization is the engine's raw single-space split (same
    convention as the shingle family).

    Scale shape — linear in corpus tokens, no Python anywhere:
    window hashes are a JVM transform over the token array (md5 of
    the joined span, reproducible in the SQL oracle); ONE shuffle
    groups hashes to find duplicated ones; the windows->counts join
    shuffles on the hash; the coverage union is one window over
    (id, pos). No driver state, no collect.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    hashes = F.when(
        n >= l,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(l - 1)),
            lambda i: F.md5(F.array_join(F.slice(toks, i, l), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    wins = df.select(
        F.col(id_col).alias("__id"),
        n.alias("n_tokens"),
        F.posexplode_outer(hashes).alias("pos", "h"),
    )
    totals = wins.groupBy("__id").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.count("h").alias("n_windows"),  # count() skips the null row
    )
    dup_h = (
        wins.where(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= int(min_count))
        .select("h")
    )
    dupwins = wins.join(dup_h, "h")
    w_cov = W.partitionBy("__id").orderBy("pos")
    cov = dupwins.withColumn(
        "__cov",
        F.least(
            F.lit(l),
            F.col("pos") - F.coalesce(
                F.lag("pos").over(w_cov), F.col("pos") - F.lit(l)
            ),
        ),
    )
    dstats = cov.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_dup_windows"),
        F.sum("__cov").alias("dup_tokens"),
    )
    return (
        totals.join(dstats, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )


def filter_duplicated_spans(
    df: DataFrame,
    max_frac: float = 0.5,
    l: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Keep documents whose duplicated-span token coverage is at most
    ``max_frac`` — the standard cleanup filter over
    :func:`duplicated_span_stats` (drops boilerplate-dominated pages
    while document-level dedup keeps unique-but-templated ones)."""
    stats = duplicated_span_stats(df, l, text_col, id_col, min_count)
    keep = stats.where(F.col("dup_frac") <= float(max_frac)).select(
        F.col(id_col).alias("__keep_id")
    )
    return df.join(
        keep, F.col(id_col) == F.col("__keep_id"), "left_semi"
    )


def edit_distance_pairs(
    df: DataFrame,
    max_dist: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    band: int | None = None,
) -> DataFrame:
    """EXACT Levenshtein near-duplicate pairs: every unordered doc
    pair with edit distance <= ``max_dist`` — the character-level
    complement to shingle Jaccard (catches small in-place edits that
    shift every w-gram) and the verify step record-linkage pipelines
    run after LSH blocking.

    Plan — length-band blocking, provably LOSSLESS for the
    threshold: levenshtein(a, b) >= |len(a) - len(b)|, so a
    qualifying pair's lengths differ by at most ``max_dist``. Docs
    are bucketed by blk = len DIV W with W > max_dist (default
    ``band`` = max(16, 4 * (max_dist + 1))); any qualifying pair
    then sits in the same or adjacent bucket, so the LEFT side is
    exploded to (blk-1, blk, blk+1) and equi-joined to the right
    side's own bucket — each pair meets exactly once (the right
    row's bucket is unique). Candidates are cut by the exact length
    filter before the DP runs, and the DP itself is Spark's built-in
    banded ``levenshtein(l, r, threshold)`` (JVM, O(len * max_dist),
    early-exit) — no Python anywhere.

    Scale shape: one equi-join shuffled on the length bucket; bucket
    population is corpus_len_histogram-bounded and AQE splits hot
    buckets (plain equi-join, not cogroup). Cost within a bucket is
    pairs * O(len * max_dist); for corpora with heavy exact
    duplication run :func:`exact_dedup_groups` first and pair only
    group representatives. Output: (doc_a, doc_b, dist) with
    doc_a < doc_b, ordered by (doc_a, doc_b).

    Reference parity: protosc has no fuzzy text matching; this is
    the standard dedup-stack member (cf. Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" —
    edit-similarity near-dup class)."""
    w_band = band if band is not None else max(16, 4 * (max_dist + 1))
    if w_band <= max_dist:
        raise ValueError(
            f"band ({w_band}) must exceed max_dist ({max_dist}) for "
            "adjacent-bucket blocking to be lossless"
        )
    ln = F.length(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        ln.alias("__len"),
        (ln.cast("bigint") / F.lit(w_band)).cast("bigint").alias("__blk"),
    )
    left = base.select(
        F.col("__id").alias("doc_a"),
        F.col("__t").alias("__ta"),
        F.col("__len").alias("__la"),
        F.explode(
            F.array(
                F.col("__blk") - 1, F.col("__blk"), F.col("__blk") + 1
            )
        ).alias("__blk"),
    ).where(F.col("__blk") >= 0)
    right = base.select(
        F.col("__id").alias("doc_b"),
        F.col("__t").alias("__tb"),
        F.col("__len").alias("__lb"),
        "__blk",
    )
    cand = left.join(right, "__blk").where(
        (F.col("doc_a") < F.col("doc_b"))
        & (F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
    )
    dist = F.levenshtein(F.col("__ta"), F.col("__tb"), max_dist)
    return (
        cand.select(
            "doc_a", "doc_b", dist.cast("int").alias("dist")
        )
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .orderBy("doc_a", "doc_b")
    )


def triangle_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over
    an undirected graph given as an edge list — the community-
    structure readout beside connected components (components say
    "reachable"; triangles say "tightly knit": near-dup clusters,
    kNN-graph neighborhoods, co-occurrence cliques).

        clustering(v) = 2 * T(v) / (deg(v) * (deg(v) - 1))

    Algorithm is the standard DISTRIBUTED triangle enumeration
    (node-iterator++ / "oriented wedge join", as in Cohen's
    MapReduce formulation and GraphFrames): canonicalize to a < b
    undirected edges, then ORIENT every edge from its lower-
    (degree, id) endpoint to the higher one — each triangle is then
    produced by EXACTLY ONE wedge (at its lowest-key corner), and
    the wedge fan-out per node is bounded by its oriented
    OUT-degree, which the orientation caps at O(sqrt(m)) — the
    skew-killer: a celebrity node of degree 10^6 generates no
    10^12-wedge explosion, because almost all its edges point INTO
    it. Two equi-joins total (wedge build, wedge close); everything
    else is projections and counts. Self-loops dropped; duplicate /
    reverse edges collapse in the canonical distinct.

    Output: (node, degree, triangles, clustering); clustering NULL
    for degree < 2. Every count is an exact BIGINT; the coefficient
    is one float division."""
    a, b = F.col(src_col), F.col(dst_col)
    und = (
        edges.where(a != b)
        .select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    da = deg.select(
        F.col("n").alias("a"), F.col("degree").alias("__da")
    )
    db = deg.select(
        F.col("n").alias("b"), F.col("degree").alias("__db")
    )
    keyed = und.join(da, "a").join(db, "b")
    lower_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias(
            "u"
        ),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias(
            "v"
        ),
        F.when(lower_first, F.col("__db"))
        .otherwise(F.col("__da"))
        .alias("__dv"),
    ).localCheckpoint(eager=True)
    e1 = oriented.select(
        "u", F.col("v").alias("x"), F.col("__dv").alias("__dx")
    )
    e2 = oriented.select(
        F.col("u").alias("u2"),
        F.col("v").alias("y"),
        F.col("__dv").alias("__dy"),
    )
    wedges = e1.join(e2, F.col("u") == F.col("u2")).where(
        (F.col("__dx") < F.col("__dy"))
        | (
            (F.col("__dx") == F.col("__dy"))
            & (F.col("x") < F.col("y"))
        )
    )
    closer = oriented.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    tri = wedges.join(closer, ["x", "y"]).select("u", "x", "y")
    corners = (
        tri.select(F.col("u").alias("n"))
        .unionAll(tri.select(F.col("x").alias("n")))
        .unionAll(tri.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__t"))
    )
    t = F.coalesce(F.col("__t"), F.lit(0)).cast("bigint")
    d = F.col("degree")
    return (
        deg.join(corners, "n", "left")
        .select(
            F.col("n").alias("node"),
            "degree",
            t.alias("triangles"),
            F.when(
                d >= 2,
                F.lit(2.0)
                * t.cast("double")
                / (d * (d - F.lit(1))).cast("double"),
            ).alias("clustering"),
        )
    )


def degree_assortativity(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Newman degree assortativity of an undirected graph given as
    an edge list — do high-degree nodes link to high-degree nodes
    (r > 0, social/core-periphery structure) or to leaves (r < 0,
    hub-and-spoke; kNN graphs and star-shaped near-dup clusters
    skew negative)? It is the Pearson correlation of the degree
    pair over DIRECTED edge stubs; Pearson is shift-invariant, so
    correlating raw degrees equals the textbook remaining-degree
    form exactly.

    Exactness: degrees are integers, so with each canonical a < b
    edge contributing both stub directions the three moments

        Sx  = sum (da + db),  Sxx = sum (da^2 + db^2),
        Sxy = sum 2 da db,    M = 2 m  (stub count)

    are exact DECIMAL(38,0) sums of integer products, and

        r = (M Sxy - Sx^2) / (M Sxx - Sx^2)

    is ONE float division of exact integers (the symmetry of the
    stub set makes the x and y marginals identical, collapsing the
    usual five-moment form to three). Self-loops dropped; duplicate
    and reverse edges collapse in the canonical distinct; two tiny
    joins against the degree table (same shape as triangle_stats).

    Output: ONE row (n_nodes, n_edges, mean_degree, assortativity);
    assortativity NULL for a degree-regular graph (denominator 0)
    or an empty edge set."""
    dec = "decimal(38,0)"
    a, b = F.col(src_col), F.col(dst_col)
    und = (
        edges.where(a != b)
        .select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast(dec).alias("degree"))
    )
    keyed = und.join(
        deg.select(
            F.col("n").alias("a"), F.col("degree").alias("__da")
        ),
        "a",
    ).join(
        deg.select(
            F.col("n").alias("b"), F.col("degree").alias("__db")
        ),
        "b",
    )
    da, db = F.col("__da"), F.col("__db")
    g = keyed.agg(
        F.count(F.lit(1)).cast(dec).alias("__m"),
        F.sum(da + db).alias("__sx"),
        F.sum(da * da + db * db).alias("__sxx"),
        F.sum(F.lit(2).cast(dec) * da * db).alias("__sxy"),
    ).crossJoin(
        F.broadcast(
            deg.agg(F.count(F.lit(1)).alias("__nn"))
        )
    )
    m2 = F.lit(2).cast(dec) * F.col("__m")
    num = m2 * F.col("__sxy") - F.col("__sx") * F.col("__sx")
    den = m2 * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    return g.select(
        F.col("__nn").cast("bigint").alias("n_nodes"),
        F.col("__m").cast("bigint").alias("n_edges"),
        F.when(
            F.col("__nn") > 0,
            m2.cast("double") / F.col("__nn").cast("double"),
        ).alias("mean_degree"),
        F.when(
            den != 0, num.cast("double") / den.cast("double")
        ).alias("assortativity"),
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    min_sim: float = 0.8,
    max_df: int | None = None,
    min_df: int = 1,
    unit: int = 10**9,
) -> DataFrame:
    """TF-IDF cosine near-duplicate pairs — the token-weighted
    sibling of :func:`ngram_jaccard_pairs` (Jaccard treats every
    shingle equally; idf weighting makes boilerplate tokens cheap and
    rare tokens decisive, the classic retrieval-era near-dup
    metric).

    Weights follow the engine's sklearn-smoothed idf
    (:func:`protosc_spark.textops.vocab_with_idf`):
    w = tf * (ln((1+N)/(1+df)) + 1).  Every cross-term w_a * w_b and
    every norm term w^2 is quantized to integer 1/``unit`` units
    (floor, both engines) BEFORE summing, so the shared-token sums
    and per-doc norms are order-independent integer sums; one float
    expression at the end: sim = cross / sqrt(qa * qb).

    Scale shape: one (doc, token) tf count, one token-df aggregate
    (broadcast N rides a 1-row crossJoin), pair candidates from ONE
    inverted-index equi-join on token — cost follows SHARED tokens,
    never |docs|^2 — with ``max_df`` dropping boilerplate tokens from
    every document before the join (the ngram_jaccard guard; cosine
    over the capped vocabulary is the documented semantics when set).
    Canonical doc_a < doc_b; deterministic (sim desc via rounded
    integer state; ordering by ids).

    Output: (doc_a, doc_b, n_shared, sim) with sim >= min_sim.
    """
    toks = df.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dfreq = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    if max_df is not None:
        dfreq = dfreq.where(F.col("df") <= int(max_df))
    dfreq = dfreq.where(F.col("df") >= int(min_df))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    w = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            (
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.lit(1.0) + F.col("__n").cast("double"))
                        / (F.lit(1.0) + F.col("df").cast("double"))
                    )
                    + F.lit(1.0)
                )
            ).alias("w"),
        )
    )
    u = F.lit(float(unit))
    norms = w.groupBy("doc_id").agg(
        F.sum(F.floor(F.col("w") * F.col("w") * u).cast("bigint"))
        .alias("q")
    )
    a = w.select(
        F.col("doc_id").alias("doc_a"), "tok", F.col("w").alias("wa")
    )
    b = w.select(
        F.col("doc_id").alias("doc_b"), "tok", F.col("w").alias("wb")
    )
    cross = (
        a.join(b, "tok")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
            F.sum(
                F.floor(F.col("wa") * F.col("wb") * u).cast("bigint")
            ).alias("x"),
        )
    )
    na = norms.select(
        F.col("doc_id").alias("doc_a"), F.col("q").alias("qa")
    )
    nb = norms.select(
        F.col("doc_id").alias("doc_b"), F.col("q").alias("qb")
    )
    sim = (
        F.col("x").cast("double")
        / F.sqrt(F.col("qa").cast("double") * F.col("qb").cast("double"))
    )
    return (
        cross.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(sim, 6).alias("sim"),
        )
        .where(F.col("sim") >= F.lit(float(min_sim)))
        .orderBy("doc_a", "doc_b")
    )
