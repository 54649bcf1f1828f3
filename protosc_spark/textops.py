"""Text-analysis operators for large-scale corpus pipelines: token
statistics, quality scoring, language ID, fingerprinting.

No reference analog (the reference is image-only); these are the
training-data-pipeline operators the engine adds as first-class
citizens. All pure JVM expressions (whole-stage codegen, no Python in
the hot path); every one has an exact DuckDB-SQL oracle in
__spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# deterministic marker vocabularies for the language-ID heuristic; a
# real deployment swaps these for n-gram tables — the ENGINE mechanics
# (broadcast marker sets, argmax over hit counts) are what's exercised.
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "und", "das", "ist"),
    "es": ("el", "los", "de", "es"),
}

FP_BASE = 1000003
FP_MOD = (1 << 31) - 1  # small enough that acc*base never overflows int64


def _tokens() -> Column:
    return F.split(F.col("text"), " ")


def token_stats(df: DataFrame) -> DataFrame:
    """Per-doc token statistics (whitespace tokenization + a BPE-ish
    regex word count)."""
    toks = _tokens()
    n_tok = F.size(toks)
    return df.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_text"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq_tokens"),
        F.round(
            (F.length("text") - (n_tok - 1)) / n_tok.cast("double"), 4
        ).alias("avg_token_len"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"))
        .cast("bigint")
        .alias("n_bpe_ish_tokens"),
    )


def quality_score(df: DataFrame) -> DataFrame:
    """Length/punctuation/stopword heuristics -> one quality scalar.

    score = stopword_ratio - punct_ratio - digit_ratio + min(n_tokens,
    50)/100, rounded; monotone in "looks like prose".
    """
    toks = _tokens()
    n_tok = F.size(toks).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))
    ).cast("double")
    n_chars = F.length("text").cast("double")
    punct = F.regexp_count(F.col("text"), F.lit(r"[^A-Za-z0-9\s]")).cast("double")
    digit = F.regexp_count(F.col("text"), F.lit(r"[0-9]")).cast("double")
    stop_ratio = stop_hits / n_tok
    punct_ratio = punct / n_chars
    digit_ratio = digit / n_chars
    score = stop_ratio - punct_ratio - digit_ratio + F.least(
        n_tok, F.lit(50.0)
    ) / F.lit(100.0)
    return df.select(
        "doc_id",
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(score, 4).alias("quality"),
    )


def language_id(df: DataFrame) -> DataFrame:
    """Marker-word language heuristic: most hits wins; ties and
    zero-hit docs -> 'und'. Deterministic tie-break by language code."""
    toks = _tokens()

    def marker_hits(markers):
        return F.size(F.filter(toks, lambda t: F.lower(t).isin(*markers)))

    hits = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)  # deterministic tie-break order
    best_n = F.greatest(*[hits[lg] for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier language wins ties
        pred = F.when((hits[lg] == best_n) & (best_n > 0), F.lit(lg)).otherwise(pred)
    sel = [F.col("doc_id"), pred.alias("lang_pred")]
    sel += [hits[lg].cast("bigint").alias(f"hits_{lg}") for lg in langs]
    return df.select(*sel)


def fingerprint(df: DataFrame) -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash of
    the token sequence, mod 2^61-1 — pure ``F.aggregate`` fold, exactly
    reproducible in any engine with 64-bit ints (DuckDB list_reduce)."""
    tok_h = F.transform(
        _tokens(),
        lambda t: F.pmod(
            F.aggregate(
                F.split(t, ""),
                F.lit(0).cast("long"),
                lambda acc, ch: F.pmod(
                    acc * F.lit(31) + F.ascii(ch), F.lit(FP_MOD)
                ),
            ),
            F.lit(FP_MOD),
        ),
    )
    fp = F.aggregate(
        tok_h,
        F.lit(0).cast("long"),
        lambda acc, h: F.pmod(acc * F.lit(FP_BASE) + h, F.lit(FP_MOD)),
    )
    return df.select("doc_id", fp.alias("fingerprint"))


def repetition_stats(df: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document (repetitious text
    is the #1 cut in LLM corpus curation):

    * dup_token_frac   — 1 - |distinct| / n (overall repetition)
    * top_token_frac   — occurrences of the most frequent token / n
    * dup_bigram_frac  — fraction of adjacent equal-token pairs

    Pure JVM array expressions, embarrassingly parallel, no shuffle
    anywhere. The top-token count is sort-based: array_sort once
    (O(n log n)) then ONE aggregate fold tracking the longest run of
    equal adjacent tokens — a mostly-unique 100k-token document (the
    Gopher max) costs ~100k comparisons, not the ~10^10 of the naive
    per-distinct-token rescan (O(n_uniq * n)) this replaces; bounded
    runtime on a high-entropy 100k-token doc is pinned in
    tests/test_textops.py.
    """
    toks = _tokens()
    n = F.size(toks)
    # longest equal-run in the sorted token array == max token count.
    # split() never yields nulls and n >= 1 (split of '' is ['']), so
    # the empty-string init sentinel is safe: run restarts at 1 on any
    # first token, including ''. (acc.run starts 0 -> ''+1 = 1.)
    run0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("int").alias("best"),
    )
    top = F.aggregate(
        F.array_sort(toks),
        run0,
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    adj_dups = F.size(
        F.filter(
            F.zip_with(
                F.slice(toks, 1, n - 1),
                F.slice(toks, 2, n - 1),
                lambda a, b: a == b,
            ),
            lambda v: v,
        )
    )
    return df.select(
        "doc_id",
        F.round(1.0 - F.size(F.array_distinct(toks)) / n.cast("double"), 4).alias(
            "dup_token_frac"
        ),
        F.round(top / n.cast("double"), 4).alias("top_token_frac"),
        F.round(
            F.when(n > 1, adj_dups / (n - 1).cast("double")).otherwise(0.0), 4
        ).alias("dup_bigram_frac"),
    )


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PII_LONG_DIGITS = r"\d{7,}"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, IPv4 addresses and long digit runs (phone/account
    numbers) — the standard pre-training scrub pass. Returns
    (doc_id, clean_text, n_redactions); patterns are RE2-compatible so
    the DuckDB oracle runs the identical regexes.

    Order matters: emails first (their domains contain dots that the
    IP pattern must not see), IPs before bare digit runs.
    """
    c = F.col(text_col)
    n_red = (
        F.regexp_count(c, F.lit(PII_EMAIL))
        + F.regexp_count(F.regexp_replace(c, PII_EMAIL, "<EMAIL>"), F.lit(PII_IPV4))
        + F.regexp_count(
            F.regexp_replace(
                F.regexp_replace(c, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
            ),
            F.lit(PII_LONG_DIGITS),
        )
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_LONG_DIGITS,
        "<NUM>",
    )
    return df.select(
        "doc_id",
        clean.alias("clean_text"),
        n_red.cast("bigint").alias("n_redactions"),
    )


GOPHER_MIN_TOKENS = 10
GOPHER_MAX_TOKENS = 100_000
GOPHER_WORD_LEN_LO = 2.0
GOPHER_WORD_LEN_HI = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2


def gopher_rules(df: DataFrame) -> DataFrame:
    """Gopher-rule document filter signals + keep flag: token-count
    bounds, mean word length band, fraction of words containing an
    alphabetic character, and a minimum stopword count — the published
    corpus-curation rules re-expressed as one codegen'd projection."""
    toks = _tokens()
    n = F.size(toks)
    mean_len = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
    ) / n.cast("double")
    alpha_frac = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ) / n.cast("double")
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    keep = (
        (n >= GOPHER_MIN_TOKENS)
        & (n <= GOPHER_MAX_TOKENS)
        & (mean_len >= GOPHER_WORD_LEN_LO)
        & (mean_len <= GOPHER_WORD_LEN_HI)
        & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
        & (n_stop >= GOPHER_MIN_STOPWORDS)
    )
    return df.select(
        "doc_id",
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        n_stop.cast("bigint").alias("n_stopwords"),
        keep.cast("int").alias("keep"),
    )


def vocab_with_idf(df: DataFrame, min_df: int = 1) -> DataFrame:
    """Corpus vocabulary with document frequencies and smoothed IDF
    (the sklearn convention: ln((1 + n_docs) / (1 + df)) + 1) —
    the vocabulary-building pass every tokenizer/TF-IDF pipeline
    runs over a corpus.

    One explode over per-doc DISTINCT tokens (so tf within a doc
    never inflates df) -> one map-side-combined groupBy. The corpus
    total rides a 1-row broadcast; no driver collect. ``min_df``
    prunes the hapax tail (at web scale the tail IS the table —
    pruning it in the same aggregation avoids a second pass).
    """
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    counts = (
        df.select(
            "doc_id", F.explode(F.array_distinct(_tokens())).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .where(F.col("df") >= min_df)
    )
    return counts.crossJoin(F.broadcast(n_docs)).select(
        "token",
        "df",
        F.round(
            F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0, 6
        ).alias("idf"),
    )


def tfidf_topk(df: DataFrame, k: int = 3, min_df: int = 2) -> DataFrame:
    """Top-k TF-IDF terms per document — the keyword/topic-signal pass
    of a corpus pipeline (and the dense end of a TF-IDF vectorizer).

    tf = raw term count per (doc, token); idf from
    :func:`vocab_with_idf` (sklearn smoothing, min_df prunes hapax);
    ties broken deterministically by token ascending so the output is
    oracle-checkable.

    Scale shape: ONE corpus explode + map-side-combined groupBy for
    tf, document frequency as a token-window count over the tf table
    itself (no second scan, no vocabulary join — the window shuffles
    the same bytes on the same key a join would), one per-doc window
    for the top-k. No Python anywhere.
    """
    from pyspark.sql import Window as W

    tf = (
        df.select("doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    # document frequency FROM the tf table via a token window (a tf
    # row per (doc, token) == one count per doc): ONE corpus explode
    # total and no vocabulary join — the window shuffles the same
    # bytes on the same key the join would, without the second scan.
    # idf formula identical to vocab_with_idf (sklearn smoothing).
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    w_tok = W.partitionBy("token")
    scored = (
        tf.withColumn(
            "df", F.count(F.lit(1)).over(w_tok).cast("bigint")
        )
        .where(F.col("df") >= min_df)
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf",
            F.round(
                F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0, 6
            ),
        )
        .withColumn("score", F.col("tf") * F.col("idf"))
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "doc_id",
            "rnk",
            "token",
            "tf",
            F.round("score", 6).alias("tfidf"),
        )
    )


def chunk_documents(
    df: DataFrame, chunk_tokens: int = 128, stride: int | None = None
) -> DataFrame:
    """Split each document into fixed-size token windows — the
    context-window chunking pass of a training/RAG pipeline. Chunk i
    covers tokens [i*stride, i*stride + chunk_tokens); the default
    stride == chunk_tokens gives disjoint chunks, smaller strides give
    sliding-window overlap. Standard sliding-window stop rule: window
    generation ends once a window reaches the end of the document
    (n_chunks = 1 + ceil((n - chunk_tokens)/stride), floored at 1), so
    no trailing window is fully contained in its predecessor. The last
    chunk may be short; every token appears in >= 1 chunk.

    Output: (doc_id, chunk_idx, n_chunk_tokens, chunk_text). Pure JVM
    (sequence + slice + posexplode), whole-stage codegen, no shuffle —
    a map-only operator at any scale. Exact DuckDB oracle.
    """
    if stride is None:
        stride = chunk_tokens
    if stride <= 0 or chunk_tokens <= 0 or stride > chunk_tokens:
        raise ValueError("need 0 < stride <= chunk_tokens")
    toks = _tokens()
    n = F.size(toks)
    # per-doc token counts are int32 — exact in the double ceil below
    n_chunks = (
        F.lit(1)
        + F.greatest(
            F.lit(0), F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride))
        )
    ).cast("int")
    return df.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
            )
        ).alias("chunk_idx", "__chunk"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.size("__chunk").cast("bigint").alias("n_chunk_tokens"),
        F.array_join("__chunk", " ").alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame, target_tokens: int = 512, bucket_width: int = 1000
) -> DataFrame:
    """Sequence packing: concatenate all documents in doc_id order into
    one conceptual token stream and cut it every ``target_tokens`` —
    the GPT-style pretraining packing where documents cross bin
    boundaries. Each doc reports where its first token lands.

    Output: (doc_id, n_tokens, bin_id, bin_offset) with
    bin_id = floor(tokens_before / target), offset = tokens_before %
    target, tokens_before = exact prefix sum of n_tokens in doc_id
    order.

    Scale shape — the global prefix sum is TWO-PHASE, never a global
    window (``Window.orderBy`` with no partition key funnels the whole
    corpus through ONE task): (1) cumsum within doc_id//bucket_width
    buckets (hash-partitioned window), (2) per-bucket totals (one tiny
    aggregate, bucket count = ids/bucket_width) cumsum'd and joined
    back broadcast. The bucketing key is monotone in doc order, so
    bucket-offset + within-bucket prefix == the global prefix exactly;
    the oracle recomputes it with a plain global window in SQL.
    """
    from pyspark.sql import Window as W

    n_tok = df.select(
        "doc_id",
        F.col("doc_id").cast("long").alias("__did"),
        F.size(_tokens()).cast("bigint").alias("n_tokens"),
    ).withColumn(
        "bucket", F.floor(F.col("__did") / F.lit(bucket_width))
    )
    w_in = (
        W.partitionBy("bucket")
        .orderBy("__did")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    within = n_tok.withColumn("cum_in", F.sum("n_tokens").over(w_in))
    # bucket totals are ONE row per bucket — cumsum over them via a
    # broadcast-joined running total (bucket table is tiny by
    # construction, |ids| / bucket_width rows)
    w_b = W.orderBy("bucket").rowsBetween(
        W.unboundedPreceding, -1
    )
    totals = (
        n_tok.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("tot"))
        .withColumn(
            "bucket_offset",
            F.coalesce(F.sum("tot").over(w_b), F.lit(0).cast("bigint")),
        )
        .select("bucket", "bucket_offset")
    )
    # bin arithmetic stays in BIGINT end to end: '/' on longs yields
    # DOUBLE, which loses integer precision past 2^53 — a real risk for
    # a global token prefix sum at the 100 TB design point. DIV is
    # Spark's integer division; tokens_before is nonnegative, so
    # DIV/pmod agree with floor/mod exactly.
    out = (
        within.join(F.broadcast(totals), "bucket")
        .withColumn(
            "__tokens_before",
            (F.col("bucket_offset") + F.col("cum_in") - F.col("n_tokens")),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"__tokens_before DIV {int(target_tokens)}").alias(
                "bin_id"
            ),
            F.pmod(F.col("__tokens_before"), F.lit(target_tokens))
            .cast("bigint")
            .alias("bin_offset"),
        )
    )
    return out


def top_ngrams(df: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-wide most frequent n-grams — the vocabulary/collocation
    audit every corpus build runs. One explode + map-side-combined
    groupBy + global top-k (rank window over the aggregated table,
    which is vocabulary-sized, not corpus-sized). Deterministic ties
    by ngram ascending.
    """
    toks = _tokens()
    size = F.size(toks)
    # guard short docs explicitly: sequence(1, 0) DESCENDS in Spark,
    # so a doc with < n tokens must yield an empty gram array instead
    grams = F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(1), size - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from pyspark.sql import Window as W

    counts = (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
    )
    w = W.orderBy(F.desc("n_occurrences"), F.asc("ngram"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("rnk", "ngram", "n_occurrences")
    )


def pmi_collocations(
    df: DataFrame, window: int = 2, min_count: int = 5, k: int = 20
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over
    directional skip-gram pairs (offsets 1..window) — the classic
    distributional-statistics pass (word2vec-era co-occurrence
    counting) and a phrase-mining primitive.

    pmi(a,b) = ln( (c_ab / T_pairs) / ((c_a / T_tok) * (c_b / T_tok)) )
    with c_ab counted over all (token_i, token_{i+off}) pairs,
    off in 1..window, and unigram counts over all tokens. Pairs with
    c_ab < min_count are pruned (rare-pair PMI is noise). Deterministic
    ties by (tok_a, tok_b).

    Scale shape: pair generation is a per-doc JVM expression (zip of
    the token array with its own shifted slices — no self-join), ONE
    map-side-combined groupBy for pair counts, one for unigrams, two
    broadcast-able marginal joins on single tokens, 1-row totals ride
    broadcasts. Exact DuckDB oracle.
    """
    from pyspark.sql import Window as W

    toks = _tokens()
    n = F.size(toks)
    pair_arrays = [
        F.when(
            n > off,
            F.zip_with(
                F.slice(toks, 1, n - off),
                F.slice(toks, off + 1, n - off),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        for off in range(1, window + 1)
    ]
    pairs = (
        df.select(F.explode(F.flatten(F.array(*pair_arrays))).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
        .where(F.col("c_ab") >= min_count)
        .select(
            F.split("pair", " ")[0].alias("tok_a"),
            F.split("pair", " ")[1].alias("tok_b"),
            "c_ab",
        )
    )
    uni = (
        df.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    t_tok = df.agg(F.sum(n).cast("double").alias("t_tok"))
    t_pairs = df.agg(
        F.sum(
            sum(
                (F.greatest(n - off, F.lit(0)) for off in range(1, window + 1)),
                F.lit(0),
            )
        ).cast("double").alias("t_pairs")
    )
    scored = (
        pairs.join(uni.select(F.col("tok").alias("tok_a"),
                              F.col("c").alias("c_a")), "tok_a")
        .join(uni.select(F.col("tok").alias("tok_b"),
                         F.col("c").alias("c_b")), "tok_b")
        .crossJoin(F.broadcast(t_tok))
        .crossJoin(F.broadcast(t_pairs))
        .withColumn(
            "pmi",
            F.log(
                (F.col("c_ab") / F.col("t_pairs"))
                / ((F.col("c_a") / F.col("t_tok"))
                   * (F.col("c_b") / F.col("t_tok")))
            ),
        )
    )
    w = W.orderBy(F.desc("pmi"), F.asc("tok_a"), F.asc("tok_b"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "rnk", "tok_a", "tok_b", "c_ab", F.round("pmi", 6).alias("pmi")
        )
    )


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    bucket_factor: int = 32,
) -> DataFrame:
    """Okapi BM25 top-k retrieval over the corpus for a bounded query
    set — the retrieval primitive behind decontamination-by-retrieval,
    eval-set nearest-neighbor audits, and quality-by-query corpus
    probes. Lucene idf variant: ln(1 + (N - df + 0.5)/(df + 0.5)).

    Scale shape: query terms are a driver-side literal broadcast; the
    corpus explode is filtered to the query VOCABULARY before the tf
    groupBy, so the shuffled tf table is (docs containing a query
    term) x (query terms), not the corpus vocabulary. Document
    frequency comes from a token window over that same tf table (the
    filter preserves every doc containing the term, so df is exact —
    no second scan). Corpus stats (N, avgdl) are ONE 1-row broadcast
    agg. The per-query top-k runs two-phase: a partial top-k per
    (query, doc-bucket) bounds any single task at ~bucket_factor x k
    rows per query, then a global window over the ≤ bucket_factor*k
    survivors applies the same ordering — identical result to a
    single global window without the single-reducer-per-query skew.
    No Python anywhere.

    Determinism contract with the SQL oracle: idf is rounded to 6
    decimals (a pure function of integers), the per-term contribution
    mirrors the oracle's arithmetic exactly, and ranking orders by
    round(score, 9) with doc_id tie-break so the 1e-16 sum-order
    noise of a distributed aggregation can't flip ranks.
    """
    from pyspark.sql import Window as W

    spark = df.sparkSession
    qterms = spark.createDataFrame(
        [
            (int(qid), tok)
            for qid, qtext in queries
            for tok in sorted(set(qtext.split(" ")))
            if tok
        ],
        "qid bigint, token string",
    )
    vocab = sorted({t for _, qtext in queries for t in qtext.split(" ") if t})

    base = df.select("doc_id", _tokens().alias("toks"))
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
    )
    tf = (
        base.select(
            "doc_id",
            F.size("toks").cast("bigint").alias("dl"),
            F.explode("toks").alias("token"),
        )
        .where(F.col("token").isin(vocab))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    w_tok = W.partitionBy("token")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(w_tok).cast("bigint"))
        .join(F.broadcast(qterms), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.round(
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ),
                6,
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * ((1.0 - b) + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("qid", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    order = [F.desc(F.round(F.col("score"), 9)), F.asc("doc_id")]
    w_part = W.partitionBy(
        "qid", F.pmod(F.col("doc_id"), F.lit(bucket_factor))
    ).orderBy(*order)
    w_full = W.partitionBy("qid").orderBy(*order)
    return (
        scored.withColumn("prnk", F.row_number().over(w_part))
        .where(F.col("prnk") <= k)
        .withColumn("rnk", F.row_number().over(w_full))
        .where(F.col("rnk") <= k)
        .select(
            "qid", "rnk", "doc_id", F.round("score", 6).alias("bm25")
        )
    )


def rrf_fuse(
    df: DataFrame,
    score_cols: list[str],
    id_col: str = "doc_id",
    k: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR
    2009): combine several rankings of the same rows into one score

        rrf(d) = sum_i 1 / (k + rank_i(d)),

    the standard way hybrid retrieval stacks merge a lexical (BM25)
    and an embedding ranking without score calibration. Each column
    of ``score_cols`` defines one ranking: score DESCENDING, ties
    broken by ``id_col`` ascending (total order, deterministic).
    Rows with a NULL score rank after all non-NULL scores (NULLS
    LAST), still tie-broken by id — every row gets a finite rank in
    every ranking.

    Scale shape — no global row window anywhere: each ranking is
    computed as rank(d) = (# rows with a strictly better score) +
    (row_number among score-ties). The first term comes from the
    score-value histogram (groupBy(score) with map-side combine;
    the only unpartitioned window runs over DISTINCT SCORE VALUES,
    the house contract, cf. evaluation.auc_exact) joined back on
    the score value; the second is a window PARTITIONED by the
    score value (bounded by the largest tie class). The fused sum
    is a fixed-order scalar expression over the per-row ranks — no
    aggregation — so it is bit-reproducible by the SQL oracle.

    Output: (id_col, rank_<c> for each score column, rrf), one row
    per input row. Feed it to a top-n filter downstream; rrf is NOT
    rounded here."""
    from pyspark.sql import Window as W

    if not score_cols:
        raise ValueError("score_cols must be non-empty")
    dec = "decimal(38,0)"
    out = df.select(id_col, *score_cols)
    for c in score_cols:
        hist = (
            out.groupBy(c)
            .agg(F.count(F.lit(1)).cast(dec).alias("__n"))
        )
        # strictly-better count: cumulative histogram over distinct
        # score values, best first, NULLs last
        w_cum = W.orderBy(
            F.desc_nulls_last(c)
        ).rowsBetween(W.unboundedPreceding, -1)
        hist = hist.select(
            F.col(c).alias("__v"),
            F.coalesce(
                F.sum("__n").over(w_cum), F.lit(0).cast(dec)
            ).cast("bigint").alias("__above"),
        )
        w_tie = W.partitionBy(c).orderBy(F.asc(id_col))
        out = (
            out.join(hist, out[c].eqNullSafe(hist["__v"]), "left")
            .drop("__v")
            .withColumn(
                f"rank_{c}",
                F.col("__above") + F.row_number().over(w_tie),
            )
            .drop("__above")
        )
    rrf = None
    for c in score_cols:
        term = F.lit(1.0) / (
            F.lit(float(k)) + F.col(f"rank_{c}").cast("double")
        )
        rrf = term if rrf is None else rrf + term
    return out.select(
        id_col, *[f"rank_{c}" for c in score_cols], rrf.alias("rrf")
    )


def keyness_llr(
    df: DataFrame,
    focus: Column,
    k: int = 25,
) -> DataFrame:
    """Top-k keyness terms by Dunning's log-likelihood ratio G^2
    (Dunning 1993) between the FOCUS slice (rows where ``focus`` is
    true) and the rest of the corpus — the calibrated "what words
    characterize this slice" readout beside tf-idf (per-doc salience)
    and PMI (collocation): per whitespace token with focus/rest
    frequencies a/b and slice totals A/B,

        G2 = 2 * (a * ln(a / Ea) + b * ln(b / Eb)),
        Ea = (a + b) * A / (A + B),  Eb = (a + b) * B / (A + B)

    zero cells contribute 0 (lim o->0 of o ln(o/e)); ``direction``
    is +1 when the term is focus-overrepresented (a * B > b * A),
    -1 otherwise. Every G2 is a pure scalar of four exact integer
    counts — deterministic at any parallelism — and the ranking
    (G2 desc, token asc) is therefore stable.

    Scale shape: one explode -> groupBy(token) with map-side combine
    (vocabulary-sized), a 1-row broadcast for the slice totals, and
    the top-k window over the vocabulary table. Rows with NULL text
    or NULL focus are dropped. Output: (rnk, token, n_focus, n_rest,
    llr, direction)."""
    from pyspark.sql import Window as W

    dec = "decimal(38,0)"
    base = df.where(F.col("text").isNotNull() & focus.isNotNull())
    toks = base.select(
        focus.alias("__f"),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    )
    per = toks.groupBy("token").agg(
        F.sum(F.when(F.col("__f"), 1).otherwise(0))
        .cast(dec)
        .alias("a"),
        F.sum(F.when(F.col("__f"), 0).otherwise(1))
        .cast(dec)
        .alias("b"),
    )
    tot = per.agg(
        F.sum("a").alias("__ta"), F.sum("b").alias("__tb")
    )
    g = per.crossJoin(F.broadcast(tot))
    a, b = F.col("a").cast("double"), F.col("b").cast("double")
    ta, tb = (
        F.col("__ta").cast("double"),
        F.col("__tb").cast("double"),
    )
    ab = (F.col("a") + F.col("b")).cast("double")
    tt = (F.col("__ta") + F.col("__tb")).cast("double")
    ea = ab * ta / tt
    eb = ab * tb / tt
    llr = F.lit(2.0) * (
        F.when(F.col("a") > 0, a * F.log(a / ea)).otherwise(F.lit(0.0))
        + F.when(F.col("b") > 0, b * F.log(b / eb)).otherwise(
            F.lit(0.0)
        )
    )
    scored = g.select(
        "token",
        F.col("a").cast("bigint").alias("n_focus"),
        F.col("b").cast("bigint").alias("n_rest"),
        llr.alias("llr"),
        F.when(
            F.col("a") * F.col("__tb") > F.col("b") * F.col("__ta"),
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("direction"),
    )
    w = W.orderBy(F.desc("llr"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("rnk", "token", "n_focus", "n_rest", "llr",
                "direction")
    )


def zipf_fit(
    df: DataFrame,
    group_col: str = "source",
    top_k: int = 100,
    unit: int = 10**9,
) -> DataFrame:
    """Per-slice Zipf fit over the word rank-frequency curve: OLS of
    ln(freq) on ln(rank) across the slice's ``top_k`` whitespace
    tokens — the corpus-health audit beside Benford (a natural-
    language slice shows slope near -1; boilerplate/spam/template
    slices go shallow or steep, so a drifting slope flags a source
    before any model sees it).

    Ranking is deterministic: (count desc, token asc). Each fitted
    point contributes ln(rank), ln(freq) and their products QUANTIZED
    to integer 1/``unit`` units before the cross-rank sums (house
    rule: float sums over the rank table would drift with partial-
    aggregation order); the slope's covariance/variance terms mix
    single- and double-quantized sums, so the single-quantized ones
    are re-scaled by ``unit`` IN INTEGER ARITHMETIC first —
    everything up to the final float division is exact DECIMAL, so a
    SQL oracle replays it digit-for-digit. All logs are of counts or
    ranks >= 1, so every quantized term is non-negative and floor is
    unambiguous.

    Scale shape: one explode -> map-side-combined groupBy(group,
    token) (vocabulary-sized), a per-group rank window over that
    vocabulary table, and a |groups|-sized final aggregate. Output:
    (group, vocab, m, slope, intercept, r2); fit columns NULL when
    fewer than 2 ranks. Empty tokens from split() are kept (the
    split convention all text kernels share)."""
    from pyspark.sql import Window as W

    dec = "decimal(38,0)"
    toks = df.where(F.col("text").isNotNull()).select(
        F.col(group_col),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    )
    cnt = toks.groupBy(group_col, "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy(group_col).orderBy(
        F.col("c").desc(), F.col("token").asc()
    )
    vocab = cnt.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab")
    )
    ranked = cnt.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= int(top_k)
    )
    u = F.lit(float(unit))
    lx = F.log(F.col("rnk").cast("double"))
    ly = F.log(F.col("c").cast("double"))
    q = ranked.select(
        group_col,
        F.floor(lx * u).cast(dec).alias("qx"),
        F.floor(ly * u).cast(dec).alias("qy"),
        F.floor(lx * lx * u).cast(dec).alias("qxx"),
        F.floor(lx * ly * u).cast(dec).alias("qxy"),
        F.floor(ly * ly * u).cast(dec).alias("qyy"),
    )
    g = q.groupBy(group_col).agg(
        F.count(F.lit(1)).cast(dec).alias("__m"),
        F.sum("qx").alias("__sx"),
        F.sum("qy").alias("__sy"),
        F.sum("qxx").alias("__sxx"),
        F.sum("qxy").alias("__sxy"),
        F.sum("qyy").alias("__syy"),
    )
    ui = F.lit(int(unit)).cast(dec)
    m = F.col("__m")
    cov = (m * F.col("__sxy") * ui - F.col("__sx") * F.col("__sy")).cast(
        "double"
    )
    vx = (m * F.col("__sxx") * ui - F.col("__sx") * F.col("__sx")).cast(
        "double"
    )
    vy = (m * F.col("__syy") * ui - F.col("__sy") * F.col("__sy")).cast(
        "double"
    )
    slope = cov / vx
    intercept = (
        F.col("__sy").cast("double")
        - slope * F.col("__sx").cast("double")
    ) / (m.cast("double") * u)
    ok = (m >= 2) & (vx > 0)
    return g.join(vocab, group_col).select(
        group_col,
        "vocab",
        m.cast("bigint").alias("m"),
        F.when(ok, slope).alias("slope"),
        F.when(ok, intercept).alias("intercept"),
        F.when(ok & (vy > 0), cov * cov / (vx * vy)).alias("r2"),
    )


def heaps_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_checkpoints: int = 8,
    unit: int = 10**9,
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit V(N) ~= K * N^beta — the
    companion corpus-health audit to zipf_fit (Zipf reads the
    frequency curve at one corpus size; Heaps reads how vocabulary
    GROWS with corpus size — natural text sits near beta 0.4-0.6,
    template/boilerplate corpora flatten, id-heavy corpora inflate):

    The growth curve is sampled WITHOUT any ordered scan: prefix
    membership is by ``id_col`` value against ``n_checkpoints``
    integer thresholds c_k = min_id + ceil((max_id-min_id)*k/K)
    (exact integer arithmetic), V(c) = |{words whose MIN doc id
    <= c}| and N(c) = total tokens over docs with id <= c — both
    conditional counts over bounded tables (vocabulary-sized /
    doc-count-sized). beta is the OLS slope of ln V on ln N over the
    K points, with the zipf_fit quantize-and-rescale rule so the fit
    is SQL-replayable; log_k is the intercept (ln of Heaps' K).

    Scale shape: ONE token explode feeding two map-side-combined
    aggregations (per-doc token counts — checkpointed, doc-count-
    sized and narrow — and per-word first doc id), a 1-row range
    aggregate, K-way conditional rollups of those bounded tables,
    and a K-point fit. Output: one row (n_docs, vocab, m, beta,
    log_k, r2); fit NULL when fewer than 2 distinct checkpoints
    carry mass or the N values are constant."""
    dec = "decimal(38,0)"
    toks = df.where(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.col(text_col), " ")).alias("__t"),
    )
    counts = (
        toks.groupBy("__id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__tn"))
        # doc-count-sized and narrow; feeds the range aggregate and
        # the K-way rollup — materialize once
        .localCheckpoint(eager=True)
    )
    firsts = toks.groupBy("__t").agg(
        F.min("__id").alias("__fid")
    )
    rng = counts.agg(
        F.min("__id").alias("__lo"),
        F.max("__id").alias("__hi"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    k_lit = F.lit(int(n_checkpoints))
    cks = rng.select(
        "n_docs",
        F.explode(F.sequence(F.lit(1), k_lit)).alias("__k"),
        "__lo",
        "__hi",
    ).select(
        "n_docs",
        (
            F.col("__lo")
            + F.expr(
                f"CAST(((__hi - __lo) * __k + {int(n_checkpoints)}"
                f" - 1) DIV {int(n_checkpoints)} AS BIGINT)"
            )
        ).alias("__c"),
    ).distinct()
    nN = (
        counts.crossJoin(F.broadcast(cks))
        .where(F.col("__id") <= F.col("__c"))
        .groupBy("__c")
        .agg(F.sum("__tn").cast("bigint").alias("__N"))
    )
    vV = (
        firsts.crossJoin(F.broadcast(cks.select("__c")))
        .where(F.col("__fid") <= F.col("__c"))
        .groupBy("__c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__V"))
    )
    pts = nN.join(vV, "__c")
    u = F.lit(float(unit))
    lx = F.log(F.col("__N").cast("double"))
    ly = F.log(F.col("__V").cast("double"))
    q = pts.select(
        F.floor(lx * u).cast(dec).alias("qx"),
        F.floor(ly * u).cast(dec).alias("qy"),
        F.floor(lx * lx * u).cast(dec).alias("qxx"),
        F.floor(lx * ly * u).cast(dec).alias("qxy"),
        F.floor(ly * ly * u).cast(dec).alias("qyy"),
    )
    g = q.agg(
        F.count(F.lit(1)).cast(dec).alias("__m"),
        F.sum("qx").alias("__sx"),
        F.sum("qy").alias("__sy"),
        F.sum("qxx").alias("__sxx"),
        F.sum("qxy").alias("__sxy"),
        F.sum("qyy").alias("__syy"),
    )
    ui = F.lit(int(unit)).cast(dec)
    m = F.col("__m")
    cov = (
        m * F.col("__sxy") * ui - F.col("__sx") * F.col("__sy")
    ).cast("double")
    vx = (
        m * F.col("__sxx") * ui - F.col("__sx") * F.col("__sx")
    ).cast("double")
    vy = (
        m * F.col("__syy") * ui - F.col("__sy") * F.col("__sy")
    ).cast("double")
    beta = cov / vx
    log_k = (
        F.col("__sy").cast("double")
        - beta * F.col("__sx").cast("double")
    ) / (m.cast("double") * u)
    ok = (m >= 2) & (vx > 0)
    vocab = firsts.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab")
    )
    return (
        g.crossJoin(F.broadcast(rng.select("n_docs")))
        .crossJoin(F.broadcast(vocab))
        .select(
            "n_docs",
            "vocab",
            m.cast("bigint").alias("m"),
            F.when(ok, beta).alias("beta"),
            F.when(ok, log_k).alias("log_k"),
            F.when(ok & (vy > 0), cov * cov / (vx * vy)).alias("r2"),
        )
    )


def readability(df: DataFrame) -> DataFrame:
    """Per-document readability scores from pure character/word/
    sentence counting — the corpus-quality signals that need NO
    syllable dictionary (Flesch does), so they stay deterministic
    and engine-reproducible:

      ARI  = 4.71 * chars/words + 0.5 * words/sentences - 21.43
             (Automated Readability Index, Senter & Smith 1967)
      CLI  = 0.0588 * L - 0.296 * S - 15.8
             (Coleman-Liau 1975; L = letters per 100 words,
              S = sentences per 100 words)

    with chars = alphanumeric characters, words = maximal
    alphanumeric runs, sentences = maximal runs of ``.!?``
    (floored at 1 — headline-style fragments score as one
    sentence, the standard guard). Both scores approximate a US
    grade level; in a cleaning pipeline they catch boilerplate
    (absurdly high) and keyboard mash / tag soup (negative) that
    length and stopword ratios miss.

    Pure codegen'd projection (regexp counts + one float expression
    with literal coefficients, shared verbatim with the SQL oracle);
    streaming-safe. Output: (doc_id, n_letters, n_words,
    n_sentences, ari, cli) — scores NULL when the text has no
    words."""
    letters = F.regexp_count(F.col("text"), F.lit("[A-Za-z]"))
    chars = F.regexp_count(F.col("text"), F.lit("[A-Za-z0-9]"))
    words = F.regexp_count(F.col("text"), F.lit("[A-Za-z0-9]+"))
    sents = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)
    )
    wd = words.cast("double")
    ari = (
        F.lit(4.71) * chars.cast("double") / wd
        + F.lit(0.5) * wd / sents.cast("double")
        - F.lit(21.43)
    )
    cli = (
        F.lit(0.0588) * (letters.cast("double") / wd * F.lit(100.0))
        - F.lit(0.296) * (sents.cast("double") / wd * F.lit(100.0))
        - F.lit(15.8)
    )
    return df.select(
        "doc_id",
        letters.cast("bigint").alias("n_letters"),
        words.cast("bigint").alias("n_words"),
        sents.cast("bigint").alias("n_sentences"),
        F.when(words > 0, ari).alias("ari"),
        F.when(words > 0, cli).alias("cli"),
    )


def vocab_richness(
    df: DataFrame, group_col: str = "source"
) -> DataFrame:
    """Per-slice vocabulary-richness audit from the count-of-counts
    tail: hapax/dis legomena, the Chao1 lower bound on TRUE
    vocabulary size and the Good-Turing unseen-probability mass —
    the "how much of this slice's vocabulary have we actually seen?"
    companion to heaps_fit (growth curve) and zipf_fit (shape):

        chao1     = V + f1 (f1 - 1) / (2 (f2 + 1))
                    (bias-corrected Chao 1984, defined at f2 = 0)
        gt_unseen = f1 / N
                    (Good 1953: probability the NEXT token is novel)

    with V distinct tokens, N total tokens, f1/f2 tokens seen
    exactly once/twice. A slice where gt_unseen stays high after
    millions of tokens is template/ID noise, not language; chao1 >>
    V says sampling has not covered the slice yet.

    Scale shape: one explode -> map-side-combined groupBy(group,
    token) to the vocabulary table, then one |groups|-sized rollup;
    every statistic is an exact integer until the two final float
    divisions (identical in the SQL oracle). Empty tokens from
    split() are kept (the split convention all text kernels share).
    Output: (group, n_tokens, vocab, f1, f2, chao1, gt_unseen)."""
    dec = "decimal(38,0)"
    toks = df.where(F.col("text").isNotNull()).select(
        F.col(group_col),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    )
    cnt = toks.groupBy(group_col, "token").agg(
        F.count(F.lit(1)).cast(dec).alias("c")
    )
    g = cnt.groupBy(group_col).agg(
        F.sum("c").alias("__n"),
        F.count(F.lit(1)).cast(dec).alias("__v"),
        F.sum((F.col("c") == 1).cast("int")).cast(dec).alias("__f1"),
        F.sum((F.col("c") == 2).cast("int")).cast(dec).alias("__f2"),
    )
    v = F.col("__v").cast("double")
    f1 = F.col("__f1").cast("double")
    f2 = F.col("__f2").cast("double")
    n = F.col("__n").cast("double")
    return g.select(
        F.col(group_col),
        F.col("__n").cast("bigint").alias("n_tokens"),
        F.col("__v").cast("bigint").alias("vocab"),
        F.col("__f1").cast("bigint").alias("f1"),
        F.col("__f2").cast("bigint").alias("f2"),
        (
            v
            + f1 * (f1 - F.lit(1.0))
            / (F.lit(2.0) * (f2 + F.lit(1.0)))
        ).alias("chao1"),
        (f1 / n).alias("gt_unseen"),
    )


def vocab_overlap(
    df: DataFrame, group_col: str = "source"
) -> DataFrame:
    """EXACT pairwise vocabulary overlap between slices — the
    ground-truth companion to the KMV sketch overlap
    (sketches.kmv_intersect_estimate): Jaccard and both containment
    directions of the distinct-token sets, for "are these two
    sources the same crawl under different names?" audits where the
    sketch's ±6% band is too coarse.

        jaccard(a,b)     = |Va n Vb| / |Va u Vb|
        containment(a,b) = |Va n Vb| / |Va|       (and / |Vb|)

    Scale shape: one explode -> distinct (group, token) vocabulary
    table; the intersection comes from ONE self-equi-join ON TOKEN
    over that table (vocabulary-sized, never corpus-sized; hot
    tokens fan out at most |groups| ways, bounded); set sizes are
    exact integers, three divisions at the end. Output: (group_a,
    group_b, v_a, v_b, n_common, jaccard, contain_a, contain_b)
    for group_a < group_b — pairs with an EMPTY intersection are
    omitted (they never materialize in the join; a full
    groups-cross-groups zero grid would say nothing the sizes
    don't)."""
    voc = (
        df.where(F.col("text").isNotNull())
        .select(
            F.col(group_col),
            F.explode(F.split(F.col("text"), " ")).alias("token"),
        )
        .distinct()
    )
    sizes = voc.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__v")
    )
    a = voc.select(
        F.col(group_col).alias("ga"), F.col("token").alias("token")
    )
    b = voc.select(
        F.col(group_col).alias("gb"), F.col("token").alias("token")
    )
    common = (
        a.join(b, "token")
        .where(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sizes.select(
        F.col(group_col).alias("ga"), F.col("__v").alias("v_a")
    )
    sb = sizes.select(
        F.col(group_col).alias("gb"), F.col("__v").alias("v_b")
    )
    return (
        common.join(sa, "ga")
        .join(sb, "gb")
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "v_a",
            "v_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("v_a") + F.col("v_b") - F.col("n_common"))
                .cast("double")
            ).alias("jaccard"),
            (
                F.col("n_common").cast("double")
                / F.col("v_a").cast("double")
            ).alias("contain_a"),
            (
                F.col("n_common").cast("double")
                / F.col("v_b").cast("double")
            ).alias("contain_b"),
        )
    )


def lexical_diversity(
    df: DataFrame, group_col: str = "source"
) -> DataFrame:
    """Per-slice lexical-diversity constants from the same
    count-of-counts collapse as :func:`vocab_richness` — the
    LENGTH-ROBUST repetitiveness readouts (type-token ratio decays
    with N, so cross-slice TTR comparisons lie; these three are the
    standard corrections):

        yule_k    = 10^4 (sum_m m^2 V_m - N) / N^2
                    (Yule 1944 — repetitiveness of the token
                    distribution, ~length-invariant)
        simpson_d = sum_m m (m - 1) V_m / (N (N - 1))
                    (probability two random tokens are the same
                    type)
        herdan_c  = ln V / ln N
                    (log-log type-token slope)

    with V_m = #types occurring exactly m times, V total types, N
    total tokens. Every numerator (sum_m m^2 V_m = sum over the
    vocabulary of c^2, etc.) is an exact DECIMAL integer off the
    vocabulary table; each constant is ONE float expression —
    replayable by any SQL engine. Empty tokens from split() are
    kept (the shared split convention).

    Scale shape: one explode -> map-side-combined groupBy(group,
    token), then a |groups|-sized rollup. Output: (group, n_tokens,
    v_types, yule_k, simpson_d, herdan_c); yule/simpson NULL when
    N < 2, herdan NULL when N <= 1 or V <= 1."""
    dec = "decimal(38,0)"
    toks = df.where(F.col("text").isNotNull()).select(
        F.col(group_col),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    )
    cnt = toks.groupBy(group_col, "token").agg(
        F.count(F.lit(1)).cast(dec).alias("c")
    )
    g = cnt.groupBy(group_col).agg(
        F.sum("c").alias("__n"),
        F.count(F.lit(1)).cast(dec).alias("__v"),
        F.sum(F.col("c") * F.col("c")).alias("__m2"),
        F.sum(
            F.col("c") * (F.col("c") - F.lit(1).cast(dec))
        ).alias("__mm"),
    )
    n = F.col("__n").cast("double")
    v = F.col("__v").cast("double")
    yule = (
        F.lit(10000.0)
        * (F.col("__m2") - F.col("__n")).cast("double")
        / (n * n)
    )
    simpson = F.col("__mm").cast("double") / (
        n * (n - F.lit(1.0))
    )
    herdan = F.log(v) / F.log(n)
    return g.select(
        F.col(group_col),
        F.col("__n").cast("bigint").alias("n_tokens"),
        F.col("__v").cast("bigint").alias("v_types"),
        F.when(F.col("__n") >= 2, yule).alias("yule_k"),
        F.when(F.col("__n") >= 2, simpson).alias("simpson_d"),
        F.when(
            (F.col("__n") > 1) & (F.col("__v") > 1), herdan
        ).alias("herdan_c"),
    )


def burrows_delta(
    df: DataFrame,
    group_col: str = "source",
    top_words: int = 150,
    unit: int = 10**12,
    z_unit: int = 10**9,
) -> DataFrame:
    """Burrows' Delta stylometric distance between every pair of
    slices — the classic authorship/register fingerprint (Burrows
    2002): over the corpus's ``top_words`` most frequent words,
    z-score each slice's RELATIVE frequency against the cross-slice
    distribution of that word, then

        delta(a, b) = mean_w |z_aw - z_bw|

    Two slices that use the same function words at the same rates
    (same "voice") sit near 0 even when their topics differ; a
    scraped slice full of boilerplate sticks out immediately.

    Exactness: the word list is a deterministic top-k by corpus
    count ((count DESC, token ASC), TakeOrderedAndProject);
    relative frequencies are quantized ONCE to integer 1/``unit``
    units (fq = floor(c * unit / N_g) — pure BIGINT DIV, exact past
    2^53); per-word cross-slice mean and variance come from exact
    integer sums of fq (population variance, k slices); each
    |z_a - z_b| = |fq_a - fq_b| / sd is quantized to 1/``z_unit``
    BEFORE the per-pair mean (house rule). Words with zero
    cross-slice variance are skipped (every slice identical — no
    signal, division guarded); the mean is over surviving words.

    Scale shape: one explode -> (group, token) counts; the top-k
    word list (<= top_words rows) joins back BROADCAST; z algebra
    runs on k x top_words rows; pairs on the k^2-sized join.
    Output: (group_a, group_b, n_words, delta) for a < b."""
    dec = "decimal(38,0)"
    toks = df.where(F.col("text").isNotNull()).select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    )
    cnt = (
        toks.groupBy("g", "token")
        .agg(F.count(F.lit(1)).cast(dec).alias("c"))
        .localCheckpoint(eager=True)  # feeds totals, top-k, freqs
    )
    tot = cnt.groupBy("g").agg(F.sum("c").alias("ng"))
    top = (
        cnt.groupBy("token")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.col("tc").desc(), F.col("token").asc())
        .limit(int(top_words))
        .select("token")
    )
    grid = tot.crossJoin(F.broadcast(top))
    freq = (
        grid.join(cnt, ["g", "token"], "left")
        .select(
            "g",
            "token",
            F.expr(
                f"coalesce(c, 0) * {int(unit)} DIV ng"
            ).cast(dec).alias("fq"),
        )
        .localCheckpoint(eager=True)  # feeds moments AND pairs
    )
    mom = freq.groupBy("token").agg(
        F.count(F.lit(1)).cast(dec).alias("k"),
        F.sum("fq").alias("s"),
        F.sum(F.col("fq") * F.col("fq")).alias("q"),
    )
    # population variance * k^2 = k*q - s^2 (exact); sd in double
    sd = F.sqrt(
        (F.col("k") * F.col("q") - F.col("s") * F.col("s")).cast(
            "double"
        )
    ) / F.col("k").cast("double")
    words = mom.select(
        "token",
        (F.col("k") * F.col("q") - F.col("s") * F.col("s")).alias(
            "__vn"
        ),
        sd.alias("__sd"),
    ).where(F.col("__vn") > 0)
    a = freq.select(
        F.col("g").alias("group_a"),
        "token",
        F.col("fq").alias("__fa"),
    )
    b = freq.select(
        F.col("g").alias("group_b"),
        "token",
        F.col("fq").alias("__fb"),
    )
    zu = F.lit(float(z_unit))
    pair_term = F.floor(
        F.abs(F.col("__fa") - F.col("__fb")).cast("double")
        / F.col("__sd")
        * zu
    ).cast(dec)
    pairs = (
        a.join(b, "token")
        .where(F.col("group_a") < F.col("group_b"))
        .join(F.broadcast(words), "token")
        .groupBy("group_a", "group_b")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(pair_term).alias("__su"),
        )
    )
    return pairs.select(
        "group_a",
        "group_b",
        "n_words",
        (
            F.col("__su").cast("double")
            / zu
            / F.col("n_words").cast("double")
        ).alias("delta"),
    )


def word_burstiness(df: DataFrame, k: int = 50) -> DataFrame:
    """Church-Gale word burstiness for the top-``k`` words by
    collection frequency — the contagion audit behind every
    bag-of-words independence assumption (and the signal content
    filters exploit: function words scatter like Poisson, topical
    and boilerplate words BURST):

        burstiness = cf / df          (occurrences per containing doc)
        adaptation = df2 / df         (Church 2000: P(again | once))
        poisson_df = N (1 - e^(-cf/N))  (docs a Poisson word would hit)

    A word with df far below poisson_df and adaptation far above
    cf/N is bursty — seeing it once makes a second occurrence cheap.

    Scale shape: one explode into (doc_id, token) counts with
    map-side combine, one token rollup carrying cf / df / df2 in the
    SAME aggregation (df2 = docs with >= 2 occurrences rides a
    conditional sum, no second pass), deterministic top-k via
    TakeOrderedAndProject (cf desc, token asc — never a global
    sort), corpus size on a 1-row broadcast. cf / df / df2 are exact
    BIGINTs; each statistic is one float expression of them.

    Output: k rows (token, cf, doc_freq, doc_freq2, burstiness,
    adaptation, poisson_df)."""
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    tok = (
        df.select(
            "doc_id", F.explode(_tokens()).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    per = tok.groupBy("token").agg(
        F.sum("__c").cast("bigint").alias("cf"),
        F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
        F.sum(
            F.when(F.col("__c") >= 2, F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias("doc_freq2"),
    )
    top = per.orderBy(
        F.col("cf").desc(), F.col("token").asc()
    ).limit(k)
    cfd = F.col("cf").cast("double")
    dfd = F.col("doc_freq").cast("double")
    nd = F.col("__n").cast("double")
    return top.crossJoin(F.broadcast(n_docs)).select(
        "token",
        "cf",
        "doc_freq",
        "doc_freq2",
        (cfd / dfd).alias("burstiness"),
        (F.col("doc_freq2").cast("double") / dfd).alias(
            "adaptation"
        ),
        (nd * (F.lit(1.0) - F.exp(-cfd / nd))).alias("poisson_df"),
    )


def char_entropy(df: DataFrame, unit: int = 10**9) -> DataFrame:
    """Per-document character-level Shannon entropy — the
    compression-ratio proxy quality filters use at both ends: near-
    zero entropy flags repetition/padding ("aaaa...", markup spam),
    entropy pinned at the maximum ln(k) flags key-mash / encrypted /
    base64 gibberish; prose sits in between. Reported in nats with
    the evenness ratio H / ln(k_distinct) in [0, 1].

    Exactness, the house rule shared with the Markov entropy rate:
    per-(doc, char) counts are exact integers off one explode +
    map-side-combined groupBy; each char's ln(c/n) is quantized to
    integer 1/``unit`` units and the per-doc sum accumulates
    c * lnq exactly — order-independent at any parallelism, ONE
    division per doc (the evenness divisor ln(k) is a plain IEEE
    ln, identical cross-engine).

    Output: one row per doc (doc_id, n, k_distinct, entropy_nats,
    evenness); evenness NULL for single-char-alphabet docs."""
    from pyspark.sql import Window as W

    dec = "decimal(38,0)"
    chars = (
        df.select(
            "doc_id", F.explode(F.split("text", "")).alias("ch")
        )
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).cast(dec).alias("__c"))
    )
    # per-doc totals via a window over the already-aggregated cell
    # table (a join against a second aggregate would recompute the
    # corpus explode — one scan, not two)
    wd = W.partitionBy("doc_id")
    u = F.lit(float(unit))
    j = chars.select(
        "doc_id",
        "__c",
        F.sum("__c").over(wd).alias("__n"),
        F.count(F.lit(1)).over(wd).cast("bigint").alias("__k"),
    )
    lnq = F.floor(
        F.log(
            F.col("__c").cast("double") / F.col("__n").cast("double")
        )
        * u
    ).cast(dec)
    g = j.groupBy("doc_id").agg(
        F.max("__n").alias("__n"),
        F.max("__k").alias("__k"),
        F.sum(F.col("__c") * lnq).alias("__s"),
    )
    n = F.col("__n")
    h = -F.col("__s").cast("double") / (n.cast("double") * u)
    k = F.col("__k")
    return g.select(
        "doc_id",
        n.cast("bigint").alias("n"),
        k.alias("k_distinct"),
        h.alias("entropy_nats"),
        (h / F.when(k > 1, F.log(k.cast("double")))).alias(
            "evenness"
        ),
    )
