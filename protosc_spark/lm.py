"""Character n-gram language-model scoring (CCNet-style quality
filtering): train a smoothed char-bigram LM on a (clean) corpus, score
every document by per-bigram average negative log-likelihood /
perplexity, filter on the score.

This is the standard web-corpus quality gate (CCNet / fastText-LM
pipelines score Common Crawl against a Wikipedia-trained LM and keep
the low-perplexity head); the engine provides it with the same
Spark-first shape as the rest of textops: counts are ONE groupBy over
exploded bigrams (map-side combined), the model is a provably-tiny
broadcast (<= |charset|^2 rows — printable ASCII -> a few thousand),
and scoring is a broadcast join + one aggregation, all JVM-side.

No reference analog (the reference is image-only). Exact DuckDB-SQL
oracle in __spark_entry__.oracle_sql() (lm_score query).

Model: add-k smoothed bigram conditionals over the charset observed in
the training corpus:

    P(c2 | c1) = (count(c1c2) + k) / (count(c1.) + k * V)

with V = |distinct chars in training text| (so unseen continuations
and unseen first-chars both get mass: an unseen bigram under a seen
first char scores k / (count(c1.) + kV); a wholly unseen first char
scores 1 / V).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bigrams(text_col: str):
    """Array of the len-1 overlapping 2-char substrings (empty for
    texts shorter than 2 chars).

    Formulated as zip_with over two slices of ONE split-to-chars
    array: per-position ``substring(text, i, 2)`` inside a lambda is
    O(len) per call (each call re-scans the string), i.e. quadratic
    per document — measured 3x slower at corpus scale. The outer
    ``transform(array(split(...)), cs -> ...)`` is a let-binding so
    the split runs once; ``greatest(size - 1, 0)`` makes 0/1-char
    texts yield an empty slice (never a negative length), so short
    texts produce no bigrams without any filter.
    """
    return F.expr(
        f"""element_at(transform(array(split({text_col}, '')),
              cs -> zip_with(
                      slice(cs, 1, greatest(size(cs) - 1, 0)),
                      slice(cs, 2, greatest(size(cs) - 1, 0)),
                      (x, y) -> concat(x, y))), 1)"""
    )


def train_char_bigram_lm(
    df: DataFrame, text_col: str = "text", k: float = 0.5
) -> DataFrame:
    """Train the smoothed bigram LM. Returns a small DataFrame
    ``(bigram, log_prob)`` plus per-first-char fallbacks under key
    ``(c1, NULL)``-style rows folded in as ``bigram = c1`` handled at
    score time via the totals join; callers pass the result to
    :func:`lm_score`.

    Two aggregations over the exploded bigrams (both map-side
    combined); output is bounded by |charset|^2 regardless of corpus
    size, so downstream joins auto-broadcast.
    """
    bg = (
        df.select(F.explode(_bigrams(text_col)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = df.select(
        F.explode(
            # linear split-to-chars (the per-position substring form is
            # quadratic per doc — see _bigrams); the filter drops the
            # empty string an empty text splits into
            F.expr(f"filter(split({text_col}, ''), x -> x <> '')")
        ).alias("ch")
    ).agg(F.countDistinct("ch").alias("v"))
    totals = bg.groupBy(F.substring("bigram", 1, 1).alias("c1")).agg(
        F.sum("n").alias("n_c1")
    )
    model = (
        bg.withColumn("c1", F.substring("bigram", 1, 1))
        .join(totals, "c1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            F.log(
                (F.col("n") + F.lit(k))
                / (F.col("n_c1") + F.lit(k) * F.col("v"))
            ).alias("log_prob"),
            "c1",
            "n_c1",
            "v",
        )
    )
    # materialize the (bounded, <= charset^2 rows) model NOW: lm_score
    # reads it from three subtrees (scores, fallbacks, vocab), and
    # without truncation each one would re-run the full training
    # aggregation over the corpus per action (measured 3x overhead)
    return model.localCheckpoint(eager=True)


def lm_score(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Per-document avg negative log-likelihood + perplexity under the
    trained LM. Docs shorter than 2 chars have no bigrams and score
    NULL.

    Plan shape: explode bigrams -> broadcast join the tiny LM (left,
    with the smoothed-fallback COALESCE chain) -> one groupBy(doc).
    The LM side is bounded by |charset|^2, so the join never shuffles
    the corpus on anything but the one aggregation exchange.
    """
    fallbacks = F.broadcast(
        lm.select("c1", "n_c1", "v").distinct().withColumnRenamed("c1", "fb_c1")
    )
    vocab = F.broadcast(lm.select(F.max("v").alias("v_all")))
    exploded = df.select(
        F.col(id_col), F.explode(_bigrams(text_col)).alias("bigram")
    )
    scored = (
        exploded.join(
            F.broadcast(lm.select("bigram", "log_prob")), "bigram", "left"
        )
        .withColumn("fb_c1", F.substring("bigram", 1, 1))
        .join(fallbacks, "fb_c1", "left")
        .crossJoin(vocab)
        .withColumn(
            "nll",
            -F.coalesce(
                # seen bigram
                F.col("log_prob"),
                # unseen continuation under a seen first char
                F.log(F.lit(k) / (F.col("n_c1") + F.lit(k) * F.col("v"))),
                # wholly unseen first char: uniform over the charset
                F.log(F.lit(1.0) / F.col("v_all")),
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("nll"), 6).alias("avg_nll"),
        F.round(F.exp(F.avg("nll")), 4).alias("ppl"),
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
    )


def lm_quality_filter(
    df: DataFrame,
    lm: DataFrame,
    max_ppl: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents whose perplexity under the LM is at most
    ``max_ppl`` (the CCNet "head" selection)."""
    scores = lm_score(df, lm, text_col=text_col, id_col=id_col)
    return df.join(
        scores.where(F.col("ppl") <= max_ppl).select(id_col), id_col
    )


# ---------------------------------------------------------------------------
# word-trigram LM with stupid backoff (Brants et al. 2007, "Large
# Language Models in Machine Translation" — THE published web-scale
# smoothing: no discounting to tune, counts only, built for
# distributed training over trillions of tokens)
# ---------------------------------------------------------------------------

def _word_tokens(text_col: str):
    """Space-split tokens with empties dropped (doubled spaces and
    leading/trailing spaces produce no tokens) — matches the engine's
    corpus tokenization convention (textops/DSIR)."""
    return F.expr(f"filter(split({text_col}, ' '), w -> w != '')")


def _word_trigrams(text_col: str):
    """Array of space-joined word trigrams, built with PURE array ops
    (one split, three slices, two zip_withs) — no shuffle, no window,
    no Python; tokens cannot contain spaces, so the join key is
    injective. Docs with fewer than 3 tokens yield an empty array."""
    return F.expr(
        f"""element_at(transform(
              array(filter(split({text_col}, ' '), w -> w != '')),
              ws -> zip_with(
                      zip_with(
                        slice(ws, 1, greatest(size(ws) - 2, 0)),
                        slice(ws, 2, greatest(size(ws) - 2, 0)),
                        (x, y) -> concat(x, ' ', y)),
                      slice(ws, 3, greatest(size(ws) - 2, 0)),
                      (x, y) -> concat(x, ' ', y))), 1)"""
    )


def train_stupid_backoff_lm(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    max_ngrams: int | None = None,
) -> DataFrame:
    """Count-based trigram model: one tall DataFrame
    ``(gram, order, cnt)`` with order 1/2/3 — three groupBys over
    exploded n-grams (map-side combined), nothing collected.
    ``min_count`` prunes rare bigrams/trigrams (unigrams are always
    kept: they are the backoff floor); ``max_ngrams`` caps each of
    the bi/tri tables to the most frequent entries (ties broken by
    gram for determinism) — the web-scale entropy-pruning stand-in.
    """
    toks = df.select(_word_tokens(text_col).alias("ws"))
    levels = []
    for order, expr in (
        (1, F.explode("ws")),
        (2, F.explode(F.expr(
            """zip_with(slice(ws, 1, greatest(size(ws) - 1, 0)),
                        slice(ws, 2, greatest(size(ws) - 1, 0)),
                        (x, y) -> concat(x, ' ', y))"""))),
        (3, F.explode(F.expr(
            """zip_with(zip_with(slice(ws, 1, greatest(size(ws) - 2, 0)),
                                 slice(ws, 2, greatest(size(ws) - 2, 0)),
                                 (x, y) -> concat(x, ' ', y)),
                        slice(ws, 3, greatest(size(ws) - 2, 0)),
                        (x, y) -> concat(x, ' ', y))"""))),
    ):
        cnt = (
            toks.select(expr.alias("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("order", F.lit(order))
        )
        if order > 1:
            if min_count > 1:
                cnt = cnt.where(F.col("cnt") >= min_count)
            if max_ngrams is not None:
                from pyspark.sql import Window

                wnd = Window.partitionBy("order").orderBy(
                    F.desc("cnt"), F.asc("gram")
                )
                cnt = (
                    cnt.withColumn("__rn", F.row_number().over(wnd))
                    .where(F.col("__rn") <= max_ngrams)
                    .drop("__rn")
                )
        levels.append(cnt.select("gram", "order", "cnt"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def stupid_backoff_score(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    k: float = 1.0,
    broadcast_model: bool = False,
) -> DataFrame:
    """Per-document average log-score under stupid backoff:

        S(w3 | w1 w2) = cnt(w1 w2 w3) / cnt(w1 w2)        if trigram seen
                      = a * cnt(w2 w3) / cnt(w2)          elif bigram seen
                      = a^2 * (cnt(w3) + k) / (N + k*V)   otherwise

    (the unigram floor is add-k smoothed so unseen words score finite,
    N = training token count, V = training vocabulary size). Returns
    ``(doc_id, avg_logscore, ppl, n_trigrams)``; docs with fewer than
    3 tokens have no trigram positions and are absent (the caller
    left-joins if it needs them).

    Plan shape: trigram construction is pure array ops on the corpus
    side (no shuffle); scoring is 4 equi-joins against the pruned
    model levels (broadcast when ``broadcast_model``, else shuffle
    joins that AQE sizes; common-token skew is bounded because the
    model side is unique per gram) + ONE aggregation exchange.
    """
    uni = model.where(F.col("order") == 1).select(
        F.col("gram").alias("u_gram"), F.col("cnt").alias("u_cnt")
    )
    bi = model.where(F.col("order") == 2).select(
        F.col("gram").alias("b_gram"), F.col("cnt").alias("b_cnt")
    )
    tri = model.where(F.col("order") == 3).select(
        F.col("gram").alias("t_gram"), F.col("cnt").alias("t_cnt")
    )
    if broadcast_model:
        uni, bi, tri = F.broadcast(uni), F.broadcast(bi), F.broadcast(tri)
    totals = F.broadcast(
        model.where(F.col("order") == 1).agg(
            F.sum("cnt").cast("double").alias("n_total"),
            F.count(F.lit(1)).cast("double").alias("v_total"),
        )
    )

    pos = df.select(
        F.col(id_col), F.explode(_word_trigrams(text_col)).alias("tri")
    )
    ws = F.split("tri", " ")
    pos = pos.select(
        id_col,
        "tri",
        F.concat_ws(" ", ws[0], ws[1]).alias("ctx12"),
        F.concat_ws(" ", ws[1], ws[2]).alias("bi23"),
        ws[1].alias("w2"),
        ws[2].alias("w3"),
    )
    scored = (
        pos.join(tri, pos["tri"] == tri["t_gram"], "left")
        .join(
            bi.select(F.col("b_gram").alias("c_gram"),
                      F.col("b_cnt").alias("c_cnt")),
            F.col("ctx12") == F.col("c_gram"), "left",
        )
        .join(bi, F.col("bi23") == bi["b_gram"], "left")
        .join(
            uni.select(F.col("u_gram").alias("w2_gram"),
                       F.col("u_cnt").alias("w2_cnt")),
            F.col("w2") == F.col("w2_gram"), "left",
        )
        .join(uni, F.col("w3") == uni["u_gram"], "left")
        .crossJoin(totals)
        .withColumn(
            "logscore",
            F.when(
                F.col("t_cnt").isNotNull() & F.col("c_cnt").isNotNull(),
                F.log(F.col("t_cnt") / F.col("c_cnt")),
            )
            .when(
                F.col("b_cnt").isNotNull() & F.col("w2_cnt").isNotNull(),
                F.log(F.lit(alpha) * F.col("b_cnt") / F.col("w2_cnt")),
            )
            .otherwise(
                F.log(
                    F.lit(alpha * alpha)
                    * (F.coalesce(F.col("u_cnt"), F.lit(0)) + F.lit(k))
                    / (F.col("n_total") + F.lit(k) * F.col("v_total"))
                )
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("logscore"), 6).alias("avg_logscore"),
        F.round(F.exp(-F.avg("logscore")), 4).alias("ppl"),
        F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
    )


def good_turing(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    unit: int = 10**9,
) -> DataFrame:
    """Simple Good-Turing frequency smoothing (Gale & Sampson 1995)
    over each slice's word count-of-counts — the principled answer
    to "how much probability do unseen words deserve, and how much
    must seen counts be discounted to pay for it": the third member
    of the smoothing family beside add-k (lm_score) and stupid
    backoff (stupid_backoff_score), and the estimator behind
    textops.vocab_richness's gt_unseen number.

    Per slice, over distinct frequencies r with N_r word types each:

      Z_r    = N_r / (0.5 (t - q))     (q/t = neighbor frequencies;
                                        q=0 first, t=2r-q last)
      S(r)  ~= exp(a + b ln r)          (log-log OLS of Z on r)
      r*_LGT = (r+1) exp(b (ln(r+1) - ln r))        (a cancels)
      r*_T   = (r+1) N_{r+1} / N_r
      switch: use Turing while N_{r+1} exists AND
              |r*_T - r*_LGT| > 1.65 sqrt((r+1)^2 N_{r+1}/N_r^2
                                          (1 + N_{r+1}/N_r)),
              PERMANENTLY LGT from the first failure on
      p_r    = (1 - p0) r* / sum_r N_r r*,   p0 = N_1 / N

    Engine-reproducibility: the count-of-counts table is exact; the
    OLS slope b uses the quantized-log house algebra (zipf_fit); the
    switch rule compares identical doubles on both engines; r* is
    re-quantized before the normalizing sum so the renormalization
    is order-independent. The three windows (neighbors, switch
    point, normalizer) all run over DISTINCT FREQUENCIES — dozens of
    rows however large the corpus.

    Output: (group, r, n_r, r_star, used_turing, p_r, p0) per
    distinct frequency, ascending; slices with fewer than 2 distinct
    frequencies emit no rows (no line to fit). Empty tokens from
    split() are kept (the shared convention)."""
    from pyspark.sql import Window as W

    dec = "decimal(38,0)"
    toks = df.where(F.col(text_col).isNotNull()).select(
        F.col(group_col),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    words = toks.groupBy(group_col, "token").agg(
        F.count(F.lit(1)).alias("r")
    )
    coc = words.groupBy(group_col, "r").agg(
        F.count(F.lit(1)).cast(dec).alias("n_r")
    )
    w_ord = W.partitionBy(group_col).orderBy("r")
    nb = coc.select(
        group_col,
        "r",
        "n_r",
        F.coalesce(F.lag("r").over(w_ord), F.lit(0)).alias("__q"),
        F.lead("r").over(w_ord).alias("__t"),
        F.lead("n_r").over(w_ord).alias("__n_next"),
        F.lead("r").over(w_ord).alias("__r_next"),
    ).withColumn(
        "__t2",
        F.coalesce(
            F.col("__t"), F.lit(2) * F.col("r") - F.col("__q")
        ),
    )
    rd = F.col("r").cast("double")
    z = F.col("n_r").cast("double") / (
        F.lit(0.5) * (F.col("__t2") - F.col("__q")).cast("double")
    )
    u = F.lit(float(unit))
    lx, ly = F.log(rd), F.log(z)
    q = nb.select(
        group_col,
        "r",
        "n_r",
        "__n_next",
        "__r_next",
        F.floor(lx * u).cast(dec).alias("qx"),
        F.floor(ly * u).cast(dec).alias("qy"),
        F.floor(lx * lx * u).cast(dec).alias("qxx"),
        F.floor(lx * ly * u).cast(dec).alias("qxy"),
    )
    fit = q.groupBy(group_col).agg(
        F.count(F.lit(1)).cast(dec).alias("__m"),
        F.sum("qx").alias("__sx"),
        F.sum("qy").alias("__sy"),
        F.sum("qxx").alias("__sxx"),
        F.sum("qxy").alias("__sxy"),
    )
    ui = F.lit(int(unit)).cast(dec)
    m = F.col("__m")
    cov = (
        m * F.col("__sxy") * ui - F.col("__sx") * F.col("__sy")
    ).cast("double")
    vx = (
        m * F.col("__sxx") * ui - F.col("__sx") * F.col("__sx")
    ).cast("double")
    slope = F.when((m >= 2) & (vx > 0), cov / vx)
    scored = q.join(
        fit.select(group_col, slope.alias("__b")), group_col
    ).where(F.col("__b").isNotNull())
    rp1 = (F.col("r") + 1).cast("double")
    r_lgt = rp1 * F.exp(
        F.col("__b") * (F.log(rp1) - F.log(F.col("r").cast("double")))
    )
    nn = F.col("__n_next").cast("double")
    nr = F.col("n_r").cast("double")
    contiguous = F.col("__r_next") == F.col("r") + 1
    r_tur = F.when(contiguous, rp1 * nn / nr)
    thresh = F.lit(1.65) * F.sqrt(
        rp1 * rp1 * (nn / (nr * nr)) * (F.lit(1.0) + nn / nr)
    )
    candidate = F.coalesce(
        contiguous & (F.abs(r_tur - r_lgt) > thresh), F.lit(False)
    )
    # the switch is PERMANENT: Turing only below the first r where
    # the candidate rule fails
    switch_at = F.min(
        F.when(~candidate, F.col("r"))
    ).over(W.partitionBy(group_col))
    used_turing = candidate & (
        switch_at.isNull() | (F.col("r") < switch_at)
    )
    r_star = F.when(used_turing, r_tur).otherwise(r_lgt)
    base = scored.select(
        group_col,
        "r",
        F.col("n_r").cast("bigint").alias("n_r"),
        r_star.alias("r_star"),
        used_turing.alias("used_turing"),
        F.floor(r_star * F.col("n_r").cast("double") * u)
        .cast(dec)
        .alias("__qmass"),
        (F.col("n_r") * F.col("r")).alias("__rmass"),
        F.when(F.col("r") == 1, F.col("n_r")).otherwise(
            F.lit(0).cast(dec)
        ).alias("__n1"),
    )
    wg = W.partitionBy(group_col)
    nprime = F.sum("__qmass").over(wg).cast("double") / u
    ntot = F.sum("__rmass").over(wg).cast("double")
    p0 = F.sum("__n1").over(wg).cast("double") / ntot
    return base.select(
        group_col,
        "r",
        "n_r",
        "r_star",
        "used_turing",
        ((F.lit(1.0) - p0) * F.col("r_star") / nprime).alias("p_r"),
        p0.alias("p0"),
    )
