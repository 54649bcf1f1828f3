"""Leakage-safe categorical target encoding.

The engine's core contract is zero temporal/target leakage in the
feature path (reference: protosc's fold discipline — a fold's
statistics never see held-out rows, protosc/model/utils.py
train/validate split). Target encoding is the classic place the
contract breaks in production feature pipelines: replacing a
high-cardinality key with the mean label of its group leaks each
row's OWN label into its own feature. Both encoders here remove that
leak deterministically:

* :func:`loo_target_encode` — leave-one-out: each row's encoding is
  the smoothed mean label of its key EXCLUDING the row itself
  (category_encoders' LeaveOneOutEncoder semantics: the global prior
  keeps the standard definition, i.e. it is not re-derived per row).
* :func:`oof_target_encode` — out-of-fold: rows are assigned to K
  deterministic md5-hash folds (:func:`~protosc_spark.sampling
  .hash_bucket` rule, engine-reproducible in SQL) and each row's
  encoding uses only the OTHER folds' statistics — the K-fold
  discipline protosc applies to model scoring, applied to feature
  construction.

Scale shape (both): one map-side-combined groupBy down to |keys| (or
|keys| x K) rows, a broadcast-sized 1-row global aggregate, and a
join back to the rows — the stats side is group-cardinality-sized,
so AQE broadcasts it; no windows over raw data, pure JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket


def _prior(df: DataFrame, label_col: str):
    return df.agg(
        (
            F.sum(F.col(label_col).cast("double"))
            / F.count(F.lit(1)).cast("double")
        ).alias("__prior")
    )


def loo_target_encode(
    df: DataFrame,
    key_col: str,
    label_col: str,
    smoothing: float = 10.0,
    out_col: str = "enc_loo",
) -> DataFrame:
    """Leave-one-out smoothed target encoding:

        enc_i = (sum_key(y) - y_i + m * prior) / (n_key - 1 + m)

    with m = ``smoothing`` and prior the global label mean. Flipping
    row i's own label never changes enc_i through the group term (the
    leak the naive mean-encode has); a singleton key degrades to the
    prior (m > 0 keeps the denominator alive)."""
    stats = df.groupBy(key_col).agg(
        F.sum(F.col(label_col).cast("double")).alias("__sy"),
        F.count(F.lit(1)).cast("double").alias("__n"),
    )
    y = F.col(label_col).cast("double")
    return (
        df.join(stats, key_col)
        .crossJoin(F.broadcast(_prior(df, label_col)))
        .withColumn(
            out_col,
            (
                F.col("__sy") - y + F.lit(smoothing) * F.col("__prior")
            )
            / (F.col("__n") - F.lit(1.0) + F.lit(smoothing)),
        )
        .drop("__sy", "__n", "__prior")
    )


def oof_target_encode(
    df: DataFrame,
    key_col: str,
    label_col: str,
    id_cols: list[str] | str,
    n_folds: int = 5,
    smoothing: float = 10.0,
    salt: str = "te1",
    out_col: str = "enc_oof",
) -> DataFrame:
    """Out-of-fold smoothed target encoding: row i in fold f gets

        enc_i = (sum_key(y) - sum_{key,f}(y) + m * prior)
                / (n_key - n_{key,f} + m)

    — only the other K-1 folds' labels reach the feature. Folds are
    the deterministic md5 ``hash_bucket`` of ``id_cols`` + ``salt``
    (stable across partitioning, parallelism and engines), so the
    encoding is a pure function of the dataset, not of scheduling.
    Appends both the fold id (``__fold``) and ``out_col``."""
    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    with_fold = df.withColumn(
        "__fold", hash_bucket(id_cols, salt=salt, n_buckets=n_folds)
    )
    per_fold = with_fold.groupBy(key_col, "__fold").agg(
        F.sum(F.col(label_col).cast("double")).alias("__sf"),
        F.count(F.lit(1)).cast("double").alias("__nf"),
    )
    totals = per_fold.groupBy(key_col).agg(
        F.sum("__sf").alias("__sy"), F.sum("__nf").alias("__n")
    )
    return (
        with_fold.join(per_fold, [key_col, "__fold"])
        .join(totals, key_col)
        .crossJoin(F.broadcast(_prior(df, label_col)))
        .withColumn(
            out_col,
            (
                F.col("__sy")
                - F.col("__sf")
                + F.lit(smoothing) * F.col("__prior")
            )
            / (F.col("__n") - F.col("__nf") + F.lit(smoothing)),
        )
        .drop("__sf", "__nf", "__sy", "__n", "__prior")
    )


def rank_normalize(
    df: DataFrame,
    value_col: str,
    out_col: str = "pct_rank",
) -> DataFrame:
    """Tie-aware rank (quantile) normalization of a numeric feature —
    the leakage-free scaling step for heavy-tailed features (token
    counts, durations) before linear/SVM-style models: each row gets
    its MIDRANK (average competition rank over its tie class,
    1-based) and ``out_col`` = midrank / n in (0, 1].

    Scale shape — no global row window: midrank(v) = (# rows with a
    strictly smaller value) + (tie_class_size + 1)/2 comes entirely
    from the VALUE HISTOGRAM (one groupBy(value) with map-side
    combine; the only window runs over distinct values, the house
    collapse), joined back on the value — so ties get identical
    output regardless of partitioning, and no single reducer ever
    sees the corpus. Midranks are exact (.5 fractions of integers).

    NULL values keep their rows with NULL midrank/out_col and are
    excluded from n. Output: input columns + (midrank, out_col)."""
    from pyspark.sql import Window as W

    dec = "decimal(38,0)"
    v = F.col(value_col)
    hist = (
        df.where(v.isNotNull())
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).cast(dec).alias("__cnt"))
    )
    w_cum = W.orderBy(value_col).rowsBetween(W.unboundedPreceding, -1)
    tot = hist.agg(F.sum("__cnt").alias("__n"))
    scored = (
        hist.select(
            F.col(value_col).alias("__v"),
            (
                F.coalesce(F.sum("__cnt").over(w_cum),
                           F.lit(0).cast(dec)).cast("double")
                + (F.col("__cnt").cast("double") + F.lit(1.0))
                / F.lit(2.0)
            ).alias("midrank"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "__v",
            "midrank",
            (F.col("midrank") / F.col("__n").cast("double"))
            .alias(out_col),
        )
    )
    return df.join(
        scored, df[value_col] == scored["__v"], "left"
    ).drop("__v")


def woe_iv(
    df: DataFrame,
    feature_cols,
    label_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence + information-value feature screening for a
    binary target — the classic credit-scoring ranking of categorical
    (or pre-binned numeric) features by predictive power, the
    production sibling of protosc's chi-square filter ranking
    (protosc/feature_extraction/selection.py: order features by a
    per-feature association statistic, keep the top block):

        woe_b = ln( dist_pos_b / dist_neg_b )
        dist_pos_b = (pos_b + a) / (P + a*K)     (Laplace a > 0
        dist_neg_b = (neg_b + a) / (N + a*K)      keeps empty cells
        iv = sum_b (dist_pos_b - dist_neg_b) * woe_b     finite)

    per feature, over that feature's K observed bins (NULL is its own
    bin). |iv| rule of thumb: < 0.02 useless, > 0.3 strong.

    Numeric features must be pre-binned by the caller with EXACT
    integer arithmetic (e.g. ``F.expr("n_chars DIV 200")``) so a SQL
    oracle can replay the bin edges; ``label_col`` must be non-null
    0/1. Every count is an exact integer; each bin's woe/iv term is
    one float expression of exact integers, and the cross-bin iv sum
    is quantized to integer 1e-9 units first (house rule: a float sum
    over bins would drift with partial-aggregation order).

    Scale shape: ONE raw scan exploded |features| ways into a
    map-side-combined groupBy down to |features| x |bins| rows;
    everything after is arithmetic on that bin table (the per-feature
    window is bin-count-sized — documented unpartitioned-window
    exemption does not apply: it IS partitioned, by feature). Output:
    (feature, bin, n, n_pos, woe, iv) — iv repeated on each of a
    feature's rows so one table both ranks features and explains the
    ranking."""
    from pyspark.sql import Window as W

    dec = "decimal(38,0)"
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"),
                        F.col(c).cast("string").alias("bin"),
                    )
                    for c in feature_cols
                ]
            )
        ).alias("__fb"),
        F.col(label_col).cast("bigint").alias("__y"),
    ).select("__fb.feature", "__fb.bin", "__y")
    bins = stacked.groupBy("feature", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__y").cast("bigint").alias("n_pos"),
    ).localCheckpoint(eager=True)  # feeds totals + join: scan once
    tot = bins.groupBy("feature").agg(
        F.sum("n").alias("__nt"),
        F.sum("n_pos").alias("__pt"),
        F.count(F.lit(1)).alias("__k"),
    )
    a = F.lit(float(alpha))
    j = bins.join(F.broadcast(tot), "feature")
    dp = (F.col("n_pos").cast("double") + a) / (
        F.col("__pt").cast("double") + a * F.col("__k").cast("double")
    )
    dn = (
        (F.col("n") - F.col("n_pos")).cast("double") + a
    ) / (
        (F.col("__nt") - F.col("__pt")).cast("double")
        + a * F.col("__k").cast("double")
    )
    woe = F.log(dp / dn)
    term = (
        F.floor((dp - dn) * woe * F.lit(1e9)).cast(dec)
    )
    w = W.partitionBy("feature")
    return j.select(
        "feature",
        "bin",
        "n",
        "n_pos",
        woe.alias("woe"),
        (F.sum(term).over(w).cast("double") / F.lit(1e9)).alias("iv"),
    )


def eb_shrink_rates(
    df: DataFrame,
    group_cols: list[str] | str,
    label_col: str,
    unit: int = 10**9,
) -> DataFrame:
    """Empirical-Bayes (beta-binomial) shrinkage of per-group binary
    rates — the standard fix for the "small slice tops the
    leaderboard" artifact that raw per-group rates produce (a
    3-of-4 slice beats a 700-of-1000 one): every group's rate is
    pulled toward the cross-group mean with strength proportional to
    the prior's evidence vs the group's own n.

    Method-of-moments fit of Beta(alpha, beta) to the GROUP RATES:

        m1 = mean(p_g),  s2 = sample var(p_g),
        c  = m1 (1 - m1) / s2 - 1,
        alpha = m1 c,  beta = (1 - m1) c,
        shrunk_g = (k_g + alpha) / (n_g + alpha + beta)

    Engine-reproducibility: k/n are exact integers from one
    map-side-combined groupBy; each group's rate is quantized to
    integer 1/``unit`` units (the house rule) and the cross-group
    moment sums accumulate those integers exactly in DECIMAL, so the
    one float expression at the end — written identically in the SQL
    oracle — reproduces digit-for-digit at any parallelism. Scale
    shape: |groups| rows after the rollup, one broadcast 1-row prior,
    one join back; no raw-row windows.

    Degenerate regimes: fewer than 2 groups or zero between-group
    variance -> shrunk = m1 (the prior is everything); method-of-
    moments c <= 0 (dispersion beyond what any beta prior explains)
    -> shrunk = raw rate (no valid prior, shrink nothing). Rows with
    NULL label or group are dropped. Output: one row per group
    (group_cols..., n, k, rate, alpha, beta, shrunk)."""
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    dec = "decimal(38,0)"
    y = F.col(label_col).cast("int")
    nn = F.col(label_col).isNotNull()
    for k in keys:
        nn = nn & F.col(k).isNotNull()
    g = (
        df.where(nn)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast(dec).alias("__n"),
            F.sum(y).cast(dec).alias("__k"),
        )
    )
    u = F.lit(float(unit))
    qp = F.floor(
        F.col("__k").cast("double") / F.col("__n").cast("double") * u
    ).cast(dec)
    gq = g.withColumn("__qp", qp)
    prior = gq.agg(
        F.count(F.lit(1)).cast(dec).alias("__g"),
        F.sum("__qp").alias("__s1"),
        F.sum(F.col("__qp") * F.col("__qp")).alias("__s2"),
    )
    gd = F.col("__g").cast("double")
    m1 = F.col("__s1").cast("double") / u / gd
    ex2 = F.col("__s2").cast("double") / u / u / gd
    # guard the divisions themselves: ANSI mode evaluates them even
    # inside a false predicate branch (G=1 -> /0, s2=0 -> /0)
    s2 = F.when(
        F.col("__g") > 1,
        (ex2 - m1 * m1) * gd / (gd - F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    c = F.when(
        s2 > 0, m1 * (F.lit(1.0) - m1) / s2 - F.lit(1.0)
    ).otherwise(F.lit(-1.0))
    alpha = m1 * c
    beta = (F.lit(1.0) - m1) * c
    nd = F.col("__n").cast("double")
    kd = F.col("__k").cast("double")
    rate = kd / nd
    ok = (F.col("__g") > 1) & (s2 > 0) & (c > 0)
    flat = (F.col("__g") <= 1) | (s2 <= 0)
    return (
        gq.crossJoin(F.broadcast(prior))
        .select(
            *keys,
            F.col("__n").cast("bigint").alias("n"),
            F.col("__k").cast("bigint").alias("k"),
            rate.alias("rate"),
            F.when(ok, alpha).alias("alpha"),
            F.when(ok, beta).alias("beta"),
            F.when(ok, (kd + alpha) / (nd + alpha + beta))
            .when(flat, m1)
            .otherwise(rate)
            .alias("shrunk"),
        )
    )
