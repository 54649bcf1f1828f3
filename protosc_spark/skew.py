"""Join-key skew diagnostics.

Every shuffle in this engine groups or joins on some key; a skewed
key distribution is the thing that turns a 1000-executor job into a
one-straggler job (the engine salts/AQE-splits where it matters —
ordering.py, similarity.py). This module measures the skew itself,
so a pipeline can AUDIT a key before shuffling 100 TB on it:
max-share (worst single key), and the Gini coefficient of the key
frequency distribution (0 = uniform, ->1 = one key owns the table).

The Gini needs ranks over keys sorted by frequency — naively a
global window over the key-count table (corpus-keys-sized: 1e9 rows
for user ids). Instead it is computed from the COUNT-OF-COUNTS
histogram: for every distinct frequency c with m_c keys, the rank
sum collapses to m_c * R_prev + m_c (m_c + 1) / 2 (R_prev = keys
with smaller frequency), so

    sum_i rank_i * c_i = sum_c c * (m_c R_prev + m_c (m_c + 1) / 2)

and the only window runs over DISTINCT FREQUENCY VALUES — thousands
of rows however many keys exist. Sums accumulate as DECIMAL(38,0)
(exact, order-independent, overflow-safe); the Gini division is the
only floating point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def key_skew_stats(df: DataFrame, key_cols: list[str] | str
                   ) -> DataFrame:
    """One-row skew audit of a key: (n_rows, n_keys, max_count,
    max_share, gini) with

        gini = T2 / (n S) - (n + 1) / n,
        T2 = 2 sum_i rank_i * c_i  (ranks ascending by frequency)
           = sum_c c (2 m_c R_prev + m_c (m_c + 1))

    — the doubled form keeps every accumulated term an exact integer
    (no decimal division). NULL key values count as a key (they land
    in one shuffle partition too — that is exactly the skew this
    audits)."""
    key_cols = (
        [key_cols] if isinstance(key_cols, str) else list(key_cols)
    )
    dec = "decimal(19,0)"
    cnt = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    hist = cnt.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    w = W.orderBy("c").rowsBetween(W.unboundedPreceding, -1)
    cd, md = F.col("c").cast(dec), F.col("m").cast(dec)
    rprev = F.coalesce(
        F.sum(md).over(w), F.lit(0).cast(dec)
    )
    term = cd * (
        F.lit(2).cast(dec) * md * rprev
        + md * (md + F.lit(1).cast(dec))
    )
    agg = hist.select(
        "c", "m", term.alias("t"), (cd * md).alias("rows")
    ).agg(
        F.sum("rows").alias("__s"),
        F.sum(F.col("m").cast(dec)).alias("__n"),
        F.sum("t").alias("__t"),
        F.max("c").alias("max_count"),
    )
    n, s, t = (
        F.col(c).cast("double") for c in ("__n", "__s", "__t")
    )
    return agg.select(
        F.col("__s").cast("bigint").alias("n_rows"),
        F.col("__n").cast("bigint").alias("n_keys"),
        F.col("max_count").alias("max_count"),
        (F.col("max_count").cast("double") / s).alias("max_share"),
        F.when(
            (F.col("__n") > 1) & (F.col("__s") > 0),
            t / (n * s) - (n + F.lit(1.0)) / n,
        ).alias("gini"),
    )


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford first-digit audit of a positive numeric column — the
    forensic data-quality check (fabricated / truncated / synthetic
    numeric fields drift from Benford's law long before summary
    stats move). For each leading digit d in 1..9: observed count
    and share vs the Benford expectation log10(1 + 1/d), plus the
    chi-square distance n * sum_d (obs_d - exp_d)^2 / exp_d repeated
    on every row (it is a property of the whole column). Zero and
    negative values are excluded (Benford applies to positive
    magnitudes); digits with no observations still appear (share 0).

    Output: (digit, n, obs_share, exp_share, chi2), 9 rows.

    Scale shape: one map-side-combined 9-bucket count; everything
    after runs on the 9-row table. Pure JVM."""
    digits = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    first = F.substring(
        F.col(value_col).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = (
        df.where(F.col(value_col).cast("bigint") > 0)
        .select(first.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    full = digits.join(obs, "digit", "left").select(
        "digit", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )
    tot = full.agg(F.sum("n").alias("__t"))
    t = F.col("__t").cast("double")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    per = full.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / t).alias("obs_share"),
        exp.alias("exp_share"),
    )
    chi = per.agg(
        F.sum(
            (F.col("obs_share") - F.col("exp_share"))
            * (F.col("obs_share") - F.col("exp_share"))
            / F.col("exp_share")
        ).alias("__chi_unit")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(chi))
        .select(
            "digit",
            "n",
            "obs_share",
            "exp_share",
            (t * F.col("__chi_unit")).alias("chi2"),
        )
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-scan column-profile audit — the "describe this table
    before you train on it" report every ingest pipeline runs: per
    column, row/null counts, EXACT distinct count, lexicographic
    min/max and the modal value with a deterministic tie rule.

    All values are profiled AS STRINGS (one schema for any column
    mix; numeric columns therefore get lexicographic min/max — use
    the typed aggregates when numeric order matters). The mode is
    picked by (count desc, value asc) via a single min over
    (-count, value) structs — no window, no second scan. NULLs are
    counted but excluded from distinct/min/max/mode.

    Scale shape: ONE raw scan exploded |cols| ways into a map-side-
    combined groupBy(column, value) histogram; both report aggregates
    run over that histogram (distinct-value-sized), never over raw
    rows. Output: (column, n, n_null, n_distinct, min_val, max_val,
    top_value, top_count)."""
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("__cv")
    ).select("__cv.column", "__cv.val")
    hist = stacked.groupBy("column", "val").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    ).localCheckpoint(eager=True)  # feeds report + null rollup: scan once
    nn = hist.where(F.col("val").isNotNull())
    rep = nn.groupBy("column").agg(
        F.sum("__c").cast("bigint").alias("__n_nn"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.min(F.struct((-F.col("__c")).alias("nc"), "val")).alias(
            "__top"
        ),
    )
    nulls = hist.groupBy("column").agg(
        F.sum(
            F.when(F.col("val").isNull(), F.col("__c")).otherwise(0)
        )
        .cast("bigint")
        .alias("n_null")
    )
    # left join FROM nulls: an all-null column has no non-null
    # histogram rows but must still emit a profile line
    return nulls.join(rep, "column", "left").select(
        "column",
        (
            F.coalesce(F.col("__n_nn"), F.lit(0)) + F.col("n_null")
        ).cast("bigint").alias("n"),
        "n_null",
        F.coalesce(F.col("n_distinct"), F.lit(0))
        .cast("bigint")
        .alias("n_distinct"),
        "min_val",
        "max_val",
        F.col("__top")["val"].alias("top_value"),
        (-F.col("__top")["nc"]).cast("bigint").alias("top_count"),
    )


def loo_influence(
    df: DataFrame,
    value_col: str,
    group_col: str,
    unit: int = 10**9,
) -> DataFrame:
    """Leave-one-group-out influence audit: how much does each slice
    (source, shard, day) pull the corpus mean of an integer-valued
    column? For each group g with sum S_g over n_g rows and corpus
    totals S over n:

        mean_without_g = (S - S_g) / (n - n_g)
        influence_g    = mean - mean_without_g

    plus the delete-one-group jackknife standard error
    sqrt((G-1)/G * sum_g (m_g - m_bar)^2) repeated on every row —
    the "is any single source steering this statistic" check run
    before trusting a corpus-level number. Group sums are exact
    DECIMAL integers; each leave-one-out mean is one float division;
    the jackknife's cross-group sums quantize every term to integer
    1/``unit`` units first (house rule for float sums over groups).

    Scale shape: ONE map-side-combined groupBy to |groups| rows, a
    broadcast 1-row total, arithmetic on that table; the jackknife
    aggregate is |groups|-sized. Output: (group, n, mean_g,
    mean_without, influence, jk_se); mean_without/influence NULL for
    a group that is the whole corpus."""
    dec = "decimal(38,0)"
    g = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast(dec).alias("__ng"),
        F.sum(F.col(value_col).cast(dec)).alias("__sg"),
    ).localCheckpoint(eager=True)  # group-sized; feeds totals + rows
    tot = g.agg(
        F.sum("__ng").alias("__n"),
        F.sum("__sg").alias("__s"),
        F.count(F.lit(1)).cast("bigint").alias("__G"),
    )
    j = g.crossJoin(F.broadcast(tot))
    mean = F.col("__s").cast("double") / F.col("__n").cast("double")
    rest_n = F.col("__n") - F.col("__ng")
    m_wo = F.when(
        rest_n > 0,
        (F.col("__s") - F.col("__sg")).cast("double")
        / rest_n.cast("double"),
    )
    j = j.withColumn("__mwo", m_wo).localCheckpoint(
        eager=True
    )  # group-sized; feeds jackknife sums + the output rows
    u = float(unit)
    qm = F.floor(F.col("__mwo") * F.lit(u)).cast(dec)
    jk = j.agg(
        F.sum(qm).alias("__qsum"),
        F.count(F.lit(1)).cast("bigint").alias("__gd"),
    )
    # m_bar from the quantized loo means, then the squared deviations
    # quantized again — both sides of the oracle replay this exactly
    j2 = j.crossJoin(F.broadcast(jk))
    m_bar = F.col("__qsum").cast("double") / F.lit(u) / F.col(
        "__gd"
    ).cast("double")
    dev = F.col("__mwo") - m_bar
    qdev = F.floor(dev * dev * F.lit(u)).cast(dec)
    se = j2.agg(
        F.sum(qdev).alias("__qss"),
        F.max("__gd").alias("__gd2"),
    ).select(
        F.when(
            F.col("__gd2") > 1,
            F.sqrt(
                (F.col("__gd2") - 1).cast("double")
                / F.col("__gd2").cast("double")
                * (F.col("__qss").cast("double") / F.lit(u))
            ),
        ).alias("jk_se")
    )
    return (
        j.crossJoin(F.broadcast(se))
        .select(
            group_col,
            F.col("__ng").cast("bigint").alias("n"),
            (
                F.col("__sg").cast("double")
                / F.col("__ng").cast("double")
            ).alias("mean_g"),
            F.col("__mwo").alias("mean_without"),
            (mean - F.col("__mwo")).alias("influence"),
            "jk_se",
        )
    )


def simpson_audit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    stratum_col: str,
) -> DataFrame:
    """Simpson's-paradox audit: does the POOLED x-y association
    direction contradict the within-stratum directions? The p=1
    regression-slope sign per scope is the sign of the exact integer
    covariance numerator n*Sxy - Sx*Sy (the denominator n*Sxx - Sx^2
    is non-negative), so every direction decision here is pure
    integer arithmetic — no float enters until the reported pooled
    slope itself. Inputs must be integer-valued (the ols2_fit
    contract).

        all_reversed = every stratum with a defined slope disagrees
                       in sign with a defined pooled slope

    — the classic paradox flag; n_pos/n_neg/n_zero_strata expose the
    milder mixtures. Scale shape: one scan into per-stratum exact
    moments (map-side combined), a 1-row rollup of those, arithmetic
    on |strata| rows. Output: one row (n, n_strata, pooled_slope,
    n_pos_strata, n_neg_strata, n_zero_strata, all_reversed);
    pooled_slope NULL when x is constant (undefined direction —
    all_reversed false)."""
    dec = "decimal(38,0)"
    x = F.col(x_col).cast(dec)
    y = F.col(y_col).cast(dec)
    st = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    ).localCheckpoint(eager=True)  # strata-sized; pooled rolls up
    # from it (exact integer sums), so the raw table scans ONCE
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    sgn = F.when(var > 0, F.signum(cov.cast("double")).cast("int"))
    marked = st.withColumn("__sgn", sgn)
    pooled = st.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxx").alias("sxx"),
        F.sum("sxy").alias("sxy"),
    ).select(
        F.col("n").cast("bigint").alias("n"),
        F.when(
            var > 0, cov.cast("double") / var.cast("double")
        ).alias("pooled_slope"),
        F.when(var > 0, F.signum(cov.cast("double")).cast("int"))
        .alias("__psgn"),
    )
    rollup = marked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum(F.when(F.col("__sgn") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos_strata"),
        F.sum(F.when(F.col("__sgn") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_neg_strata"),
        F.sum(F.when(F.col("__sgn") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_strata"),
        F.count("__sgn").cast("bigint").alias("__defined"),
    )
    return pooled.crossJoin(F.broadcast(rollup)).select(
        "n",
        "n_strata",
        "pooled_slope",
        "n_pos_strata",
        "n_neg_strata",
        "n_zero_strata",
        (
            F.col("__psgn").isNotNull()
            & (F.col("__defined") > 0)
            & (
                (
                    (F.col("__psgn") > 0)
                    & (F.col("n_pos_strata") == 0)
                    & (F.col("n_neg_strata") == F.col("__defined"))
                )
                | (
                    (F.col("__psgn") < 0)
                    & (F.col("n_neg_strata") == 0)
                    & (F.col("n_pos_strata") == F.col("__defined"))
                )
            )
        ).alias("all_reversed"),
    )
