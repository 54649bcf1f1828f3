"""Deterministic corpus sampling / splitting operators.

Training-data pipelines need reproducible, cluster-stable ways to cut
a corpus: train/val/test splits that never move a document between
splits when the corpus is re-partitioned or re-run, and down-samples
that are a pure function of content keys rather than of Spark's RNG
partition placement. Both are implemented as a content hash -> bucket
-> threshold comparison, entirely in JVM expressions (whole-stage
codegen, no shuffle, no Python), so they cost one projection at any
scale and push down beneath joins.

No reference analog (the reference's only split machinery is the
balanced k-fold in protosc/feature_matrix.py:216-293, which is ported
in folds.py); these close the corpus-management gap a 100-TB pipeline
hits first.

Why md5 and not xxhash64/rand: the bucket must be REPRODUCIBLE OUTSIDE
Spark (the DuckDB oracle, a downstream pandas consumer, a different
engine re-reading the split) — md5 is the one keyed hash every engine
computes identically. 15 hex digits = 60 bits, exact in an int64 in
both Spark (``conv(..., 16, 10)``) and DuckDB (``('0x' || ...)::
BIGINT``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000  # split resolution: 0.01% granularity


def hash_bucket(
    key_cols: Sequence[str], salt: str = "", n_buckets: int = N_BUCKETS
) -> Column:
    """Deterministic bucket in [0, n_buckets) from the concatenated key
    columns + salt. Stable across partitioning, parallelism, engines.
    """
    key = F.concat_ws("\x1f", F.lit(salt), *[F.col(c) for c in key_cols])
    return (
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
        % n_buckets
    ).alias("bucket")


def hash_split(
    df: DataFrame,
    key_cols: Sequence[str],
    weights: Mapping[str, float] | None = None,
    salt: str = "v1",
) -> DataFrame:
    """Assign every row a named split by hash-bucket thresholding.

    ``weights`` maps split name -> fraction (must sum to 1.0); splits
    are assigned by cumulative bucket ranges in the given order, so the
    assignment is a pure function of (key, salt, weights) — adding or
    removing OTHER rows never moves a row between splits, and growing
    one split's fraction only ever *adds* rows to it from its
    neighbor's range (stable incremental re-splits). One codegen'd
    projection: no shuffle, no RNG, no Python.
    """
    weights = dict(weights or {"train": 0.9, "val": 0.05, "test": 0.05})
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    bucket = hash_bucket(key_cols, salt=salt)
    expr: Column | None = None
    cum = 0.0
    # iterate in insertion order; last split takes the remainder so
    # float accumulation can never leave a bucket unassigned
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        hi = int(round(cum * N_BUCKETS))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    fraction: float,
    key_cols: Sequence[str],
    salt: str = "v1",
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by key hash.

    Unlike ``df.sample``, the kept set is a pure function of content:
    re-runs, re-partitions and different cluster sizes keep the SAME
    rows, and nested samples are monotone (fraction 0.1 is a subset of
    fraction 0.2 at the same salt). A filter beneath the scan at any
    scale.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    hi = int(round(fraction * N_BUCKETS))
    return df.where(hash_bucket(key_cols, salt=salt) < F.lit(hi))


def split_oracle_sql(
    key_sql: str,
    weights: Mapping[str, float],
    salt: str = "v1",
) -> str:
    """DuckDB CASE expression computing the identical split label —
    used by the gate oracle and available to downstream consumers that
    need to reproduce the split outside Spark."""
    weights = dict(weights)
    bucket = (
        f"(('0x' || substr(md5('{salt}' || chr(31) || {key_sql}), 1, 15))"
        f"::BIGINT % {N_BUCKETS})"
    )
    names = list(weights)
    case = "CASE"
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        hi = int(round(cum * N_BUCKETS))
        case += f" WHEN {bucket} < {hi} THEN '{name}'"
    case += f" ELSE '{names[-1]}' END"
    return case


def mixture_rates(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    total_frac: float = 0.5,
) -> DataFrame:
    """Per-group temperature keep rates (group_col, rate) — the tiny
    |groups|-row table :func:`mixture_sample` thresholds against.
    Split out so the rates can come from a STATIC reference corpus and
    the sampling filter applied to a STREAM (stream-static broadcast
    join + JVM filter, a supported Structured Streaming shape; pinned
    stream==batch in tests/test_streaming.py)."""
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    totals = counts.agg(
        F.sum("__n").alias("__N"),
        F.sum(F.pow("__n", F.lit(float(alpha)))).alias("__S"),
    )
    # explicit aliases: counts and totals share lineage (totals is an
    # aggregate OF counts), so unqualified refs are ambiguous
    return (
        counts.alias("c")
        .crossJoin(F.broadcast(totals.alias("t")))
        .select(
            F.col(f"c.{group_col}").alias(group_col),
            F.least(
                F.lit(1.0),
                (F.lit(float(total_frac)) * F.col("t.__N") / F.col("t.__S"))
                * F.pow(F.col("c.__n"), F.lit(float(alpha) - 1.0)),
            ).alias("rate"),
        )
    )


def mixture_sample(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    total_frac: float = 0.5,
    key_cols: Sequence[str] = ("doc_id",),
    salt: str = "v1",
    rates: DataFrame | None = None,
) -> DataFrame:
    """Temperature-scaled data-mixture downsampling (the GPT-3 /
    multilingual-pretraining recipe): keep a deterministic subset whose
    per-group sizes are proportional to ``n_g ** alpha`` instead of
    ``n_g`` — ``alpha < 1`` up-weights rare sources/languages relative
    to dominant ones, ``alpha = 1`` is plain uniform sampling,
    ``alpha = 0`` targets equal counts per group. ``total_frac`` sets
    the overall corpus fraction kept; per-group keep rates are capped
    at 1 (a saturated rare group keeps everything and the realized
    total undershoots — rates are NOT redistributed, keeping the rate
    a pure per-group function).

    Per-group rate: ``r_g = min(1, C * n_g**(alpha-1))`` with
    ``C = total_frac * N / sum_g n_g**alpha``. Row decisions reuse the
    engine's content-hash bucket rule, so the kept set is a pure
    function of (content key, salt, counts) — identical at any
    parallelism and reproducible outside Spark (the gate's DuckDB
    oracle re-derives it end to end, including the rates).

    Scale shape: ONE tiny groupBy(group) count aggregate, a broadcast
    1-row-totals cross join to form rates (|groups| rows), one
    broadcast join back to the corpus, and a JVM-only filter — no
    collect, no Python, no corpus shuffle.
    """
    if not 0.0 <= total_frac <= 1.0:
        raise ValueError(f"total_frac must be in [0, 1], got {total_frac}")
    if rates is None:
        rates = mixture_rates(df, group_col, alpha, total_frac)
    # eqNullSafe: groupBy counted NULL as its own group and computed a
    # rate for it, so NULL-group rows must join that rate row too — a
    # plain equi-join would silently drop every NULL-group document
    rates = rates.withColumnRenamed(group_col, "__grp").withColumnRenamed(
        "rate", "__rate"
    )
    return (
        df.join(
            F.broadcast(rates),
            F.col(group_col).eqNullSafe(F.col("__grp")),
        )
        .where(
            hash_bucket(key_cols, salt=salt)
            < F.floor(F.col("__rate") * F.lit(N_BUCKETS))
        )
        .drop("__rate", "__grp")
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 1 << 14,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Hashed-unigram importance log-weights of ``raw`` documents
    toward a ``target`` corpus — the DSIR recipe (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    estimate bag-of-hashed-token distributions p_target and p_raw with
    add-``alpha`` smoothing over ``n_buckets`` md5 buckets, then
    log w_i = sum over doc tokens of log(p_target(b) / p_raw(b)).

    Returns (id, n_tokens, log_weight). All JVM: tokens hash with the
    engine's md5-bucket construction (reproducible in the DuckDB
    oracle), the two distributions are two groupBy counts (bounded by
    n_buckets rows), and the per-document sum is one explode + one
    BROADCAST join against the bucket-ratio table + one groupBy(id) —
    linear in corpus tokens, no Python, no driver state beyond the
    broadcast ratio table (n_buckets rows).
    """
    B = int(n_buckets)
    a = float(alpha)

    def tok_buckets(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("__id"),
            F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
        ).select(
            "__id",
            (
                F.conv(
                    F.substring(F.md5(F.col("__tok")), 1, 15), 16, 10
                ).cast("bigint")
                % B
            ).alias("b"),
        )

    t_counts = tok_buckets(target).groupBy("b").agg(
        F.count(F.lit(1)).cast("double").alias("__tn")
    )
    r_toks = tok_buckets(raw)
    r_counts = r_toks.groupBy("b").agg(
        F.count(F.lit(1)).cast("double").alias("__rn")
    )
    t_tot = t_counts.agg(F.sum("__tn").alias("__T"))
    r_tot = r_counts.agg(F.sum("__rn").alias("__R"))
    ratios = (
        t_counts.join(r_counts, "b", "full")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce("__tn", F.lit(0.0)) + F.lit(a))
                    / (F.col("__T") + F.lit(a * B))
                )
                - F.log(
                    (F.coalesce("__rn", F.lit(0.0)) + F.lit(a))
                    / (F.col("__R") + F.lit(a * B))
                )
            ).alias("__lr"),
        )
    )
    return (
        r_toks.join(F.broadcast(ratios), "b")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__lr").alias("log_weight"),
        )
        .select(
            F.col("__id").alias(id_col), "n_tokens", "log_weight"
        )
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    frac: float = 0.25,
    n_buckets: int = 1 << 14,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    key_cols: Sequence[str] = ("doc_id",),
    salt: str = "v1",
) -> DataFrame:
    """Importance-resample ``raw`` toward ``target``: keep each
    document with probability min(1, frac * n * softmax(log_weight)) —
    documents whose hashed-token distribution looks like the target
    are kept preferentially, at an expected overall rate of ``frac``
    (saturated high-weight docs cap at 1 and the realized total
    undershoots; rates are NOT redistributed, keeping the decision a
    pure per-document function, same contract as mixture_sample).
    Row decisions reuse the engine's content-hash bucket rule, so the
    kept set is deterministic at any parallelism and reproducible in
    the DuckDB oracle end to end.

    Scale shape: dsir_log_weights (linear, broadcast ratio table) +
    two 1-row aggregates (max for a stable softmax, then the sum) +
    one broadcast of the tiny (id, prob) decision inputs back onto the
    corpus — no global sort, no rank window, no collect."""
    lw = dsir_log_weights(raw, target, n_buckets, text_col, id_col, alpha)
    mx = lw.agg(
        F.max("log_weight").alias("__mx"),
        F.count(F.lit(1)).cast("double").alias("__n"),
    )
    u = lw.crossJoin(F.broadcast(mx)).withColumn(
        "__u", F.exp(F.col("log_weight") - F.col("__mx"))
    )
    z = u.agg(F.sum("__u").alias("__Z"))
    probs = (
        u.crossJoin(F.broadcast(z))
        .select(
            F.col(id_col),
            "n_tokens",
            "log_weight",
            F.least(
                F.lit(1.0),
                F.lit(float(frac)) * F.col("__n") * F.col("__u")
                / F.col("__Z"),
            ).alias("keep_prob"),
        )
    )
    return probs.where(
        hash_bucket(key_cols, salt=salt)
        < F.floor(F.col("keep_prob") * N_BUCKETS)
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: int = 0,
    bucket_factor: int = 32,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirtakis
    2006, the exponential-race / A-ES scheme): each row draws a
    deterministic uniform u from the engine-stable md5 hash of its id
    (plus ``salt`` for independent draws) and races with key
    -ln(u) / w; the k smallest keys win, which selects each item with
    probability proportional to its weight — the "sample documents
    by quality/length for a training mix" primitive that per-group
    rate sampling (mixture_sample) and importance reweighting
    (dsir_sample) don't cover.

    Determinism contract: u is a pure function of (id, salt), keys
    are ranked by (round(key, 9), id) so a last-ulp difference
    between the JVM's and the oracle's ln() cannot flip ranks, and
    the top-k runs two-phase ((id-bucket) partial then global) —
    skew-safe, identical result to a single global window. Rows with
    non-positive weight are excluded (they'd never win the race).
    All pure JVM."""
    from pyspark.sql import Window as W

    two60 = float(1 << 60)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{salt}"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + 1.0) / F.lit(two60)
    key = -F.log(u) / F.col(weight_col).cast("double")
    scored = df.where(F.col(weight_col) > 0).withColumn(
        "__key", F.round(key, 9)
    )
    order = [F.asc("__key"), F.asc(id_col)]
    w1 = W.partitionBy(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(bucket_factor))
    ).orderBy(*order)
    w2 = W.orderBy(*order)
    return (
        scored.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .withColumn("rnk", F.row_number().over(w2))
        .where(F.col("rnk") <= k)
        .drop("__key", "__r1")
    )


# Poisson(1) CDF at k = 0..9, scaled to the md5 hash-uniform's
# integer domain [0, 2^60): T[k] = floor(P(X <= k) * 2^60). A row's
# replicate weight is the number of thresholds at or below its hash
# integer — pure integer comparisons, so Spark and any SQL oracle
# agree bit-for-bit. Truncating at w = 10 ignores 1.1e-7 of mass
# (deterministically, on both sides).
POISSON1_T60 = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
    1152236456152946176,
    1152825534095764608,
    1152909688087595776,
    1152920207336574720,
    1152921376142016768,
)


def poisson_bootstrap(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str],
    group_col: str | None = None,
    n_reps: int = 100,
    alpha: float = 0.05,
) -> DataFrame:
    """Percentile confidence interval for the per-group mean of an
    integer-valued column via the POISSON BOOTSTRAP (Chamandy et al.
    2012, "Estimating uncertainty for massive data streams" — the
    standard resampling scheme when rows cannot be drawn jointly):
    classic bootstrap needs n draws WITH replacement per replicate —
    impossible to coordinate across partitions — but each row's
    multiplicity in a replicate is asymptotically an independent
    Poisson(1), so every row locally derives its own weight for all
    R replicates and the shuffle only carries |groups| x R partial
    sums.

    Determinism/exactness: the weight is the count of
    :data:`POISSON1_T60` thresholds at or below the row's md5
    hash-uniform integer (the engine-wide ``hash_bucket`` rule keyed
    by ``key_cols`` + the replicate index) — integer compares only;
    per-replicate sum(w) and sum(w * x) are exact integers, each
    replicate mean is one float division, and the percentile CI
    picks discrete ranks floor(alpha/2 * R_eff) + 1 and its mirror
    from the sorted replicate means (replicates whose sum(w) = 0 —
    probability e^-n — are dropped and R_eff pinned). A SQL oracle
    replays every step digit-for-digit.

    Scale shape: one raw scan exploded R ways (map-only; the md5 per
    (row, replicate) is embarrassingly parallel), a map-side-combined
    groupBy down to |groups| x R cells, then an R-sized sorted array
    per group — driver never sees more than the output. Output:
    (group?, n, mean, eff_reps, ci_lo, ci_hi)."""
    dec = "decimal(38,0)"
    keys = [group_col] if group_col else []
    ex = df.withColumn(
        "__rep",
        F.explode(F.sequence(F.lit(0), F.lit(int(n_reps) - 1))),
    )
    key = F.concat_ws(
        "\x1f",
        F.lit("boot"),
        *[F.col(c) for c in key_cols],
        F.col("__rep"),
    )
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    w = sum(
        (h >= F.lit(t)).cast("int") for t in POISSON1_T60
    ).cast("bigint")
    x = F.col(value_col).cast(dec)
    per = (
        ex.groupBy(*keys, "__rep")
        .agg(
            F.sum(w.cast(dec)).alias("__sw"),
            F.sum(w.cast(dec) * x).alias("__swx"),
            F.count(F.lit(1)).cast("bigint").alias("__nr"),
            F.sum(x).alias("__sx"),
        )
        # |groups| x R rows; feeds the CI AND the point estimate
        # (each row appears exactly once per replicate, so any one
        # replicate's count/sum(x) IS the group's n / exact sum) —
        # ONE raw scan total
        .localCheckpoint(eager=True)
    )
    reps = (
        per.where(F.col("__sw") > 0)
        .select(
            *keys,
            (
                F.col("__swx").cast("double")
                / F.col("__sw").cast("double")
            ).alias("__mean_r"),
        )
    )
    ci = reps.groupBy(*keys).agg(
        F.sort_array(F.collect_list("__mean_r")).alias("__ms")
    )
    eff = F.size("__ms")
    lo_rank = (
        F.floor(F.lit(float(alpha) / 2.0) * eff.cast("double"))
        .cast("int")
        + F.lit(1)
    )
    hi_rank = eff - lo_rank + F.lit(1)
    point = per.where(F.col("__rep") == 0).select(
        *keys,
        F.col("__nr").alias("n"),
        (
            F.col("__sx").cast("double")
            / F.col("__nr").cast("double")
        ).alias("mean"),
    )
    joined = point.join(ci, keys) if keys else point.crossJoin(ci)
    return joined.select(
        *keys,
        "n",
        "mean",
        eff.cast("bigint").alias("eff_reps"),
        F.element_at("__ms", lo_rank).alias("ci_lo"),
        F.element_at("__ms", hi_rank).alias("ci_hi"),
    )
