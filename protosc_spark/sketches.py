"""Mergeable distinct-count sketches (classic HyperLogLog, Flajolet et
al. 2007) — the incremental-rollup primitive the snapshot tables
exist for: compute a sketch per (day, source) once, store it as an
ordinary array column, and answer "distinct tokens this quarter"
by MERGING stored sketches (register-wise max, O(m) per group) instead
of rescanning the corpus. Spark's built-in approx_count_distinct
cannot persist or merge its state across runs; this one can.

Engine-stable hashing: the same md5-prefix BIGINT hash the sampling
rules use (``conv(substr(md5(v),1,15),16,10)``, 60 bits), so a DuckDB
oracle reproduces every register and the estimate bit-for-bit — the
gate checks the full computation, not a tolerance.

Layout: p index bits (m = 2^p registers), rank = leading-zero count
of the remaining 60-p bits + 1. Estimate = alpha_m * m^2 /
sum(2^-rank) with the small-range linear-counting correction
(E <= 2.5m and empty registers present -> m * ln(m / V)). The
HLL++ empirical bias tables are deliberately not transcribed; classic
HLL keeps every constant derivable from the published formula.

All pure JVM expressions — no Python anywhere.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

HLL_P = 12  # 4096 registers, ~1.6% standard error
_HASH_BITS = 60


def _alpha(m: int) -> float:
    # published alpha_m for m >= 128 (Flajolet et al. 2007, Fig. 3)
    return 0.7213 / (1.0 + 1.079 / m)


def _hash60(col: Column) -> Column:
    """60-bit engine-stable hash: BIGINT of the first 15 hex chars of
    md5 — reproducible in DuckDB as ('0x'||substr(md5(v),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _registers(df: DataFrame, keys: list[str], value_col: str,
               p: int) -> DataFrame:
    """(keys..., idx, rank): max rank per occupied register. One
    explode-free projection + one map-side-combined groupBy."""
    w_bits = _HASH_BITS - p
    two_w = 1 << w_bits
    base = df.select(*keys, _hash60(F.col(value_col)).alias("__h"))
    w = F.pmod(F.col("__h"), F.lit(two_w))
    # highest-set-bit position of w via the base-2 string (no clz
    # builtin): bin(w) prints no leading zeros, so its length IS the
    # bit position; w = 0 -> 0 occupied bits -> rank = w_bits + 1
    bits = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
    return (
        base.select(
            *keys,
            F.expr(f"__h DIV {two_w}").cast("bigint").alias("idx"),
            (F.lit(w_bits) - bits + 1).cast("int").alias("rank"),
        )
        .groupBy(*keys, "idx")
        .agg(F.max("rank").alias("rank"))
    )


def _estimate_from_stats(m: int) -> Column:
    """Estimate from per-group aggregates ``__z`` (sum of 2^-rank over
    OCCUPIED registers) and ``__occ`` (occupied-register count):
    empty registers each contribute 2^0 = 1 to the harmonic sum."""
    z = F.col("__z") + (F.lit(m) - F.col("__occ"))
    raw = F.lit(_alpha(m) * m * m) / z
    v = F.lit(m) - F.col("__occ")  # empty registers
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    return F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), linear
    ).otherwise(raw)


def hll_distinct(df: DataFrame, keys: list[str] | str, value_col: str,
                 p: int = HLL_P) -> DataFrame:
    """Per-group distinct-count estimate, straight from the register
    table (no sketch materialization): (keys..., hll_distinct double).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    m = 1 << p
    regs = _registers(df, keys, value_col, p)
    return (
        regs.groupBy(*keys)
        .agg(
            F.sum(F.pow(F.lit(2.0), -F.col("rank"))).alias("__z"),
            F.count(F.lit(1)).cast("bigint").alias("__occ"),
        )
        .select(
            *keys,
            F.round(_estimate_from_stats(m), 4).alias("hll_distinct"),
        )
    )


def hll_sketch(df: DataFrame, keys: list[str] | str, value_col: str,
               p: int = HLL_P) -> DataFrame:
    """Materialize the MERGEABLE sketch: (keys..., sketch array<int>
    of length 2^p). Store it next to a rollup (e.g. per day x source
    in the snapshot tables); later periods merge with
    :func:`hll_merge` without touching the raw rows again."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    m = 1 << p
    regs = _registers(df, keys, value_col, p)
    pairs = regs.groupBy(*keys).agg(
        F.map_from_entries(
            F.collect_list(F.struct("idx", "rank"))
        ).alias("__m")
    )
    sketch = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.coalesce(
            F.element_at("__m", i.cast("bigint")), F.lit(0)
        ).cast("int"),
    )
    return pairs.select(*keys, sketch.alias("sketch"))


def hll_merge(df: DataFrame, keys: list[str] | str,
              sketch_col: str = "sketch") -> DataFrame:
    """Merge sketch rows into one sketch per key group: register-wise
    max. Explode-based (scales with rows x m, no per-group collect):
    posexplode -> (keys, pos) max -> reassemble."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    exploded = df.select(
        *keys, F.posexplode(sketch_col).alias("idx", "rank")
    ).groupBy(*keys, "idx").agg(F.max("rank").alias("rank"))
    merged = exploded.groupBy(*keys).agg(
        F.map_from_entries(
            F.collect_list(F.struct("idx", "rank"))
        ).alias("__m")
    )
    m = F.size(F.map_keys("__m"))  # registers all present post-explode
    sketch = F.transform(
        F.sequence(F.lit(0), m - 1),
        lambda i: F.element_at("__m", i.cast("bigint")).cast("int"),
    )
    return merged.select(*keys, sketch.alias("sketch"))


def hll_estimate(sketch: Column | str, p: int = HLL_P) -> Column:
    """Estimate column from a stored sketch array (pure expression):
    usable in any select over sketch rollups."""
    m = 1 << p
    s = F.col(sketch) if isinstance(sketch, str) else sketch
    z = F.aggregate(
        s,
        F.lit(0.0),
        lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double")),
    )
    occ = F.size(F.filter(s, lambda r: r > 0))
    raw = F.lit(_alpha(m) * m * m) / z
    v = (F.lit(m) - occ).cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    return F.round(
        F.when((raw <= F.lit(2.5 * m)) & (v > 0), linear).otherwise(raw),
        4,
    )


def hll_error_bound(p: int = HLL_P) -> float:
    """Published standard error of classic HLL: 1.04 / sqrt(m)."""
    return 1.04 / math.sqrt(1 << p)


# ---------------------------------------------------------------------------
# HDR-histogram quantile sketch (mergeable, integer-exact bucketing)
# ---------------------------------------------------------------------------

HDR_S = 7  # sub-bucket precision bits: relative error <= 2^-7 < 0.8%


def _hdr_bucket(x: Column, s: int) -> Column:
    """Bucket id for positive integer x — HDR-histogram layout: exact
    ids below 2^(s+1), then (exponent, s-bit mantissa prefix) buckets.
    Integer-exact and reproducible in DuckDB (highest set bit via the
    base-2 string, shifts via exact small-power division), unlike a
    log-gamma DDSketch index whose float boundary rounding could
    differ between engines. Monotone in x; relative bucket width
    <= 2^-s."""
    e = F.length(F.bin(x)) - 1  # floor(log2 x), x >= 1
    shift = (e - F.lit(s)).cast("int")
    m = F.floor(
        x / F.pow(F.lit(2.0), shift.cast("double"))
    ).cast("bigint")
    return F.when(e <= s, x.cast("bigint")).otherwise(
        shift.cast("bigint") * (1 << s) + m
    )


def _hdr_lower(bucket: Column, s: int) -> Column:
    """Lower bound (representative value) of a bucket id — the exact
    inverse of :func:`_hdr_bucket`'s lower edge."""
    shift = (bucket / (1 << s)).cast("bigint") - 1
    m = bucket - shift * (1 << s)
    return F.when(bucket < (1 << (s + 1)), bucket).otherwise(
        (m * F.pow(F.lit(2.0), shift.cast("double"))).cast("bigint")
    )


def hdr_histogram(df: DataFrame, keys: list[str] | str, value_col: str,
                  s: int = HDR_S) -> DataFrame:
    """Mergeable quantile summary: (keys..., bucket, n) counts per HDR
    bucket. Merge across periods = groupBy(keys, bucket) sum(n) —
    store one histogram per (day, source) and answer quarter
    percentiles without rescanning raw rows. Values must be positive
    integers (token counts, byte sizes, latencies)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return (
        df.select(
            *keys, _hdr_bucket(F.col(value_col), s).alias("bucket")
        )
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def hdr_merge(df: DataFrame, keys: list[str] | str) -> DataFrame:
    """Merge histogram rows (from several periods) bucket-wise."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*keys, "bucket").agg(F.sum("n").alias("n"))


def hdr_quantiles(hist: DataFrame, keys: list[str] | str,
                  qs: list[float], s: int = HDR_S) -> DataFrame:
    """Quantiles from a histogram: for each q, the representative
    (bucket lower bound) of the first bucket whose cumulative count
    reaches ceil(q * n) — the classic discrete rank rule, identical
    in the DuckDB oracle. Output: (keys..., q, value). Relative error
    vs the true order statistic <= 2^-s.

    Scale shape: one window cumsum over the (small) bucket table per
    group + a broadcast-sized quantile list crossJoin; never touches
    raw rows."""
    from pyspark.sql import Window as W

    keys = [keys] if isinstance(keys, str) else list(keys)
    w = W.partitionBy(*keys).orderBy("bucket").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(W.partitionBy(*keys))
    )
    qdf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("total")))
        .groupBy(*keys, "q")
        .agg(F.min("bucket").alias("bucket"))
    )
    return hit.select(
        *keys, "q", _hdr_lower(F.col("bucket"), s).alias("value")
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k theta) sketch: mergeable distinct
# sketches that also support SET OPERATIONS (intersection cardinality),
# which HLL registers cannot express.
# ---------------------------------------------------------------------------

KMV_K = 256
_TWO60 = float(1 << _HASH_BITS)


def kmv_sketch(df: DataFrame, keys: list[str] | str, value_col: str,
               k: int = KMV_K, bucket_factor: int = 32) -> DataFrame:
    """(keys..., kmv array<bigint>): the k smallest DISTINCT 60-bit
    hashes per group, ascending. Deterministic (no sampling coin —
    the hash order IS the sample), so the DuckDB oracle reproduces
    the sketch value-for-value.

    Scale shape: distinct-hash groupBy, then the k-smallest per group
    runs two-phase ((keys, hash-bucket) partial top-k, then global
    over <= bucket_factor*k survivors) — same skew-safe pattern as
    bm25_topk; the final collect_list is k-bounded."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    dh = (
        df.select(*keys, _hash60(F.col(value_col)).alias("h"))
        .groupBy(*keys, "h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .drop("__c")
    )
    return _bottom_k(dh, keys, k, bucket_factor)


def _bottom_k(dh: DataFrame, keys: list[str], k: int,
              bucket_factor: int) -> DataFrame:
    """k smallest DISTINCT values of column ``h`` per key group,
    two-phase skew-safe, assembled ascending into ``kmv``."""
    from pyspark.sql import Window as W

    w1 = W.partitionBy(
        *keys, F.pmod(F.col("h"), F.lit(bucket_factor))
    ).orderBy("h")
    w2 = W.partitionBy(*keys).orderBy("h")
    topk = (
        dh.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .withColumn("__r2", F.row_number().over(w2))
        .where(F.col("__r2") <= k)
    )
    return topk.groupBy(*keys).agg(
        F.sort_array(F.collect_list("h")).alias("kmv")
    )


def kmv_estimate(sketch: Column | str, k: int = KMV_K) -> Column:
    """Distinct-count estimate from a KMV sketch: exact when fewer
    than k distinct hashes were seen, else (k-1) * 2^60 / theta with
    theta = the k-th smallest hash."""
    s = F.col(sketch) if isinstance(sketch, str) else sketch
    n = F.size(s)
    theta = F.element_at(s, k).cast("double")
    return F.round(
        F.when(n < k, n.cast("double")).otherwise(
            F.lit(float(k - 1)) * F.lit(_TWO60) / theta
        ),
        4,
    )


def kmv_merge(df: DataFrame, keys: list[str] | str,
              sketch_col: str = "kmv", k: int = KMV_K) -> DataFrame:
    """Merge sketch rows per key group: union of hash sets, keep the
    k smallest — the sketch of the union, exactly (explode-based,
    same two-phase k-smallest kernel)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    dh = (
        df.select(*keys, F.explode(sketch_col).alias("h"))
        .groupBy(*keys, "h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .drop("__c")
    )
    return _bottom_k(dh, keys, k, bucket_factor=32)


def kmv_intersect_estimate(a: Column | str, b: Column | str,
                           k: int = KMV_K) -> Column:
    """Intersection-cardinality estimate of two KMV sketches (theta
    semantics): candidates = shared hashes below theta_min; estimate
    = |candidates| * 2^60 / theta_min, exact when both sketches are
    under-full (every distinct hash present)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    theta_a = F.when(
        F.size(ca) < k, F.lit(_TWO60)
    ).otherwise(F.element_at(ca, k).cast("double"))
    theta_b = F.when(
        F.size(cb) < k, F.lit(_TWO60)
    ).otherwise(F.element_at(cb, k).cast("double"))
    theta = F.least(theta_a, theta_b)
    shared = F.size(
        F.filter(
            F.array_intersect(ca, cb), lambda h: h.cast("double") < theta
        )
    )
    return F.round(shared.cast("double") * F.lit(_TWO60) / theta, 4)


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency summaries / heavy hitters
# ---------------------------------------------------------------------------

CMS_D = 4     # hash rows: error probability ~ e^-d
CMS_W = 1024  # counters per row: overestimate ~ n_total / w


def _cms_bucket(row: Column, value: Column, w: int) -> Column:
    """Row-salted engine-stable bucket: md5(row ':' value) % w —
    reproducible in DuckDB."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(row.cast("string"), F.lit(":"), value)), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(w))


def cms_table(df: DataFrame, keys: list[str] | str, value_col: str,
              d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Mergeable count-min sketch as a (keys..., row, bucket, c)
    counter table (<= d*w rows per key group). Merge across periods =
    groupBy(keys, row, bucket) sum(c) — store one per (day, source)
    and answer \"how often did X occur this quarter\" from counters.

    Scale shape: a d-way sequence explode before ONE map-side-combined
    groupBy; counters, never raw values, cross the wire."""
    keys = ([keys] if isinstance(keys, str) else list(keys or []))
    rows = df.select(
        *keys,
        F.col(value_col).alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"),
    )
    return (
        rows.select(
            *keys,
            "row",
            _cms_bucket(F.col("row"), F.col("__v"), w).alias("bucket"),
        )
        .groupBy(*keys, "row", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def cms_merge(df: DataFrame, keys: list[str] | str) -> DataFrame:
    """Merge counter tables from several periods: elementwise sum."""
    keys = ([keys] if isinstance(keys, str) else list(keys or []))
    return df.groupBy(*keys, "row", "bucket").agg(
        F.sum("c").alias("c")
    )


def cms_estimate(table: DataFrame, queries: DataFrame,
                 value_col: str, d: int = CMS_D,
                 w: int = CMS_W) -> DataFrame:
    """Frequency estimates for a bounded query set: min over the d
    row counters at each query's buckets (the classic CMS upper
    bound — never an underestimate). Queries broadcast; one join
    against the counter table."""
    q = queries.select(F.col(value_col).alias("__q")).distinct()
    qb = q.select(
        "__q",
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"),
    ).select(
        "__q",
        "row",
        _cms_bucket(F.col("row"), F.col("__q"), w).alias("bucket"),
    )
    joined = table.join(F.broadcast(qb), ["row", "bucket"])
    return (
        joined.groupBy("__q")
        .agg(F.min("c").alias("est_count"))
        .select(F.col("__q").alias(value_col), "est_count")
    )


def hll_window_distinct(df: DataFrame, day_col: str, value_col: str,
                        window_days: int = 7,
                        p: int = HLL_P) -> DataFrame:
    """Sliding-window distinct counts from DAILY register tables —
    the DAU/WAU pattern: each day's registers are built once and
    every overlapping window position merges register rows
    (register-wise max) instead of rescanning raw rows. Output:
    (target_day, hll_distinct) for every day present.

    Scale shape: the register table is <= days x m rows; the window
    expansion is a broadcast range join against the (tiny) distinct-
    day list, then one groupBy per (target_day, register). Raw rows
    are touched exactly once."""
    m = 1 << p
    regs = _registers(df, [day_col], value_col, p)
    days = df.select(
        F.col(day_col).alias("target_day")
    ).distinct()
    joined = regs.join(
        F.broadcast(days),
        (F.col(day_col) <= F.col("target_day"))
        & (
            F.col(day_col)
            >= F.date_sub(F.col("target_day"), window_days - 1)
        ),
    )
    merged = joined.groupBy("target_day", "idx").agg(
        F.max("rank").alias("rank")
    )
    return (
        merged.groupBy("target_day")
        .agg(
            F.sum(F.pow(F.lit(2.0), -F.col("rank"))).alias("__z"),
            F.count(F.lit(1)).cast("bigint").alias("__occ"),
        )
        .select(
            "target_day",
            F.round(_estimate_from_stats(m), 4).alias("hll_distinct"),
        )
    )


def psi_by_group(df: DataFrame, group_col: str, value_col: str,
                 s: int = HDR_S, floor: float = 1e-6) -> DataFrame:
    """Population Stability Index of each group's value distribution
    against the GLOBAL distribution — the standard drift monitor for
    corpus/feature pipelines (PSI < 0.1 stable, 0.1-0.25 moderate,
    > 0.25 major shift). Bins are the integer-exact HDR buckets, so
    the binning can never disagree between engines; empty-bin
    proportions are floored at ``floor`` (the standard guard, PSI is
    undefined at 0).

    PSI_g = sum_bins (p_g - p_all) * ln(p_g / p_all).

    Scale shape: ONE bucket groupBy per (group, bucket) + a global
    rollup of the same table; the PSI sum runs over the (tiny)
    bucket table. Pure JVM."""
    grp = (
        df.select(
            F.col(group_col).alias("g"),
            _hdr_bucket(F.col(value_col), s).alias("bucket"),
        )
        .groupBy("g", "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    gtot = grp.groupBy("g").agg(F.sum("n").alias("gn"))
    allb = grp.groupBy("bucket").agg(F.sum("n").alias("an"))
    atot = grp.agg(F.sum("n").alias("at"))
    # every (group, bucket-seen-anywhere) pair, so a bucket missing
    # from one group still contributes (floor vs p_all)
    pairs = gtot.crossJoin(F.broadcast(allb)).crossJoin(
        F.broadcast(atot)
    )
    joined = pairs.join(grp, ["g", "bucket"], "left").select(
        "g",
        F.greatest(
            F.coalesce(F.col("n"), F.lit(0.0)) / F.col("gn"),
            F.lit(floor),
        ).alias("pg"),
        F.greatest(
            (F.col("an") / F.col("at")), F.lit(floor)
        ).alias("pa"),
    )
    return (
        joined.groupBy("g")
        .agg(
            F.round(
                F.sum(
                    (F.col("pg") - F.col("pa"))
                    * F.log(F.col("pg") / F.col("pa"))
                ),
                6,
            ).alias("psi")
        )
        .select(F.col("g").alias(group_col), "psi")
    )


def mad_robust_stats(df: DataFrame, keys: list[str] | str,
                     value_col: str, s: int = HDR_S) -> DataFrame:
    """Median + MAD (median absolute deviation) per group, computed
    ENTIRELY from the mergeable HDR histogram: med is the discrete-
    rank bucket representative at q=0.5; the deviation histogram
    re-buckets |representative - med| weighted by the bucket counts,
    so the MAD needs NO second scan of raw rows — both statistics
    come from the (tiny) bucket table and merge across periods like
    any HDR rollup. Exact when values and deviations sit below
    2^(s+1) (bucket = value there); relative error <= 2^-s above.
    Output: (keys..., med, mad), both BIGINT.

    Scale shape: one raw scan (the histogram groupBy); everything
    after runs on group x bucket rows. Pure JVM."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    hist = hdr_histogram(df, keys, value_col, s)
    med = hdr_quantiles(hist, keys, [0.5], s).select(
        *keys, F.col("value").alias("med")
    )
    dev_hist = (
        hist.join(med, keys)
        .select(
            *keys,
            "med",
            _hdr_bucket(
                F.abs(_hdr_lower(F.col("bucket"), s) - F.col("med")), s
            ).alias("bucket"),
            "n",
        )
        .groupBy(*keys, "med", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    return hdr_quantiles(dev_hist, keys + ["med"], [0.5], s).select(
        *keys, "med", F.col("value").alias("mad")
    )


def mad_outliers(df: DataFrame, keys: list[str] | str, value_col: str,
                 s: int = HDR_S, threshold: float = 3.5) -> DataFrame:
    """Robust per-group outlier flags: the Iglewicz-Hoaglin modified
    z-score z = 0.6745 * (x - med) / mad against the sketch-derived
    med/mad of :func:`mad_robust_stats` (|z| > 3.5 is the published
    cutoff). Degenerate mad = 0 (over half the mass at the median
    representative): z is NULL and any x != med is flagged.

    Input rows pass through with (med, mad, z, is_outlier) appended;
    z is computed from the RAW value, only the med/mad statistics are
    sketch approximations. Scale shape: the stats table is one row
    per group — the join broadcasts under AQE; raw data is scanned
    once here and once in the histogram."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    stats = mad_robust_stats(df, keys, value_col, s)
    x = F.col(value_col).cast("bigint")
    z = F.when(
        F.col("mad") > 0,
        F.lit(0.6745) * (x - F.col("med")) / F.col("mad"),
    )
    return (
        df.join(stats, keys)
        .withColumn("z", z)
        .withColumn(
            "is_outlier",
            F.when(F.col("mad") > 0, F.abs(F.col("z")) > threshold)
            .otherwise(x != F.col("med")),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str = "winsorized",
    s: int = HDR_S,
) -> DataFrame:
    """Winsorize (clip) a positive-integer column at its [lo, hi]
    quantiles — the standard heavy-tail taming transform before
    mean-based statistics — with the thresholds read off the HDR
    HISTOGRAM (integer-exact bucketing, discrete-rank rule, relative
    error <= 2^-s), so no sort or global row window ever touches the
    corpus: one histogram aggregation + a 1-row broadcast of the two
    thresholds + a map-only clip.

    NULL values pass through as NULL. Thresholds are bucket lower
    bounds (the hdr_quantiles contract). Output: input columns +
    ``out_col``."""
    v = F.col(value_col)
    hist = hdr_histogram(df.where(v.isNotNull()), [], value_col, s)
    qs = hdr_quantiles(hist, [], [lo, hi], s)
    b = qs.groupBy().agg(
        F.min(F.when(F.col("q") == lo, F.col("value"))).alias("__lo"),
        F.min(F.when(F.col("q") == hi, F.col("value"))).alias("__hi"),
    )
    return (
        df.crossJoin(F.broadcast(b))
        .withColumn(
            out_col,
            F.when(
                v.isNotNull(),
                F.least(F.greatest(v, F.col("__lo")), F.col("__hi")),
            ),
        )
        .drop("__lo", "__hi")
    )


def quantiles_exact(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    qs: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """EXACT discrete quantiles per group via the value-histogram
    collapse — the exact companion to the HDR sketch (hdr_quantiles
    is the mergeable approximate path for unbounded domains; this is
    the zero-error path whenever the column's DISTINCT-value count is
    bounded, which integer feature columns almost always are):

        q-th quantile = the smallest value v whose cumulative count
        reaches ceil(q * n)  (percentile_disc lower convention)

    Scale shape: ONE map-side-combined groupBy(group, value) down to
    the distinct-value histogram, a cumulative window over THAT
    (distinct-value-sized, the rank_normalize trick — never a sort
    of raw rows), and an explode of the q list against the
    |groups|-sized count table. Everything is integer comparisons —
    no interpolation, no floats except the q literals — so any SQL
    engine replays it exactly. Output: (group?, q, n, value)."""
    from pyspark.sql import Window as W

    keys = [group_col] if group_col else []
    hist = df.groupBy(*keys, value_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    ).localCheckpoint(eager=True)  # feeds cum + totals: scan once
    w = (
        W.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = hist.select(
        *[F.col(k).alias(f"__g_{k}") for k in keys],
        F.col(value_col).alias("__v"),
        F.sum("__c").over(w).alias("__cum"),
        (F.sum("__c").over(w) - F.col("__c")).alias("__prev"),
    )
    tot = hist.groupBy(*keys).agg(
        F.sum("__c").cast("bigint").alias("n")
    )
    qcol = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    targets = tot.select(*keys, "n", qcol).select(
        *keys,
        "n",
        "q",
        F.greatest(
            F.ceil(F.col("q") * F.col("n").cast("double")).cast(
                "bigint"
            ),
            F.lit(1),
        ).alias("__rank"),
    )
    bracket = (F.col("__cum") >= F.col("__rank")) & (
        F.col("__prev") < F.col("__rank")
    )
    cond = bracket
    for k in keys:
        cond = (F.col(k) == F.col(f"__g_{k}")) & cond
    j = targets.join(cum, on=cond)
    return j.select(
        *keys,
        "q",
        "n",
        F.col("__v").alias("value"),
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_col: str,
    p_millis: Sequence[int] = (500, 900),
) -> DataFrame:
    """Exact weighted quantiles per group — "which value does the
    p-th unit of MASS sit at" (the corpus-report statistic: the
    median token lives in a document of length L, which plain
    row-quantiles understate badly on heavy-tailed corpora).

    Rule: the left-continuous weighted quantile, the smallest value
    whose cumulative weight reaches p of the total — evaluated as the
    pure-integer cross-multiplication 1000 * cumw >= p_milli * totw
    (weights must be nonneg integers; no float division anywhere), so
    both engines agree bit for bit.  Rows with NULL or nonpositive
    weight carry no mass and are excluded.

    Scale: one groupBy(group, value) weight histogram (map-side
    combined), per-group cumulative window over distinct values, the
    threshold probe a broadcast of |groups| x |levels| rows.  Output:
    (group, p_milli, quantile, total_weight) ordered by (group,
    p_milli).
    """
    hist = (
        df.where(
            F.col(value_col).isNotNull()
            & (F.col(weight_col).cast("bigint") > 0)
        )
        .groupBy(
            F.col(group_col).alias("g"), F.col(value_col).alias("v")
        )
        .agg(F.sum(F.col(weight_col).cast("bigint")).alias("w"))
    )
    wc = W.partitionBy("g").orderBy("v").rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = hist.select(
        "g", "v", F.sum("w").over(wc).alias("cumw")
    ).localCheckpoint(eager=True)
    tot = cum.groupBy("g").agg(
        F.max("cumw").cast("bigint").alias("totw")
    )
    ps = df.sparkSession.createDataFrame(
        [(int(p),) for p in p_millis], "p_milli int"
    )
    probes = tot.crossJoin(F.broadcast(ps))
    out = (
        probes.join(
            cum.select(
                F.col("g").alias("__cg"), "v", "cumw"
            ),
            (F.col("g") == F.col("__cg"))
            & (
                F.col("cumw") * F.lit(1000)
                >= F.col("p_milli").cast("bigint") * F.col("totw")
            ),
        )
        .groupBy("g", "p_milli", "totw")
        .agg(F.min("v").alias("quantile"))
    )
    return out.select(
        F.col("g").alias(group_col),
        "p_milli",
        "quantile",
        F.col("totw").alias("total_weight"),
    ).orderBy(group_col, "p_milli")
