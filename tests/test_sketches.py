"""Mergeable HyperLogLog sketches (protosc_spark.sketches): accuracy
vs exact distinct counts, sketch/direct-path agreement, register-wise
merge semantics, partitioning independence, and plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from protosc_spark.sketches import (
    hll_distinct,
    hll_error_bound,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _vals(spark, n_rows, n_distinct, g="a"):
    return spark.range(n_rows).select(
        F.lit(g).alias("g"),
        F.concat(
            F.lit(g), F.lit("v"), (F.col("id") % n_distinct).cast("string")
        ).alias("v"),
    )


@pytest.mark.parametrize("n_distinct", [500, 5000, 20000])
def test_hll_estimate_within_error_bound(spark, n_distinct):
    df = _vals(spark, 3 * n_distinct, n_distinct)
    est = hll_distinct(df, "g", "v").collect()[0].hll_distinct
    rel = abs(est - n_distinct) / n_distinct
    assert rel < 3 * hll_error_bound(), (est, n_distinct, rel)


def test_hll_linear_counting_small_range(spark):
    """Tiny cardinalities hit the linear-counting correction and are
    near-exact (the raw HLL formula would be badly biased here)."""
    df = _vals(spark, 1000, 100)
    est = hll_distinct(df, "g", "v").collect()[0].hll_distinct
    assert abs(est - 100) / 100 < 0.02, est


def test_hll_sketch_path_matches_direct_path(spark):
    df = _vals(spark, 10000, 4000)
    direct = hll_distinct(df, "g", "v").collect()[0].hll_distinct
    via_sketch = (
        hll_sketch(df, "g", "v")
        .select(hll_estimate("sketch").alias("e"))
        .collect()[0]
        .e
    )
    assert abs(direct - via_sketch) < 1e-6


def test_hll_merge_equals_sketch_of_union(spark):
    """The incremental-rollup contract: sketches of disjoint halves,
    merged register-wise, are IDENTICAL (array-exact, not just close)
    to the sketch of the union — so stored daily sketches answer
    range queries without rescanning raw rows."""
    a = _vals(spark, 6000, 3000, "x").where(F.col("id") < 3000)
    b = _vals(spark, 6000, 3000, "x").where(F.col("id") >= 3000)
    union = a.unionByName(b)
    sk_union = hll_sketch(union, "g", "v").collect()[0].sketch
    merged = hll_merge(
        hll_sketch(a, "g", "v").unionByName(hll_sketch(b, "g", "v")),
        "g",
    ).collect()[0].sketch
    assert list(merged) == list(sk_union)


def test_hll_partitioning_independence(spark):
    df = _vals(spark, 8000, 2500)
    e1 = hll_distinct(df.repartition(1), "g", "v").collect()[0].hll_distinct
    e2 = hll_distinct(df.repartition(17), "g", "v").collect()[0].hll_distinct
    assert e1 == e2


def test_hll_plan_no_python_no_cartesian(spark):
    df = _vals(spark, 100, 50)
    p = (
        hll_distinct(df, "g", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


# --- HDR-histogram quantile sketch ---


def _hdr_vals(spark, seed=0, n=20000, hi=5000):
    rng = np.random.default_rng(seed)
    vals = rng.integers(1, hi, n).tolist()
    return (
        spark.createDataFrame(
            [("a", int(v)) for v in vals], "g string, v long"
        ),
        np.sort(np.array(vals)),
    )


def test_hdr_quantiles_within_relative_error_bound(spark):
    import math

    from protosc_spark.sketches import HDR_S, hdr_histogram, hdr_quantiles

    df, exact = _hdr_vals(spark)
    qs = [0.5, 0.9, 0.99]
    out = hdr_quantiles(hdr_histogram(df, "g", "v"), "g", qs).collect()
    assert len(out) == 3
    for r in out:
        true = exact[math.ceil(r.q * len(exact)) - 1]
        assert abs(r.value - true) / true <= 2 ** -HDR_S, (r, true)


def test_hdr_small_values_are_exact(spark):
    """Values below 2^(s+1) = 256 occupy exact unit buckets: any
    quantile of small-valued data is the TRUE order statistic."""
    import math

    from protosc_spark.sketches import hdr_histogram, hdr_quantiles

    df, exact = _hdr_vals(spark, seed=3, hi=250)
    out = hdr_quantiles(
        hdr_histogram(df, "g", "v"), "g", [0.25, 0.5, 0.75, 0.99]
    ).collect()
    for r in out:
        assert r.value == exact[math.ceil(r.q * len(exact)) - 1]


def test_hdr_merge_equals_histogram_of_union(spark):
    from protosc_spark.sketches import hdr_histogram, hdr_merge

    df, _ = _hdr_vals(spark, seed=5)
    a = df.where(F.col("v") % 2 == 0)
    b = df.where(F.col("v") % 2 == 1)
    merged = hdr_merge(
        hdr_histogram(a, "g", "v").unionByName(hdr_histogram(b, "g", "v")),
        "g",
    )
    full = hdr_histogram(df, "g", "v")
    got = [(r.bucket, r.n) for r in merged.orderBy("bucket").collect()]
    want = [(r.bucket, r.n) for r in full.orderBy("bucket").collect()]
    assert got == want


def test_hdr_bucket_monotone_and_invertible():
    """Pure-python transcription of the bucket/lower rules: monotone
    in x, lower(bucket(x)) <= x, relative width <= 2^-s."""
    s = 7

    def bucket(x):
        e = x.bit_length() - 1
        if e <= s:
            return x
        return (e - s) * (1 << s) + (x >> (e - s))

    def lower(b):
        if b < 1 << (s + 1):
            return b
        shift = b // (1 << s) - 1
        return (b - shift * (1 << s)) << shift

    prev = 0
    for x in list(range(1, 5000)) + [10**6, 10**9, 2**40]:
        bkt = bucket(x)
        assert bkt >= prev
        prev = bkt
        lo = lower(bkt)
        assert lo <= x and (x - lo) / x <= 2 ** -s


def test_hdr_plan_no_python(spark):
    from protosc_spark.sketches import hdr_histogram, hdr_quantiles

    df, _ = _hdr_vals(spark, n=200)
    p = (
        hdr_quantiles(hdr_histogram(df, "g", "v"), "g", [0.5])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


# --- KMV (bottom-k theta) sketch ---


def _two_groups(spark):
    """Group a: 5000 distinct values; group b: 4000 distinct values,
    2000 of them shared with a."""
    return spark.range(9000).select(
        F.when(F.col("id") < 5000, "a").otherwise("b").alias("g"),
        F.concat(
            F.lit("v"),
            F.when(F.col("id") < 5000, F.col("id"))
            .otherwise(F.col("id") - 2000)
            .cast("string"),
        ).alias("v"),
    )


def test_kmv_estimate_accuracy_and_exact_underfull(spark):
    from protosc_spark.sketches import kmv_estimate, kmv_sketch

    df = _two_groups(spark)
    est = {
        r.g: r.e
        for r in kmv_sketch(df, "g", "v")
        .select("g", kmv_estimate("kmv").alias("e"))
        .collect()
    }
    # k=256 -> sigma ~ 1/sqrt(254) ~ 6.3%; allow 3 sigma
    assert abs(est["a"] - 5000) / 5000 < 0.19
    assert abs(est["b"] - 4000) / 4000 < 0.19
    # under-full sketch: exact by construction
    small = spark.createDataFrame(
        [("s", f"x{i}") for i in range(40)], "g string, v string"
    )
    e = (
        kmv_sketch(small, "g", "v")
        .select(kmv_estimate("kmv").alias("e"))
        .collect()[0]
        .e
    )
    assert e == 40.0


def test_kmv_merge_equals_sketch_of_union(spark):
    from protosc_spark.sketches import kmv_merge, kmv_sketch

    df = _two_groups(spark)
    sk = kmv_sketch(df, "g", "v")
    merged = kmv_merge(
        sk.select(F.lit("all").alias("g"), "kmv"), "g"
    ).collect()[0].kmv
    union = kmv_sketch(
        df.select(F.lit("all").alias("g"), "v"), "g", "v"
    ).collect()[0].kmv
    assert list(merged) == list(union)


def test_kmv_intersection_estimate(spark):
    from protosc_spark.sketches import kmv_intersect_estimate, kmv_sketch

    df = _two_groups(spark)
    sk = kmv_sketch(df, "g", "v")
    pair = (
        sk.where(F.col("g") == "a")
        .select(F.col("kmv").alias("ka"))
        .crossJoin(
            sk.where(F.col("g") == "b").select(F.col("kmv").alias("kb"))
        )
    )
    i = pair.select(kmv_intersect_estimate("ka", "kb").alias("i")).collect()[
        0
    ].i
    assert abs(i - 2000) / 2000 < 0.35, i
    # disjoint groups -> exactly 0
    dj = spark.createDataFrame(
        [("p", f"l{i}") for i in range(300)]
        + [("q", f"r{i}") for i in range(300)],
        "g string, v string",
    )
    sk2 = kmv_sketch(dj, "g", "v")
    pair2 = (
        sk2.where(F.col("g") == "p")
        .select(F.col("kmv").alias("ka"))
        .crossJoin(
            sk2.where(F.col("g") == "q").select(F.col("kmv").alias("kb"))
        )
    )
    assert (
        pair2.select(kmv_intersect_estimate("ka", "kb").alias("i"))
        .collect()[0]
        .i
        == 0.0
    )


def test_kmv_underfull_intersection_is_exact(spark):
    """Both sketches under-full -> every distinct hash is present and
    theta = 2^60, so the intersection estimate IS the exact count."""
    from protosc_spark.sketches import kmv_intersect_estimate, kmv_sketch

    rows = [("x", f"s{i}") for i in range(100)] + [
        ("y", f"s{i}") for i in range(60, 160)
    ]
    sk = kmv_sketch(
        spark.createDataFrame(rows, "g string, v string"), "g", "v"
    )
    pair = (
        sk.where(F.col("g") == "x")
        .select(F.col("kmv").alias("ka"))
        .crossJoin(
            sk.where(F.col("g") == "y").select(F.col("kmv").alias("kb"))
        )
    )
    i = pair.select(kmv_intersect_estimate("ka", "kb").alias("i")).collect()[
        0
    ].i
    assert i == 40.0


def test_kmv_partitioning_independence(spark):
    from protosc_spark.sketches import kmv_sketch

    df = _two_groups(spark)
    a = kmv_sketch(df.repartition(1), "g", "v").orderBy("g").collect()
    b = kmv_sketch(df.repartition(13), "g", "v").orderBy("g").collect()
    assert [list(r.kmv) for r in a] == [list(r.kmv) for r in b]


# --- count-min sketch ---


def test_cms_never_underestimates_and_mostly_exact_when_sparse(spark):
    from protosc_spark.sketches import cms_estimate, cms_table

    rng = np.random.default_rng(4)
    vals = [f"t{rng.integers(0, 100)}" for _ in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    exact = {}
    for v in vals:
        exact[v] = exact.get(v, 0) + 1
    table = cms_table(df, [], "v")
    est = {
        r.v: r.est_count
        for r in cms_estimate(table, df.select("v").distinct(), "v").collect()
    }
    n_exact = 0
    for v, c in exact.items():
        assert est[v] >= c, (v, est[v], c)  # CMS upper bound, always
        n_exact += est[v] == c
    # 100 distinct into 1024 buckets x 4 rows: the min over rows is
    # exact for the vast majority (deterministic for this fixed data)
    assert n_exact >= 90, n_exact


def test_cms_merge_equals_table_of_union(spark):
    from protosc_spark.sketches import cms_merge, cms_table

    df = spark.createDataFrame(
        [(i, f"u{i % 37}") for i in range(500)], "id long, v string"
    )
    a = df.where(F.col("id") < 250)
    b = df.where(F.col("id") >= 250)
    merged = cms_merge(
        cms_table(a, [], "v").unionByName(cms_table(b, [], "v")), []
    )
    full = cms_table(df, [], "v")
    got = sorted(
        (r.row, r.bucket, r.c) for r in merged.collect()
    )
    want = sorted((r.row, r.bucket, r.c) for r in full.collect())
    assert got == want


def test_cms_partitioning_independence(spark):
    from protosc_spark.sketches import cms_table

    df = spark.createDataFrame(
        [(f"w{i % 61}",) for i in range(800)], "v string"
    )
    a = sorted(
        (r.row, r.bucket, r.c)
        for r in cms_table(df.repartition(1), [], "v").collect()
    )
    b = sorted(
        (r.row, r.bucket, r.c)
        for r in cms_table(df.repartition(19), [], "v").collect()
    )
    assert a == b


def test_cms_plan_no_python(spark):
    from protosc_spark.sketches import cms_estimate, cms_table

    df = spark.createDataFrame([("x",), ("y",)], "v string")
    t = cms_table(df, [], "v")
    p = (
        cms_estimate(t, df, "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_hll_window_distinct_matches_per_window_direct(spark):
    """Each sliding-window estimate from merged DAILY registers must
    EQUAL the direct hll_distinct of that window's raw rows (register
    max commutes with union) — and stay within the error bound of the
    exact windowed count."""
    import datetime as dt

    from protosc_spark.sketches import (
        hll_distinct,
        hll_error_bound,
        hll_window_distinct,
    )

    rows = []
    base = dt.date(2025, 3, 1)
    rng = np.random.default_rng(9)
    for d in range(10):
        day = base + dt.timedelta(days=d)
        for u in rng.integers(0, 2000, 800):
            rows.append((day, f"u{u}"))
    df = spark.createDataFrame(rows, "day date, u string")
    out = {
        r.target_day: r.hll_distinct
        for r in hll_window_distinct(df, "day", "u", window_days=3).collect()
    }
    assert len(out) == 10
    for d in range(10):
        day = base + dt.timedelta(days=d)
        lo = day - dt.timedelta(days=2)
        win = df.where((F.col("day") >= lo) & (F.col("day") <= day))
        direct = (
            hll_distinct(win.select(F.lit("g").alias("g"), "u"), "g", "u")
            .collect()[0]
            .hll_distinct
        )
        assert abs(out[day] - direct) < 1e-6, (day, out[day], direct)
        exact = win.select("u").distinct().count()
        assert abs(out[day] - exact) / exact < 3 * hll_error_bound()


# --- PSI drift monitor ---


def test_psi_identical_distribution_is_zero(spark):
    """Two groups with IDENTICAL value multisets: PSI of each group
    vs global must be ~0 (p_g == p_all in every bin)."""
    from protosc_spark.sketches import psi_by_group

    rows = [("a", v) for v in range(1, 501)] + [
        ("b", v) for v in range(1, 501)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = psi_by_group(df, "g", "v").collect()
    for r in out:
        assert abs(r.psi) < 1e-9, r


def test_psi_detects_shift(spark):
    """A group whose values are 8x the other's must show large PSI
    (different HDR buckets entirely), while a mild re-weighting stays
    small — orders the monitor's sensitivity correctly."""
    from protosc_spark.sketches import psi_by_group

    rng = np.random.default_rng(2)
    base = rng.integers(50, 400, 2000)
    # the shifted slice is a SMALL fraction, so the global
    # distribution stays close to the healthy groups (PSI is group
    # vs GLOBAL — a huge shifted slice would move the global itself
    # and flag everyone, correctly but uselessly for this test)
    rows = (
        [("same", int(v)) for v in base]
        + [("same2", int(v)) for v in base]
        + [("shift", int(v) * 8) for v in base[:100]]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    psi = {r.g: r.psi for r in psi_by_group(df, "g", "v").collect()}
    # healthy slices carry a small residual PSI from the 1e-6
    # empty-bin floor on the contaminated buckets (a known PSI
    # property); the shifted slice must still dominate by an order
    # of magnitude
    assert psi["shift"] > 1.0, psi
    assert psi["same"] < 0.2 and psi["same2"] < 0.2, psi
    assert psi["shift"] > 10 * psi["same"], psi


def test_psi_plan_no_python(spark):
    from protosc_spark.sketches import psi_by_group

    df = spark.createDataFrame(
        [("a", 5), ("b", 9)], "g string, v long"
    )
    p = (
        psi_by_group(df, "g", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


# --- Robust median/MAD outlier flags ---


def test_mad_stats_exact_small_values(spark):
    """Values and deviations below 2^(s+1) sit in exact HDR buckets,
    so med/mad equal the hand-computed discrete-rank medians:
    [1,2,3,4,100] -> med 3 (rank ceil(2.5)=3), deviations
    [2,1,0,1,97] -> mad 1."""
    from protosc_spark.sketches import mad_robust_stats

    df = spark.createDataFrame(
        [("a", v) for v in (1, 2, 3, 4, 100)], "g string, v long"
    )
    r = mad_robust_stats(df, "g", "v").collect()[0]
    assert (r.med, r.mad) == (3, 1), r


def test_mad_outliers_flags_and_z(spark):
    """z = 0.6745 (x - med) / mad; only x=100 crosses |z| > 3.5
    (z = 65.4265), x=1 stays at |z| = 1.349."""
    from protosc_spark.sketches import mad_outliers

    df = spark.createDataFrame(
        [("a", v) for v in (1, 2, 3, 4, 100)], "g string, v long"
    )
    out = {r.v: r for r in mad_outliers(df, "g", "v").collect()}
    assert [v for v in out if out[v].is_outlier] == [100]
    assert abs(out[100].z - 0.6745 * 97) < 1e-9
    assert abs(out[1].z + 0.6745 * 2) < 1e-9


def test_mad_zero_degenerate_flags_any_deviation(spark):
    """mad = 0 (over half the mass at the median): z is NULL and the
    rule falls back to flagging x != med."""
    from protosc_spark.sketches import mad_outliers

    df = spark.createDataFrame(
        [("a", v) for v in (5, 5, 5, 9)], "g string, v long"
    )
    out = {r.v: r for r in mad_outliers(df, "g", "v").collect()}
    assert out[9].mad == 0 and out[9].z is None
    assert out[9].is_outlier and not out[5].is_outlier


def test_mad_plan_no_python(spark):
    from protosc_spark.sketches import mad_outliers

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    plan = mad_outliers(df, "g", "v")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# winsorize
# ---------------------------------------------------------------------------

def test_winsorize_clips_to_hdr_thresholds(spark):
    """Exact-bucket regime (values < 256 are their own HDR bucket),
    so the thresholds ARE the discrete-rank order statistics and the
    clip is checkable by hand."""
    import numpy as np

    from protosc_spark.sketches import winsorize

    vals = list(range(1, 101))  # 1..100, all exact buckets
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id bigint, v int"
    )
    got = {
        r.id: r.winsorized
        for r in winsorize(df, "v", 0.10, 0.90).collect()
    }
    lo = int(np.ceil(0.10 * 100))  # rank rule: first cum >= ceil(q n)
    hi = int(np.ceil(0.90 * 100))
    for i, v in enumerate(vals):
        assert got[i] == min(max(v, lo), hi)


def test_winsorize_null_passthrough_and_identity(spark):
    from protosc_spark.sketches import winsorize

    df = spark.createDataFrame(
        [(0, 5), (1, None), (2, 9)], "id bigint, v int"
    )
    got = {r.id: r.winsorized for r in winsorize(df, "v", 0.0, 1.0).collect()}
    assert got[1] is None
    # degenerate full range: clip is identity on the bucket bounds
    assert got[0] == 5 and got[2] == 9


# --- exact discrete quantiles (value-histogram collapse) ---


def _q_bruteforce(vals, q):
    import math

    s = sorted(vals)
    return s[max(math.ceil(q * len(s)), 1) - 1]


def test_quantiles_exact_matches_sorted_rank_rule(spark):
    from protosc_spark.sketches import quantiles_exact

    vals_a = [((i * 17) % 40) for i in range(101)]  # heavy ties
    vals_b = [5] * 30  # constant column
    rows = [("a", v) for v in vals_a] + [("b", v) for v in vals_b]
    df = spark.createDataFrame(rows, "g string, v long")
    qs = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    got = {
        (r.g, r.q): (r.n, r.value)
        for r in quantiles_exact(df, "v", "g", qs=qs).collect()
    }
    assert len(got) == 2 * len(qs)
    for q in qs:
        assert got[("a", q)] == (101, _q_bruteforce(vals_a, q))
        assert got[("b", q)] == (30, 5)
    # ungrouped path
    one = {
        r.q: r.value
        for r in quantiles_exact(df, "v", qs=(0.5,)).collect()
    }
    assert one[0.5] == _q_bruteforce(vals_a + vals_b, 0.5)


# ------------------------------------------------- weighted quantile
class TestWeightedQuantiles:
    def _run(self, spark, rows, ps=(500,)):
        from protosc_spark.sketches import weighted_quantiles

        df = spark.createDataFrame(rows, "g string, v int, w int")
        return {
            (r["g"], r["p_milli"]): r
            for r in weighted_quantiles(df, "v", "w", "g", ps).collect()
        }

    def test_mass_weighted_median_hand_fixture(self, spark):
        # values 1..4 with weights 1,1,1,7 -> half the mass sits at 4
        rows = [("a", 1, 1), ("a", 2, 1), ("a", 3, 1), ("a", 4, 7)]
        out = self._run(spark, rows, (500, 200))
        assert out[("a", 500)]["quantile"] == 4
        # 20% of mass (2 units) reached at v=2 (cum 1,2,3,10)
        assert out[("a", 200)]["quantile"] == 2
        assert out[("a", 500)]["total_weight"] == 10

    def test_matches_numpy_weighted_quantile(self, spark):
        import numpy as np

        rng = np.random.RandomState(4)
        v = rng.randint(1, 200, 500)
        w = rng.randint(1, 9, 500)
        rows = [("g", int(a), int(b)) for a, b in zip(v, w)]
        out = self._run(spark, rows, (250, 500, 900))
        order = np.argsort(v, kind="stable")
        sv, sw = v[order], w[order]
        cw = np.cumsum(sw)
        for p in (250, 500, 900):
            want = sv[np.searchsorted(cw * 1000, p * cw[-1])]
            # smallest value whose cum reaches the rank; collapse ties
            want = int(min(x for x, c in zip(sv, cw)
                           if c * 1000 >= p * cw[-1]))
            assert out[("g", p)]["quantile"] == want

    def test_nonpositive_weights_carry_no_mass(self, spark):
        rows = [("a", 1, 0), ("a", 2, -5), ("a", 3, 2)]
        out = self._run(spark, rows)
        assert out[("a", 500)]["quantile"] == 3
        assert out[("a", 500)]["total_weight"] == 2
