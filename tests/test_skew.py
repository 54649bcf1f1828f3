"""Key-skew diagnostics (skew.py): Gini via the count-of-counts
collapse must equal the classic sorted-rank formula."""

import pytest
from pyspark.sql import functions as F

from protosc_spark.session import get_spark
from protosc_spark.skew import key_skew_stats


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_skew")


def _df(spark, counts):
    rows = [
        (f"k{i}",) for i, c in enumerate(counts) for _ in range(c)
    ]
    return spark.createDataFrame(rows, "k string")


def _gini_reference(counts):
    c = sorted(counts)
    n, s = len(c), sum(c)
    t = sum((i + 1) * ci for i, ci in enumerate(c))
    return 2 * t / (n * s) - (n + 1) / n


def test_gini_matches_sorted_rank_formula(spark):
    """Mixed distribution WITH frequency ties (the collapse's hard
    case: tied frequencies share rank mass m(m+1)/2)."""
    counts = [1, 1, 1, 2, 2, 5, 5, 5, 40, 100]
    r = key_skew_stats(_df(spark, counts), "k").collect()[0]
    assert r.n_rows == sum(counts) and r.n_keys == len(counts)
    assert r.max_count == 100
    assert abs(r.max_share - 100 / sum(counts)) < 1e-12
    assert abs(r.gini - _gini_reference(counts)) < 1e-12


def test_gini_uniform_zero_and_degenerate(spark):
    """All keys equal frequency: gini 0 exactly. Single key: gini
    NULL (undefined), max_share 1."""
    r = key_skew_stats(_df(spark, [7] * 6), "k").collect()[0]
    assert abs(r.gini - 0.0) < 1e-12
    one = key_skew_stats(_df(spark, [9]), "k").collect()[0]
    assert one.gini is None and one.max_share == 1.0


def test_null_keys_count_as_a_key(spark):
    df = spark.createDataFrame(
        [("a",), (None,), (None,), (None,)], "k string"
    )
    r = key_skew_stats(df, "k").collect()[0]
    assert r.n_keys == 2 and r.max_count == 3


def test_skew_plan_no_python(spark):
    plan = (
        key_skew_stats(_df(spark, [1, 2]), "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


# --- Benford first-digit audit ---


def test_benford_exact_distribution_scores_zero(spark):
    """A column whose first-digit counts are EXACTLY proportional to
    Benford shares is impossible with integers, so instead pin the
    arithmetic: a single-digit column (all values 1xx) puts all mass
    on digit 1, and chi2 must equal n * sum_d (o_d - e_d)^2 / e_d
    recomputed in python."""
    import math

    from protosc_spark.skew import benford_audit

    df = spark.createDataFrame(
        [(v,) for v in (100, 150, 199, 123)], "x long"
    )
    rows = benford_audit(df, "x").orderBy("digit").collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert rows[0].n == 4 and all(r.n == 0 for r in rows[1:])
    exp = [math.log10(1 + 1 / d) for d in range(1, 10)]
    obs = [1.0] + [0.0] * 8
    chi = 4 * sum(
        (o - e) ** 2 / e for o, e in zip(obs, exp)
    )
    for r in rows:
        assert abs(r.chi2 - chi) < 1e-9
        assert abs(r.exp_share - exp[r.digit - 1]) < 1e-12


def test_benford_excludes_nonpositive(spark):
    from protosc_spark.skew import benford_audit

    df = spark.createDataFrame(
        [(0,), (-5,), (7,)], "x long"
    )
    rows = {r.digit: r.n for r in benford_audit(df, "x").collect()}
    assert sum(rows.values()) == 1 and rows[7] == 1


# --- column profile ---


def test_profile_columns_counts_mode_and_all_null(spark):
    from protosc_spark.skew import profile_columns

    rows = [
        (1, "b", None),
        (2, "a", None),
        (3, "a", None),
        (4, None, None),
        (5, "b", None),
        (6, "c", None),
    ]
    df = spark.createDataFrame(rows, "id long, k string, dead string")
    got = {
        r.column: r
        for r in profile_columns(df, ["id", "k", "dead"]).collect()
    }
    k = got["k"]
    assert (k.n, k.n_null, k.n_distinct) == (6, 1, 3)
    assert (k.min_val, k.max_val) == ("a", "c")
    # a and b both appear twice: tie broken to the smaller value
    assert (k.top_value, k.top_count) == ("a", 2)
    i = got["id"]
    assert (i.n, i.n_null, i.n_distinct) == (6, 0, 6)
    assert (i.min_val, i.max_val) == ("1", "6")  # lexicographic
    assert (i.top_value, i.top_count) == ("1", 1)
    dead = got["dead"]
    assert (dead.n, dead.n_null, dead.n_distinct) == (6, 6, 0)
    assert dead.min_val is None and dead.top_value is None


# --- leave-one-group-out influence ---


def test_loo_influence_hand_case(spark):
    from protosc_spark.skew import loo_influence
    import math

    rows = (
        [("a", 10)] * 4 + [("b", 20)] * 4 + [("c", 90)] * 2
    )  # c is the outlier slice
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: r for r in loo_influence(df, "v", "g").collect()}
    mean = (40 + 80 + 180) / 10
    m_wo = {
        "a": (300 - 40) / 6,
        "b": (300 - 80) / 6,
        "c": (300 - 180) / 8,
    }
    for g in ("a", "b", "c"):
        assert abs(got[g].mean_without - m_wo[g]) < 1e-9
        assert abs(got[g].influence - (mean - m_wo[g])) < 1e-9
    # c pulls the mean UP, a/b pull it down
    assert abs(got["c"].influence - 15.0) < 1e-9
    assert got["a"].influence < 0 < got["c"].influence
    ms = list(m_wo.values())
    mbar = sum(ms) / 3
    jk = math.sqrt(2 / 3 * sum((m - mbar) ** 2 for m in ms))
    assert abs(got["a"].jk_se - jk) < 1e-4  # quantized at 1e-9
    # single-group corpus: no leave-out population
    one = loo_influence(
        spark.createDataFrame([("x", 5)], "g string, v long"), "v", "g"
    ).collect()[0]
    assert one.mean_without is None and one.influence is None


# --- Simpson's paradox audit ---


def test_simpson_planted_paradox_and_consistent_case(spark):
    from protosc_spark.skew import simpson_audit

    rows = []
    # within each stratum y falls with x; across strata both rise
    for x in range(5):
        rows.append(("s1", x, 10 - x))
    for x in range(10, 15):
        rows.append(("s2", x, 40 - x))
    df = spark.createDataFrame(rows, "st string, x long, y long")
    r = simpson_audit(df, "x", "y", "st").collect()[0]
    assert r.n == 10 and r.n_strata == 2
    assert r.n_neg_strata == 2 and r.n_pos_strata == 0
    assert r.pooled_slope > 0 and r.all_reversed
    # consistent data: no flag
    rows2 = [("s1", x, x) for x in range(5)] + [
        ("s2", x, x + 3) for x in range(5)
    ]
    df2 = spark.createDataFrame(rows2, "st string, x long, y long")
    r2 = simpson_audit(df2, "x", "y", "st").collect()[0]
    assert r2.n_pos_strata == 2 and not r2.all_reversed
    # constant-x stratum: slope undefined there, excluded from the
    # reversal test; constant-x corpus: pooled NULL, flag false
    df3 = spark.createDataFrame(
        [("s1", 1, 5), ("s1", 1, 9)], "st string, x long, y long"
    )
    r3 = simpson_audit(df3, "x", "y", "st").collect()[0]
    assert r3.pooled_slope is None and not r3.all_reversed
