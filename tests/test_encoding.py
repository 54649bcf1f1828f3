"""Leakage-safe target encoding (encoding.py).

The marquee property under test is the leakage contract itself:
LOO — a row's encoding never sees its own label through the group
term; OOF — a row's encoding never sees ANY label from its own fold.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from protosc_spark.encoding import loo_target_encode, oof_target_encode
from protosc_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_encoding")


def test_loo_hand_computed(spark):
    """Group a: y=[1,0,1], group b: y=[0]; prior=0.5, m=2.
    enc(a, y=1) = (2-1+1)/4 = 0.5; enc(a, y=0) = (2-0+1)/4 = 0.75;
    singleton b: (0-0+1)/(0+2) = 0.5 (degrades to prior)."""
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 0), (3, "a", 1), (4, "b", 0)],
        "id long, k string, y int",
    )
    out = {
        r.id: r.enc_loo
        for r in loo_target_encode(df, "k", "y", smoothing=2.0)
        .collect()
    }
    assert out[1] == 0.5 and out[3] == 0.5
    assert out[2] == 0.75
    assert out[4] == 0.5


def test_loo_own_label_excluded(spark):
    """Within a group, enc_i - enc_j == (y_j - y_i) / (n - 1 + m):
    the own label enters only via subtraction — two same-label rows
    encode identically regardless of position/partition."""
    rows = [(i, "g", i % 3 == 0) for i in range(30)]
    df = spark.createDataFrame(
        [(i, k, int(y)) for i, k, y in rows], "id long, k string, y int"
    )
    out = {
        r.id: (r.y, r.enc_loo)
        for r in loo_target_encode(df, "k", "y", smoothing=7.0)
        .collect()
    }
    ones = {v for y, v in out.values() if y == 1}
    zeros = {v for y, v in out.values() if y == 0}
    assert len(ones) == 1 and len(zeros) == 1
    diff = next(iter(zeros)) - next(iter(ones))
    assert abs(diff - 1.0 / (30 - 1 + 7.0)) < 1e-12


def test_oof_excludes_own_fold(spark):
    """Recompute every row's encoding in pure pandas from the OTHER
    folds' rows only; the operator must match exactly. Also pins the
    fold assignment to the deterministic md5 rule (same ids -> same
    folds on every run/partitioning)."""
    rows = [(i, "k%d" % (i % 4), int(i % 5 < 2)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k string, y int")
    m, nf = 10.0, 5
    out = oof_target_encode(
        df, "k", "y", "id", n_folds=nf, smoothing=m
    ).toPandas()
    prior = out.y.mean()
    for _, r in out.iterrows():
        others = out[(out.k == r.k) & (out.__fold != r.__fold)]
        want = (others.y.sum() + m * prior) / (len(others) + m)
        assert abs(r.enc_oof - want) < 1e-12, (r.id, r.enc_oof, want)
    out2 = oof_target_encode(
        df.repartition(7), "k", "y", "id", n_folds=nf, smoothing=m
    ).toPandas()
    a = out.sort_values("id").reset_index(drop=True)
    b = out2.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_encode_plan_no_python(spark):
    df = spark.createDataFrame([(1, "a", 1)], "id long, k string, y int")
    for enc in (
        loo_target_encode(df, "k", "y"),
        oof_target_encode(df, "k", "y", "id"),
    ):
        plan = enc._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# rank_normalize
# ---------------------------------------------------------------------------

def test_rank_normalize_midranks_with_ties(spark):
    from protosc_spark.encoding import rank_normalize

    vals = [5, 3, 3, 8, 5, 5, 1, 8]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id bigint, v int"
    )
    got = {
        r.id: (r.midrank, r.pct_rank)
        for r in rank_normalize(df, "v").collect()
    }
    # sorted: 1,3,3,5,5,5,8,8 -> midranks 1, 2.5, 4+1=5? -> tie class
    # of 5 spans ranks 4-6 (mid 5), 8 spans 7-8 (mid 7.5)
    want_mid = {1: 1.0, 3: 2.5, 5: 5.0, 8: 7.5}
    n = len(vals)
    for i, v in enumerate(vals):
        assert got[i] == (want_mid[v], want_mid[v] / n)


def test_rank_normalize_nulls_and_identity(spark):
    from protosc_spark.encoding import rank_normalize

    df = spark.createDataFrame(
        [(0, 10), (1, None), (2, 20)], "id bigint, v int"
    )
    got = {r.id: (r.midrank, r.pct_rank)
           for r in rank_normalize(df, "v").collect()}
    assert got[1] == (None, None)          # NULL rows kept, unranked
    assert got[0] == (1.0, 0.5) and got[2] == (2.0, 1.0)  # n excludes NULL


# --- WOE / information value ---


def _woe_bruteforce(rows, feature_idx, alpha=0.5):
    """rows: (f1, f2, ..., y). Returns {bin: (n, pos, woe)} and iv
    for the feature at feature_idx."""
    import math
    from collections import defaultdict

    cnt = defaultdict(lambda: [0, 0])
    for r in rows:
        b = r[feature_idx]
        b = None if b is None else str(b)
        cnt[b][0] += 1
        cnt[b][1] += r[-1]
    nt = sum(v[0] for v in cnt.values())
    pt = sum(v[1] for v in cnt.values())
    k = len(cnt)
    out, iv = {}, 0.0
    for b, (n, pos) in cnt.items():
        dp = (pos + alpha) / (pt + alpha * k)
        dn = (n - pos + alpha) / ((nt - pt) + alpha * k)
        w = math.log(dp / dn)
        out[b] = (n, pos, w)
        iv += (dp - dn) * w
    return out, iv


def test_woe_iv_bruteforce_and_ranking(spark):
    from protosc_spark.encoding import woe_iv

    # f_good perfectly tracks y; f_noise is independent of it
    rows = [
        ("hi" if i % 2 == 0 else "lo", f"n{i % 3}", 1 - (i % 2))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "f_good string, f_noise string, y int")
    got = woe_iv(df, ["f_good", "f_noise"], "y").collect()
    by_feat = {}
    for r in got:
        by_feat.setdefault(r.feature, {})[r.bin] = r
    for idx, feat in [(0, "f_good"), (1, "f_noise")]:
        want, iv = _woe_bruteforce(rows, idx)
        assert set(by_feat[feat]) == set(want)
        for b, (n, pos, w) in want.items():
            r = by_feat[feat][b]
            assert (r.n, r.n_pos) == (n, pos)
            assert abs(r.woe - w) < 1e-12
            # iv quantized to 1e-9 units before the cross-bin sum
            assert abs(r.iv - iv) < 2e-9 * len(want)
    # the screening property itself: predictive >> noise
    iv_good = by_feat["f_good"]["hi"].iv
    iv_noise = by_feat["f_noise"]["n0"].iv
    assert iv_good > 1.0 and abs(iv_noise) < 0.05


def test_woe_iv_null_bin_and_empty_cell(spark):
    from protosc_spark.encoding import woe_iv

    # NULL is its own bin; a bin with zero positives stays finite
    rows = [("a", 1), ("a", 1), ("b", 0), ("b", 0), (None, 1)]
    df = spark.createDataFrame(rows, "f string, y int")
    got = {r.bin: r for r in woe_iv(df, ["f"], "y").collect()}
    assert set(got) == {"a", "b", None}
    want, iv = _woe_bruteforce([(b, y) for b, y in rows], 0)
    for b, (n, pos, w) in want.items():
        assert (got[b].n, got[b].n_pos) == (n, pos)
        assert abs(got[b].woe - w) < 1e-12
    import math
    assert all(math.isfinite(r.woe) for r in got.values())
    assert got["b"].woe < 0 < got["a"].woe


# ---------------------------------------------------------------------------
# eb_shrink_rates
# ---------------------------------------------------------------------------

def _eb_bruteforce(groups, unit=10**9):
    """MoM beta-binomial fit over quantized group rates, mirroring
    the documented algebra."""
    import math

    qps = [math.floor(k / n * unit) for n, k in groups]
    g = len(qps)
    m1 = sum(qps) / unit / g
    ex2 = sum(q * q for q in qps) / unit / unit / g
    s2 = (ex2 - m1 * m1) * g / (g - 1) if g > 1 else 0.0
    if g > 1 and s2 > 0:
        c = m1 * (1 - m1) / s2 - 1.0
        if c > 0:
            a, b = m1 * c, (1 - m1) * c
            return [(k + a) / (n + a + b) for n, k in groups], a, b
    if g <= 1 or s2 <= 0:
        return [m1 for _ in groups], None, None
    return [k / n for n, k in groups], None, None


def test_eb_shrink_matches_bruteforce(spark):
    from protosc_spark.encoding import eb_shrink_rates

    groups = [(1000, 700), (4, 3), (50, 10), (200, 90), (30, 21)]
    rows = [
        (f"g{i}", 1 if j < k else 0)
        for i, (n, k) in enumerate(groups)
        for j in range(n)
    ]
    df = spark.createDataFrame(rows, "g string, y int")
    got = {
        r.g: r
        for r in eb_shrink_rates(df, "g", "y").collect()
    }
    want, a, b = _eb_bruteforce(groups)
    assert a is not None and abs(got["g0"].alpha - a) < 1e-9
    assert abs(got["g0"].beta - b) < 1e-9
    for i, (n, k) in enumerate(groups):
        r = got[f"g{i}"]
        assert r.n == n and r.k == k
        assert abs(r.shrunk - want[i]) < 1e-9
        # shrunk lies between the raw rate and the prior mean
        m1 = sum(x.rate for x in got.values()) / len(got)
        lo, hi = sorted((r.rate, m1))
        assert lo - 1e-9 <= r.shrunk <= hi + 1e-9
    # the small extreme group moves proportionally further than the
    # big one
    assert abs(got["g1"].shrunk - got["g1"].rate) > abs(
        got["g0"].shrunk - got["g0"].rate
    )


def test_eb_shrink_degenerate(spark):
    from protosc_spark.encoding import eb_shrink_rates

    # single group: prior IS the group -> shrunk = m1 = rate
    one = spark.createDataFrame(
        [("a", 1), ("a", 0), ("a", 1), ("a", 1)], "g string, y int"
    )
    r = eb_shrink_rates(one, "g", "y").collect()[0]
    assert r.alpha is None and abs(r.shrunk - 0.75) < 1e-9
    # zero between-group variance -> every group gets m1
    flat = spark.createDataFrame(
        [("a", 1), ("a", 0), ("b", 1), ("b", 0)], "g string, y int"
    )
    for r in eb_shrink_rates(flat, "g", "y").collect():
        assert r.alpha is None and abs(r.shrunk - 0.5) < 1e-9
    # beyond-beta overdispersion (rates 0 and 1): c < 0 -> raw rates
    over = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 0), ("b", 0)], "g string, y int"
    )
    got = {r.g: r for r in eb_shrink_rates(over, "g", "y").collect()}
    assert got["a"].shrunk == 1.0 and got["b"].shrunk == 0.0
    assert got["a"].alpha is None
    # NULL group / label rows dropped
    withnull = spark.createDataFrame(
        [("a", 1), (None, 1), ("a", None), ("b", 0), ("b", 1)],
        "g string, y int",
    )
    got = {
        r.g: r for r in eb_shrink_rates(withnull, "g", "y").collect()
    }
    assert got["a"].n == 1 and got["b"].n == 2 and len(got) == 2


def test_eb_shrink_plan_no_python(spark):
    from protosc_spark.encoding import eb_shrink_rates

    df = spark.createDataFrame([("a", 1), ("b", 0)], "g string, y int")
    plan = (
        eb_shrink_rates(df, "g", "y")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
