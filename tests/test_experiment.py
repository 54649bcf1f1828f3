"""A/B readout (experiment.py): deterministic split, grid semantics,
z statistic."""

import math

import pytest
from pyspark.sql import functions as F

from protosc_spark.experiment import ab_readout
from protosc_spark.sampling import hash_bucket
from protosc_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_experiment")


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string"
    )


def test_ab_matches_pure_python_recomputation(spark):
    """Recompute variants (same md5 rule), grid conversions and the
    pooled z in pure python; the operator must match exactly —
    including users with ZERO events of a type counting in their
    variant's denominator."""
    import hashlib

    rows = [(u, t) for u in range(40) for t in "XY"
            for _ in range(u % 4)]  # user u emits u%4 of each type
    rows += [(99, "X")]  # user 99 never emits Y
    df = _events(spark, rows)
    out = {r.event_type: r for r in
           ab_readout(df, threshold=2).collect()}

    def variant(u):
        h = hashlib.md5(f"exp1\x1f{u}".encode()).hexdigest()
        return int(h[:15], 16) % 2

    users = sorted({u for u, _ in rows})
    for t in "XY":
        n = {0: 0, 1: 0}
        conv = {0: 0, 1: 0}
        for u in users:
            v = variant(u)
            n[v] += 1
            c = sum(1 for uu, tt in rows if uu == u and tt == t)
            conv[v] += int(c >= 2)
        r = out[t]
        assert (r.n_a, r.n_b) == (n[0], n[1])
        assert (r.conv_a, r.conv_b) == (conv[0], conv[1])
        p = (conv[0] + conv[1]) / (n[0] + n[1])
        z = (conv[1] / n[1] - conv[0] / n[0]) / math.sqrt(
            p * (1 - p) * (1 / n[0] + 1 / n[1])
        )
        assert abs(r.z - z) < 1e-12


def test_ab_degenerate_rates_give_null_z(spark):
    """Everyone converts (threshold=1, every user emits the type):
    pooled rate 1 -> z undefined -> NULL, rates still 1.0."""
    rows = [(u, "X") for u in range(20)]
    r = ab_readout(_events(spark, rows), threshold=1).collect()[0]
    assert r.rate_a == 1.0 and r.rate_b == 1.0 and r.z is None


def test_ab_plan_no_python(spark):
    df = _events(spark, [(1, "X")])
    plan = (
        ab_readout(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
