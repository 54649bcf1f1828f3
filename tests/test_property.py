"""Property-based tests (hypothesis) for the point-in-time core:
random tiny inputs, engine vs an independent pandas oracle.

The reference's suite leans on parametrized grids + planted ground
truth (tests/test_fold_models.py:37-49); hypothesis is the stronger
version of the same idea for operators whose edge cases are
combinatorial (ties, empty groups, single-row entities, gap
boundaries). Example counts are kept small because every example runs
Spark jobs.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from protosc_spark.asof import asof_join
from protosc_spark.ordering import stable_dedup
from protosc_spark.windows import rolling_agg, sessionize

ENTITIES = ["a", "b", "c"]

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # CI determinism: same examples every run
)


def _ts(seconds):
    return pd.Timestamp("2025-01-01") + pd.to_timedelta(seconds, unit="s")


left_strategy = st.lists(
    st.tuples(
        st.sampled_from(ENTITIES),
        st.integers(min_value=0, max_value=500),
    ),
    min_size=1,
    max_size=25,
)
# unique (entity, ts) on the right: duplicate-ts tiebreak conventions
# differ between merge_asof (row order) and the engine (value order) by
# design, and dedup-before-join is the engine's documented contract
right_strategy = st.lists(
    st.tuples(
        st.sampled_from(ENTITIES),
        st.integers(min_value=0, max_value=500),
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda t: (t[0], t[1]),
)


class TestAsofProperty:
    @given(left=left_strategy, right=right_strategy)
    @settings(**SETTINGS)
    def test_matches_merge_asof(self, spark, left, right):
        lpdf = pd.DataFrame(
            {
                "conv_id": [e for e, _ in left],
                "turn_idx": range(len(left)),
                "ts": [_ts(s) for _, s in left],
            }
        )
        rpdf = pd.DataFrame(
            {
                "conv_id": [e for e, _, _ in right],
                "ts": [_ts(s) for _, s, _ in right],
                "attr_value": [v for _, _, v in right],
            },
        )
        ldf = spark.createDataFrame(lpdf)
        rdf = (
            spark.createDataFrame(rpdf)
            if len(rpdf)
            else spark.createDataFrame([], "conv_id string, ts timestamp, attr_value double")
        )
        got = {
            (r.conv_id, r.turn_idx): r.attr_value
            for r in asof_join(ldf, rdf, value_cols=["attr_value"]).collect()
        }
        if len(rpdf) == 0:
            exp = {(r.conv_id, r.turn_idx): None for r in lpdf.itertuples()}
        else:
            exp_df = pd.merge_asof(
                lpdf.sort_values("ts", kind="mergesort"),
                rpdf.sort_values("ts", kind="mergesort"),
                on="ts",
                by="conv_id",
                direction="backward",
                allow_exact_matches=False,
            )
            exp = {
                (r.conv_id, r.turn_idx): (
                    None if pd.isna(r.attr_value) else r.attr_value
                )
                for r in exp_df.itertuples()
            }
        assert got == exp


class TestWindowProperty:
    @given(data=left_strategy)
    @settings(**SETTINGS)
    def test_rolling_mean_matches_pandas(self, spark, data):
        pdf = pd.DataFrame(
            {
                "conv_id": [e for e, _ in data],
                "turn_idx": range(len(data)),
                "v": [float(s) for _, s in data],
            }
        )
        df = spark.createDataFrame(pdf)
        got = {
            (r.conv_id, r.turn_idx): round(r.rm, 9)
            for r in rolling_agg(
                df, {"rm": F.avg("v")}, n_rows=3, order="turn_idx"
            ).collect()
        }
        exp_series = (
            pdf.sort_values(["conv_id", "turn_idx"])
            .groupby("conv_id")["v"]
            .rolling(3, min_periods=1)
            .mean()
        )
        exp = {
            (k[0], int(pdf.loc[k[1], "turn_idx"])): round(v, 9)
            for k, v in exp_series.items()
        }
        assert got == exp

    @given(
        gaps=st.lists(
            st.integers(min_value=1, max_value=200), min_size=1, max_size=30
        ),
        gap_seconds=st.integers(min_value=10, max_value=100),
    )
    @settings(**SETTINGS)
    def test_sessionize_matches_pandas(self, spark, gaps, gap_seconds):
        ts = np.cumsum(gaps)
        pdf = pd.DataFrame(
            {
                "conv_id": "x",
                "turn_idx": range(len(ts)),
                "ts": [_ts(int(s)) for s in ts],
            }
        )
        got = {
            r.turn_idx: r.session_id
            for r in sessionize(
                spark.createDataFrame(pdf), gap_seconds=gap_seconds,
                order=["turn_idx"],
            ).collect()
        }
        exp = (pd.Series(gaps) > gap_seconds)
        exp.iloc[0] = True
        exp = exp.cumsum().astype(int).to_dict()
        assert got == {i: exp[i] for i in range(len(ts))}


class TestDedupProperty:
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),   # turn_idx
                st.integers(min_value=0, max_value=50),  # ts seconds
                st.sampled_from(["user", "assistant"]),
            ),
            min_size=1,
            max_size=20,
        )
    )
    @settings(**SETTINGS)
    def test_survivor_is_min_by_stable_order(self, spark, rows):
        pdf = pd.DataFrame(
            {
                "conv_id": "c",
                "turn_idx": [t for t, _, _ in rows],
                "ts": [_ts(s) for _, s, _ in rows],
                "role": [r for _, _, r in rows],
                "text": [f"t{t}" for t, _, _ in rows],
                "tool": None,
            }
        )
        out = stable_dedup(spark.createDataFrame(pdf)).collect()
        got = {r.turn_idx: (r.ts, r.role) for r in out}
        exp = (
            pdf.sort_values(["turn_idx", "ts", "role"], kind="mergesort")
            .groupby("turn_idx")
            .first()
        )
        assert len(out) == len(exp)
        for t, row in exp.iterrows():
            assert got[t] == (row["ts"].to_pydatetime(), row["role"])


class TestRankInvariances:
    """Laws the round-5 rank/histogram kernels must satisfy: rank
    statistics are invariant under strictly monotone value maps;
    energy distance is translation-invariant and 1-homogeneous."""

    @given(
        data=st.lists(
            st.tuples(
                st.integers(0, 2), st.integers(0, 50)
            ),
            min_size=12,
            max_size=60,
        )
    )
    @settings(**SETTINGS)
    def test_kruskal_monotone_invariant(self, spark, data):
        from protosc_spark.evaluation import kruskal_wallis

        rows = [(f"g{g}", v) for g, v in data]
        df = spark.createDataFrame(rows, "g string, x long")
        df2 = df.select("g", (F.col("x") * 7 + 3).alias("x"))
        a = kruskal_wallis(df, "x", "g").collect()[0]
        b = kruskal_wallis(df2, "x", "g").collect()[0]
        assert a.h == b.h and a.tie_factor == b.tie_factor

    @given(
        xs=st.lists(st.integers(0, 40), min_size=4, max_size=40),
        ys=st.lists(st.integers(0, 40), min_size=4, max_size=40),
        shift=st.integers(-20, 20),
    )
    @settings(**SETTINGS)
    def test_energy_translation_invariant_nonneg(
        self, spark, xs, ys, shift
    ):
        from protosc_spark.evaluation import energy_distance

        def mk(xa, ya):
            rows = [(int(v), 1) for v in xa] + [
                (int(v), 0) for v in ya
            ]
            return spark.createDataFrame(rows, "x long, g int")

        a = energy_distance(mk(xs, ys), "x", "g").collect()[0]
        b = energy_distance(
            mk([v + shift for v in xs], [v + shift for v in ys]),
            "x",
            "g",
        ).collect()[0]
        assert a.e_dist == b.e_dist
        assert a.e_dist >= 0.0

    @given(
        xs=st.lists(st.integers(0, 30), min_size=5, max_size=40),
        ys=st.lists(st.integers(0, 30), min_size=5, max_size=40),
    )
    @settings(**SETTINGS)
    def test_ad_monotone_invariant(self, spark, xs, ys):
        from protosc_spark.evaluation import ad_two_sample

        def mk(xa, ya):
            rows = [(int(v), 1) for v in xa] + [
                (int(v), 0) for v in ya
            ]
            return spark.createDataFrame(rows, "x long, g int")

        a = ad_two_sample(mk(xs, ys), "x", "g").collect()[0]
        b = ad_two_sample(
            mk([5 * v + 2 for v in xs], [5 * v + 2 for v in ys]),
            "x",
            "g",
        ).collect()[0]
        assert a.a2 == b.a2

    @given(
        data=st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 5)),
            min_size=8,
            max_size=50,
        )
    )
    @settings(**SETTINGS)
    def test_gamma_antisymmetric_in_b(self, spark, data):
        from protosc_spark.evaluation import ordinal_association

        df = spark.createDataFrame(
            [(a, b) for a, b in data], "a long, b long"
        )
        neg = df.select("a", (-F.col("b")).alias("b"))
        r1 = ordinal_association(df, "a", "b").collect()[0]
        r2 = ordinal_association(neg, "a", "b").collect()[0]
        if r1.gamma is not None:
            assert r2.gamma == -r1.gamma
            assert r2.somers_d_ba == -r1.somers_d_ba
        assert r1.n_concordant == r2.n_discordant
