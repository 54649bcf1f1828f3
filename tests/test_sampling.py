"""Deterministic split / sample operators: engine vs DuckDB oracle,
stability contracts, plan shape."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from protosc_spark.sampling import (
    N_BUCKETS,
    hash_bucket,
    hash_split,
    split_oracle_sql,
    stratified_sample,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    return con.execute(sql).df()


def test_split_matches_duckdb_oracle(docs):
    got = (
        hash_split(docs, ["doc_id"], WEIGHTS)
        .select("doc_id", "split")
        .orderBy("doc_id")
        .toPandas()
    )
    case = split_oracle_sql("doc_id::VARCHAR", WEIGHTS)
    want = _duck(
        f"SELECT doc_id, {case} AS split FROM documents ORDER BY doc_id"
    )
    pd.testing.assert_frame_equal(got, want)


def test_split_fractions_and_totality(docs):
    counts = {
        r["split"]: r["count"]
        for r in hash_split(docs, ["doc_id"], WEIGHTS)
        .groupBy("split")
        .count()
        .collect()
    }
    n = sum(counts.values())
    assert n == docs.count()  # every row assigned exactly one split
    assert set(counts) == set(WEIGHTS)
    # 500 docs: binomial tolerance, generous
    assert abs(counts["train"] / n - 0.9) < 0.06
    assert abs(counts["val"] / n - 0.05) < 0.04
    assert abs(counts["test"] / n - 0.05) < 0.04


def test_split_stability_is_per_row(docs):
    """Removing other rows never moves a surviving row's split."""
    full = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, ["doc_id"], WEIGHTS).collect()
    }
    subset = docs.where(F.col("doc_id") % 3 == 0)
    sub = {
        r["doc_id"]: r["split"]
        for r in hash_split(subset, ["doc_id"], WEIGHTS).collect()
    }
    assert sub == {k: v for k, v in full.items() if k % 3 == 0}


def test_split_salt_changes_assignment(docs):
    a = hash_split(docs, ["doc_id"], WEIGHTS, salt="v1")
    b = hash_split(docs, ["doc_id"], WEIGHTS, salt="v2")
    joined = a.select("doc_id", F.col("split").alias("sa")).join(
        b.select("doc_id", F.col("split").alias("sb")), "doc_id"
    )
    n_diff = joined.where(F.col("sa") != F.col("sb")).count()
    assert n_diff > 0


def test_split_weights_must_sum_to_one(docs):
    with pytest.raises(ValueError):
        hash_split(docs, ["doc_id"], {"a": 0.5, "b": 0.6})


def test_stratified_sample_monotone_nested(docs):
    s10 = {r["doc_id"] for r in stratified_sample(docs, 0.10, ["doc_id"]).collect()}
    s25 = {r["doc_id"] for r in stratified_sample(docs, 0.25, ["doc_id"]).collect()}
    assert s10 <= s25  # nested: smaller fraction is a subset
    n = docs.count()
    assert abs(len(s25) / n - 0.25) < 0.08


def test_stratified_sample_deterministic_across_partitioning(docs):
    a = {r["doc_id"] for r in stratified_sample(docs, 0.2, ["doc_id"]).collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(17), 0.2, ["doc_id"]
        ).collect()
    }
    assert a == b


def test_bucket_range(docs):
    mm = docs.select(hash_bucket(["doc_id"]).alias("b")).agg(
        F.min("b"), F.max("b")
    ).first()
    assert mm[0] >= 0 and mm[1] < N_BUCKETS


def test_split_plan_has_no_shuffle_or_python(docs):
    plan = hash_split(docs, ["doc_id"], WEIGHTS)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestMixtureSample:
    """Temperature-scaled mixture sampling: kept counts follow
    n_group**alpha, alpha=1 degenerates to uniform sampling, rates cap
    at 1, and the kept set is a pure content function (stable across
    partitioning)."""

    @staticmethod
    def _skewed(spark):
        rows = []
        sizes = {"en": 3200, "de": 800, "fr": 200, "rare": 8}
        i = 0
        for g, n in sizes.items():
            for _ in range(n):
                rows.append((i, g))
                i += 1
        return (
            spark.createDataFrame(rows, "doc_id long, lang string"),
            sizes,
        )

    def test_alpha_half_upweights_rare_groups(self, spark):
        from protosc_spark.sampling import mixture_sample

        df, sizes = self._skewed(spark)
        kept = (
            mixture_sample(df, group_col="lang", alpha=0.5, total_frac=0.5)
            .groupBy("lang")
            .count()
            .toPandas()
            .set_index("lang")["count"]
        )
        import numpy as np

        # expected kept_g ~ C * n_g**0.5 for unsaturated groups
        # (C ~ 20.7 here, so fr at rate 20.7/sqrt(200)=1.46 and rare
        # both cap at 1 and keep everything)
        n = np.array([sizes[g] for g in ("en", "de")], dtype=float)
        got = np.array([kept[g] for g in ("en", "de")], dtype=float)
        ratios = got / np.sqrt(n)
        assert ratios.max() / ratios.min() < 1.15  # ~ proportional
        assert kept["fr"] == 200 and kept["rare"] == 8  # capped at 1
        # dominant group is downsampled far below 0.5
        assert kept["en"] / sizes["en"] < 0.45

    def test_alpha_one_is_uniform(self, spark):
        from protosc_spark.sampling import mixture_sample, stratified_sample

        df, _ = self._skewed(spark)
        mix = mixture_sample(df, group_col="lang", alpha=1.0, total_frac=0.3)
        uni = stratified_sample(df, 0.3, ["doc_id"])
        a = {r["doc_id"] for r in mix.select("doc_id").collect()}
        b = {r["doc_id"] for r in uni.select("doc_id").collect()}
        assert a == b  # identical rows, not just identical sizes

    def test_deterministic_across_partitioning(self, spark):
        from protosc_spark.sampling import mixture_sample

        df, _ = self._skewed(spark)
        a = {
            r["doc_id"]
            for r in mixture_sample(df, group_col="lang").collect()
        }
        b = {
            r["doc_id"]
            for r in mixture_sample(
                df.repartition(13), group_col="lang"
            ).collect()
        }
        assert a == b

    def test_null_group_rows_sampled_at_their_rate(self, spark):
        """NULL-group docs form their own group (advice r4): they are
        kept at the NULL group's computed rate, not silently dropped
        by the rate join, and the kept set equals a run where NULL is
        re-labeled to a sentinel string (same counts -> same rates ->
        same hash decisions)."""
        from pyspark.sql import functions as F

        from protosc_spark.sampling import mixture_sample

        df, _ = self._skewed(spark)
        withnull = df.withColumn(
            "lang",
            F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(
                F.col("lang")
            ),
        )
        kept = mixture_sample(
            withnull, group_col="lang", alpha=0.5, total_frac=0.5
        )
        kept_null = kept.where(F.col("lang").isNull()).count()
        assert kept_null > 0  # not dropped

        sentinel = withnull.withColumn(
            "lang", F.coalesce(F.col("lang"), F.lit("@@null@@"))
        )
        kept_s = mixture_sample(
            sentinel, group_col="lang", alpha=0.5, total_frac=0.5
        )
        a = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
        b = sorted(r["doc_id"] for r in kept_s.select("doc_id").collect())
        assert a == b


class TestDSIR:
    """DSIR importance resampling (Xie et al. 2023): planted target-
    like docs outrank off-distribution ones, log-weights match a
    brute-force python re-derivation exactly, and the kept set is
    partition-stable."""

    @staticmethod
    def _corpora(spark):
        import numpy as np

        rng = np.random.default_rng(11)
        tgt_vocab = [f"good{i}" for i in range(40)]
        raw_vocab = [f"junk{i}" for i in range(40)]
        target = [
            (i, " ".join(rng.choice(tgt_vocab, 20).tolist()))
            for i in range(60)
        ]
        raw = []
        for i in range(100):
            vocab = tgt_vocab if i % 2 == 0 else raw_vocab
            raw.append((i, " ".join(rng.choice(vocab, 20).tolist())))
        schema = "doc_id long, text string"
        return (
            spark.createDataFrame(raw, schema),
            spark.createDataFrame(target, schema),
        )

    def test_target_like_docs_outrank(self, spark):
        from protosc_spark.sampling import dsir_log_weights, dsir_sample

        raw, target = self._corpora(spark)
        lw = {
            r["doc_id"]: r["log_weight"]
            for r in dsir_log_weights(raw, target, n_buckets=1 << 12).collect()
        }
        like = [v for k, v in lw.items() if k % 2 == 0]
        unlike = [v for k, v in lw.items() if k % 2 == 1]
        assert min(like) > max(unlike)  # clean separation on this fixture

        kept = {
            r["doc_id"]
            for r in dsir_sample(
                raw, target, frac=0.4, n_buckets=1 << 12
            ).collect()
        }
        # importance mass concentrates on the target-like half
        frac_like = sum(1 for k in kept if k % 2 == 0) / max(len(kept), 1)
        assert frac_like >= 0.95
        assert 20 <= len(kept) <= 60  # ~frac * n with cap undershoot

    def test_log_weights_match_bruteforce(self, spark):
        import hashlib
        import math
        from collections import Counter

        from protosc_spark.sampling import dsir_log_weights

        raw, target = self._corpora(spark)
        B, a = 1 << 12, 1.0

        def bucket(tok):
            return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B

        t_rows = {r["doc_id"]: r["text"] for r in target.collect()}
        r_rows = {r["doc_id"]: r["text"] for r in raw.collect()}
        tc = Counter(bucket(t) for s in t_rows.values() for t in s.split(" "))
        rc = Counter(bucket(t) for s in r_rows.values() for t in s.split(" "))
        T, R = sum(tc.values()), sum(rc.values())
        want = {}
        for i, s in r_rows.items():
            w = 0.0
            for t in s.split(" "):
                b = bucket(t)
                w += math.log((tc[b] + a) / (T + a * B)) - math.log(
                    (rc[b] + a) / (R + a * B)
                )
            want[i] = w
        got = {
            r["doc_id"]: r["log_weight"]
            for r in dsir_log_weights(raw, target, n_buckets=B).collect()
        }
        assert set(got) == set(want)
        for i in want:
            assert abs(got[i] - want[i]) < 1e-9, i

    def test_deterministic_across_partitioning(self, spark):
        from protosc_spark.sampling import dsir_sample

        raw, target = self._corpora(spark)
        a = {
            r["doc_id"]
            for r in dsir_sample(raw, target, frac=0.3).collect()
        }
        b = {
            r["doc_id"]
            for r in dsir_sample(
                raw.repartition(13), target.repartition(7), frac=0.3
            ).collect()
        }
        assert a == b


# --- weighted sampling without replacement (A-ES) ---


def test_weighted_sample_prefers_heavy_items(spark):
    """5000 heavy (w=10) + 5000 light (w=1) docs, k=1000: expected
    heavy share ~91%; the draw is deterministic, so the assertion is
    a fixed fact about the hash, not a flaky statistical test."""
    from protosc_spark.sampling import weighted_sample

    df = spark.range(10000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 5000, 10).otherwise(1).alias("w"),
    )
    got = weighted_sample(df, k=1000, weight_col="w").collect()
    assert len(got) == 1000
    heavy = sum(1 for r in got if r.doc_id < 5000)
    assert heavy > 800, heavy


def test_weighted_sample_equal_weights_is_hash_bottom_k(spark):
    """All weights equal -> the race reduces to plain bottom-k of
    -ln(u), i.e. a uniform deterministic sample; doubling every
    weight must not change the selection (scale invariance)."""
    from protosc_spark.sampling import weighted_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit(3).alias("w")
    )
    a = sorted(r.doc_id for r in weighted_sample(df, 50, "w").collect())
    df2 = df.withColumn("w", F.lit(6))
    b = sorted(r.doc_id for r in weighted_sample(df2, 50, "w").collect())
    assert a == b


def test_weighted_sample_salt_gives_independent_draws(spark):
    from protosc_spark.sampling import weighted_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("w")
    )
    a = {r.doc_id for r in weighted_sample(df, 100, "w", salt=0).collect()}
    b = {r.doc_id for r in weighted_sample(df, 100, "w", salt=1).collect()}
    assert a != b
    # overlap of two independent 5% draws should be small
    assert len(a & b) < 30


def test_weighted_sample_nonpositive_weights_excluded(spark):
    from protosc_spark.sampling import weighted_sample

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 10, 0).otherwise(1).alias("w"),
    )
    got = weighted_sample(df, 200, "w").collect()
    assert len(got) == 90
    assert all(r.doc_id >= 10 for r in got)


def test_weighted_sample_partitioning_independence(spark):
    from protosc_spark.sampling import weighted_sample

    df = spark.range(3000).select(
        F.col("doc_id") if False else F.col("id").alias("doc_id"),
        (F.pmod(F.col("id"), F.lit(7)) + 1).alias("w"),
    )
    a = [
        r.doc_id
        for r in weighted_sample(df.repartition(1), 80, "w")
        .orderBy("rnk")
        .collect()
    ]
    b = [
        r.doc_id
        for r in weighted_sample(df.repartition(23), 80, "w")
        .orderBy("rnk")
        .collect()
    ]
    assert a == b


# --- Poisson bootstrap CI ---


def test_poisson_bootstrap_weights_and_ci(spark):
    from protosc_spark.sampling import poisson_bootstrap

    # 400 rows around mean 100 with a deterministic spread
    rows = [(i, 100 + (i * 37) % 21 - 10) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v long")
    r = poisson_bootstrap(
        df, "v", ["id"], n_reps=200
    ).collect()[0]
    true_mean = sum(v for _, v in rows) / 400
    assert r.n == 400 and abs(r.mean - true_mean) < 1e-9
    assert r.eff_reps == 200
    # the percentile CI brackets the point estimate, is a few
    # standard errors wide (sd ~ 6.05, se ~ 0.30), and is ordered
    assert r.ci_lo < r.mean < r.ci_hi
    assert 0.5 < (r.ci_hi - r.ci_lo) < 2.5
    # deterministic: a reshuffled input gives the identical CI
    r2 = poisson_bootstrap(
        df.repartition(13), "v", ["id"], n_reps=200
    ).collect()[0]
    assert (r2.ci_lo, r2.ci_hi) == (r.ci_lo, r.ci_hi)


def test_poisson_bootstrap_groups_and_zero_weight_reps(spark):
    from protosc_spark.sampling import poisson_bootstrap
    import math

    rows = [("big", i, 50 + (i % 7)) for i in range(300)]
    rows += [("tiny", 1000, 5)]  # single row: P(rep all-zero)=e^-1
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = {
        r.g: r
        for r in poisson_bootstrap(
            df, "v", ["id"], group_col="g", n_reps=100
        ).collect()
    }
    assert got["big"].eff_reps == 100
    tiny = got["tiny"]
    # ~e^-1 of a singleton's replicates drop; all survivors have
    # mean exactly v, so the CI collapses onto the point estimate
    assert 40 <= tiny.eff_reps <= 90
    assert tiny.ci_lo == tiny.ci_hi == tiny.mean == 5.0


def test_poisson_bootstrap_weight_moments(spark):
    """The hash-threshold weights behave like Poisson(1): over 40k
    (row, rep) draws the mean and variance are both ~1 and the
    zero-rate ~e^-1."""
    from pyspark.sql import functions as SF
    from protosc_spark.sampling import POISSON1_T60

    ex = (
        spark.range(400)
        .withColumn(
            "rep", SF.explode(SF.sequence(SF.lit(0), SF.lit(99)))
        )
        .select(
            SF.conv(
                SF.substring(
                    SF.md5(
                        SF.concat_ws(
                            "\x1f",
                            SF.lit("boot"),
                            SF.col("id"),
                            SF.col("rep"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h")
        )
    )
    w = sum(
        (SF.col("h") >= SF.lit(t)).cast("int") for t in POISSON1_T60
    )
    s = ex.select(
        SF.mean(w).alias("m"),
        SF.var_pop(w).alias("v"),
        SF.mean((w == 0).cast("int")).alias("z"),
    ).collect()[0]
    import math

    assert abs(s.m - 1.0) < 0.02
    assert abs(s.v - 1.0) < 0.05
    assert abs(s.z - math.exp(-1)) < 0.01
