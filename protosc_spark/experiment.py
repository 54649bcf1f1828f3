"""Deterministic A/B experiment readout.

Completes the analysis loop the other monitors feed (PSI/MAD/CUSUM
say *something changed*; an experiment readout says *did the change
do what we wanted*): users are split into two variants by the same
deterministic md5 ``hash_bucket`` rule the engine uses for splits
and folds (a pure function of id + salt — stable across runs,
partitioning, engines), per-user conversion is a threshold on the
user's count of the target state, and each state gets the classic
two-proportion pooled z statistic

    z = (p_b - p_a) / sqrt(p (1 - p) (1/n_a + 1/n_b)),
    p = (conv_a + conv_b) / (n_a + n_b)

(z is NULL when a variant is empty or the pooled rate is degenerate
0/1 — the statistic is undefined there, not zero).

Scale shape: one (user, state) count — map-side combined; the
user x state grid is a broadcast crossJoin of the distinct-state
list (states are enum-sized) against the distinct-user table, so
users who never emitted a state still count in its denominator; one
conditional-sum groupBy down to |states| rows. Pure JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket


def ab_readout(
    df: DataFrame,
    id_col: str = "user_id",
    state_col: str = "event_type",
    threshold: int = 1,
    salt: str = "exp1",
) -> DataFrame:
    """Per-state two-proportion readout over a deterministic 50/50
    hash split of the ids. Conversion for (user, state) is
    count >= ``threshold`` (users with zero events of the state are
    non-converting members of their variant, not missing rows).

    Output: (state, n_a, n_b, conv_a, conv_b, rate_a, rate_b, z).
    """
    users = (
        df.select(id_col)
        .distinct()
        .withColumn(
            "variant", hash_bucket([id_col], salt=salt, n_buckets=2)
        )
    )
    states = (
        df.select(state_col)
        .where(F.col(state_col).isNotNull())
        .distinct()
    )
    counts = df.groupBy(id_col, state_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    grid = (
        users.crossJoin(F.broadcast(states))
        .join(counts, [id_col, state_col], "left")
        .withColumn(
            "conv",
            (F.coalesce(F.col("__c"), F.lit(0)) >= threshold)
            .cast("bigint"),
        )
    )
    va = F.when(F.col("variant") == 0, 1).otherwise(0)
    vb = F.when(F.col("variant") == 1, 1).otherwise(0)
    s = grid.groupBy(state_col).agg(
        F.sum(va).cast("bigint").alias("n_a"),
        F.sum(vb).cast("bigint").alias("n_b"),
        F.sum(va * F.col("conv")).cast("bigint").alias("conv_a"),
        F.sum(vb * F.col("conv")).cast("bigint").alias("conv_b"),
    )
    n_a, n_b = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = (
        F.col("conv_a").cast("double"),
        F.col("conv_b").cast("double"),
    )
    p = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = F.when(
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") > 0)
        & (
            F.col("conv_a") + F.col("conv_b")
            < F.col("n_a") + F.col("n_b")
        ),
        (cb / n_b - ca / n_a)
        / F.sqrt(
            p * (F.lit(1) - p) * (F.lit(1.0) / n_a + F.lit(1.0) / n_b)
        ),
    )
    return s.select(
        state_col,
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        (ca / n_a).alias("rate_a"),
        (cb / n_b).alias("rate_b"),
        z.alias("z"),
    )
