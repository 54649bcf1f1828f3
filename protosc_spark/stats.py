"""Distributed statistics via two-phase sufficient-statistics
aggregation — the engine's re-expression of the reference's in-memory
matrix math (north rule: "chi-square statistics, feature clustering
over the correlation matrix ... as two-phase treeAggregate of
per-partition sufficient statistics").

* :func:`chisquare_features` — per-feature Kruskal–Wallis H across the
  label classes (what the reference calls chi-square,
  protosc/model/utils.py:56-89, a per-feature scipy loop there).
  Here: posexplode to (feature, value, y) -> average ranks from a
  window + a tie groupBy -> per-(feature, class) rank sums -> final H
  on the driver from ~n_features*n_classes floats. Exact parity with
  the tie-corrected scipy formula (numerics.kruskal_h).
* :func:`correlation_matrix` — Pearson feature x feature correlation
  from one pass of per-partition Gramian partials (n, sum x, X^T X)
  combined on the driver (tree-combine of numpy blocks). Matches
  np.corrcoef to allclose (reference protosc/feature_matrix.py:122-138
  computes np.corrcoef on the dense matrix).

Scale notes: ranks shuffle rows*features once, partitioned BY FEATURE —
embarrassingly parallel across features, which is the dimension that
grows with extractor count; the Gramian pass is map-side only (no
shuffle) and its partial size is p^2 doubles per partition, independent
of row count.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def chisquare_features(
    df: DataFrame,
    features_col: str = "features",
    label_col: str = "y",
    n_features: int | None = None,
) -> np.ndarray:
    """Kruskal–Wallis H per feature column of the array, distributed.

    Returns np.ndarray[n_features] of H statistics (tie-corrected).
    """
    ex = df.select(
        F.posexplode(F.col(features_col)).alias("fid", "x"),
        F.col(label_col).alias("y"),
    )
    w_rank = W.partitionBy("fid").orderBy("x")
    w_tie = W.partitionBy("fid", "x")
    ranked = ex.select(
        "fid",
        "y",
        "x",
        (
            F.rank().over(w_rank)
            + (F.count(F.lit(1)).over(w_tie) - F.lit(1)) / F.lit(2.0)
        ).alias("r"),
        F.count(F.lit(1)).over(w_tie).alias("t"),
    )
    # per (fid, y): rank sums, counts and the tie contribution. A tie
    # group of size t contributes t^3 - t == t rows * (t^2 - 1), so the
    # per-row term (t^2 - 1) folds into the same single aggregation.
    grp = ranked.groupBy("fid", "y").agg(
        F.sum("r").alias("rsum"),
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("t").cast("double") * F.col("t") - F.lit(1.0)).alias("tie_part"),
    )
    grp_pdf = grp.toPandas()

    if n_features is None:
        n_features = int(grp_pdf["fid"].max()) + 1
    out = np.full(n_features, np.nan)
    for fid, sub in grp_pdf.groupby("fid"):
        cnts = sub["cnt"].to_numpy(dtype=np.float64)
        rsums = sub["rsum"].to_numpy(dtype=np.float64)
        n = int(cnts.sum())
        tie_sum = float(sub["tie_part"].sum())
        h = 12.0 / (n * (n + 1)) * np.sum(rsums**2 / cnts) - 3.0 * (n + 1)
        t = 1.0 - tie_sum / float(n**3 - n)
        out[int(fid)] = h / t
    return out


def gramian_stats(
    df: DataFrame, features_col: str = "features"
) -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass -> (n, sum_x[p], X^T X[p, p]).

    Per-Arrow-batch partials are computed with numpy inside
    ``mapInPandas`` (map-side only, no shuffle) and tree-combined on
    the driver by summation — the two-phase treeAggregate shape.
    """
    p = None

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.array(pdf[features_col].tolist(), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [X.shape[0]],
                    "p": [X.shape[1]],
                    "sx": [X.sum(axis=0).tolist()],
                    "sxx": [(X.T @ X).ravel().tolist()],
                }
            )

    rows = (
        df.select(features_col)
        .mapInPandas(
            partials, schema="n long, p int, sx array<double>, sxx array<double>"
        )
        .collect()
    )
    if not rows:
        raise ValueError("empty input")
    p = rows[0]["p"]
    n = sum(r["n"] for r in rows)
    sx = np.zeros(p)
    sxx = np.zeros((p, p))
    for r in rows:
        sx += np.asarray(r["sx"])
        sxx += np.asarray(r["sxx"]).reshape(p, p)
    return n, sx, sxx


def correlation_matrix(
    df: DataFrame, features_col: str = "features"
) -> np.ndarray:
    """Pearson correlation matrix from Gramian sufficient statistics.

    cov = (X^T X - n mu mu^T) / (n - 1); corr = cov / (sd sd^T) —
    numerically float64 throughout, allclose to np.corrcoef on the
    collected matrix (pinned in tests/test_stats.py).
    """
    n, sx, sxx = gramian_stats(df, features_col)
    mu = sx / n
    cov = (sxx - n * np.outer(mu, mu)) / (n - 1)
    sd = np.sqrt(np.diag(cov))
    sd = np.where(sd == 0, 1.0, sd)
    corr = cov / np.outer(sd, sd)
    np.clip(corr, -1.0, 1.0, out=corr)
    return corr


def correlation_submatrix(
    df: DataFrame, feature_ids: np.ndarray, features_col: str = "features"
) -> np.ndarray:
    """Correlation of a subset of array positions (used by clustering:
    only the ~selected features participate, so the Gramian is computed
    on the projected sub-array — less shuffle-free work, smaller
    partials)."""
    idx = [int(i) for i in feature_ids]
    sub = df.select(
        F.array(*[F.col(features_col)[i] for i in idx]).alias(features_col)
    )
    return correlation_matrix(sub, features_col)
