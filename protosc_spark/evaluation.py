"""Corpus-scale model-evaluation metrics.

protosc scores models with fold accuracy (model/utils.py
compute_accuracy — covered by models/search.py); at corpus scale the
standard readouts are threshold-free ranking quality (AUC) and
probability calibration (reliability bins / ECE). Both here are
EXACT and engine-reproducible:

* :func:`auc_exact` — the Mann-Whitney U formulation with full tie
  handling, computed from the score-value histogram: group rows by
  DISTINCT SCORE VALUE (pos/neg counts per value), then
  U = sum_s pos_s * (neg_below_s + neg_s / 2), doubled to stay
  integer. The only window runs over distinct score values — for the
  integer-ish scores the engine produces (counts, lengths, quantized
  probabilities) that is thousands of rows, never the corpus. For a
  continuous score, quantize first (sketches.hdr_histogram is the
  scale path); AUC over the quantized score is AUC of the quantized
  ranking, exactly.
* :func:`calibration_bins` — fixed-width reliability bins with
  per-bin confidence vs empirical rate and the Expected Calibration
  Error sum_b (n_b / n) |rate_b - conf_b|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def auc_exact(df: DataFrame, score_col: str, label_col: str
              ) -> DataFrame:
    """Exact ROC AUC (probability a random positive outranks a
    random negative, ties at half credit) via the doubled integer
    Mann-Whitney sum

        U2 = sum_s pos_s * (2 * neg_below_s + neg_s),
        auc = U2 / (2 * P * N)

    accumulated as DECIMAL(38,0) — order-independent and exact; the
    division is the only floating point. Rows with NULL score or
    label are dropped; AUC is NULL when either class is empty.
    Output: one row (n_pos, n_neg, auc)."""
    dec = "decimal(19,0)"
    y = F.col(label_col).cast("int")
    g = (
        df.where(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(score_col)
        .agg(
            F.sum(y).cast("bigint").alias("pos"),
            F.sum(1 - y).cast("bigint").alias("neg"),
        )
    )
    w = W.orderBy(score_col).rowsBetween(W.unboundedPreceding, -1)
    nd = F.col("neg").cast(dec)
    below = F.coalesce(
        F.sum(nd).over(w), F.lit(0).cast(dec)
    )
    u2 = F.col("pos").cast(dec) * (
        F.lit(2).cast(dec) * below + nd
    )
    agg = g.select(
        "pos", "neg", u2.alias("u2")
    ).agg(
        F.sum("pos").alias("__p"),
        F.sum("neg").alias("__n"),
        F.sum("u2").alias("__u2"),
    )
    p, n, u = (
        F.col(c).cast("double") for c in ("__p", "__n", "__u2")
    )
    return agg.select(
        F.col("__p").cast("bigint").alias("n_pos"),
        F.col("__n").cast("bigint").alias("n_neg"),
        F.when(
            (F.col("__p") > 0) & (F.col("__n") > 0),
            u / (F.lit(2.0) * p * n),
        ).alias("auc"),
    )


def calibration_bins(df: DataFrame, score_col: str, label_col: str,
                     n_bins: int = 10) -> DataFrame:
    """Reliability diagram + ECE: scores in [0, 1] land in
    ``n_bins`` fixed-width bins (score 1.0 folds into the last bin),
    each reporting its size, mean predicted confidence and empirical
    positive rate; every row repeats the whole-column

        ece = sum_b (n_b / n) * |rate_b - conf_b|.

    Empty bins are omitted (their ECE weight is zero). Output:
    (bin, n, conf, rate, ece) ordered by bin.

    Scale shape: one map-side-combined n_bins-bucket aggregation;
    everything after runs on the <= n_bins-row table. Pure JVM."""
    s = F.col(score_col).cast("double")
    b = F.least(
        F.floor(s * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    per = (
        df.where(s.isNotNull() & F.col(label_col).isNotNull())
        .select(
            b.alias("bin"),
            s.alias("__s"),
            F.col(label_col).cast("int").alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.sum("__s") / F.count(F.lit(1))).alias("conf"),
            (
                F.sum("__y").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("rate"),
        )
    )
    tot = per.agg(F.sum("n").alias("__t"))
    ece = (
        per.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("n").cast("double")
                / F.col("__t").cast("double")
                * F.abs(F.col("rate") - F.col("conf"))
            ).alias("__ece")
        )
    )
    return (
        per.crossJoin(F.broadcast(ece))
        .select("bin", "n", "conf", "rate",
                F.col("__ece").alias("ece"))
        .orderBy("bin")
    )
