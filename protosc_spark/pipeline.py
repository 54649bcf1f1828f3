"""Flagship feature pipeline: transcript table -> per-(conv_id,
turn_idx, ts) feature vector.

Composition (the Spark analog of the reference's
``default_visual_pipeline`` at reference protosc/settings.py:20-24,
which chains ReadImage -> ViolaJones -> CutCircle -> {Fourier, HOG}):

  scan -> stable_dedup -> per-turn text extractors (one select pass,
  shared intermediates) -> window features (lag / rolling / session;
  ONE shuffle on conv_id, frames end at the current row) -> strict-past
  as-of join of attribute updates -> concat into features:array<double>
  + registry.

Leakage-freedom is structural: per-turn extractors see only their own
row; window frames end at (or before) the current row; the as-of join
uses strict '<'. tests/test_leakage.py verifies by perturbing future
rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from protosc_spark.asof import asof_join
from protosc_spark.extract import Extractor, FeatureRegistry, extract
from protosc_spark.features.text import default_text_extractors
from protosc_spark.ordering import stable_dedup
from protosc_spark.windows import (
    _epoch_s,
    rolling_agg,
    sessionize,
    with_lag_lead,
)

BASE_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

WINDOW_FEATURES = (
    "prev_n_tokens",
    "gap_s",
    "roll_mean_tokens5",
    "turn_in_session",
    "session_id_f",
)
ASOF_FEATURES = ("attr_value_f", "attr_known")


def _window_context(df: DataFrame):
    return F.array(*[F.col(c).cast("double") for c in WINDOW_FEATURES])


def _asof_context(df: DataFrame):
    return F.array(*[F.col(c).cast("double") for c in ASOF_FEATURES])


def flagship_features(
    transcripts: DataFrame,
    updates: DataFrame | None = None,
    extractors: Sequence[Extractor] | None = None,
    dedup: bool = True,
) -> tuple[DataFrame, FeatureRegistry]:
    """Full pipeline; returns (keyed feature DataFrame, registry).

    Output columns: conv_id, turn_idx, ts, features(array<double>).
    """
    extractors = list(extractors if extractors is not None else default_text_extractors())
    df = stable_dedup(transcripts) if dedup else transcripts

    # scalar context columns (JVM, codegen) --------------------------------
    df = df.withColumn("n_tokens", F.size(F.split(F.col("text"), " ")).cast("double"))

    # window features: one conv_id shuffle serves all of these --------------
    df = with_lag_lead(df, {"nt": "n_tokens", "pts": "ts"}, order="turn_idx")
    df = df.withColumn(
        "prev_n_tokens", F.coalesce(F.col("nt_lag1"), F.lit(-1.0))
    ).withColumn(
        "gap_s",
        F.coalesce(
            (_epoch_s("ts") - _epoch_s(F.col("pts_lag1"))).cast("double"), F.lit(-1.0)
        ),
    )
    df = rolling_agg(
        df, {"roll_mean_tokens5": F.avg("n_tokens")}, n_rows=5, order="turn_idx"
    )
    df = sessionize(df, gap_seconds=1800, order=["turn_idx"])
    # turn_in_session without a (conv_id, session_id) re-shuffle: stay in
    # the existing conv_id window; position = rn - rn(session start) + 1
    w_order = W.partitionBy("conv_id").orderBy("turn_idx")
    w_cum = w_order.rowsBetween(W.unboundedPreceding, W.currentRow)
    df = df.withColumn("__rn", F.row_number().over(w_order))
    df = df.withColumn(
        "__is_boundary",
        (F.col("session_id") != F.lag("session_id", 1, -1).over(w_order)).cast("int"),
    )
    df = (
        df.withColumn(
            "__session_start_rn",
            F.max(F.when(F.col("__is_boundary") == 1, F.col("__rn"))).over(w_cum),
        )
        .withColumn(
            "turn_in_session", F.col("__rn") - F.col("__session_start_rn") + 1
        )
        .drop("__rn", "__is_boundary", "__session_start_rn")
        .withColumn("session_id_f", F.col("session_id").cast("double"))
    )

    ctx = Extractor(
        name="window_ctx",
        width=len(WINDOW_FEATURES),
        build=_window_context,
        feature_names=WINDOW_FEATURES,
    )
    extractors = extractors + [ctx]

    # strict-past as-of attributes ------------------------------------------
    if updates is not None:
        df = asof_join(df, updates, on="ts", by="conv_id", value_cols=["attr_value"])
        df = df.withColumn(
            "attr_known", F.col("attr_value").isNotNull().cast("double")
        ).withColumn("attr_value_f", F.coalesce(F.col("attr_value"), F.lit(-1.0)))
        extractors = extractors + [
            Extractor(
                name="asof_ctx",
                width=len(ASOF_FEATURES),
                build=_asof_context,
                feature_names=ASOF_FEATURES,
            )
        ]

    out, registry = extract(
        df, extractors, keep_cols=["conv_id", "turn_idx", "ts"]
    )
    return out, registry
