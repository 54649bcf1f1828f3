"""Zero-temporal-leakage: perturbing or deleting FUTURE rows must leave
every feature at earlier (conv_id, turn_idx) bit-identical.

This is the north rule's central correctness property; the reference
has no time axis so no analog exists there — the property is pinned
directly.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from protosc_spark.datagen import generate_attribute_updates, generate_transcripts
from protosc_spark.pipeline import flagship_features

CUTOFF = 6  # turn_idx boundary: rows with turn_idx < CUTOFF are "the past"


@pytest.fixture(scope="module")
def base(spark):
    tr = generate_transcripts(spark, n_conversations=60, seed=7).cache()
    up = generate_attribute_updates(spark, n_conversations=60, seed=7).cache()
    out, _ = flagship_features(tr, up)
    past = (
        out.where(F.col("turn_idx") < CUTOFF)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    return tr, up, past


def _past_features(out_df):
    pdf = (
        out_df.where(F.col("turn_idx") < CUTOFF)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    return np.array(pdf["features"].tolist())


def test_deleting_future_rows_changes_nothing(spark, base):
    tr, up, past = base
    truncated = tr.where(F.col("turn_idx") < CUTOFF)
    out2, _ = flagship_features(truncated, up)
    assert np.array_equal(_past_features(out2), np.array(past["features"].tolist()))


def test_mutating_future_text_changes_nothing(spark, base):
    tr, up, past = base
    mutated = tr.withColumn(
        "text",
        F.when(F.col("turn_idx") >= CUTOFF, F.lit("CORRUPTED FUTURE")).otherwise(
            F.col("text")
        ),
    )
    out2, _ = flagship_features(mutated, up)
    assert np.array_equal(_past_features(out2), np.array(past["features"].tolist()))


def test_future_attribute_updates_invisible(spark, base):
    tr, up, past = base
    # shift ALL updates 10 years into the future -> every attr feature
    # must become the null sentinel, and nothing else may move
    far = up.withColumn("ts", F.col("ts") + F.expr("INTERVAL 3650 DAYS"))
    out2, registry = flagship_features(tr, far)
    got = _past_features(out2)
    want = np.array(past["features"].tolist()).copy()
    ids = registry.feature_ids()
    i_val = ids.index("asof_ctx:attr_value_f")
    i_known = ids.index("asof_ctx:attr_known")
    want[:, i_val] = -1.0
    want[:, i_known] = 0.0
    assert np.array_equal(got, want)
