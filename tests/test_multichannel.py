"""Multi-channel feature registry: grouped chi-square (flattened
tuple-max quirk), corrcoef channel-block max, and FilterModel over
logical features — engine == numpy oracle, mirroring the reference's
FeatureMatrix semantics (protosc/feature_matrix.py:20-27,48-67,122-138
and protosc/model/utils.py:70-78)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from protosc_spark.extract import Extractor, FeatureRegistry, extract
from protosc_spark.numerics import chi2_sf, kruskal_h, kruskal_h_p
from protosc_spark.oracle.numpy_model import (
    oracle_chisquare_grouped,
    oracle_filter_model,
)
from protosc_spark.stats import (
    blockmax_reduce,
    chisquare_features_grouped,
    correlation_blockmax,
)


def _to_df(spark, X, y):
    pdf = pd.DataFrame(
        {
            "sample_id": np.arange(len(y), dtype=np.int64),
            "features": list(X.astype(np.float64)),
            "y": y.astype(np.int32),
        }
    )
    return spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def paired():
    """24 columns grouped as 12 two-channel logical features; signal
    planted in the first 4 groups (both channels)."""
    rng = np.random.default_rng(1928)
    n = 160
    X = rng.normal(size=(n, 24))
    y = rng.integers(0, 2, size=n)
    for g in range(4):
        X[y == 1, 2 * g] += 1.5 + 0.3 * g
        X[y == 1, 2 * g + 1] += 1.0
    groups = [[2 * i, 2 * i + 1] for i in range(12)]
    return X, y, groups


def test_kruskal_h_p_matches_chi2_sf():
    rng = np.random.default_rng(3)
    a, b, c = rng.normal(size=50), rng.normal(size=60) + 0.5, rng.normal(size=40)
    h, p = kruskal_h_p(a, b, c)
    assert h == kruskal_h(a, b, c)
    assert p == chi2_sf(h, 2)
    assert 0.0 <= p <= 1.0


def test_grouped_chisquare_engine_equals_oracle(spark, paired):
    X, y, groups = paired
    got = chisquare_features_grouped(_to_df(spark, X, y), groups)
    want = oracle_chisquare_grouped(X, y, groups)
    assert np.allclose(got, want, atol=1e-9)
    # planted groups dominate
    assert set(np.argsort(-got)[:4]) == {0, 1, 2, 3}


def test_tuple_max_quirk_pvalue_can_win(spark):
    """The reference's np.max flattens (statistic, pvalue) pairs: for a
    pure-noise group H is tiny (< 1) while p is near 1, so the QUIRK
    returns the p-value. Pin that both paths reproduce it."""
    rng = np.random.default_rng(7)
    n = 400
    X = rng.normal(size=(n, 2))
    y = rng.integers(0, 2, size=n)
    groups = [[0, 1]]
    want = oracle_chisquare_grouped(X, y, groups)
    got = chisquare_features_grouped(_to_df(spark, X, y), groups)
    assert np.allclose(got, want, atol=1e-9)
    # verify the quirk actually fired: result is a probability-sized
    # number exceeding every channel's H statistic
    hs = [kruskal_h(X[y == 0, c], X[y == 1, c]) for c in (0, 1)]
    if max(hs) < 1.0:
        assert got[0] > max(hs)  # a p-value won the flattened max


def test_correlation_blockmax_engine_equals_oracle(spark, paired):
    X, y, groups = paired
    fs = np.array([0, 3, 7, 11])
    got = correlation_blockmax(_to_df(spark, X, y), fs, groups)
    expanded = [c for f in fs for c in groups[f]]
    r = np.corrcoef(X[:, expanded], rowvar=False)
    want = blockmax_reduce(r, [len(groups[f]) for f in fs])
    assert np.allclose(got, want, atol=1e-9)
    assert got.shape == (4, 4)


def test_filter_model_multichannel_matches_oracle(spark, paired):
    from protosc_spark.models.filter_model import FilterModel

    X, y, groups = paired
    df = _to_df(spark, X, y)
    got = FilterModel(n_fold=4).execute(
        df, fold_seed=5, seed=1, col_groups=groups, mode="distributed"
    )
    want = oracle_filter_model(
        X, y, n_fold=4, fold_seed=5, seed=1, col_groups=groups
    )["selected"]
    assert sorted(got) == sorted(want)
    assert len(got) > 0
    assert all(0 <= f < len(groups) for f in got)  # logical ids


def test_registry_channel_groups_and_extract(spark):
    """An extractor declaring channels=3 yields width/3 logical
    features each owning 3 adjacent columns; extract() assembles the
    flat array and the registry exposes the grouping."""
    ex = Extractor(
        name="rgb",
        width=6,
        channels=3,
        build=lambda df: F.array(*[F.lit(float(i)) for i in range(6)]),
    )
    reg = FeatureRegistry.from_extractors([ex])
    assert reg.n_features == 2 and reg.n_columns == 6
    assert reg.col_groups() == [[0, 1, 2], [3, 4, 5]]
    assert reg.feature_ids() == ["rgb:0", "rgb:1"]

    df = spark.range(3).select(F.lit("k").alias("conv_id"))
    out, reg2 = extract(df, [ex], keep_cols=["conv_id"])
    row = out.first()
    assert list(row["features"]) == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    assert reg2.col_groups() == [[0, 1, 2], [3, 4, 5]]


def test_per_channel_fourier_through_filter_model(spark):
    """The VERDICT scenario: per-channel Fourier features (one logical
    feature per polar bin, one column per image channel) flow through
    FilterModel with the numpy oracle agreeing feature-ID-exact."""
    from protosc_spark.multimodal import decode_images, generate_media
    from protosc_spark.visual import multichannel_fourier_udf

    media = generate_media(spark, n=96, seed=42, kind="image")
    # fixed channel count for a static UDF width
    rgb = decode_images(media).where(F.col("channels") == 3)
    udf, width, n_bins = multichannel_fourier_udf((8, 8), n_channels=3)
    ex = Extractor(
        name="fourier",
        width=width,
        channels=3,
        build=lambda df: udf(
            F.col("pixels"), F.col("width"), F.col("height"), F.col("channels")
        ),
    )
    feats, reg = extract(rgb, [ex], keep_cols=["media_id"])
    assert reg.n_features == n_bins and reg.n_columns == width

    # deterministic label from the media id; stable sample key
    labeled = feats.select(
        F.regexp_extract("media_id", r"(\d+)", 1).cast("long").alias("sample_id"),
        (F.pmod(F.xxhash64("media_id"), F.lit(2)) == 0).cast("int").alias("y"),
        "features",
    ).cache()

    from protosc_spark.models.filter_model import FilterModel

    got = FilterModel(n_fold=4).execute(
        labeled, fold_seed=3, seed=0, col_groups=reg.col_groups(),
        mode="distributed",
    )
    pdf = labeled.orderBy("sample_id").toPandas()
    X = np.array(pdf["features"].tolist(), dtype=np.float64)
    y = pdf["y"].to_numpy()
    want = oracle_filter_model(
        X, y, n_fold=4, fold_seed=3, seed=0, col_groups=reg.col_groups()
    )["selected"]
    assert sorted(got) == sorted(want)


def test_dead_channel_correlation_defined_once(spark):
    """Zero-variance (dead) channel — common with real extractors (an
    all-black image region): raw np.corrcoef emits NaN there, which
    poisons np.max inside blockmax_reduce, while the engine's Gramian
    guards sd==0 -> 0. The degenerate case is now defined ONCE
    (stats.corrcoef_guarded, mirror of the round-2 H := 0 fix):
    engine == oracle, everything finite, no RuntimeWarnings."""
    import warnings

    from protosc_spark.stats import corrcoef_guarded

    rng = np.random.default_rng(11)
    n = 80
    X = rng.normal(size=(n, 6))
    X[:, 3] = 2.5  # dead channel inside logical feature 1
    y = rng.integers(0, 2, size=n)
    groups = [[0, 1], [2, 3], [4, 5]]
    fs = np.array([0, 1, 2])
    got = correlation_blockmax(_to_df(spark, X, y), fs, groups)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        want = blockmax_reduce(corrcoef_guarded(X), [2, 2, 2])
    assert np.isfinite(got).all() and np.isfinite(want).all()
    assert np.allclose(got, want, atol=1e-9)
    # dead channel row/col contributes 0; live channels decide the max
    assert want[1, 1] > 0.999  # block (1,1) still has the live diagonal


def test_dead_channel_filter_model_engine_equals_oracle(spark):
    """FilterModel end-to-end over a registry containing a dead channel:
    selections identical, and the oracle path raises no numpy
    RuntimeWarning (the round-2 green run had two)."""
    import warnings

    from protosc_spark.models.filter_model import FilterModel

    rng = np.random.default_rng(1928)
    n = 160
    X = rng.normal(size=(n, 12))
    y = rng.integers(0, 2, size=n)
    for g in range(3):  # plant signal in groups 0..2
        X[y == 1, 2 * g] += 1.5 + 0.3 * g
        X[y == 1, 2 * g + 1] += 1.0
    X[:, 7] = -1.0  # dead channel in (unplanted) logical feature 3
    groups = [[2 * i, 2 * i + 1] for i in range(6)]
    df = _to_df(spark, X, y)
    got = FilterModel(n_fold=4).execute(
        df, fold_seed=5, seed=1, col_groups=groups, mode="distributed"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        want = oracle_filter_model(
            X, y, n_fold=4, fold_seed=5, seed=1, col_groups=groups
        )["selected"]
    assert sorted(got) == sorted(want)
    assert len(got) > 0
