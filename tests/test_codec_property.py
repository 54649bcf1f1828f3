"""Property-based round-trip tests (hypothesis) for the pure-numpy
media codecs — no Spark session needed, so example counts can be much
higher than the point-in-time property suite. Every lossless path
must be BIT-EXACT on arbitrary content; the lossy JPEG paths must
agree between coding processes (baseline vs progressive share the
quantizer) and stay within the quantization error bound."""

import numpy as np
from hypothesis import given, settings, strategies as st

from protosc_spark.flac import decode_flac, encode_flac
from protosc_spark.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_lossless,
    encode_jpeg_progressive,
)
from protosc_spark.png import decode_png, encode_png

SETTINGS = dict(max_examples=25, deadline=None, derandomize=True)

dims = st.tuples(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
)


def _img(h, w, seed, channels=1):
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    return rng.integers(0, 256, shape).astype(np.uint8)


@settings(**SETTINGS)
@given(dims=dims, seed=st.integers(0, 2**32 - 1))
def test_jpeg_lossless_roundtrip_bit_exact(dims, seed):
    img = _img(*dims, seed)
    pred = 1 + seed % 7
    dec = decode_jpeg(encode_jpeg_lossless(img, predictor=pred))
    assert np.array_equal(dec[:, :, 0], img)


@settings(**SETTINGS)
@given(dims=dims, seed=st.integers(0, 2**32 - 1))
def test_jpeg_progressive_equals_baseline(dims, seed):
    img = _img(*dims, seed)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img)),
        decode_jpeg(encode_jpeg_progressive(img)),
    )


@settings(**SETTINGS)
@given(dims=dims, seed=st.integers(0, 2**32 - 1),
       channels=st.sampled_from([1, 3]))
def test_jpeg_unit_quant_error_bound(dims, seed, channels):
    img = _img(*dims, seed, channels)
    dec = decode_jpeg(encode_jpeg(img, q=np.ones((8, 8))))
    if channels == 1:
        assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 1
    else:
        # colour transform round trip adds at most a few counts
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


@settings(**SETTINGS)
@given(dims=dims, seed=st.integers(0, 2**32 - 1),
       channels=st.sampled_from([1, 3, 4]))
def test_png_roundtrip_bit_exact(dims, seed, channels):
    img = _img(*dims, seed, channels)
    dec = decode_png(encode_png(img))
    assert np.array_equal(dec, img if img.ndim == 3 else img[:, :, None])


@settings(**SETTINGS)
@given(
    n=st.integers(min_value=1, max_value=3000),
    seed=st.integers(0, 2**32 - 1),
    mode=st.sampled_from(["verbatim", "fixed", "lpc", "auto"]),
    order=st.integers(min_value=0, max_value=4),
    po=st.integers(min_value=0, max_value=3),
    channels=st.integers(min_value=1, max_value=3),
)
def test_flac_roundtrip_bit_exact(n, seed, mode, order, po, channels):
    rng = np.random.default_rng(seed)
    # mix of smooth + noise, occasional constant stretches
    t = np.arange(n)
    pcm = (
        (2000 * np.sin(t / max(1, n // 7)))[:, None]
        + rng.integers(-300, 300, (n, channels))
    ).astype(np.int64)
    if seed % 5 == 0:
        pcm[: n // 2] = 7  # constant run
    blob = encode_flac(
        pcm, 16_000, subframe=mode, fixed_order=order, partition_order=po
    )
    _sr, x = decode_flac(blob)
    assert np.array_equal(np.rint(x * 32768.0).astype(np.int64), pcm)


@settings(**SETTINGS)
@given(
    n=st.integers(min_value=2, max_value=2000),
    seed=st.integers(0, 2**32 - 1),
    stereo=st.sampled_from(["left_side", "right_side", "mid_side"]),
)
def test_flac_stereo_decorrelation_bit_exact(n, seed, stereo):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, (n, 2)).astype(np.int64)
    _sr, x = decode_flac(encode_flac(pcm, 16_000, stereo=stereo))
    assert np.array_equal(np.rint(x * 32768.0).astype(np.int64), pcm)
