"""Real PNG codec: filter-by-filter round trips, palette expansion,
interlace/depth rejection, Spark decode_images(codec='png') end to end,
and compatibility with the plot sink's writer."""

import numpy as np
import pandas as pd
import pytest

from protosc_spark.png import decode_png, encode_png


@pytest.fixture(scope="module")
def rgb():
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(21, 17, 3), dtype=np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter_rgb(rgb, ftype):
    assert np.array_equal(decode_png(encode_png(rgb, ftype)), rgb)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_every_color_type(channels):
    rng = np.random.default_rng(channels)
    img = rng.integers(0, 256, size=(9, 13, channels), dtype=np.uint8)
    out = decode_png(encode_png(img, filter_type=4))
    assert out.shape == (9, 13, channels)
    assert np.array_equal(out, img)


def test_palette_expansion():
    """Hand-built palette PNG: 2 colors, 4x4 checkerboard of indices."""
    import struct
    import zlib

    idx = np.indices((4, 4)).sum(axis=0) % 2
    raw = b"".join(b"\x00" + idx[r].astype(np.uint8).tobytes() for r in range(4))
    plte = bytes([255, 0, 0, 0, 0, 255])  # color 0 red, color 1 blue

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    img = decode_png(png)
    assert img.shape == (4, 4, 3)
    assert tuple(img[0, 0]) == (255, 0, 0)
    assert tuple(img[0, 1]) == (0, 0, 255)


def test_rejects_unsupported():
    import struct
    import zlib

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIFnotapng")
    interlaced = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00ab\x00cd"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(interlaced)
    deep = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(deep)


def test_plot_sink_writer_decodes(tmp_path):
    """The plot sink's write_png_grey output is valid input for the
    full decoder (writer and decoder built independently)."""
    from protosc_spark.plots import write_png_grey

    arr = np.linspace(0, 1, 64).reshape(8, 8)
    p = write_png_grey(arr, tmp_path / "x.png")
    img = decode_png(p.read_bytes())
    assert img.shape == (8, 8, 1)
    # vmin->white convention: the smallest value is the brightest pixel
    assert img[0, 0, 0] == 255 and img[-1, -1, 0] == 0


def test_spark_decode_images_png_codec(spark, rgb):
    """decode_images(codec='png') decodes real PNG blobs distributed;
    dims come from IHDR (meta deliberately wrong to prove it)."""
    from protosc_spark.multimodal import decode_images

    blobs = [
        ("a", encode_png(rgb, 2), {"width": 1, "height": 1, "channels": 1}),
        (
            "b",
            encode_png(rgb[::-1].copy(), 4),
            {"width": 9, "height": 9, "channels": 9},
        ),
    ]
    df = spark.createDataFrame(
        blobs,
        "media_id string, data binary, "
        "meta struct<width:int,height:int,channels:int>",
    )
    out = {r["media_id"]: r for r in decode_images(df, codec="png").collect()}
    assert (out["a"]["height"], out["a"]["width"], out["a"]["channels"]) == (
        21, 17, 3,
    )
    got = np.array(out["a"]["pixels"]).reshape(21, 17, 3)
    assert np.array_equal(got, rgb.astype(np.float64))
    got_b = np.array(out["b"]["pixels"]).reshape(21, 17, 3)
    assert np.array_equal(got_b, rgb[::-1].astype(np.float64))
