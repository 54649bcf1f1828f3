"""AVI/MJPEG container (protosc_spark.avi): spec conformance via a
HAND-BUILT RIFF byte stream (independent of the encoder), bit-exact
frame round trips, stream filtering / alignment / rec-list tolerance,
and the Spark sample_frames(codec='mjpeg') path feeding the real JPEG
decoder."""

import struct

import numpy as np
import pytest

from protosc_spark.avi import encode_avi_mjpeg, parse_avi
from protosc_spark.jpeg import decode_jpeg, encode_jpeg


def _chunk(ckid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return ckid + struct.pack("<I", len(body)) + body + pad


def _handmade_avi(frames, width=16, height=16, extra_stream=False,
                  rec_list=False, junk=False) -> bytes:
    """Minimal AVI built byte-by-byte from the RIFF/AVI spec."""
    avih = struct.pack(
        "<10I16x", 40_000, 0, 0, 0, len(frames), 0, 1, 0, width, height
    )
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih))
    movi_body = b""
    if junk:
        movi_body += _chunk(b"JUNK", b"\x00" * 7)
    for f in frames:
        fc = _chunk(b"00dc", f)
        if rec_list:
            fc = _chunk(b"LIST", b"rec " + fc)
        movi_body += fc
        if extra_stream:
            movi_body += _chunk(b"01dc", b"OTHERSTREAM")
    movi = _chunk(b"LIST", b"movi" + movi_body)
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def test_parser_against_handmade_spec_stream():
    # odd-length payload exercises word alignment
    frames = [b"frame-zero!", b"frame-one", b"xyz"]
    meta, got = parse_avi(_handmade_avi(frames))
    assert meta["width"] == 16 and meta["height"] == 16
    assert meta["n_frames"] == 3
    assert got == frames


def test_parser_skips_other_streams_and_junk():
    frames = [b"aaa", b"bb"]
    _, got = parse_avi(
        _handmade_avi(frames, extra_stream=True, junk=True)
    )
    assert got == frames  # 01dc chunks (stream 1) excluded


def test_parser_handles_rec_lists():
    frames = [b"one", b"two", b"three"]
    _, got = parse_avi(_handmade_avi(frames, rec_list=True))
    assert got == frames


def test_encoder_roundtrip_bit_identical():
    frames = [
        encode_jpeg(np.full((16, 16), v, dtype=np.uint8))
        for v in (10, 60, 110, 160, 210)
    ]
    meta, got = parse_avi(encode_avi_mjpeg(frames, 16, 16, fps=10))
    assert meta == {
        "width": 16, "height": 16, "n_frames": 5, "usec_per_frame": 100_000
    }
    assert got == frames
    assert [float(decode_jpeg(f).mean()) for f in got] == [
        10.0, 60.0, 110.0, 160.0, 210.0
    ]


def test_not_an_avi_raises():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"fLaC" + b"\x00" * 20)
    with pytest.raises(ValueError, match="avih"):
        parse_avi(b"RIFF" + struct.pack("<I", 4) + b"AVI ")


def test_spark_sample_frames_mjpeg(spark):
    """sample_frames(codec='mjpeg'): every 2nd frame of each AVI comes
    back as its original JPEG blob; decoding recovers the planted
    constant values."""
    from protosc_spark.multimodal import sample_frames

    rng = np.random.default_rng(0)
    rows, expect = [], {}
    for i in range(4):
        vals = rng.integers(0, 256, 6)
        frames = [
            encode_jpeg(np.full((16, 16), v, dtype=np.uint8)) for v in vals
        ]
        rows.append(
            (str(i), bytearray(encode_avi_mjpeg(frames, 16, 16)),
             {"width": 16, "height": 16, "channels": 1, "n_frames": 6})
        )
        expect[str(i)] = {fi: int(vals[fi]) for fi in (0, 2, 4)}
    df = spark.createDataFrame(
        rows,
        "media_id string, data binary, meta struct<width:int,height:int,"
        "channels:int,n_frames:int>",
    )
    got = sample_frames(df, every_k=2, codec="mjpeg").collect()
    assert len(got) == 12
    for r in got:
        img = decode_jpeg(bytes(r["frame"]))
        assert (img == expect[r["media_id"]][r["frame_idx"]]).all()


def test_sample_frames_real_codec_boundary():
    from protosc_spark.multimodal import sample_frames

    with pytest.raises(NotImplementedError, match="inter-frame"):
        sample_frames(None, codec="real")
