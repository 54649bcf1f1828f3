"""FLAC codec (protosc_spark.flac): spec conformance via a HAND-BUILT
byte stream (independent of the encoder, CRCs computed by a local
bit-by-bit reference loop), bit-exact lossless round trips across the
full subframe/residual/stereo/bit-depth surface, CRC rejection, and
the Spark audio_features(codec='flac') path."""

import struct

import numpy as np
import pytest

from protosc_spark.flac import decode_flac, encode_flac


def _ref_crc(data: bytes, poly: int, width: int) -> int:
    """Bit-by-bit CRC, written independently of flac.py's tables."""
    top, mask = 1 << (width - 1), (1 << width) - 1
    crc = 0
    for b in data:
        crc ^= b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
    return crc


def _handmade_constant_flac() -> bytes:
    """8 mono 16-bit samples, all 1000, built byte-by-byte from RFC
    9639: STREAMINFO (last-block flag set), one frame (8-bit uncommon
    block size code, sample rate from STREAMINFO, CONSTANT subframe)."""
    out = bytearray(b"fLaC")
    # STREAMINFO: last(1) type(0) -> 0x80, length 34
    body = struct.pack(">HH", 8, 8)  # min/max block size
    body += b"\x00\x00\x00" * 2  # min/max frame size unknown
    v = (16_000 << 44) | (0 << 41) | (15 << 36) | 8  # sr|ch-1|bps-1|total
    body += v.to_bytes(8, "big")
    body += b"\x00" * 16  # md5 unknown
    out += bytes([0x80]) + (34).to_bytes(3, "big") + body
    # frame header: sync(14)=0x3FFE, reserved 0, strategy 0 -> FF F8
    hdr = bytearray(b"\xff\xf8")
    hdr.append(0x60)  # bs code 6 (8-bit), sr code 0 (streaminfo)
    hdr.append(0x08)  # ch assign 0 (mono), sample size 4 (16-bit), r 0
    hdr.append(0x00)  # coded frame number 0
    hdr.append(0x07)  # block size - 1
    hdr.append(_ref_crc(bytes(hdr), 0x07, 8))
    frame = bytearray(hdr)
    frame.append(0x00)  # subframe: pad 0, type 000000 CONSTANT, wasted 0
    frame += struct.pack(">h", 1000)  # the constant (16-bit signed)
    frame += _ref_crc(bytes(frame), 0x8005, 16).to_bytes(2, "big")
    return bytes(out + frame)


def test_decoder_against_handmade_spec_stream():
    sr, x = decode_flac(_handmade_constant_flac())
    assert sr == 16_000
    assert x.shape == (8, 1)
    assert np.allclose(x[:, 0], 1000 / 32768.0)


def _rt(pcm: np.ndarray, bps: int = 16, **kw) -> None:
    """Assert a bit-exact integer round trip."""
    blob = encode_flac(pcm, 16_000, bps=bps, **kw)
    sr, x = decode_flac(blob)
    assert sr == 16_000
    back = np.rint(x * (1 << (bps - 1))).astype(np.int64)
    want = pcm if pcm.ndim == 2 else pcm[:, None]
    assert np.array_equal(back, want)


def _smooth(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (1000 * np.sin(t / 50) + rng.integers(-20, 20, n)).astype(np.int64)


@pytest.mark.parametrize("mode", ["verbatim", "fixed", "lpc"])
def test_roundtrip_noise_all_modes(mode):
    rng = np.random.default_rng(1)
    _rt(rng.integers(-30000, 30000, 5000).astype(np.int64), subframe=mode)


def test_constant_subframe_auto():
    blob = encode_flac(np.full(1000, 123, dtype=np.int64), 16_000)
    assert len(blob) < 100  # constant subframe, not 1000 samples
    _rt(np.full(1000, 123, dtype=np.int64))


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_predictor_orders(order):
    _rt(_smooth(10_000), subframe="fixed", fixed_order=order)


@pytest.mark.parametrize("order", [1, 4, 8, 12, 32])
def test_lpc_orders(order):
    _rt(_smooth(4_000), subframe="lpc", lpc_order=order)


def test_rice_partitions_and_escape():
    x = _smooth(8_192)
    _rt(x, subframe="fixed", partition_order=3)
    _rt(x, subframe="fixed", force_escape=True)


def test_wasted_bits():
    _rt((_smooth(4_096) >> 3) << 3, subframe="fixed")


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24, 32])
def test_bit_depths(bps):
    rng = np.random.default_rng(bps)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    _rt(rng.integers(lo, hi, 3000).astype(np.int64), bps=bps,
        subframe="fixed")


@pytest.mark.parametrize(
    "stereo", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_decorrelation_modes(stereo):
    rng = np.random.default_rng(2)
    a = _smooth(6_000)
    st = np.stack([a, a + rng.integers(-5, 5, 6_000)], axis=1)
    _rt(st, stereo=stereo, subframe="fixed")


def test_multichannel_independent():
    rng = np.random.default_rng(3)
    _rt(rng.integers(-1000, 1000, (4000, 3)).astype(np.int64),
        subframe="fixed")


def test_many_frames_utf8_numbers_and_short_tail():
    """Block size 64 over 10k samples -> 157 frames (multi-byte UTF-8
    frame numbers past 127) with a short final frame."""
    _rt(_smooth(10_000), subframe="fixed", block_size=64)


def test_float_input_matches_wav_scaling():
    rng = np.random.default_rng(4)
    f = rng.uniform(-1, 1, 2000)
    sr, x = decode_flac(encode_flac(f, 16_000))
    want = np.clip(np.rint(f * 32767), -32768, 32767) / 32768.0
    assert np.array_equal(x[:, 0], want)


def test_corrupt_frame_raises_crc_mismatch():
    blob = bytearray(encode_flac(_smooth(1000), 16_000, subframe="fixed"))
    blob[-20] ^= 0x10  # flip a bit inside the last frame's payload
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(blob))


def test_not_a_flac_raises():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFF\x00\x00\x00\x00WAVE")


def test_spark_audio_features_flac_path(spark):
    """audio_features(codec='flac'): features match the WAV path on
    the same PCM (both decoders are exact, so rms/zcr/envelopes are
    IDENTICAL floats)."""
    from protosc_spark.multimodal import audio_features
    from protosc_spark.wav import encode_wav

    rng = np.random.default_rng(5)
    rows_flac, rows_wav = [], []
    for i in range(6):
        pcm = rng.uniform(-1, 1, 256)
        meta = {"sample_rate": 16_000}
        rows_flac.append((str(i), bytearray(encode_flac(pcm, 16_000)), meta))
        rows_wav.append((str(i), bytearray(encode_wav(pcm, 16_000)), meta))
    schema = (
        "media_id string, data binary, meta struct<sample_rate:int>"
    )
    got_flac = {
        r["media_id"]: list(r["audio_features"])
        for r in audio_features(
            spark.createDataFrame(rows_flac, schema), codec="flac"
        ).collect()
    }
    got_wav = {
        r["media_id"]: list(r["audio_features"])
        for r in audio_features(
            spark.createDataFrame(rows_wav, schema), codec="wav"
        ).collect()
    }
    assert got_flac == got_wav
