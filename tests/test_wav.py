"""WAV codec (protosc_spark.wav): spec conformance via hand-built
RIFF bytes, PCM/float format matrix, extra-chunk tolerance, round
trips, and the Spark audio_features(codec='wav') path."""

import struct

import numpy as np
import pytest

from protosc_spark.wav import decode_wav, encode_wav


def test_handmade_riff_pcm16():
    """4-sample mono PCM16 WAV built byte-by-byte from the RIFF spec:
    samples 0, 16384, -16384, -32768 -> 0, 0.5, -0.5, -1.0."""
    data = struct.pack("<4h", 0, 16384, -16384, -32768)
    buf = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    sr, x = decode_wav(buf)
    assert sr == 8000
    assert x.shape == (4, 1)
    assert np.allclose(x[:, 0], [0.0, 0.5, -0.5, -1.0])


def test_extra_chunks_are_skipped():
    """Real encoders put LIST/fact chunks around data; the parser must
    walk chunk-by-chunk (word-aligned), not assume a fixed layout."""
    data = struct.pack("<2h", 1000, -1000)
    buf = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 44100, 88200, 2, 16)
        + b"fact" + struct.pack("<II", 4, 2)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    sr, x = decode_wav(buf)
    assert sr == 44100
    assert np.allclose(x[:, 0], [1000 / 32768, -1000 / 32768])


def test_pcm16_roundtrip_and_stereo():
    rng = np.random.default_rng(0)
    mono = rng.uniform(-1, 1, 64)
    sr, x = decode_wav(encode_wav(mono, 16_000))
    assert sr == 16_000 and x.shape == (64, 1)
    # encode scales by 32767, decode by 32768 (both the standard
    # conventions): quantization step + 1/32768 relative scale skew
    assert np.abs(x[:, 0] - mono).max() <= 1e-4

    stereo = rng.uniform(-1, 1, (32, 2))
    _, y = decode_wav(encode_wav(stereo, 8_000))
    assert y.shape == (32, 2)
    assert np.abs(y - stereo).max() <= 1e-4


def test_pcm8_24_32_and_float_formats():
    """Each supported sample format decodes to the documented [-1, 1]
    scaling (hand-built buffers, known sample values)."""
    def wav(fmt_code, bits, payload):
        return (
            b"RIFF" + struct.pack("<I", 0) + b"WAVE"
            + b"fmt "
            + struct.pack("<IHHIIHH", 16, fmt_code, 1, 8000,
                          8000 * bits // 8, bits // 8, bits)
            + b"data" + struct.pack("<I", len(payload)) + payload
        )

    _, x = decode_wav(wav(1, 8, bytes([128, 255, 0])))
    assert np.allclose(x[:, 0], [0.0, 127 / 128, -1.0])

    v24 = (1 << 22).to_bytes(3, "little") + (0x800000).to_bytes(3, "little")
    _, x = decode_wav(wav(1, 24, v24))
    assert np.allclose(x[:, 0], [0.5, -1.0])

    _, x = decode_wav(wav(1, 32, struct.pack("<2i", 1 << 30, -(1 << 31))))
    assert np.allclose(x[:, 0], [0.5, -1.0])

    _, x = decode_wav(wav(3, 32, struct.pack("<2f", 0.25, -0.75)))
    assert np.allclose(x[:, 0], [0.25, -0.75])

    _, x = decode_wav(wav(3, 64, struct.pack("<2d", 0.125, -0.5)))
    assert np.allclose(x[:, 0], [0.125, -0.5])


def test_compressed_format_raises_with_boundary():
    buf = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 85, 1, 8000, 8000, 1, 16)
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="soundfile"):
        decode_wav(buf)


def test_not_a_wav_raises():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG\r\n")


def test_spark_audio_features_wav_path(spark):
    """audio_features(codec='wav') decodes real WAV blobs; features
    match a local numpy re-derivation exactly."""
    from protosc_spark.multimodal import audio_features

    rng = np.random.default_rng(5)
    rows = []
    waves = {}
    for i in range(5):
        w = rng.uniform(-1, 1, 160)
        waves[str(i)] = w
        rows.append(
            (str(i), bytearray(encode_wav(w, 16_000)), {"sample_rate": 16_000})
        )
    df = spark.createDataFrame(
        rows, "media_id string, data binary, meta struct<sample_rate:int>"
    )
    got = {r["media_id"]: np.array(r["audio_features"])
           for r in audio_features(df, codec="wav").collect()}
    assert set(got) == set(waves)
    for k, w in waves.items():
        _, ch = decode_wav(encode_wav(w, 16_000))
        pcm = ch.mean(axis=1)
        rms = float(np.sqrt(np.mean(pcm**2)))
        zcr = float(np.mean(np.abs(np.diff(np.sign(pcm))) > 0))
        env = pcm[: (len(pcm) // 8) * 8].reshape(8, -1)
        want = np.concatenate([[rms, zcr], np.sqrt((env**2).mean(axis=1))])
        assert np.array_equal(got[k], want)
