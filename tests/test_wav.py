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


# --------------------------------------------------------------------------
# G.711 mu-law / A-law (format tags 7 / 6) — CCITT reference arithmetic
# --------------------------------------------------------------------------


def _ulaw2linear_ref(b):
    """Independent scalar transcription of the CCITT ulaw2linear."""
    u = ~b & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return 0x84 - t if (u & 0x80) else t - 0x84


def _alaw2linear_ref(b):
    """Independent scalar transcription of the CCITT alaw2linear."""
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = t + 8 if seg == 0 else (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def test_g711_decode_tables_match_reference_arithmetic():
    from protosc_spark.wav import _ALAW, _ULAW

    for b in range(256):
        assert int(_ULAW[b]) == _ulaw2linear_ref(b)
        assert int(_ALAW[b]) == _alaw2linear_ref(b)
    # spec pins: mu-law 0xFF is zero, 0x00 is the negative rail
    assert _ULAW[0xFF] == 0 and _ULAW[0x00] == -32124
    # A-law has no true zero (quiet codes decode to +-8) and +-32256 rails
    assert _ALAW[0x55] == -8 and _ALAW[0xD5] == 8
    assert _ALAW.max() == 32256 and _ALAW.min() == -32256


def test_g711_codeword_roundtrip_exact():
    from protosc_spark.wav import _ALAW, _ULAW, encode_wav_g711

    for law, table in (("ulaw", _ULAW), ("alaw", _ALAW)):
        vals = table.astype(np.float64) / 32768.0
        sr, out = decode_wav(encode_wav_g711(vals, 8000, law))
        assert sr == 8000
        assert np.array_equal(
            (out[:, 0] * 32768.0).round().astype(np.int16), table
        )


def test_g711_sine_snr():
    from protosc_spark.wav import encode_wav_g711

    t = np.arange(4000) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    for law, floor_db in (("ulaw", 35.0), ("alaw", 35.0)):
        _sr, y = decode_wav(encode_wav_g711(x, 8000, law))
        err = y[:, 0] - x
        snr = 10 * np.log10(np.mean(x**2) / np.mean(err**2))
        assert snr > floor_db, (law, snr)


def test_g711_stereo_shape():
    from protosc_spark.wav import encode_wav_g711

    x = np.stack(
        [np.linspace(-0.9, 0.9, 64), np.linspace(0.9, -0.9, 64)], axis=1
    )
    sr, y = decode_wav(encode_wav_g711(x, 16000, "alaw"))
    assert sr == 16000 and y.shape == (64, 2)
    assert np.max(np.abs(y - x)) < 0.05  # A-law quantization bound


# --------------------------------------------------------------------------
# IMA / DVI ADPCM (format tag 0x11)
# --------------------------------------------------------------------------


def _ima_decode_ref(data, n_ch, block_align):
    """Independent SCALAR IMA ADPCM decoder straight from the IMA
    recommended-practices pseudocode (per-sample Python loop, no
    shared code with the vectorized implementation)."""
    steps = [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767]
    itab = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]
    ba = block_align
    out = []
    for off in range(0, len(data) - ba + 1, ba):
        block = data[off : off + ba]
        chans = []
        for c in range(n_ch):
            p = int.from_bytes(block[4 * c : 4 * c + 2], "little", signed=True)
            idx = block[4 * c + 2]
            chans.append({"pred": p, "idx": idx, "s": [p]})
        body = block[4 * n_ch :]
        for gstart in range(0, len(body), 4 * n_ch):
            for c in range(n_ch):
                for byte in body[gstart + 4 * c : gstart + 4 * c + 4]:
                    for code in (byte & 0xF, byte >> 4):
                        st = chans[c]
                        step = steps[st["idx"]]
                        diff = step >> 3
                        if code & 1:
                            diff += step >> 2
                        if code & 2:
                            diff += step >> 1
                        if code & 4:
                            diff += step
                        pred = st["pred"] + (-diff if code & 8 else diff)
                        pred = max(-32768, min(32767, pred))
                        idx = max(0, min(88, st["idx"] + itab[code]))
                        st["pred"], st["idx"] = pred, idx
                        st["s"].append(pred)
        n = len(chans[0]["s"])
        for i in range(n):
            out.append([chans[c]["s"][i] for c in range(n_ch)])
    return np.array(out, dtype=np.int16)


def test_ima_adpcm_vectorized_decode_matches_scalar_reference():
    from protosc_spark.wav import encode_wav_ima_adpcm

    rng = np.random.default_rng(7)
    for n_ch, ba in ((1, 132), (2, 264), (3, 60)):
        x = np.cumsum(rng.normal(0, 0.02, size=(777, n_ch)), axis=0)
        x = np.clip(x, -0.95, 0.95)
        buf = encode_wav_ima_adpcm(x, 8000, block_align=ba)
        sr, got = decode_wav(buf)
        assert sr == 8000
        # locate the data payload independently
        pos, data = 12, None
        while pos + 8 <= len(buf):
            tag = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            if tag == b"data":
                data = buf[pos + 8 : pos + 8 + size]
            pos += 8 + size + (size & 1)
        want = _ima_decode_ref(data, n_ch, ba)
        assert np.array_equal(
            (got * 32768.0).round().astype(np.int16), want
        )


def test_ima_adpcm_roundtrip_snr():
    from protosc_spark.wav import encode_wav_ima_adpcm

    t = np.arange(4000) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    _sr, y = decode_wav(encode_wav_ima_adpcm(x, 8000, block_align=256))
    y = y[: len(x), 0]
    snr = 10 * np.log10(np.mean(x**2) / np.mean((y - x) ** 2))
    assert snr > 20, snr


def test_ima_adpcm_bad_block_align_raises():
    from protosc_spark.wav import encode_wav_ima_adpcm

    with pytest.raises(ValueError, match="block align"):
        encode_wav_ima_adpcm(np.zeros(16), 8000, block_align=7)
