"""WAV (RIFF/WAVE) codec in pure numpy — the real-audio-decode path
closing the last media-decode stub (PNG: protosc_spark.png, baseline
JPEG: protosc_spark.jpeg). The reference has no audio operators at all
(it is an image library; the audio surface comes from the LLM-data-
pipeline mandate), and soundfile/librosa are absent from this
container, but WAV is a fully published container (RIFF 1991 spec /
RFC 2361 wave formats), so the engine decodes it for real:

* :func:`decode_wav` — PCM 8/16/24/32-bit and IEEE float32/64, any
  channel count (returned as [n_samples, n_channels] float64 in
  [-1, 1]), tolerant of extra chunks (LIST/fact/cue) before/after
  ``data``, as real encoders emit. Also the published COMPRESSED
  telephony formats: G.711 mu-law (tag 7) and A-law (tag 6) via
  256-entry expand tables built from the CCITT reference arithmetic,
  and IMA/DVI ADPCM (tag 0x11) decoded VECTORIZED ACROSS BLOCKS
  (blocks are independent by construction: each carries its own
  predictor/step-index header, so the inherently sequential
  per-sample recurrence runs as ~samples_per_block numpy steps over
  ALL blocks x channels at once, not a Python loop per sample).
  FLAC decodes for real too (:mod:`protosc_spark.flac`); only the
  lossy perceptual codecs (MP3/AAC/Opus/Vorbis) remain behind the
  documented soundfile boundary.
* :func:`encode_wav` — PCM16 fixture/round-trip companion;
  :func:`encode_wav_g711` / :func:`encode_wav_ima_adpcm` — fixture
  companions for the compressed formats (G.711 segment encoder per
  the reference linear2ulaw/linear2alaw; standard IMA step encoder).
"""

from __future__ import annotations

import struct

import numpy as np


def _ulaw_table() -> np.ndarray:
    """256-entry mu-law byte -> linear int16, the CCITT G.711
    reference ulaw2linear arithmetic (BIAS 0x84, 3-bit exponent,
    4-bit mantissa, ones-complement transmission)."""
    b = np.arange(256, dtype=np.int32)
    u = ~b & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where((u & 0x80) != 0, 0x84 - t, t - 0x84).astype(np.int16)


def _alaw_table() -> np.ndarray:
    """256-entry A-law byte -> linear int16, the CCITT G.711
    reference alaw2linear arithmetic (0x55 toggle, segment 0 offset
    8, segments 1+ offset 0x108 shifted)."""
    b = np.arange(256, dtype=np.int32)
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    # reference sign convention: bit 7 SET (after the toggle) is positive
    return np.where((a & 0x80) != 0, t, -t).astype(np.int16)


_ULAW = _ulaw_table()
_ALAW = _alaw_table()

# IMA ADPCM tables (IMA Recommended Practices for Enhancing Digital
# Audio Compatibility, rev 3.00; also the Microsoft WAVE DVI/IMA spec)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767], dtype=np.int32)
_IMA_INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int32,
)


def _ima_step(pred: np.ndarray, idx: np.ndarray, code: np.ndarray):
    """One IMA ADPCM decode step, vectorized over any shape of
    parallel streams: (predictor, step index, 4-bit code) ->
    (new predictor, new index, decoded sample)."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    diff = diff + np.where((code & 1) != 0, step >> 2, 0)
    diff = diff + np.where((code & 2) != 0, step >> 1, 0)
    diff = diff + np.where((code & 4) != 0, step, 0)
    pred = np.where((code & 8) != 0, pred - diff, pred + diff)
    pred = np.clip(pred, -32768, 32767)
    idx = np.clip(idx + _IMA_INDEX[code], 0, 88)
    return pred, idx


def _decode_ima_adpcm(
    data: bytes, n_ch: int, block_align: int
) -> np.ndarray:
    """IMA ADPCM payload -> interleaved linear int16 [n, n_ch].

    Block layout (per the IMA/Microsoft spec): per channel a 4-byte
    header (int16 initial predictor — emitted as the first output
    sample — uint8 step index, uint8 reserved), then the channels'
    nibbles in interleaved 4-byte groups (8 samples per group per
    channel), LOW nibble first. Blocks are self-contained, so the
    whole payload decodes as a [n_blocks x n_ch]-wide vectorized
    recurrence of length samples_per_block."""
    ba = int(block_align)
    if ba <= 4 * n_ch or (ba - 4 * n_ch) % (4 * n_ch) != 0:
        raise ValueError(f"bad IMA ADPCM block align {ba} for {n_ch} ch")
    nb = len(data) // ba
    if nb == 0:
        return np.zeros((0, n_ch), dtype=np.int16)
    raw = np.frombuffer(data[: nb * ba], dtype=np.uint8).reshape(nb, ba)
    hdr = raw[:, : 4 * n_ch].reshape(nb, n_ch, 4)
    pred = (
        hdr[:, :, 0].astype(np.int32)
        | (hdr[:, :, 1].astype(np.int32) << 8)
    )
    pred = np.where(pred >= 1 << 15, pred - (1 << 16), pred)
    idx = np.clip(hdr[:, :, 2].astype(np.int32), 0, 88)
    # payload bytes -> [nb, n_groups, n_ch, 4] -> per-channel streams
    body = raw[:, 4 * n_ch :].reshape(nb, -1, n_ch, 4)
    n_groups = body.shape[1]
    lo = (body & 0x0F).astype(np.int32)
    hi = (body >> 4).astype(np.int32)
    # byte k holds samples 2k (low nibble) and 2k+1 (high nibble)
    inter = np.stack([lo, hi], axis=-1).reshape(nb, n_groups, n_ch, 8)
    codes = np.moveaxis(inter, 2, 1).reshape(nb, n_ch, n_groups * 8)
    spb = n_groups * 8 + 1
    out = np.empty((nb, n_ch, spb), dtype=np.int16)
    out[:, :, 0] = pred.astype(np.int16)
    for t in range(n_groups * 8):
        pred, idx = _ima_step(pred, idx, codes[:, :, t])
        out[:, :, t + 1] = pred.astype(np.int16)
    # [nb, n_ch, spb] -> interleaved [nb*spb, n_ch]
    return np.moveaxis(out, 1, 2).reshape(nb * spb, n_ch)


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, samples[n, channels] float64 in
    [-1, 1])."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV (missing RIFF/WAVE header)")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            (audio_fmt, n_ch, sr, _br, ba, bits) = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                (audio_fmt,) = struct.unpack("<H", body[24:26])
            fmt = (audio_fmt, n_ch, sr, bits, ba)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_fmt, n_ch, sr, bits, block_align = fmt
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            x = (
                np.frombuffer(data, dtype=np.uint8).astype(np.float64)
                - 128.0
            ) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
            v = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(
                1 << 31
            )
        else:
            raise ValueError(f"unsupported PCM bit depth: {bits}")
    elif audio_fmt == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"unsupported float bit depth: {bits}")
    elif audio_fmt == 6:  # G.711 A-law
        x = _ALAW[np.frombuffer(data, dtype=np.uint8)].astype(
            np.float64
        ) / 32768.0
    elif audio_fmt == 7:  # G.711 mu-law
        x = _ULAW[np.frombuffer(data, dtype=np.uint8)].astype(
            np.float64
        ) / 32768.0
    elif audio_fmt == 0x11:  # IMA / DVI ADPCM
        return sr, _decode_ima_adpcm(data, n_ch, block_align).astype(
            np.float64
        ) / 32768.0
    else:
        raise ValueError(
            f"unsupported WAV audio format {audio_fmt} (PCM, IEEE "
            "float, G.711 u-law/A-law and IMA ADPCM are implemented; "
            "perceptual codecs need soundfile in production)"
        )
    n = (len(x) // n_ch) * n_ch
    return sr, x[:n].reshape(-1, n_ch)


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16_000
) -> bytes:
    """[n] or [n, channels] float in [-1, 1] -> PCM16 WAV bytes."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n_ch = a.shape[1]
    pcm = np.clip(np.rint(a * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.reshape(-1).tobytes()
    byte_rate = sample_rate * n_ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16
    )
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def _riff(fmt_body: bytes, data: bytes, extra: bytes = b"") -> bytes:
    """Assemble RIFF/WAVE from a fmt chunk body + data payload."""
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += extra
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _g711_encode_table(law: str) -> tuple[np.ndarray, np.ndarray]:
    """(sorted decoded values, byte for each) — the exact-inverse
    quantizer of the decode table (a G.711 encoder IS the nearest-
    codeword map onto the 256 expand values; ties resolve to the
    lower codeword deterministically)."""
    table = _ULAW if law == "ulaw" else _ALAW
    vals = table.astype(np.int32)
    order = np.argsort(vals, kind="stable")
    return vals[order], np.arange(256, dtype=np.uint8)[order]


def encode_wav_g711(
    samples: np.ndarray, sample_rate: int = 8_000, law: str = "ulaw"
) -> bytes:
    """[n] or [n, channels] float in [-1, 1] -> G.711 WAV bytes
    (format tag 7 for mu-law, 6 for A-law; 8 bits/sample + fact
    chunk, as telephony encoders emit). Quantization is the exact
    nearest-codeword inverse of the decode table, so any value that
    IS a codeword round-trips bit-exactly."""
    if law not in ("ulaw", "alaw"):
        raise ValueError(f"law must be 'ulaw' or 'alaw', got {law!r}")
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n, n_ch = a.shape
    pcm = np.clip(np.rint(a * 32768.0), -32768, 32767).astype(np.int32)
    vals, codes = _g711_encode_table(law)
    pos = np.searchsorted(vals, pcm.reshape(-1))
    pos = np.clip(pos, 1, len(vals) - 1)
    left = vals[pos - 1]
    right = vals[pos]
    take_left = (pcm.reshape(-1) - left) <= (right - pcm.reshape(-1))
    data = np.where(take_left, codes[pos - 1], codes[pos]).astype(
        np.uint8
    ).tobytes()
    tag = 7 if law == "ulaw" else 6
    fmt_body = struct.pack(
        "<HHIIHHH", tag, n_ch, sample_rate, sample_rate * n_ch, n_ch, 8, 0
    )
    fact = b"fact" + struct.pack("<II", 4, n)
    return _riff(fmt_body, data, fact)


def encode_wav_ima_adpcm(
    samples: np.ndarray, sample_rate: int = 8_000, block_align: int = 256
) -> bytes:
    """[n] or [n, channels] float in [-1, 1] -> IMA/DVI ADPCM WAV
    bytes (format tag 0x11). Fixture companion: blocks are encoded
    independently (start predictor = the block's first sample, start
    step index = the step nearest the block's mean sample-to-sample
    delta, both carried in the block header exactly as the spec's
    decoder expects), vectorized across blocks x channels the same
    way the decoder is. Input is padded to whole blocks by repeating
    the final sample; decode returns the padded length."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n, n_ch = a.shape
    ba = int(block_align)
    if ba <= 4 * n_ch or (ba - 4 * n_ch) % (4 * n_ch) != 0:
        raise ValueError(f"bad IMA ADPCM block align {ba} for {n_ch} ch")
    spb = (ba - 4 * n_ch) * 2 // n_ch + 1
    pcm = np.clip(np.rint(a * 32768.0), -32768, 32767).astype(np.int32)
    nb = max(1, -(-n // spb))
    if nb * spb > n:
        pad = np.repeat(pcm[-1:] if n else np.zeros((1, n_ch), np.int32),
                        nb * spb - n, axis=0)
        pcm = np.vstack([pcm, pad]) if n else pad
    x = pcm.reshape(nb, spb, n_ch)
    pred = x[:, 0, :].copy()  # [nb, n_ch]
    mean_d = np.abs(np.diff(x, axis=1)).mean(axis=1) if spb > 1 else (
        np.zeros((nb, n_ch))
    )
    idx0 = np.clip(
        np.searchsorted(_IMA_STEPS, mean_d.astype(np.int32)), 0, 88
    ).astype(np.int32)
    idx = idx0.copy()
    n_codes = spb - 1
    codes = np.empty((nb, n_ch, n_codes), dtype=np.int32)
    for t in range(n_codes):
        step = _IMA_STEPS[idx]
        diff = x[:, t + 1, :] - pred
        sign = diff < 0
        mag = np.abs(diff)
        code = np.where(sign, 8, 0)
        hit = mag >= step
        code = code | np.where(hit, 4, 0)
        mag = mag - np.where(hit, step, 0)
        half = step >> 1
        hit = mag >= half
        code = code | np.where(hit, 2, 0)
        mag = mag - np.where(hit, half, 0)
        code = code | np.where(mag >= (step >> 2), 1, 0)
        codes[:, :, t] = code
        pred, idx = _ima_step(pred, idx, code)
    # pack: [nb, n_ch, g, 8 nibbles] -> bytes low|high -> interleave
    g = n_codes // 8
    nib = codes.reshape(nb, n_ch, g, 8)
    by = (nib[..., 0::2] | (nib[..., 1::2] << 4)).astype(np.uint8)
    body = np.moveaxis(by, 1, 2).reshape(nb, -1)  # [nb, g*n_ch*4]
    p16 = x[:, 0, :].astype(np.int32) & 0xFFFF
    hdr = np.empty((nb, n_ch, 4), dtype=np.uint8)
    hdr[:, :, 0] = p16 & 0xFF
    hdr[:, :, 1] = p16 >> 8
    hdr[:, :, 2] = idx0.astype(np.uint8)
    hdr[:, :, 3] = 0
    blocks = np.concatenate(
        [hdr.reshape(nb, -1), body], axis=1
    ).reshape(-1)
    data = blocks.tobytes()
    byte_rate = (sample_rate * ba + spb - 1) // spb
    fmt_body = struct.pack(
        "<HHIIHHHH", 0x11, n_ch, sample_rate, byte_rate, ba, 4, 2, spb
    )
    fact = b"fact" + struct.pack("<II", 4, nb * spb)
    return _riff(fmt_body, data, fact)
