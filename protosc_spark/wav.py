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
  ``data``, as real encoders emit.
* :func:`encode_wav` — PCM16 fixture/round-trip companion.
"""

from __future__ import annotations

import struct

import numpy as np


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
            (audio_fmt, n_ch, sr, _br, _ba, bits) = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                (audio_fmt,) = struct.unpack("<H", body[24:26])
            fmt = (audio_fmt, n_ch, sr, bits)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_fmt, n_ch, sr, bits = fmt
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
    else:
        raise ValueError(
            f"unsupported WAV audio format {audio_fmt} (PCM and IEEE "
            "float are implemented; compressed formats need soundfile "
            "in production)"
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
