"""Real PNG codec in stdlib zlib + numpy — no cv2/PIL in this
container (verified absent), but PNG is a fully published format
(RFC 2083 / ISO 15948), so the engine decodes it for real rather than
stubbing: :func:`decode_png` handles 8-bit greyscale, grey+alpha,
RGB, RGBA and palette images with all five scanline filters. This
closes the "real image decode" boundary for PNG inputs; sequential,
progressive AND lossless JPEG are likewise decoded for real in
:mod:`protosc_spark.jpeg` (only hierarchical/arithmetic JPEG remains
behind the documented cv2 boundary, cited in
multimodal.decode_images).

Encoding lives in :mod:`protosc_spark.plots` (write_png_grey, the plot
sink); :func:`encode_png` here is the general-purpose companion used
by tests to build RGB/RGBA fixtures with nontrivial filters.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> raw channels


def _chunks(buf: bytes):
    if buf[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    while pos < len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        yield tag, data
        pos += 12 + length
        if tag == b"IEND":
            break


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline position."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering -> (h, w*bpp) uint8."""
    stride = w * bpp
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ftype = int(lines[r, 0])
        cur = lines[r, 1:].copy()
        if ftype == 0:  # None
            rec = cur
        elif ftype == 1:  # Sub
            rec = cur
            for x in range(bpp, stride):
                rec[x] = (int(rec[x]) + int(rec[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            rec = (cur.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            rec = cur
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(rec[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = cur
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(rec[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = rec
        prev = out[r]
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, c) uint8 array. 8-bit depth, non-interlaced
    (the overwhelmingly common case; others raise with a clear
    message). Palette images are expanded to RGB."""
    ihdr = plte = None
    idat = b""
    for tag, chunk in _chunks(data):
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif tag == b"PLTE":
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += chunk
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNGs supported (got depth {depth})")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNGs not supported")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported color type {ctype}")
    c = _CHANNELS[ctype]
    flat = _unfilter(zlib.decompress(idat), h, w, c)
    img = flat.reshape(h, w, c)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        img = plte[img[:, :, 0]]
    return img


def encode_png(
    img: np.ndarray, filter_type: int = 0, level: int = 6
) -> bytes:
    """(h, w[, c]) uint8 -> PNG bytes (8-bit grey/grey+alpha/RGB/RGBA).
    ``filter_type`` applies one filter to every scanline — the round-
    trip fixture knob for exercising the decoder's unfilter paths.
    ``level`` is the zlib effort (6 = zlib default; 9 buys ~nothing on
    filtered scanlines and costs ~2x CPU in this per-row hot path)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    stride = w * bpp
    flat = a.reshape(h, stride).astype(np.int32)
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        cur = flat[r]
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            enc = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            pred = _paeth(
                left.astype(np.uint8),
                prev.astype(np.uint8),
                upleft.astype(np.uint8),
            ).astype(np.int32)
            enc = cur - pred
        else:
            raise ValueError(filter_type)
        lines.append(bytes([filter_type]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    raw = b"".join(lines)

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, level))
        + chunk(b"IEND", b"")
    )
