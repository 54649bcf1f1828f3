"""AVI (RIFF) Motion-JPEG container in pure stdlib/numpy — the
real-video path (SURVEY §2.1 #1; the reference reads media via cv2,
protosc/io.py:5-26, and cv2/pyav are verified absent here). AVI is a
fully published container (Microsoft RIFF/AVI 1992 spec, OpenDML
AVIX extension) and MJPEG frames are plain JPEG bytes, so together
with :mod:`protosc_spark.jpeg` (sequential + progressive decode) the
engine extracts and decodes video frames for real:

* :func:`parse_avi` — chunk-walking RIFF parser: ``hdrl`` header
  (``avih`` dims / frame count / frame interval, ``strl``/``strh``
  stream list), ``movi`` payload (``NNdc``/``NNdb`` chunks of the
  first video stream, word-aligned), tolerant of ``idx1``/``JUNK``
  and unknown chunks, exactly like real muxers emit.
* :func:`encode_avi_mjpeg` — the fixture/round-trip companion: a
  spec-complete writer (avih + vids strh + BITMAPINFOHEADER strf +
  movi + idx1) whose output parse_avi and any standard tool can read.

Inter-frame codecs (H.264/VP9/AV1...) remain behind the documented
cv2/pyav boundary (multimodal.sample_frames(codec="real")) — they
are lossy motion-compensated formats with no pure-numpy path.
"""

from __future__ import annotations

import struct


def _fourcc(b: bytes) -> bytes:
    return b.ljust(4)[:4]


def parse_avi(buf: bytes) -> tuple[dict, list[bytes]]:
    """AVI bytes -> (meta, frames): meta has width/height/n_frames/
    usec_per_frame from ``avih``; frames are the raw payloads of the
    first video stream's ``dc``/``db`` chunks in stream order (for
    MJPEG each is one complete JPEG)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    meta: dict = {}
    frames: list[bytes] = []

    def walk(pos: int, end: int):
        while pos + 8 <= end:
            ckid = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if ckid == b"LIST":
                ltype = buf[body_start : body_start + 4]
                if ltype in (b"hdrl", b"movi", b"strl", b"rec "):
                    walk(body_start + 4, body_end)
            elif ckid == b"avih":
                (uspf, _mbps, _pad, _flags, total, _init, _streams,
                 _sbuf, w, h) = struct.unpack(
                    "<10I", buf[body_start : body_start + 40]
                )
                meta.update(
                    width=w, height=h, n_frames=total, usec_per_frame=uspf
                )
            elif (
                ckid[2:4] in (b"dc", b"db")
                and ckid[:2].isdigit()
                and int(ckid[:2]) == 0
            ):
                frames.append(buf[body_start:body_end])
            pos = body_start + size + (size & 1)  # chunks are word-aligned

    walk(12, len(buf))
    if not meta:
        raise ValueError("AVI missing avih header")
    return meta, frames


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """JPEG frame blobs -> AVI/MJPEG bytes (one ``00dc`` chunk per
    frame, word-aligned, with an ``idx1`` index as real muxers write)."""
    uspf = 1_000_000 // max(fps, 1)
    max_bytes = max((len(f) for f in frames), default=0)

    avih = struct.pack(
        "<10I16x",
        uspf, max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_bytes, width, height,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), max_bytes, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )

    def chunk(ckid: bytes, body: bytes) -> bytes:
        return (
            _fourcc(ckid) + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", _fourcc(ltype) + body)

    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)

    # idx1: offsets are relative to the start of the movi list type
    idx_entries = []
    off = 4  # past the 'movi' fourcc
    for f in frames:
        idx_entries.append(
            b"00dc" + struct.pack("<III", 0x10, off, len(f))
        )
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    payload = _fourcc(b"AVI ") + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(payload)) + payload
