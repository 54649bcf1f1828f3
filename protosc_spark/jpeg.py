"""Baseline JPEG codec in pure numpy — closes the last real-decode gap
(SURVEY §2.1 #1; reference protosc/io.py:5-26 uses cv2.imread, and
cv2/PIL are verified absent in this container). JPEG is a fully
published format (ITU-T T.81 / ISO 10918-1), so like the PNG path
(protosc_spark.png) the engine decodes it for real:

* **decode_jpeg**: baseline + extended-sequential (SOF0/SOF1),
  progressive (SOF2) AND lossless (SOF3) Huffman JPEGs — DQT
  (8/16-bit), multi-table DHT, DRI/RSTn restart markers, byte
  stuffing, arbitrary sampling factors (4:4:4, 4:2:0, 4:2:2 via
  replication upsample), 1-component greyscale and 3-component YCbCr
  (BT.601). Progressive covers all four scan kinds of T.81 Annex G:
  DC first/refinement (interleaved or not), AC first with EOB runs,
  AC successive-approximation refinement. Lossless covers all 7
  Annex-H predictors with point transform (greyscale). HIERARCHICAL
  (Annex J) covers DHP, EXP reference expansion with the spec
  interpolation filter, and SOF5/SOF7 differential sequential/
  lossless frames plus SOF6 differential progressive (greyscale
  pyramids) — every Huffman coding process of the spec. Arithmetic
  coding raises with the production call documented.
* **encode_jpeg** / **encode_jpeg_progressive** /
  **encode_jpeg_hierarchical**: the fixture/
  round-trip companions — 4:4:4 with deterministic uniform-length
  Huffman tables built from the image's own symbol set (valid DHT by
  construction, no Annex-K transcription), orthonormal FDCT,
  selectable quantization tables. The progressive encoder's fixed
  scan script exercises every decoder scan kind and quantizes
  identically to the baseline encoder, so both encodings of an image
  decode to identical pixels.

Numerics: the FDCT/IDCT use the exact orthonormal DCT-II matrix (the
spec's Annex-A definition, not a fast integer approximation), so
dequantized coefficients reconstruct to float precision; a constant
(DC-only) block with a DC quantization step that divides 8 round-trips
BIT-EXACTLY — the property the driver-gate oracle keys on.
"""

from __future__ import annotations

import struct

import numpy as np


def _zigzag() -> np.ndarray:
    """Flat indices of the 8x8 zigzag scan, derived (not transcribed)
    from the diagonal-sweep definition in T.81 Figure 5."""
    idx = np.arange(64).reshape(8, 8)
    out = []
    for s in range(15):
        diag = [(y, s - y) for y in range(8) if 0 <= s - y < 8]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left -> top-right
        out.extend(idx[y, x] for (y, x) in diag)
    return np.array(out, dtype=np.int64)


ZZ = _zigzag()


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    T = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    T[0] = np.sqrt(1.0 / 8.0)
    return T


_T = _dct_matrix()

# BT.601 full-range YCbCr (the JFIF convention)
_FWD = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168735892, -0.331264108, 0.5],
        [0.5, -0.418687589, -0.081312411],
    ]
)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    ycc = rgb.astype(np.float64) @ _FWD.T
    ycc[:, :, 1:] += 128.0
    return ycc


def _ycbcr_to_rgb(y, cb, cr):
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

def _build_decode_table(bits: list[int], values: list[int]) -> dict:
    """(length, code) -> symbol, canonical JPEG assignment (T.81
    Annex C: codes of each length are consecutive, starting from
    double the first code of the previous length)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over an entropy-coded segment; 0xFF00 byte
    stuffing removed, RSTn markers act as segment breaks."""

    def __init__(self, segments: list[bytes]):
        self.segments = segments
        self.seg_idx = 0
        self.data = segments[0] if segments else b""
        self.pos = 0
        self.bit = 0

    def next_segment(self) -> bool:
        self.seg_idx += 1
        if self.seg_idx >= len(self.segments):
            return False
        self.data = self.segments[self.seg_idx]
        self.pos = 0
        self.bit = 0
        return True

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            # T.81 F.2.2.5: missing bits at the tail decode as 1s
            return 1
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    """T.81 F.12 EXTEND: map an s-bit magnitude to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _entropy_segments(buf: bytes, p: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``p`` to the next real marker, split on
    RSTn, 0xFF00 stuffing dropped. Returns (segments, end position)."""
    segments, cur = [], bytearray()
    while p < len(buf):
        b = buf[p]
        if b == 0xFF and p + 1 < len(buf):
            nxt = buf[p + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # real marker ends the scan
        cur.append(b)
        p += 1
    segments.append(bytes(cur))
    return segments, p


def _assemble(frame, planes) -> np.ndarray:
    """Component planes (MCU-padded, centered at 0) -> (h, w, c) uint8:
    level shift, replication upsample, crop, colour convert."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(comps) == 1:
        plane = np.clip(np.rint(planes[comps[0]["id"]] + 128.0), 0, 255)
        return plane[:h, :w].astype(np.uint8)[:, :, None]
    ups = []
    for c in comps:
        p = planes[c["id"]] + 128.0
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"],
                      axis=1)
        ups.append(p[:h, :w])
    return _ycbcr_to_rgb(*ups)


def _alloc_coeffs(frame) -> dict[int, np.ndarray]:
    """Per-component coefficient store for progressive decoding:
    cid -> int32 [block_rows, block_cols, 64] in ZIGZAG order, sized to
    the MCU-padded grid (so interleaved DC scans always fit)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                          dtype=np.int32)
        for c in frame["comps"]
    }


def _comp_block_dims(frame, comp) -> tuple[int, int]:
    """(block_rows, block_cols) of one component for NON-interleaved
    scans (T.81 A.1.1: component dims are ceil(w*h_i/hmax) etc.)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    cw = -(-(frame["w"] * comp["h"]) // hmax)
    ch = -(-(frame["h"] * comp["v"]) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _ac_first_block(reader, act, block, ss, se, al, eobrun) -> int:
    """One block of a progressive AC FIRST scan (Ah=0, T.81 G.1.2.2):
    run/size coding over the spectral band with EOB-run extension;
    new coefficients enter at magnitude << Al."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn: run of 2^r + extension bits
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run overflows spectral band")
        block[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, act, block, ss, se, al, eobrun) -> int:
    """One block of a progressive AC REFINEMENT scan (Ah=Al+1, T.81
    G.1.2.3): already-nonzero coefficients receive a correction bit;
    zero-history positions are run-length coded and may turn on at
    ±2^Al; EOB runs refine every remaining nonzero coefficient."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(act)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:  # EOBn
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                # s is always 1 in a refinement scan (new coefficient)
                val = p1 if reader.read_bit() else m1
            # advance past r zero-history positions, emitting a
            # correction bit at every nonzero coefficient on the way
            while k <= se:
                c = int(block[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        block[k] = c + (p1 if c > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # refine every remaining nonzero coefficient
            c = int(block[k])
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    block[k] = c + (p1 if c > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(frame, scan, huff, restart_interval,
                             segments, ss, se, ah, al, coeffs,
                             differential: bool = False) -> None:
    """Decode one progressive scan into the coefficient store. DC
    scans (Ss=0) may be interleaved; AC scans are single-component by
    definition (T.81 G.1.1.1.1). Restart markers reset predictors and
    the EOB run. ``differential`` (SOF6 frames, T.81 Annex J): DC
    first scans code the coefficient DIRECTLY — prediction is zero
    for every block (F.2.1.3.1); AC and refinement scans are
    identical to the non-differential case."""
    reader = _BitReader(segments)
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if len(scan) == 1:  # non-interleaved: component's own grid
            comp = scan[0][0]
            bh, bw = _comp_block_dims(frame, comp)
            groups = [[(scan[0], by, bx)]
                      for by in range(bh) for bx in range(bw)]
        else:  # interleaved MCU order
            groups = []
            for m in range(mcux * mcuy):
                my, mx = divmod(m, mcux)
                groups.append([
                    (sc, my * sc[0]["v"] + by, mx * sc[0]["h"] + bx)
                    for sc in scan
                    for by in range(sc[0]["v"])
                    for bx in range(sc[0]["h"])
                ])
        pred = {sc[0]["id"]: 0 for sc in scan}
        for m, g in enumerate(groups):
            if restart_interval and m and m % restart_interval == 0:
                if not reader.next_segment():
                    raise ValueError("missing restart segment")
                pred = {cid: 0 for cid in pred}
            for (comp, dc_id, _), by, bx in g:
                block = coeffs[comp["id"]][by, bx]
                if ah == 0:  # first scan: diff-coded, point-transformed
                    s = reader.decode_symbol(huff[(0, dc_id)])
                    v = 32768 if s == 16 else _extend(
                        reader.read_bits(s), s
                    )
                    if differential:  # PRED = 0 for every block
                        block[0] = v << al
                    else:
                        pred[comp["id"]] += v
                        block[0] = pred[comp["id"]] << al
                else:  # refinement: one raw bit per block
                    if reader.read_bit():
                        block[0] |= 1 << al
        return

    if len(scan) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    comp, _, ac_id = scan[0]
    act = huff[(1, ac_id)]
    cblocks = coeffs[comp["id"]]
    bh, bw = _comp_block_dims(frame, comp)
    eobrun = 0
    for m in range(bh * bw):
        if restart_interval and m and m % restart_interval == 0:
            if not reader.next_segment():
                raise ValueError("missing restart segment")
            eobrun = 0
        by, bx = divmod(m, bw)
        if ah == 0:
            eobrun = _ac_first_block(reader, act, cblocks[by, bx],
                                     ss, se, al, eobrun)
        else:
            eobrun = _ac_refine_block(reader, act, cblocks[by, bx],
                                      ss, se, al, eobrun)


def _decode_lossless_scan(frame, scan, huff, restart_interval,
                          segments, pred_sel, pt) -> np.ndarray:
    """Lossless (SOF3, T.81 Annex H) scan: per-sample Huffman-coded
    prediction differences, 7 fixed predictors, point transform Pt,
    mod-2^16 arithmetic. Greyscale only (the practical lossless
    surface: medical/raw sensor data); first line falls back to the
    left predictor, first column to the above predictor, and the first
    sample predicts 2^(P-Pt-1), all per H.1.2.1."""
    if len(frame["comps"]) != 1 or len(scan) != 1:
        raise NotImplementedError(
            "multi-component lossless JPEG not supported (no colour "
            "transform is defined for it; greyscale covers the "
            "practical surface)"
        )
    if restart_interval:
        raise NotImplementedError(
            "restart markers in lossless scans not supported"
        )
    p = frame["precision"]
    if not 2 <= p <= 8:
        raise ValueError(
            f"lossless precision {p} unsupported (2-8 decode to uint8)"
        )
    if not 1 <= pred_sel <= 7:
        raise ValueError(f"invalid lossless predictor {pred_sel}")
    h, w = frame["h"], frame["w"]
    table = huff[(0, scan[0][1])]
    reader = _BitReader(segments)
    default = 1 << (p - pt - 1)
    out = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        row = out[y]
        above = out[y - 1] if y else None
        for x in range(w):
            if y == 0:
                pred = int(row[x - 1]) if x else default
            elif x == 0:
                pred = int(above[0])
            else:
                a, b, c = int(row[x - 1]), int(above[x]), int(above[x - 1])
                if pred_sel == 1:
                    pred = a
                elif pred_sel == 2:
                    pred = b
                elif pred_sel == 3:
                    pred = c
                elif pred_sel == 4:
                    pred = a + b - c
                elif pred_sel == 5:
                    pred = a + ((b - c) >> 1)
                elif pred_sel == 6:
                    pred = b + ((a - c) >> 1)
                else:
                    pred = (a + b) >> 1
            s = reader.decode_symbol(table)
            if s == 16:
                diff = 32768
            else:
                diff = _extend(reader.read_bits(s), s)
            row[x] = (pred + diff) & 0xFFFF
    img = (out << pt).astype(np.int64)
    return np.clip(img, 0, 255).astype(np.uint8)[:, :, None]


def _reconstruct_progressive(frame, coeffs, qt) -> np.ndarray:
    """Coefficient store -> pixels: de-zigzag, dequantize, IDCT (one
    einsum per component), assemble/upsample/colour-convert."""
    planes = {}
    for c in frame["comps"]:
        zzb = coeffs[c["id"]]
        bh, bw = zzb.shape[:2]
        nat = np.zeros((bh, bw, 64))
        nat[:, :, ZZ] = zzb  # de-zigzag: scatter into natural order
        blocks = nat.reshape(bh, bw, 8, 8) * qt[c["q"]]
        pix = np.einsum("ji,abjk,kl->abil", _T, blocks, _T)
        planes[c["id"]] = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return _assemble(frame, planes)


def _fold_mod16(x: np.ndarray) -> np.ndarray:
    """Modulo-2^16 accumulation (T.81 J.1.6) interpreted as SIGNED:
    without the signed fold, a reference pixel whose differential sum
    lands at -1 would wrap to 65535 and the final 0-255 clip would
    emit 255 where the true value is 0."""
    return ((x + 32768) & 0xFFFF) - 32768


def _expand_ref(ref: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """T.81 J.1.1.2 reference expansion: double the indicated
    dimension(s) with the spec interpolation filter
    P(2x) = R(x), P(2x+1) = (R(x) + R(x+1) + 1) >> 1, last odd sample
    by edge replication. Integer arithmetic throughout."""
    r = ref.astype(np.int64)
    if ev:
        up = np.empty((r.shape[0] * 2, r.shape[1]), dtype=np.int64)
        up[0::2] = r
        nxt = np.vstack([r[1:], r[-1:]])
        up[1::2] = (r + nxt + 1) >> 1
        r = up
    if eh:
        up = np.empty((r.shape[0], r.shape[1] * 2), dtype=np.int64)
        up[:, 0::2] = r
        nxt = np.hstack([r[:, 1:], r[:, -1:]])
        up[:, 1::2] = (r + nxt + 1) >> 1
        r = up
    return r


def _decode_diff_scan(frame, scan, qt, huff, restart_interval,
                      segments) -> np.ndarray:
    """Differential sequential DCT scan (SOF5, T.81 J.1): identical
    block decode to the sequential path except the DC prediction is
    ZERO for every block (F.2.1.3.1 — the DC 'difference' IS the
    coefficient) and no level shift applies. Greyscale; returns the
    rounded int64 difference plane cropped to the frame dims."""
    if len(frame["comps"]) != 1 or len(scan) != 1:
        raise NotImplementedError(
            "multi-component differential frames not supported "
            "(greyscale covers the hierarchical surface here)"
        )
    h, w = frame["h"], frame["w"]
    comp, dc_id, ac_id = scan[0]
    mcux, mcuy = -(-w // 8), -(-h // 8)
    plane = np.zeros((mcuy * 8, mcux * 8))
    reader = _BitReader(segments)
    dct = huff[(0, dc_id)]
    act = huff[(1, ac_id)]
    q = qt[comp["q"]]
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            if not reader.next_segment():
                raise ValueError("missing restart segment")
        my, mx = divmod(m, mcux)
        coef = np.zeros(64)
        s = reader.decode_symbol(dct)
        # differential DC range doubles: SSSS 16 codes 32768 (F.1.2.1)
        coef[0] = 32768 if s == 16 else _extend(reader.read_bits(s), s)
        k = 1
        while k < 64:
            rs = reader.decode_symbol(act)
            r, size = rs >> 4, rs & 0x0F
            if size == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC run overflows block")
            coef[k] = _extend(reader.read_bits(size), size)
            k += 1
        nat = np.zeros(64)
        nat[ZZ] = coef
        block = _T.T @ (nat.reshape(8, 8) * q) @ _T
        plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = block
    return np.rint(plane[:h, :w]).astype(np.int64)


def _decode_lossless_diff_scan(frame, scan, huff, restart_interval,
                               segments) -> np.ndarray:
    """Differential lossless scan (SOF7, T.81 J.1/H.1): each sample's
    Huffman-coded value IS the difference to the reference — no
    spatial prediction (PRED = 0). Greyscale; returns int64 (h, w)."""
    if len(frame["comps"]) != 1 or len(scan) != 1:
        raise NotImplementedError(
            "multi-component differential frames not supported"
        )
    if restart_interval:
        raise NotImplementedError(
            "restart markers in lossless scans not supported"
        )
    h, w = frame["h"], frame["w"]
    table = huff[(0, scan[0][1])]
    reader = _BitReader(segments)
    out = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            s = reader.decode_symbol(table)
            out[y, x] = 32768 if s == 16 else _extend(
                reader.read_bits(s), s
            )
    return out


def _finalize_hier_progressive(frame, coeffs, qt, ref):
    """End of a progressive frame inside a hierarchical stream (next
    SOF/DHP/EXP/EOI seen): reconstruct the pending coefficient store.
    Differential (SOF6): add the difference plane to the reference
    modulo 2^16 (T.81 J.1.6); non-differential first frame: the
    reconstructed pixels BECOME the reference."""
    if frame.get("differential"):
        if ref is None:
            raise ValueError("differential frame with no reference")
        diff = _reconstruct_progressive_diff(frame, coeffs, qt)
        hh, ww = frame["h"], frame["w"]
        return _fold_mod16(ref[:hh, :ww] + diff), None
    out = _reconstruct_progressive(frame, coeffs, qt)
    return out[:, :, 0].astype(np.int64), None


def _reconstruct_progressive_diff(frame, coeffs, qt) -> np.ndarray:
    """Differential progressive (SOF6) coefficient store -> rounded
    int64 DIFFERENCE plane (greyscale, no level shift), cropped."""
    if len(frame["comps"]) != 1:
        raise NotImplementedError(
            "multi-component differential frames not supported"
        )
    c = frame["comps"][0]
    zzb = coeffs[c["id"]]
    bh, bw = zzb.shape[:2]
    nat = np.zeros((bh, bw, 64))
    nat[:, :, ZZ] = zzb
    blocks = nat.reshape(bh, bw, 8, 8) * qt[c["q"]]
    pix = np.einsum("ji,abjk,kl->abil", _T, blocks, _T)
    plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return np.rint(plane[: frame["h"], : frame["w"]]).astype(np.int64)


def decode_jpeg(buf: bytes) -> np.ndarray:
    """JPEG bytes -> (h, w, c) uint8 (c = 1 grey or 3 RGB)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    restart_interval = 0
    frame = None
    out = None
    coeffs = None  # progressive: cid -> int32 [bh, bw, 64] (zigzag)
    hier = None  # hierarchical: dims/comps from the DHP marker
    ref = None  # hierarchical: int64 reference plane (greyscale)

    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", buf[pos : pos + 2])
        seg = buf[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec:
                    q = np.frombuffer(seg[p : p + 128], dtype=">u2")
                    p += 128
                else:
                    q = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                    p += 64
                tbl = np.zeros(64)
                tbl[ZZ] = q.astype(np.float64)
                qt[tid] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                values = list(seg[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _build_decode_table(bits, values)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xDE):
            # SOF0/SOF1 sequential, SOF2 progressive, SOF3 lossless,
            # SOF5/SOF6/SOF7 differential sequential/progressive/
            # lossless (hierarchical frames, T.81 Annex J), DHP
            # (hierarchical progression — SOF syntax, defines the
            # FULL-resolution dims)
            if hier is not None and coeffs is not None:
                # a new frame/DHP ends the pending progressive frame
                ref, coeffs = _finalize_hier_progressive(
                    frame, coeffs, qt, ref
                )
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(nc):
                cid, samp, qid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "q": qid}
                )
            if marker == 0xDE:  # DHP
                if nc != 1:
                    raise NotImplementedError(
                        "multi-component hierarchical JPEG not "
                        "supported (greyscale covers the surface)"
                    )
                hier = {"h": h, "w": w, "comps": comps}
                pos += seglen
                continue
            frame = {"h": h, "w": w, "comps": comps, "precision": prec,
                     "progressive": marker in (0xC2, 0xC6),
                     "lossless": marker in (0xC3, 0xC7),
                     "differential": marker in (0xC5, 0xC6, 0xC7)}
            if frame["differential"] and hier is None:
                raise ValueError("differential frame before DHP")
        elif marker == 0xDF:  # EXP: expand the hierarchical reference
            if hier is not None and coeffs is not None:
                ref, coeffs = _finalize_hier_progressive(
                    frame, coeffs, qt, ref
                )
            if ref is None:
                raise ValueError("EXP with no reference frame decoded")
            ref = _expand_ref(ref, seg[0] >> 4, seg[0] & 0x0F)
        elif marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "every Huffman coding process (sequential, "
                "progressive, lossless, hierarchical SOF5/SOF6/SOF7) "
                "is implemented; arithmetic-coded inputs need "
                "cv2.imdecode in production"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan.append((comp, tabs >> 4, tabs & 0x0F))
            if frame.get("differential") and not frame["progressive"]:
                if ref is None:
                    raise ValueError("differential scan with no "
                                     "reference (missing first frame)")
                segments, p = _entropy_segments(buf, pos + seglen)
                if frame["lossless"]:
                    pt = seg[3 + 2 * ns] & 0x0F
                    diff = _decode_lossless_diff_scan(
                        frame, scan, huff, restart_interval, segments
                    ) << pt
                else:
                    diff = _decode_diff_scan(
                        frame, scan, qt, huff, restart_interval,
                        segments,
                    )
                hh, ww = frame["h"], frame["w"]
                # T.81 J.1.6: differential output adds modulo 2^16
                ref = _fold_mod16(ref[:hh, :ww] + diff)
                pos = p
                continue
            if frame["lossless"]:
                pred_sel = seg[1 + 2 * ns]
                pt = seg[3 + 2 * ns] & 0x0F
                segments, p = _entropy_segments(buf, pos + seglen)
                out = _decode_lossless_scan(
                    frame, scan, huff, restart_interval, segments,
                    pred_sel, pt,
                )
                if hier is not None:
                    ref = out[:, :, 0].astype(np.int64)
                    out = None
                pos = p
                continue
            if frame["progressive"]:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                if coeffs is None:
                    coeffs = _alloc_coeffs(frame)
                segments, p = _entropy_segments(buf, pos + seglen)
                _decode_progressive_scan(
                    frame, scan, huff, restart_interval, segments,
                    ss, se, ahal >> 4, ahal & 0x0F, coeffs,
                    differential=frame.get("differential", False),
                )
                pos = p
                continue
            if ns != len(frame["comps"]):
                raise NotImplementedError(
                    "multi-scan non-interleaved baseline JPEG not "
                    "supported"
                )
            segments, p = _entropy_segments(buf, pos + seglen)
            out = _decode_scan(frame, scan, qt, huff, restart_interval,
                               segments)
            if hier is not None:
                ref = out[:, :, 0].astype(np.int64)
                out = None
            pos = p
            continue
        pos += seglen
    if hier is not None:
        if coeffs is not None:
            ref, coeffs = _finalize_hier_progressive(
                frame, coeffs, qt, ref
            )
        if ref is None:
            raise ValueError("hierarchical stream with no frames")
        final = ref[: hier["h"], : hier["w"]]
        return np.clip(final, 0, 255).astype(np.uint8)[:, :, None]
    if out is None and coeffs is not None:
        out = _reconstruct_progressive(frame, coeffs, qt)
    if out is None:
        raise ValueError("no scan decoded")
    return out


def _decode_scan(frame, scan, qt, huff, restart_interval, segments):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        for c in frame["comps"]
    }
    reader = _BitReader(segments)
    pred = {c["id"]: 0 for c in frame["comps"]}
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            if not reader.next_segment():
                raise ValueError("missing restart segment")
            pred = {c["id"]: 0 for c in frame["comps"]}
        my, mx = divmod(m, mcux)
        for comp, dc_id, ac_id in scan:
            dct = huff[(0, dc_id)]
            act = huff[(1, ac_id)]
            q = qt[comp["q"]]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    coef = np.zeros(64)
                    s = reader.decode_symbol(dct)
                    diff = _extend(reader.read_bits(s), s)
                    pred[comp["id"]] += diff
                    coef[0] = pred[comp["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(act)
                        r, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run overflows block")
                        coef[k] = _extend(reader.read_bits(size), size)
                        k += 1
                    nat = np.zeros(64)
                    nat[ZZ] = coef  # de-zigzag: scatter into natural order
                    block = _T.T @ (nat.reshape(8, 8) * q) @ _T
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
    return _assemble(frame, planes)


# ---------------------------------------------------------------------------
# encoder (4:4:4 baseline, deterministic uniform-length Huffman tables)
# ---------------------------------------------------------------------------

_DEFAULT_Q = np.full((8, 8), 8.0)  # DC step 8: constant blocks are exact


def _quantize_blocks(
    chan: np.ndarray, q: np.ndarray, level_shift: bool = True
) -> np.ndarray:
    """(h, w) float -> (n_blocks_y, n_blocks_x, 64) int32 zigzagged
    quantized coefficients; image padded to 8s by edge replication.
    ``level_shift=False`` for DIFFERENTIAL frames (T.81 J.1: the
    hierarchical difference signal is already centred at 0)."""
    h, w = chan.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(chan, ((0, ph - h), (0, pw - w)), mode="edge")
    by, bx = ph // 8, pw // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    if level_shift:
        blocks = blocks - 128.0
    coefs = np.einsum("ij,abjk,lk->abil", _T, blocks, _T)
    qz = np.rint(coefs / q).astype(np.int32)
    return qz.reshape(by, bx, 64)[:, :, ZZ]


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _block_symbols(zz: np.ndarray, prev_dc: int):
    """(dc_symbol, dc_bits), [(ac_symbol, ac_bits)...], new_dc for one
    zigzagged quantized block."""
    diff = int(zz[0]) - prev_dc
    s = _category(diff)
    dc_bits = (diff if diff >= 0 else diff + (1 << s) - 1, s)
    acs = []
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, (0, 0)))  # ZRL
            run -= 16
        size = _category(v)
        acs.append(
            ((run << 4) | size, (v if v >= 0 else v + (1 << size) - 1, size))
        )
        run = 0
    if last < 63:
        acs.append((0x00, (0, 0)))  # EOB
    return (s, dc_bits), acs, int(zz[0])


def _uniform_huffman(symbols: set[int]) -> tuple[list[int], list[int]]:
    """Valid JPEG Huffman spec (BITS, HUFFVAL) assigning every symbol
    the same code length L with 2^L > n (so the all-ones code stays
    unused, as T.81 requires for the fixed-length corner)."""
    vals = sorted(symbols)
    n = max(len(vals), 1)
    L = 1
    while (1 << L) <= n:  # need 2^L >= n+1 codes of length L
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(vals)
    return bits, vals


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s (T.81 F.1.2.3)


def _encode_table_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length), canonical assignment (encoder side)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


class _SymbolCollector:
    """Pass-1 sink: records which Huffman symbols a scan emits."""

    def __init__(self):
        self.symbols: set[int] = set()

    def symbol(self, sym: int):
        self.symbols.add(sym)

    def bits(self, value: int, length: int):
        pass


class _ScanEmitter:
    """Pass-2 sink: Huffman-encodes symbols and writes raw bits."""

    def __init__(self, codes: dict):
        self.codes = codes
        self.w = _BitWriter()

    def symbol(self, sym: int):
        code, length = self.codes[sym]
        self.w.write(code, length)

    def bits(self, value: int, length: int):
        self.w.write(value, length)


def _run_scan(encode, cls: int) -> tuple[bytes, bytes]:
    """Two-pass progressive scan emission: collect the scan's Huffman
    symbols, build a deterministic uniform-length table, then emit.
    Returns (DHT segment or b'', entropy-coded bytes)."""
    coll = _SymbolCollector()
    encode(coll)
    dht, codes = b"", {}
    if coll.symbols:
        bits, vals = _uniform_huffman(coll.symbols)
        body = bytes([(cls << 4) | 0]) + bytes(bits) + bytes(vals)
        dht = b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
        codes = _encode_table_codes(bits, vals)
    em = _ScanEmitter(codes)
    encode(em)
    em.w.flush()
    return dht, bytes(em.w.out)


def _dc_first_scan(blocks, al, sink):
    """Interleaved DC first scan (1x1 sampling): diff-code the
    point-transformed DC of every component per MCU, shared table."""
    by, bx = blocks[0].shape[:2]
    prev = [0] * len(blocks)
    for m in range(by * bx):
        y, x = divmod(m, bx)
        for ci, bl in enumerate(blocks):
            v = int(bl[y, x, 0]) >> al
            diff = v - prev[ci]
            prev[ci] = v
            s = _category(diff)
            sink.symbol(s)
            sink.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _dc_first_scan_diff(blocks, al, sink):
    """DC first scan of a DIFFERENTIAL progressive frame (SOF6): the
    point-transformed DC coefficient is coded directly — prediction
    is zero for every block (T.81 F.2.1.3.1)."""
    by, bx = blocks[0].shape[:2]
    for m in range(by * bx):
        y, x = divmod(m, bx)
        for bl in blocks:
            v = int(bl[y, x, 0]) >> al
            s = _category(v)
            sink.symbol(s)
            sink.bits(v if v >= 0 else v + (1 << s) - 1, s)


def _dc_refine_scan(blocks, al, sink):
    """DC refinement: one raw bit (bit ``al`` of the DC) per block,
    MCU order. Uses no Huffman table."""
    by, bx = blocks[0].shape[:2]
    for m in range(by * bx):
        y, x = divmod(m, bx)
        for bl in blocks:
            sink.bits((int(bl[y, x, 0]) >> al) & 1, 1)


def _ac_first_scan(bl, ss, se, al, sink):
    """Single-component AC first scan over band [ss, se] at precision
    ``al``: run/size coding with cross-block EOB runs (T.81 G.1.2.2)."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            sink.symbol(nbits << 4)
            if nbits:
                sink.bits(eobrun - (1 << nbits), nbits)
            eobrun = 0

    for zz in bl.reshape(-1, 64):
        band = [int(v) for v in zz[ss : se + 1]]
        # point transform: integer division toward zero (T.81 G.1.2.1)
        t = [(v >> al) if v >= 0 else -((-v) >> al) for v in band]
        nz = [i for i, v in enumerate(t) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        r = 0
        for i in range(nz[-1] + 1):
            v = t[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                sink.symbol(0xF0)  # ZRL
                r -= 16
            s = _category(v)
            sink.symbol((r << 4) | s)
            sink.bits(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if nz[-1] < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _ac_refine_scan(bl, ss, se, al, sink):
    """Single-component AC refinement scan (T.81 G.1.2.3): correction
    bits for history-nonzero coefficients, run-coded newly-nonzero
    positions, correction bits deferred across EOB runs."""
    eobrun = 0
    be: list[int] = []  # correction bits deferred with the EOB run

    def flush_eob():
        nonlocal eobrun, be
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            sink.symbol(nbits << 4)
            if nbits:
                sink.bits(eobrun - (1 << nbits), nbits)
            eobrun = 0
            for b in be:
                sink.bits(b, 1)
            be = []

    for zz in bl.reshape(-1, 64):
        band = [int(v) for v in zz[ss : se + 1]]
        absval = [abs(v) >> al for v in band]
        eob = -1  # index of the last NEWLY-nonzero coefficient
        for i, a in enumerate(absval):
            if a == 1:
                eob = i
        r = 0
        br: list[int] = []  # correction bits pending in this block
        for i, a in enumerate(absval):
            if a == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                flush_eob()
                sink.symbol(0xF0)
                r -= 16
                for b in br:
                    sink.bits(b, 1)
                br = []
            if a > 1:  # history-nonzero: correction bit only
                br.append(a & 1)
                continue
            flush_eob()
            sink.symbol((r << 4) | 1)
            sink.bits(1 if band[i] >= 0 else 0, 1)  # sign of new coef
            for b in br:
                sink.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(
    img: np.ndarray, q: np.ndarray | None = None
) -> bytes:
    """(h, w[, c]) uint8 -> progressive (SOF2) JPEG bytes, 4:4:4.
    Fixed scan script exercising all four progressive scan kinds:
    interleaved DC first (Al=1), DC refinement, per-component AC first
    scans in two spectral bands (Al=1), per-component AC refinement
    (Ah=1, Al=0). Quantizes identically to encode_jpeg, so progressive
    and baseline encodings of the same image decode identically."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in (1, 3):
        raise ValueError("encode_jpeg_progressive supports 1 or 3 channels")
    q = _DEFAULT_Q if q is None else np.asarray(q, dtype=np.float64)
    if c == 3:
        ycc = _rgb_to_ycbcr(a)
        chans = [ycc[:, :, i] for i in range(3)]
    else:
        chans = [a[:, :, 0].astype(np.float64)]
    blocks = [_quantize_blocks(ch, q) for ch in chans]

    out = bytearray(b"\xff\xd8")
    zz_q = q.reshape(64)[ZZ]
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00)
    out += bytes(int(v) for v in zz_q)
    sof = struct.pack(">BHHB", 8, h, w, c)
    for i in range(c):
        sof += bytes([i + 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof

    run_scan = _run_scan

    def sos(comp_ids, ss, se, ah, al):
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            hdr += bytes([cid, 0x00])  # DC/AC table 0
        hdr += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr

    all_ids = list(range(1, c + 1))
    dht, data = run_scan(lambda s: _dc_first_scan(blocks, 1, s), 0)
    out += dht + sos(all_ids, 0, 0, 0, 1) + data
    _, data = run_scan(lambda s: _dc_refine_scan(blocks, 0, s), 0)
    out += sos(all_ids, 0, 0, 1, 0) + data
    for ci in range(c):
        for lo, hi in ((1, 5), (6, 63)):
            dht, data = run_scan(
                lambda s, b=blocks[ci], lo=lo, hi=hi:
                    _ac_first_scan(b, lo, hi, 1, s),
                1,
            )
            out += dht + sos([ci + 1], lo, hi, 0, 1) + data
    for ci in range(c):
        dht, data = run_scan(
            lambda s, b=blocks[ci]: _ac_refine_scan(b, 1, 63, 0, s), 1
        )
        out += dht + sos([ci + 1], 1, 63, 1, 0) + data
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_lossless(
    img: np.ndarray, predictor: int = 4, pt: int = 0
) -> bytes:
    """(h, w) uint8 greyscale -> lossless (SOF3) JPEG bytes, T.81
    Annex H: per-sample prediction differences Huffman-coded with a
    deterministic uniform-length table. decode_jpeg recovers the
    input BIT-EXACTLY (with pt=0; a nonzero point transform drops the
    pt low bits, also per spec). Prediction is fully vectorized here
    because the encoder sees the true samples."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("encode_jpeg_lossless supports greyscale only")
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid lossless predictor {predictor}")
    h, w = a.shape
    x = a.astype(np.int64) >> pt
    pred = np.empty((h, w), dtype=np.int64)
    pred[0, 0] = 1 << (8 - pt - 1)
    if w > 1:
        pred[0, 1:] = x[0, :-1]  # first line: left predictor (H.1.2.1)
    if h > 1:
        pred[1:, 0] = x[:-1, 0]  # first column: above predictor
        if w > 1:
            pa, pb, pc = x[1:, :-1], x[:-1, 1:], x[:-1, :-1]
            pred[1:, 1:] = {
                1: pa, 2: pb, 3: pc, 4: pa + pb - pc,
                5: pa + ((pb - pc) >> 1), 6: pb + ((pa - pc) >> 1),
                7: (pa + pb) >> 1,
            }[predictor]
    d = ((x - pred + 32768) & 0xFFFF) - 32768  # mod-2^16 differences

    syms = set()
    flat = d.ravel()
    for v in flat:
        syms.add(_category(int(v)))
    bits, vals = _uniform_huffman(syms)
    codes = _encode_table_codes(bits, vals)

    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    body = bytes([0x00]) + bytes(bits) + bytes(vals)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([1, 1, 0x00, predictor, 0, pt])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    wtr = _BitWriter()
    for v in flat:
        v = int(v)
        s = _category(v)
        code, length = codes[s]
        wtr.write(code, length)
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg(img: np.ndarray, q: np.ndarray | None = None) -> bytes:
    """(h, w[, c]) uint8 -> baseline JPEG bytes (grey or RGB, 4:4:4).
    ``q`` is the quantization table applied to every component
    (default: flat steps of 8, making constant blocks bit-exact)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    q = _DEFAULT_Q if q is None else np.asarray(q, dtype=np.float64)

    if c == 3:
        ycc = _rgb_to_ycbcr(a)
        chans = [ycc[:, :, i] for i in range(3)]
    else:
        chans = [a[:, :, 0].astype(np.float64)]
    blocks = [_quantize_blocks(ch, q) for ch in chans]

    # pass 1: symbol sets -> deterministic tables (DC/AC, lum/chroma)
    dc_syms = [set(), set()]
    ac_syms = [set(), set()]
    for ci, bl in enumerate(blocks):
        t = 0 if ci == 0 else 1
        prev = 0
        for zz in bl.reshape(-1, 64):
            (s, _), acs, prev = _block_symbols(zz, prev)
            dc_syms[t].add(s)
            ac_syms[t].update(sym for sym, _ in acs)
    n_t = 1 if c == 1 else 2
    dc_specs = [_uniform_huffman(dc_syms[t]) for t in range(n_t)]
    ac_specs = [_uniform_huffman(ac_syms[t]) for t in range(n_t)]
    dc_codes = [_encode_table_codes(*s) for s in dc_specs]
    ac_codes = [_encode_table_codes(*s) for s in ac_specs]

    # pass 2: emit
    out = bytearray(b"\xff\xd8")
    zz_q = q.reshape(64)[ZZ]  # DQT stores the table in zigzag order
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00)
    out += bytes(int(v) for v in zz_q)
    sof = struct.pack(">BHHB", 8, h, w, c)
    for i in range(c):
        sof += bytes([i + 1, 0x11, 0])  # 1x1 sampling, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for t in range(n_t):
        for cls, (bits, vals) in ((0, dc_specs[t]), (1, ac_specs[t])):
            body = bytes([(cls << 4) | t]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([c])
    for i in range(c):
        t = 0 if i == 0 else (n_t - 1)
        sos += bytes([i + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    wtr = _BitWriter()
    # all components share 1x1 sampling -> one block per comp per MCU
    by, bx = blocks[0].shape[0], blocks[0].shape[1]
    prev = [0] * c
    for myx in range(by * bx):
        y, x = divmod(myx, bx)
        for ci in range(c):
            t = 0 if ci == 0 else (n_t - 1)
            (s, (dv, dl)), acs, prev[ci] = _block_symbols(
                blocks[ci][y, x], prev[ci]
            )
            code, length = dc_codes[t][s]
            wtr.write(code, length)
            wtr.write(dv, dl)
            for sym, (av, al) in acs:
                code, length = ac_codes[t][sym]
                wtr.write(code, length)
                wtr.write(av, al)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_hierarchical(
    img: np.ndarray, q: np.ndarray | None = None,
    lossless: bool = False, progressive: bool = False
) -> bytes:
    """(h, w) uint8 greyscale -> HIERARCHICAL JPEG bytes (T.81 Annex
    J): a two-level pyramid — DHP with the full dims, a baseline
    (SOF0) first frame at half resolution (2:1 decimation), an EXP
    marker expanding the reference in both dimensions with the spec
    interpolation filter, and a differential sequential (SOF5) frame
    coding ``img - upsampled_reference`` with a unit quantizer, DC
    prediction zero and no level shift.

    The encoder reconstructs the first frame exactly as the decoder
    will (dequant + IDCT + level shift + clip), so the differential
    stage sees the true decoder-side reference. Constant images are
    bit-exact end to end (DC-only blocks at both levels); arbitrary
    images round-trip within IDCT integer-rounding error of the unit-
    quantized difference."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 3:
        if a.shape[2] != 1:
            raise ValueError(
                "encode_jpeg_hierarchical supports greyscale only"
            )
        a = a[:, :, 0]
    h, w = a.shape
    q1 = _DEFAULT_Q if q is None else np.asarray(q, dtype=np.float64)
    q2 = np.ones((8, 8))

    def frame_bytes(blocks, marker: int, fh: int, fw: int, qid: int,
                    chain_dc: bool) -> bytes:
        """DHT + SOF + SOS + entropy data for one greyscale frame."""
        dc_syms: set[int] = set()
        ac_syms: set[int] = set()
        prev = 0
        for zz in blocks.reshape(-1, 64):
            (s, _), acs, ndc = _block_symbols(zz, prev)
            prev = ndc if chain_dc else 0
            dc_syms.add(s)
            ac_syms.update(sym for sym, _ in acs)
        dc_spec = _uniform_huffman(dc_syms)
        ac_spec = _uniform_huffman(ac_syms)
        dc_codes = _encode_table_codes(*dc_spec)
        ac_codes = _encode_table_codes(*ac_spec)
        out = bytearray()
        for cls, (bits, vals) in ((0, dc_spec), (1, ac_spec)):
            body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
        sof = struct.pack(">BHHB", 8, fh, fw, 1) + bytes([1, 0x11, qid])
        out += bytes([0xFF, marker]) + struct.pack(
            ">H", 2 + len(sof)
        ) + sof
        sos = bytes([1, 1, 0x00, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        wtr = _BitWriter()
        prev = 0
        for zz in blocks.reshape(-1, 64):
            (s, (dv, dl)), acs, ndc = _block_symbols(zz, prev)
            prev = ndc if chain_dc else 0
            code, length = dc_codes[s]
            wtr.write(code, length)
            wtr.write(dv, dl)
            for sym, (av, al) in acs:
                code, length = ac_codes[sym]
                wtr.write(code, length)
                wtr.write(av, al)
        wtr.flush()
        return bytes(out + wtr.out)

    # stage 1: half-resolution baseline frame (2:1 decimation)
    low = a[::2, ::2].astype(np.float64)
    lh, lw = low.shape
    bl1 = _quantize_blocks(low, q1)
    # decoder-side reconstruction of stage 1 (the true reference)
    by, bx = bl1.shape[:2]
    nat = np.zeros((by, bx, 64))
    nat[:, :, ZZ] = bl1
    pix = np.einsum("ji,abjk,kl->abil", _T, nat.reshape(by, bx, 8, 8) * q1,
                    _T)
    rec = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)[:lh, :lw]
    ref1 = np.clip(np.rint(rec + 128.0), 0, 255).astype(np.int64)

    # stage 2: differential frame on img - expand(ref1)
    up = _expand_ref(ref1, 1, 1)[:h, :w]
    diff = a.astype(np.float64) - up.astype(np.float64)
    bl2 = _quantize_blocks(diff, q2, level_shift=False)

    out = bytearray(b"\xff\xd8")
    for qid, qtab in ((0, q1), (1, q2)):
        zz_q = qtab.reshape(64)[ZZ]
        out += b"\xff\xdb" + struct.pack(">HB", 67, qid)
        out += bytes(int(v) for v in zz_q)
    dhp = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xde" + struct.pack(">H", 2 + len(dhp)) + dhp
    out += frame_bytes(bl1, 0xC0, lh, lw, 0, chain_dc=True)
    out += b"\xff\xdf" + struct.pack(">H", 3) + bytes([0x11])  # EXP
    if lossless:
        # SOF7 differential LOSSLESS final stage: each sample's
        # Huffman-coded value IS the exact difference, so the full
        # round trip is BIT-EXACT for arbitrary images.
        vals = diff.astype(np.int64).ravel()
        syms = {_category(int(v)) for v in vals}
        spec = _uniform_huffman(syms)
        codes = _encode_table_codes(*spec)
        body = bytes([0x00]) + bytes(spec[0]) + bytes(spec[1])
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
        sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
        out += b"\xff\xc7" + struct.pack(">H", 2 + len(sof)) + sof
        sos = bytes([1, 1, 0x00, 0, 0, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        wtr = _BitWriter()
        for v in vals:
            v = int(v)
            s = _category(v)
            code, length = codes[s]
            wtr.write(code, length)
            wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        wtr.flush()
        out += wtr.out
    elif progressive:
        # SOF6 differential PROGRESSIVE final stage: the same fixed
        # scan script as encode_jpeg_progressive (DC first/refine, AC
        # first in two bands, AC refine) over the unit-quantized
        # difference coefficients, with zero DC prediction.
        run_scan = _run_scan

        def sos6(ss, se, ah, al):
            hdr = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
            return b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr

        sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 1])
        out += b"\xff\xc6" + struct.pack(">H", 2 + len(sof)) + sof
        dht, data = run_scan(
            lambda sk: _dc_first_scan_diff([bl2], 1, sk), 0
        )
        out += dht + sos6(0, 0, 0, 1) + data
        _, data = run_scan(lambda sk: _dc_refine_scan([bl2], 0, sk), 0)
        out += sos6(0, 0, 1, 0) + data
        for lo, hi in ((1, 5), (6, 63)):
            dht, data = run_scan(
                lambda sk, lo=lo, hi=hi:
                    _ac_first_scan(bl2, lo, hi, 1, sk),
                1,
            )
            out += dht + sos6(lo, hi, 0, 1) + data
        dht, data = run_scan(
            lambda sk: _ac_refine_scan(bl2, 1, 63, 0, sk), 1
        )
        out += dht + sos6(1, 63, 1, 0) + data
    else:
        out += frame_bytes(bl2, 0xC5, h, w, 1, chain_dc=False)
    out += b"\xff\xd9"
    return bytes(out)
