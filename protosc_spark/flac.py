"""FLAC codec in pure numpy/stdlib — extends the real-audio-decode
path (SURVEY §2.1 #1; reference protosc/io.py:5-26 reads media via
cv2, and the audio side of the boundary is soundfile/librosa, both
verified absent in this container). FLAC is a fully published format
(RFC 9639 / xiph.org spec), and — unlike the perceptual codecs — it is
LOSSLESS, so like PNG/JPEG/WAV the engine decodes it for real:

* **decode_flac**: the full subframe/residual surface — STREAMINFO +
  metadata-block walk, frame headers (common/uncommon block-size and
  sample-rate codes, UTF-8-coded frame numbers, CRC-8 verified),
  CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) subframes, both rice
  residual methods (4- and 5-bit parameters) with partitioned rice
  coding, escape (unencoded) partitions, wasted bits, stereo
  decorrelation (left/side, right/side, mid/side), 8/12/16/20/24/32
  bit depths, frame CRC-16 verified. Only the lossy perceptual
  codecs (MP3/AAC/Opus/Vorbis) remain behind the documented
  soundfile boundary (multimodal.audio_features(codec="real")).
* **encode_flac**: the fixture/round-trip companion — constant /
  verbatim / fixed-predictor / LPC (least-squares fit, quantized
  coefficients) subframes, selectable rice partition order, forced
  escape partitions, wasted-bits detection, stereo decorrelation
  modes. FLAC is lossless, so every encode/decode round trip is
  BIT-EXACT regardless of predictor quality — the property the tests
  and the driver-gate oracle key on.

Scale note: decoding is per-row work inside one Arrow batch pass
(multimodal.audio_features(codec="flac")); rice unary scans use a
precomputed set-bit index (numpy flatnonzero + searchsorted), and
fixed-predictor reconstruction is vectorized as seeded cumulative
sums. LPC reconstruction is an inherently sequential IIR recurrence
(kept in Python over ≤blocksize samples per subframe).
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# CRCs (frame-header CRC-8 poly 0x07, frame CRC-16 poly 0x8005, init 0)
# ---------------------------------------------------------------------------

def _crc_table(poly: int, width: int) -> list[int]:
    top, mask = 1 << (width - 1), (1 << width) - 1
    tbl = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        tbl.append(crc)
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TBL[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TBL[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# ---------------------------------------------------------------------------
# bit reader
# ---------------------------------------------------------------------------

class _Bits:
    """MSB-first bit reader. ``ones`` — the sorted positions of every
    set bit, built once per stream with numpy — turns each rice unary
    scan into one searchsorted instead of a per-bit loop."""

    __slots__ = ("data", "pos", "ones")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits
        self.ones = np.flatnonzero(
            np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        )

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        b0, b1 = self.pos >> 3, (end + 7) >> 3
        if b1 > len(self.data):
            raise ValueError("bit stream exhausted")
        chunk = int.from_bytes(self.data[b0:b1], "big")
        v = (chunk >> ((b1 << 3) - end)) & ((1 << n) - 1)
        self.pos = end
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        """Number of 0 bits before the next 1 bit (consumes the 1)."""
        i = int(np.searchsorted(self.ones, self.pos))
        if i >= len(self.ones):
            raise ValueError("unary code ran off the stream")
        one = int(self.ones[i])
        q = one - self.pos
        self.pos = one + 1
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_SR_TABLE = [None, 88_200, 176_400, 192_000, 8_000, 16_000, 22_050,
             24_000, 32_000, 44_100, 48_000, 96_000]
_SS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_coded_number(br: _Bits) -> int:
    """UTF-8-style frame/sample number (1-7 bytes, RFC 9639 §9.1.5)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("bad coded frame number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad coded frame number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _fixed_restore(warm: list[int], res: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-k fixed (polynomial) predictor: the residual is
    the k-th difference of the signal, so reconstruction is k seeded
    cumulative sums — fully vectorized."""
    res = np.asarray(res, dtype=np.int64)
    if order == 0:
        return res
    w = np.asarray(warm, dtype=np.int64)
    seeds = []
    d = w.copy()
    for _ in range(order):
        seeds.append(int(d[-1]))  # Δ^k a at index order-1
        d = np.diff(d)
    x = res
    for k in range(order - 1, -1, -1):
        x = seeds[k] + np.cumsum(x)
    return np.concatenate([w, x])


def _lpc_restore(warm, res, coefs, shift) -> np.ndarray:
    a = [int(v) for v in warm]
    order = len(coefs)
    cr = [int(c) for c in coefs]
    for r in res:
        pred = 0
        for j in range(order):
            pred += cr[j] * a[-1 - j]
        a.append(int(r) + (pred >> shift))
    return np.asarray(a, dtype=np.int64)


def _decode_residual(br: _Bits, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if bs % nparts or (bs >> porder) <= order:
        raise ValueError("invalid rice partition order")
    out = np.empty(bs - order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                out[w : w + cnt] = 0
            else:
                for i in range(cnt):
                    out[w + i] = br.read_signed(raw)
        else:
            mask = (1 << param) - 1
            for i in range(cnt):
                q = br.unary()
                u = (q << param) | (br.read(param) if param else 0)
                out[w + i] = (u >> 1) ^ -(u & 1)  # zigzag
        w += cnt
    return out


def _decode_subframe(br: _Bits, bs: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
        bps -= wasted
    if t == 0:  # CONSTANT
        x = np.full(bs, br.read_signed(bps), dtype=np.int64)
    elif t == 1:  # VERBATIM
        x = np.fromiter(
            (br.read_signed(bps) for _ in range(bs)), np.int64, count=bs
        )
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        x = _fixed_restore(warm, _decode_residual(br, bs, order), order)
    elif t >= 32:  # LPC order 1-32
        order = (t & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid qlp coefficient precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative qlp shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        x = _lpc_restore(warm, _decode_residual(br, bs, order), coefs, shift)
    else:
        raise ValueError(f"reserved subframe type {t}")
    return x << wasted if wasted else x


def _decode_frame(br: _Bits, info: dict) -> np.ndarray:
    start = br.pos >> 3
    if br.read(14) != 0x3FFE:
        raise ValueError("bad frame sync code")
    if br.read(1):
        raise ValueError("reserved frame-header bit set")
    br.read(1)  # blocking strategy
    bs_code = br.read(4)
    sr_code = br.read(4)
    ca = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise ValueError("reserved frame-header bit set")
    _read_coded_number(br)
    if bs_code == 0:
        raise ValueError("reserved block size code")
    elif bs_code == 1:
        bs = 192
    elif bs_code <= 5:
        bs = 576 << (bs_code - 2)
    elif bs_code == 6:
        bs = br.read(8) + 1
    elif bs_code == 7:
        bs = br.read(16) + 1
    else:
        bs = 256 << (bs_code - 8)
    if sr_code < 12:
        pass  # streaminfo / common table — informational only here
    elif sr_code == 12:
        br.read(8)
    elif sr_code in (13, 14):
        br.read(16)
    else:
        raise ValueError("invalid sample rate code")
    if ss_code == 0:
        bps = info["bps"]
    elif ss_code in _SS_TABLE:
        bps = _SS_TABLE[ss_code]
    else:
        raise ValueError("reserved sample size code")
    hdr_end = br.pos >> 3
    crc = br.read(8)
    if _crc8(br.data[start:hdr_end]) != crc:
        raise ValueError("frame header CRC-8 mismatch")

    if ca <= 7:
        n_ch = ca + 1
        if n_ch != info["channels"]:
            raise ValueError("frame channel count != STREAMINFO")
        out = np.stack(
            [_decode_subframe(br, bs, bps) for _ in range(n_ch)], axis=1
        )
    elif ca in (8, 9, 10):
        if info["channels"] != 2:
            raise ValueError("stereo decorrelation in non-stereo stream")
        if ca == 8:  # left/side
            left = _decode_subframe(br, bs, bps)
            side = _decode_subframe(br, bs, bps + 1)
            right = left - side
        elif ca == 9:  # right/side
            side = _decode_subframe(br, bs, bps + 1)
            right = _decode_subframe(br, bs, bps)
            left = right + side
        else:  # mid/side
            mid = _decode_subframe(br, bs, bps)
            side = _decode_subframe(br, bs, bps + 1)
            m2 = (mid << 1) | (side & 1)
            left = (m2 + side) >> 1
            right = (m2 - side) >> 1
        out = np.stack([left, right], axis=1)
    else:
        raise ValueError("reserved channel assignment")
    br.align()
    body_end = br.pos >> 3
    crc16 = br.read(16)
    if _crc16(br.data[start:body_end]) != crc16:
        raise ValueError("frame CRC-16 mismatch")
    return out


def decode_flac(buf: bytes) -> tuple[int, np.ndarray]:
    """FLAC bytes -> (sample_rate, samples[n, channels] float64 in
    [-1, 1]); decoding is bit-exact, scaling is 2^(bps-1) (matching
    decode_wav's PCM convention)."""
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info = None
    while pos + 4 <= len(buf):
        hdr = buf[pos]
        length = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + length]
        if hdr & 0x7F == 0:  # STREAMINFO
            if length < 34:
                raise ValueError("short STREAMINFO")
            v = int.from_bytes(body[10:18], "big")
            info = {
                "sr": (v >> 44) & 0xFFFFF,
                "channels": ((v >> 41) & 0x7) + 1,
                "bps": ((v >> 36) & 0x1F) + 1,
                "total": v & 0xFFFFFFFFF,
            }
        pos += 4 + length
        if hdr & 0x80:  # last metadata block
            break
    if info is None:
        raise ValueError("missing STREAMINFO block")
    br = _Bits(buf, pos << 3)
    chunks = []
    got = 0
    while (br.pos >> 3) < len(buf) and (
        info["total"] == 0 or got < info["total"]
    ):
        frame = _decode_frame(br, info)
        chunks.append(frame)
        got += frame.shape[0]
    x = np.concatenate(chunks, axis=0)
    if info["total"]:
        x = x[: info["total"]]
    return info["sr"], x.astype(np.float64) / float(1 << (info["bps"] - 1))


# ---------------------------------------------------------------------------
# encoder (fixture/round-trip companion)
# ---------------------------------------------------------------------------

class _BitW:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int):
        if n == 0:
            return
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def unary(self, q: int):
        self.write(1, q + 1)  # q zeros then a 1

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)


def _best_rice_param(u: np.ndarray, cnt: int, pmax: int) -> tuple[int, int]:
    """Exact (param, cost-in-bits) minimization over 0..pmax
    (u = zigzagged magnitudes)."""
    best, best_cost = 0, None
    for p in range(pmax + 1):
        cost = int(np.sum(u >> p)) + cnt * (p + 1)
        if best_cost is None or cost < best_cost:
            best, best_cost = p, cost
    return best, best_cost


def _enc_residual(w: _BitW, res: np.ndarray, order: int, bs: int,
                  partition_order: int, force_escape: bool):
    # method 0 (4-bit params, escape 15) unless any partition needs a
    # larger parameter or a >31-bit escape — then rice2 (5-bit params)
    u_all = np.where(res >= 0, res << 1, (-res << 1) - 1).astype(np.int64)
    p14, _ = _best_rice_param(u_all, max(len(res), 1), 30)
    raw_all = int(np.max(np.abs(res), initial=0)).bit_length() + 1
    method = 1 if (p14 > 14 or raw_all > 31) else 0
    pbits = 4 + method
    escape = (1 << pbits) - 1
    w.write(method, 2)
    w.write(partition_order, 4)
    nparts = 1 << partition_order
    pos = 0
    for p in range(nparts):
        cnt = (bs >> partition_order) - (order if p == 0 else 0)
        part = res[pos : pos + cnt]
        pos += cnt
        raw = max(2, int(np.max(np.abs(part), initial=0)).bit_length() + 1)
        u = np.where(part >= 0, part << 1, (-part << 1) - 1).astype(np.int64)
        param, rice_cost = _best_rice_param(u, cnt, escape - 1)
        if (force_escape or rice_cost > 5 + cnt * raw) and raw <= 31:
            w.write(escape, pbits)
            w.write(raw, 5)
            for v in part:
                w.write(int(v), raw)
            continue
        w.write(param, pbits)
        mask = (1 << param) - 1
        for uv in u:
            uv = int(uv)
            w.unary(uv >> param)
            if param:
                w.write(uv & mask, param)


def _wasted_bits(x: np.ndarray) -> int:
    orv = int(np.bitwise_or.reduce(np.abs(x)))
    if orv == 0:
        return 0
    return (orv & -orv).bit_length() - 1


def _quantize_lpc(coefs: np.ndarray, prec: int) -> tuple[list[int], int]:
    cmax = float(np.max(np.abs(coefs)))
    if cmax <= 0:
        return [0] * len(coefs), 0
    shift = prec - 2 - max(0, int(np.ceil(np.log2(cmax))))
    shift = max(0, min(15, shift))
    lo, hi = -(1 << (prec - 1)), (1 << (prec - 1)) - 1
    q = np.clip(np.rint(coefs * (1 << shift)), lo, hi).astype(np.int64)
    return [int(v) for v in q], shift


def _enc_subframe(w: _BitW, x: np.ndarray, bps: int, mode: str,
                  fixed_order: int, partition_order: int,
                  force_escape: bool, lpc_order: int):
    bs = len(x)
    const = bool(np.all(x == x[0]))
    if mode == "auto":
        mode = "constant" if const else "fixed"
    wasted = 0
    if mode in ("fixed", "lpc") and not const:
        wasted = _wasted_bits(x)
        if wasted:
            x = x >> wasted
    eff = bps - wasted

    def header(t: int):
        w.write(0, 1)
        w.write(t, 6)
        if wasted:
            w.write(1, 1)
            w.unary(wasted - 1)
        else:
            w.write(0, 1)

    if mode == "constant":
        if not const:
            raise ValueError("constant subframe on non-constant data")
        header(0)
        w.write(int(x[0]), eff)
    elif mode == "verbatim":
        header(1)
        for v in x:
            w.write(int(v), eff)
    elif mode == "fixed":
        order = min(fixed_order, bs - 1, 4)
        # decoder requires bs % 2^po == 0 and bs >> po > order
        while partition_order and (
            bs % (1 << partition_order) or (bs >> partition_order) <= order
        ):
            partition_order -= 1
        if (bs >> partition_order) <= order:
            order = max(0, (bs >> partition_order) - 1)
        header(8 + order)
        for v in x[:order]:
            w.write(int(v), eff)
        res = np.diff(x, n=order) if order else x
        _enc_residual(w, res, order, bs, partition_order, force_escape)
    elif mode == "lpc":
        if bs < 2:  # an order-1 LPC needs at least one residual sample
            header(1)
            for v in x:
                w.write(int(v), eff)
            return
        order = max(1, min(lpc_order or 4, bs - 1, 32))
        while partition_order and (
            bs % (1 << partition_order) or (bs >> partition_order) <= order
        ):
            partition_order -= 1
        if (bs >> partition_order) <= order:
            order = max(1, (bs >> partition_order) - 1)
        prec = 12
        win = np.lib.stride_tricks.sliding_window_view(
            x[:-1].astype(np.float64), order
        )
        tgt = x[order:].astype(np.float64)
        sol, *_ = np.linalg.lstsq(win, tgt, rcond=None)
        coefs, shift = _quantize_lpc(sol[::-1], prec)  # c_j multiplies x[i-1-j]
        header(32 + order - 1)
        for v in x[:order]:
            w.write(int(v), eff)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for cq in coefs:
            w.write(cq, prec)
        iw = np.lib.stride_tricks.sliding_window_view(x[:-1], order)
        pred = iw @ np.asarray(coefs[::-1], dtype=np.int64)
        res = x[order:] - (pred >> shift)
        _enc_residual(w, res, order, bs, partition_order, force_escape)
    else:
        raise ValueError(f"unknown subframe mode {mode!r}")


_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16_000,
    bps: int = 16,
    block_size: int = 4096,
    subframe: str = "auto",
    fixed_order: int = 2,
    stereo: str = "independent",
    partition_order: int = 0,
    force_escape: bool = False,
    lpc_order: int = 0,
) -> bytes:
    """[n] or [n, channels] float in [-1, 1] (or integer PCM at
    ``bps``) -> FLAC bytes. ``subframe``: auto | constant | verbatim |
    fixed | lpc; ``stereo``: independent | left_side | right_side |
    mid_side (2-channel input only). Lossless: decode_flac returns the
    exact PCM."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if np.issubdtype(a.dtype, np.floating):
        full = float((1 << (bps - 1)) - 1)
        pcm = np.clip(
            np.rint(a * full), -(1 << (bps - 1)), (1 << (bps - 1)) - 1
        ).astype(np.int64)
    else:
        pcm = a.astype(np.int64)
    n, n_ch = pcm.shape
    if bps not in _SS_CODE:
        raise ValueError(f"unsupported bits per sample: {bps}")
    if stereo != "independent" and n_ch != 2:
        raise ValueError("stereo decorrelation needs 2 channels")

    out = bytearray(b"fLaC")
    si = _BitW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.buf.extend(b"\x00" * 16)  # md5 unknown (spec-permitted)
    out += bytes([0x80]) + struct.pack(">I", 34)[1:] + bytes(si.buf)

    for fi, start in enumerate(range(0, n, block_size)):
        blk = pcm[start : start + block_size]
        bs = blk.shape[0]
        w = _BitW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking strategy (frame numbers)
        w.write(7, 4)  # uncommon 16-bit block size (always valid)
        w.write(0, 4)  # sample rate from STREAMINFO
        ca = {"independent": n_ch - 1, "left_side": 8,
              "right_side": 9, "mid_side": 10}[stereo]
        w.write(ca, 4)
        w.write(_SS_CODE[bps], 3)
        w.write(0, 1)
        # UTF-8 coded frame number
        if fi < 0x80:
            w.write(fi, 8)
        elif fi < 0x800:
            w.write(0xC0 | (fi >> 6), 8)
            w.write(0x80 | (fi & 0x3F), 8)
        else:
            w.write(0xE0 | (fi >> 12), 8)
            w.write(0x80 | ((fi >> 6) & 0x3F), 8)
            w.write(0x80 | (fi & 0x3F), 8)
        w.write(bs - 1, 16)
        hdr = bytes(w.buf)
        w.write(_crc8(hdr), 8)

        po = partition_order if bs % (1 << partition_order) == 0 else 0
        kw = dict(fixed_order=fixed_order, partition_order=po,
                  force_escape=force_escape, lpc_order=lpc_order)
        if stereo == "independent":
            for c in range(n_ch):
                _enc_subframe(w, blk[:, c], bps, subframe, **kw)
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right
            if stereo == "left_side":
                _enc_subframe(w, left, bps, subframe, **kw)
                _enc_subframe(w, side, bps + 1, subframe, **kw)
            elif stereo == "right_side":
                _enc_subframe(w, side, bps + 1, subframe, **kw)
                _enc_subframe(w, right, bps, subframe, **kw)
            else:  # mid/side
                mid = (left + right) >> 1
                _enc_subframe(w, mid, bps, subframe, **kw)
                _enc_subframe(w, side, bps + 1, subframe, **kw)
        w.align()
        body = bytes(w.buf)
        w.write(_crc16(body), 16)
        out += bytes(w.buf)
    return bytes(out)
