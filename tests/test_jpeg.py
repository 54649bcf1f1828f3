"""Baseline JPEG codec (protosc_spark.jpeg): spec conformance via a
HAND-BUILT byte stream (independent of the encoder), exact round trips
for DC-only content, bounded quantization error for general content,
restart markers, and the Spark decode_images(codec='jpeg') path."""

import struct

import numpy as np
import pytest

from protosc_spark.jpeg import (
    ZZ,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_lossless,
    encode_jpeg_progressive,
)


def _handmade_dc_only_jpeg() -> bytes:
    """8x8 grey, every pixel 130, built byte-by-byte from T.81:
    quant steps all 8 -> level-shifted value 2 -> DC coefficient
    8*2=16 -> quantized 2 (category 2, bits '10'). Huffman DC table:
    single symbol 2 at code length 1 (code '0'); AC table: single
    symbol EOB (0x00) at code '0'. Entropy bits: 0 10 0 + 1-padding
    = 0b01001111 = 0x4F."""
    out = bytearray(b"\xff\xd8")
    # DQT: table 0, 8-bit, all steps 8 (zigzag order of a flat table
    # is the flat table)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([8] * 64)
    # SOF0: 8-bit, 8x8, 1 component (id 1, 1x1 sampling, qt 0)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT class 0 (DC) id 0: one code of length 1 -> symbol 2
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1)
    out += bytes([0x00]) + bytes([1] + [0] * 15) + bytes([2])
    # DHT class 1 (AC) id 0: one code of length 1 -> symbol 0x00 (EOB)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1)
    out += bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0])
    # SOS: 1 component, DC table 0 / AC table 0, Ss=0 Se=63 AhAl=0
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bytes([0x4F])
    out += b"\xff\xd9"
    return bytes(out)


def test_decoder_against_handmade_spec_stream():
    img = decode_jpeg(_handmade_dc_only_jpeg())
    assert img.shape == (8, 8, 1)
    assert (img == 130).all()


def test_zigzag_is_the_published_sequence():
    """First and last entries of T.81's zigzag order, transcribed from
    the spec figure — pins the derived construction."""
    assert list(ZZ[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(ZZ[-6:]) == [61, 54, 47, 55, 62, 63]
    assert sorted(ZZ) == list(range(64))


@pytest.mark.parametrize("v", [0, 1, 37, 128, 200, 255])
def test_constant_blocks_roundtrip_exactly(v):
    """DC quantization step 8 divides the DC coefficient 8*(v-128)
    exactly, so constant blocks are bit-exact through the lossy path —
    the property the gate oracle keys on."""
    img = np.full((8, 8), v, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == (8, 8, 1)
    assert (dec[:, :, 0] == v).all()


def test_dc_prediction_chain_across_blocks():
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 10, 200, 130, 55
    dec = decode_jpeg(encode_jpeg(img))[:, :, 0]
    assert (dec == img).all()


def test_general_grey_roundtrip_error_bounded():
    """Non-multiple-of-8 dims (edge-replication padding + crop);
    reconstruction error bounded by the quantization step."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (24, 17)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img))[:, :, 0]
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 16 and err.mean() < 4


def test_near_lossless_at_unit_quant():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, q=np.ones((8, 8))))[:, :, 0]
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_rgb_roundtrip_error_bounded():
    x, y = np.meshgrid(np.arange(40), np.arange(30))
    img = np.stack(
        [x * 5 % 256, y * 7 % 256, (x + y) * 3 % 256], axis=-1
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 16 and err.mean() < 3


def test_byte_stuffing_survives_ff_bytes_in_entropy_stream():
    """An image whose entropy stream necessarily contains 0xFF bytes
    (high-entropy content) must decode — exercises 0xFF00 stuffing in
    both writer and reader."""
    rng = np.random.default_rng(7)
    for _ in range(5):
        img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        blob = encode_jpeg(img, q=np.ones((8, 8)))
        dec = decode_jpeg(blob)[:, :, 0]
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_restart_markers_and_dri():
    """Inject DRI + RSTn into a handmade 2-MCU stream: predictors
    reset at the restart, so both blocks carry ABSOLUTE DC values."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([8] * 64)
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI: every 1 MCU
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1)
    out += bytes([0x00]) + bytes([1] + [0] * 15) + bytes([2])
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1)
    out += bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bytes([0x4F])  # MCU 0: DC diff +2 -> value 130
    out += b"\xff\xd0"  # RST0 (resets the DC predictor)
    out += bytes([0x4F])  # MCU 1: same bits -> ALSO 130 (not 132)
    out += b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    assert img.shape == (8, 16, 1)
    assert (img == 130).all()


def test_unsupported_sof_raises_with_documented_boundary():
    """Arithmetic-coded SOFs stay behind the documented boundary;
    every Huffman process (SOF0-3, SOF5-7) is now real."""
    blob = bytearray(encode_jpeg(np.full((8, 8), 9, dtype=np.uint8)))
    idx = blob.find(b"\xff\xc0")
    for marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
        blob[idx + 1] = marker
        with pytest.raises(NotImplementedError, match="arithmetic"):
            decode_jpeg(bytes(blob))


# ---------------------------------------------------------------------------
# lossless (SOF3)
# ---------------------------------------------------------------------------


def _handmade_lossless_jpeg() -> bytes:
    """2x2 grey, every pixel 130, lossless predictor 1, built
    byte-by-byte from T.81 Annex H — independent of the encoder.
    Sample order: (0,0) predicts 128 (default 2^(P-1)), diff 2
    (category 2, bits '10'); the rest predict their neighbour, diff 0
    (category 0). Huffman table {0, 2} at length 2: '00'->0, '01'->2.
    Bits: 01 10 00 00 00 + 1-padding -> 0x60 0x3F."""
    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", 8, 2, 2, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 2)
    out += bytes([0x00]) + bytes([0, 2] + [0] * 14) + bytes([0, 2])
    sos = bytes([1, 1, 0x00, 1, 0, 0])  # Ss=predictor 1, Se=0, AhAl=0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bytes([0x60, 0x3F])
    out += b"\xff\xd9"
    return bytes(out)


def test_lossless_decoder_against_handmade_spec_stream():
    img = decode_jpeg(_handmade_lossless_jpeg())
    assert img.shape == (2, 2, 1)
    assert (img == 130).all()


@pytest.mark.parametrize("pred", list(range(1, 8)))
def test_lossless_roundtrip_all_predictors(pred):
    rng = np.random.default_rng(pred)
    img = rng.integers(0, 256, (24, 17)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_lossless(img, predictor=pred))
    assert np.array_equal(dec[:, :, 0], img)


def test_lossless_point_transform_drops_low_bits():
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_lossless(img, predictor=4, pt=2))
    assert np.array_equal(dec[:, :, 0], (img >> 2) << 2)


@pytest.mark.parametrize("shape", [(1, 9), (9, 1), (1, 1), (200, 3)])
def test_lossless_degenerate_shapes(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_lossless(img))
    assert np.array_equal(dec[:, :, 0], img)


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------


def _handmade_progressive_dc_jpeg() -> bytes:
    """8x8 grey, every pixel 130, progressive, built byte-by-byte from
    T.81 Annex G — INDEPENDENT of encode_jpeg_progressive. Quantized
    DC = 2 (as in the baseline handmade stream). Scan 1 (DC first,
    Al=1): sends DC>>1 = 1 as diff 1 — category 1 (code '0'),
    magnitude bit '1' -> 0b01 + 1-padding = 0x7F. Scan 2 (DC refine,
    Al=0): one raw bit, bit0 of 2 = '0' -> 0x7F. No AC scans (all AC
    coefficients stay zero)."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([8] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT class 0 id 0: one code of length 1 -> symbol 1 (category 1)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1)
    out += bytes([0x00]) + bytes([1] + [0] * 15) + bytes([1])
    # scan 1: DC first, Ss=0 Se=0 Ah=0 Al=1
    sos = bytes([1, 1, 0x00, 0, 0, 0x01])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bytes([0x7F])
    # scan 2: DC refinement, Ss=0 Se=0 Ah=1 Al=0 (no Huffman table)
    sos = bytes([1, 1, 0x00, 0, 0, 0x10])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bytes([0x7F])
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_decoder_against_handmade_spec_stream():
    img = decode_jpeg(_handmade_progressive_dc_jpeg())
    assert img.shape == (8, 8, 1)
    assert (img == 130).all()


@pytest.mark.parametrize("v", [0, 1, 37, 128, 200, 255])
def test_progressive_constant_blocks_roundtrip_exactly(v):
    img = np.full((8, 8), v, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_progressive(img))
    assert dec.shape == (8, 8, 1)
    assert (dec[:, :, 0] == v).all()


@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (24, 17), (40, 33)])
def test_progressive_grey_decodes_identically_to_baseline(shape):
    """Progressive and baseline encodings share the quantizer, so
    decoding both must give IDENTICAL pixels — pins all four scan
    kinds (DC first/refine, AC first with EOB runs, AC refine)
    against the independently-tested sequential path."""
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(base, prog)


def test_progressive_rgb_decodes_identically_to_baseline():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (30, 41, 3)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img)),
        decode_jpeg(encode_jpeg_progressive(img)),
    )


def test_progressive_sparse_image_exercises_eob_runs():
    """Mostly-flat image -> most blocks end in long EOB runs (and the
    AC-refine correction-bit deferral across the run); a few hot
    pixels plant nonzero ACs mid-run."""
    img = np.full((48, 48), 100, dtype=np.uint8)
    img[5, 7], img[20, 33], img[41, 2] = 255, 0, 180
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(base, prog)


def test_progressive_unit_quant_near_lossless():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_progressive(img, q=np.ones((8, 8))))
    err = np.abs(dec[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 1


def test_spark_decode_images_handles_progressive_blobs(spark):
    """decode_images(codec='jpeg') accepts a MIX of sequential and
    progressive blobs in one pass (format sniffed per row from SOF)."""
    from protosc_spark.multimodal import decode_images

    rng = np.random.default_rng(9)
    rows, expect = [], {}
    for i in range(4):
        img = rng.integers(0, 256, (16, 8 + i)).astype(np.uint8)
        blob = (encode_jpeg(img) if i % 2 == 0
                else encode_jpeg_progressive(img))
        expect[str(i)] = decode_jpeg(blob).astype(np.float64).ravel()
        rows.append(
            (str(i), bytearray(blob),
             {"width": 8 + i, "height": 16, "channels": 1})
        )
    df = spark.createDataFrame(
        rows,
        "media_id string, data binary, "
        "meta struct<width:int,height:int,channels:int>",
    )
    got = decode_images(df, codec="jpeg").collect()
    assert len(got) == 4
    for r in got:
        assert np.array_equal(np.array(r["pixels"]), expect[r["media_id"]])


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n")


def test_spark_decode_images_jpeg_path(spark):
    """decode_images(codec='jpeg'): dims from the blob's SOF, pixel
    payload matches the local decode exactly."""
    from protosc_spark.multimodal import decode_images

    rng = np.random.default_rng(3)
    rows = []
    imgs = {}
    for i in range(6):
        img = rng.integers(0, 256, (16, 8 + i)).astype(np.uint8)
        imgs[str(i)] = img
        rows.append(
            (str(i), bytearray(encode_jpeg(img)),
             {"width": 8 + i, "height": 16, "channels": 1})
        )
    df = spark.createDataFrame(
        rows,
        "media_id string, data binary, "
        "meta struct<width:int,height:int,channels:int>",
    )
    got = decode_images(df, codec="jpeg").collect()
    assert len(got) == 6
    for r in got:
        img = imgs[r["media_id"]]
        assert (r["height"], r["width"], r["channels"]) == (
            img.shape[0], img.shape[1], 1,
        )
        local = decode_jpeg(encode_jpeg(img)).astype(np.float64).ravel()
        assert np.array_equal(np.array(r["pixels"]), local)


def test_handmade_420_chroma_subsampled_stream():
    """16x16 4:2:0 YCbCr stream built by hand (the encoder is 4:4:4-
    only, so this pins the subsampled-MCU layout + replication
    upsample independently): Y=130 constant (4 Y blocks per MCU, DC
    chain 2,0,0,0), Cb=Cr=128 (zero DC) -> RGB all 130."""
    bits = []

    def put(s):
        bits.extend(int(c) for c in s)

    # DC lum table: vals [2, 0] at length 2 -> '00'->2, '01'->0
    # AC lum/chroma + DC chroma: single '0' codes
    put("00"); put("10"); put("0")      # Y1: DC sym2 val 2, EOB
    for _ in range(3):
        put("01"); put("0")             # Y2..Y4: DC diff 0, EOB
    for _ in range(2):
        put("0"); put("0")              # Cb, Cr: DC 0, EOB
    while len(bits) % 8:
        bits.append(1)                  # 1-padding
    payload = bytes(
        int("".join(map(str, bits[i : i + 8])), 2)
        for i in range(0, len(bits), 8)
    )

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([8] * 64)
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0])  # Y: 2x2 sampling
    sof += bytes([2, 0x11, 0])  # Cb: 1x1
    sof += bytes([3, 0x11, 0])  # Cr: 1x1
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 2)
    out += bytes([0x00]) + bytes([0, 2] + [0] * 14) + bytes([2, 0])
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1)
    out += bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0])
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1)
    out += bytes([0x01]) + bytes([1] + [0] * 15) + bytes([0])
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1)
    out += bytes([0x11]) + bytes([1] + [0] * 15) + bytes([0])
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += payload
    out += b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    assert img.shape == (16, 16, 3)
    assert (img == 130).all()


# --- hierarchical (T.81 Annex J: DHP / EXP / SOF5 / SOF7) ---


def _handmade_hierarchical_jpeg() -> bytes:
    """16x16 grey built byte-by-byte from T.81 Annex J, independent of
    the encoder: DHP(16x16), an 8x8 SOF0 first frame of constant 130
    (the _handmade_dc_only_jpeg construction), EXP expanding the
    reference 2x in both dims (constant stays constant through the
    interpolation filter), then an SOF5 differential frame whose
    top-left block carries DC coefficient +4 (dequant 32 -> +4 per
    pixel after IDCT) and whose other three blocks are zero.
    Expected: top-left 8x8 = 134, rest 130."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([8] * 64)
    # DHP: SOF syntax, full dims 16x16
    dhp = struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xde" + struct.pack(">H", 2 + len(dhp)) + dhp
    # first frame: 8x8 constant 130 (DC sym 2, bits '10', EOB) ------
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1)
    out += bytes([0x00]) + bytes([1] + [0] * 15) + bytes([2])
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1)
    out += bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bytes([0x4F])
    # EXP: expand reference 2x horizontally and vertically ----------
    out += b"\xff\xdf" + struct.pack(">H", 3) + bytes([0x11])
    # differential frame: DC table {0 -> '0', 3 -> '10'}, AC = EOB
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 2)
    out += bytes([0x00]) + bytes([1, 1] + [0] * 14) + bytes([0, 3])
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1)
    out += bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0])
    sof5 = struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc5" + struct.pack(">H", 2 + len(sof5)) + sof5
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    # block0: DC sym 3 ('10') + '100' (+4) + EOB ('0');
    # blocks 1..3: DC sym 0 ('0') + EOB ('0'); pad with 1s
    # -> 10 100 0 00 00 00 + 1111 = 0xA0 0x0F
    out += bytes([0xA0, 0x0F])
    out += b"\xff\xd9"
    return bytes(out)


def test_hierarchical_decoder_against_handmade_spec_stream():
    img = decode_jpeg(_handmade_hierarchical_jpeg())
    assert img.shape == (16, 16, 1)
    p = img[:, :, 0]
    assert (p[:8, :8] == 134).all()
    assert (p[:8, 8:] == 130).all()
    assert (p[8:, :] == 130).all()


def test_expand_ref_is_the_spec_interpolation_filter():
    from protosc_spark.jpeg import _expand_ref

    r = np.array([[0, 10]], dtype=np.int64)
    # P(2x)=R(x), P(2x+1)=(R(x)+R(x+1)+1)>>1, edge replicated
    assert _expand_ref(r, 1, 0).tolist() == [[0, 5, 10, 10]]
    c = np.array([[3], [8]], dtype=np.int64)
    assert _expand_ref(c, 0, 1).tolist() == [[3], [6], [8], [8]]


@pytest.mark.parametrize("v", [0, 77, 128, 255])
def test_hierarchical_constant_roundtrip_exact(v):
    from protosc_spark.jpeg import encode_jpeg_hierarchical

    img = np.full((16, 16), v, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_hierarchical(img))
    assert np.array_equal(out[:, :, 0], img)


@pytest.mark.parametrize("shape", [(16, 16), (24, 31), (8, 8), (17, 9)])
def test_hierarchical_lossless_roundtrip_bit_exact(shape):
    """SOF7 differential-lossless final stage: arbitrary content is
    exact regardless of first-stage quantization loss."""
    from protosc_spark.jpeg import encode_jpeg_hierarchical

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_hierarchical(img, lossless=True))
    assert np.array_equal(out[:, :, 0], img)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 7])
def test_hierarchical_dct_differential_bounded_error(seed):
    """SOF5 unit-quantized difference stage: within IDCT integer
    rounding (|err| <= 1) on arbitrary content — INCLUDING forced
    0/255 pixels, where an unsigned mod-2^16 reconstruction would
    wrap a -1 differential sum to 255 (the bug a single lucky seed
    used to mask)."""
    from protosc_spark.jpeg import encode_jpeg_hierarchical

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (24, 31), dtype=np.uint8)
    img[0, :5] = 0
    img[-1, -5:] = 255
    img[7, 7] = 0
    for kw in ({}, {"progressive": True}):
        out = decode_jpeg(encode_jpeg_hierarchical(img, **kw))[:, :, 0]
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_differential_frame_before_dhp_raises():
    buf = _handmade_hierarchical_jpeg()
    # strip the DHP segment (19 bytes starting at its marker)
    i = buf.index(b"\xff\xde")
    broken = buf[:i] + buf[i + 19 :]
    with pytest.raises(ValueError):
        decode_jpeg(broken)


def _handmade_hierarchical_sof6_jpeg() -> bytes:
    """Same construction as _handmade_hierarchical_jpeg but the
    differential frame is SOF6 (differential PROGRESSIVE) with a
    single DC-first scan (Ss=Se=0, Ah=Al=0), no AC scans: block0
    codes DC +4 directly (no prediction), blocks 1..3 code 0.
    Entropy: '10'+'100' + '0'+'0'+'0' = 0xA0 exactly one byte."""
    buf = bytearray(_handmade_hierarchical_jpeg())
    i = buf.index(b"\xff\xc5")
    buf[i + 1] = 0xC6  # SOF5 -> SOF6
    # rewrite the SOS progression params Ss=0 Se=0 AhAl=0 and the
    # entropy byte: the SOF5 stream's SOS is ...[1,1,0x00,0,63,0]
    j = buf.index(b"\xff\xda", i)
    assert buf[j + 7 : j + 10] == bytes([0, 63, 0])
    buf[j + 8] = 0  # Se: 63 -> 0 (DC scan)
    # entropy was 0xA0 0x0F (DC+EOB per block); DC-only needs 0xA0
    assert buf[j + 10 : j + 12] == bytes([0xA0, 0x0F])
    del buf[j + 11]  # drop the second byte (no AC symbols now)
    return bytes(buf)


def test_hierarchical_sof6_decoder_against_handmade_spec_stream():
    img = decode_jpeg(_handmade_hierarchical_sof6_jpeg())
    assert img.shape == (16, 16, 1)
    p = img[:, :, 0]
    assert (p[:8, :8] == 134).all()
    assert (p[:8, 8:] == 130).all()
    assert (p[8:, :] == 130).all()


@pytest.mark.parametrize("shape", [(16, 16), (24, 31), (17, 9)])
def test_hierarchical_sof6_decodes_identically_to_sof5(shape):
    """The SOF6 scan script carries the same quantized coefficients
    as the SOF5 frame, so both pyramids decode to identical pixels —
    pins the whole differential-progressive reassembly path."""
    from protosc_spark.jpeg import encode_jpeg_hierarchical

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    a = decode_jpeg(encode_jpeg_hierarchical(img))
    b = decode_jpeg(encode_jpeg_hierarchical(img, progressive=True))
    assert np.array_equal(a, b)


@pytest.mark.parametrize("v", [0, 99, 255])
def test_hierarchical_sof6_constant_roundtrip_exact(v):
    from protosc_spark.jpeg import encode_jpeg_hierarchical

    img = np.full((16, 16), v, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_hierarchical(img, progressive=True))
    assert np.array_equal(out[:, :, 0], img)
