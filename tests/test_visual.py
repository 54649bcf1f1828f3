"""Visual operator laws mirroring the reference's own pins
(tests/test_preprocessing.py, tests/test_feature_extraction.py,
tests/test_plotting.py): greyscale idempotence + shape, circle
zeroing, crop contract, fourier/hog width laws, and Spark/numpy
parity of the full visual chain."""

import numpy as np
import pytest

from protosc_spark.multimodal import decode_images, generate_media
from protosc_spark.visual import (
    cut_circle,
    detect_crop,
    fourier_bin_count,
    fourier_features,
    greyscale,
    hog_features,
    hog_width,
    visual_features,
)


def _img(h=20, w=20, c=3, seed=0):
    return np.random.default_rng(seed).uniform(0, 255, (h, w, c))


def test_greyscale_shape_and_idempotence():
    g = greyscale(_img())
    assert g.shape == (20, 20, 1)
    assert np.allclose(greyscale(g), g)  # idempotent
    with pytest.raises(TypeError, match="np.ndarray"):
        greyscale([[1, 2]])


def test_cut_circle_zeroes_corners_keeps_center():
    img = np.ones((21, 21, 1))
    out = cut_circle(img)
    assert out[0, 0, 0] == 0 and out[0, -1, 0] == 0
    assert out[10, 10, 0] == 1 and out[10, 0, 0] == 1
    assert img[0, 0, 0] == 1  # input not mutated


def test_detect_crop_contract():
    out = detect_crop(_img(40, 40, 3), add_perc=20, out_size=16)
    assert out.shape == (16, 16, 3)
    # deterministic
    assert np.allclose(out, detect_crop(_img(40, 40, 3), add_perc=20, out_size=16))


def test_fourier_width_law_and_symmetry():
    # 200x200 with reference defaults (8 angular, 7 spatial) -> 56
    # features, the count the reference pins in tests/test_plotting.py:36
    assert fourier_bin_count((200, 200, 1), 8, 7) == 56
    img = _img(16, 16, 2)
    out = fourier_features(img, n_angular=4, n_spatial=2)
    assert out.shape == (fourier_bin_count(img.shape, 4, 2), 2)
    assert np.all(out >= 0)  # abs of spectrum, summed
    # constant image: all energy at DC -> exactly one nonzero bin
    flat = fourier_features(np.full((16, 16, 1), 7.0), 4, 2)
    assert np.count_nonzero(flat > 1e-9) <= 1


def test_hog_width_law_and_gradient_response():
    # (h//ch)*(w//cw)*orientations — the shape law the reference pins
    # in tests/test_feature_extraction.py:20
    assert hog_width((200, 200, 1), 9, (10, 10)) == 3600
    img = np.zeros((16, 16, 1))
    img[:, 8:, 0] = 255.0  # vertical edge -> horizontal gradient
    out = hog_features(img, orientations=6, cellsize=(4, 4))
    assert out.shape == (16 * 6,)
    per_cell = out.reshape(4, 4, 6)
    # energy only in the columns containing the edge, bin 0 (0 deg)
    assert per_cell[:, 1, 0].sum() > 0 or per_cell[:, 2, 0].sum() > 0
    assert np.allclose(per_cell[:, :, 1:], 0)


def test_spark_visual_chain_matches_numpy_oracle(spark):
    media = generate_media(spark, n=24, kind="image")
    decoded = decode_images(media)
    feats, width = visual_features(decoded, image_shape=(8, 8))
    rows = {r.media_id: np.array(r.vis_features) for r in feats.collect()}
    assert all(len(v) == width for v in rows.values())

    from protosc_spark.multimodal import _fake_pixels
    from protosc_spark.visual import visual_feature_udf  # noqa: F401

    for r in decoded.collect():
        img = np.asarray(r.pixels, dtype=np.float64).reshape(
            r.height, r.width, r.channels
        )
        img = cut_circle(greyscale(img))
        exp = np.concatenate(
            [
                fourier_features(img, 4, 2)[:, 0],
                hog_features(img, 6, (4, 4)),
            ]
        )
        assert np.allclose(rows[r.media_id], exp), r.media_id


def test_spark_visual_deterministic_across_partitioning(spark):
    media = generate_media(spark, n=24, kind="image")
    a, _ = visual_features(decode_images(media))
    b, _ = visual_features(decode_images(media.repartition(7)))
    ra = {r.media_id: tuple(r.vis_features) for r in a.collect()}
    rb = {r.media_id: tuple(r.vis_features) for r in b.collect()}
    assert ra == rb


def test_rgb_to_cielab_primary_colors():
    """Pin against the standard published sRGB->CIELAB values (D65):
    the same numbers skimage.color.rgb2lab produces for the primaries
    (the conversion the reference's SetColorChannels performs,
    protosc/feature_extraction/color_channels.py:30-41)."""
    from protosc_spark.visual import rgb_to_cielab

    img = np.array(
        [[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]],
         [[0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [0.5, 0.5, 0.5]]]
    )
    lab = rgb_to_cielab(img)
    assert np.allclose(lab[0, 0], [100.0, 0.0, 0.0], atol=0.02)
    assert np.allclose(lab[0, 1], [0.0, 0.0, 0.0], atol=0.02)
    assert np.allclose(lab[0, 2], [53.24, 80.09, 67.20], atol=0.05)
    assert np.allclose(lab[1, 0], [87.74, -86.18, 83.18], atol=0.05)
    assert np.allclose(lab[1, 1], [32.30, 79.19, -107.86], atol=0.05)
    # byte-scaled input takes the same path via /255
    lab255 = rgb_to_cielab(img * 255.0)
    assert np.allclose(lab255, lab, atol=1e-9)


def test_set_color_channels_matches_reference_contract():
    from protosc_spark.visual import rgb_to_cielab, set_color_channels

    rng = np.random.default_rng(8)
    img = rng.random((4, 5, 3))
    # empty get_layers keeps everything (reference color_channels.py:38-41)
    assert np.array_equal(set_color_channels(img), img)
    # channel projection
    assert np.array_equal(
        set_color_channels(img, get_layers=[2, 0]), img[:, :, [2, 0]]
    )
    # conversion then projection
    got = set_color_channels(img, convert_to_cielab=True, get_layers=[0])
    assert np.allclose(got[..., 0], rgb_to_cielab(img)[..., 0])
    with pytest.raises(TypeError):
        set_color_channels([1, 2, 3])


def _skimage_hog_loop_oracle(img, orientations, cellsize):
    """Independent SLOW transcription of skimage.feature.hog for the
    reference's exact call (cells_per_block=(1,1), block_norm='L2-Hys',
    multichannel) — per-pixel/per-bin loops written straight from the
    published _hoghistogram.pyx semantics, deliberately sharing no code
    with the vectorized engine kernel. skimage itself is absent from
    this container, so this transcription + the hand-computed fixtures
    below are the parity pins."""
    h, w, n_ch = img.shape
    g_row = np.zeros((h, w, n_ch))
    g_col = np.zeros((h, w, n_ch))
    for ch in range(n_ch):
        g_row[1:-1, :, ch] = img[2:, :, ch] - img[:-2, :, ch]
        g_col[:, 1:-1, ch] = img[:, 2:, ch] - img[:, :-2, ch]
    gr = np.zeros((h, w))
    gc = np.zeros((h, w))
    for r in range(h):
        for c in range(w):
            mags = [
                np.hypot(g_row[r, c, ch], g_col[r, c, ch])
                for ch in range(n_ch)
            ]
            ch = int(np.argmax(mags))
            gr[r, c], gc[r, c] = g_row[r, c, ch], g_col[r, c, ch]
    magnitude = np.hypot(gc, gr)
    orientation = np.rad2deg(np.arctan2(gr, gc)) % 180
    cy, cx = cellsize
    n_cy, n_cx = h // cy, w // cx
    unit = 180.0 / orientations
    hist = np.zeros((n_cy, n_cx, orientations))
    for i in range(orientations):
        start, end = unit * (i + 1), unit * i
        for r_i in range(n_cy):
            for c_i in range(n_cx):
                total = 0.0
                for rr in range(r_i * cy, (r_i + 1) * cy):
                    for cc in range(c_i * cx, (c_i + 1) * cx):
                        o = orientation[rr, cc]
                        if o >= start or o < end:
                            continue
                        total += magnitude[rr, cc]
                hist[r_i, c_i, i] = total / (cy * cx)
    eps = 1e-5
    out = np.zeros_like(hist)
    for r_i in range(n_cy):
        for c_i in range(n_cx):
            blk = hist[r_i, c_i]
            v = blk / np.sqrt(np.sum(blk**2) + eps**2)
            v = np.minimum(v, 0.2)
            out[r_i, c_i] = v / np.sqrt(np.sum(v**2) + eps**2)
    return out.reshape(-1)


def test_hog_matches_skimage_loop_oracle():
    """Vectorized engine HOG == independent loop transcription of the
    skimage algorithm: multi-channel (channel-max votes), odd cell
    sizes, pixels beyond the last full cell ignored."""
    for seed, shape, n_ori, cell in [
        (0, (12, 10, 3), 9, (3, 5)),
        (1, (16, 16, 1), 6, (4, 4)),
        (2, (11, 13, 2), 5, (4, 3)),  # ragged: trailing pixels dropped
    ]:
        img = np.random.default_rng(seed).uniform(0, 255, shape)
        got = hog_features(img, orientations=n_ori, cellsize=cell)
        want = _skimage_hog_loop_oracle(img, n_ori, cell)
        assert got.shape == want.shape == (
            (shape[0] // cell[0]) * (shape[1] // cell[1]) * n_ori,
        )
        assert np.allclose(got, want, atol=1e-12), (seed, shape)


def test_hog_hand_computed_fixtures():
    """Hand-derived exact cases for the skimage semantics."""
    # pure horizontal ramp img[r,c] = c: interior g_col = 2, g_row = 0,
    # orientation 0 -> bin 0; cell mean = 2*2*4/16 = 1.0; L2-Hys of
    # [1,0,0,0] ~ [1,0,0,0] (eps-small deviation)
    ramp = np.tile(np.arange(4.0), (4, 1)).reshape(4, 4, 1)
    out = hog_features(ramp, orientations=4, cellsize=(4, 4))
    assert np.allclose(out, [1.0, 0, 0, 0], atol=1e-4)
    # 45-degree diagonal img[r,c] = r + c, full hand derivation:
    # 4 interior pixels g_row=g_col=2 -> orientation EXACTLY 45, which
    # the boundary rule puts in bin 1 ([45,90)), mag 2*sqrt(2);
    # 4 top/bottom edge pixels g_row=0 -> bin 0, mag 2; 4 left/right
    # edge pixels g_col=0 -> bin 2 (90 deg), mag 2; corners mag 0.
    # hist = [8, 8*sqrt(2), 8, 0]/16; L2 norm = 1 -> clip at 0.2 hits
    # all three -> renorm: 0.2/sqrt(3*0.04) = 1/sqrt(3) each
    diag = (np.arange(4.0)[:, None] + np.arange(4.0)[None, :]).reshape(4, 4, 1)
    out = hog_features(diag, orientations=4, cellsize=(4, 4))
    v = 1 / np.sqrt(3)
    assert np.allclose(out, [v, v, v, 0], atol=1e-6)
    # channel-max vote: channel 1's gradient dominates everywhere, so a
    # 2-channel image scores identically to channel 1 alone
    rng = np.random.default_rng(3)
    weak = rng.uniform(0, 1, (8, 8, 1))
    strong = rng.uniform(0, 255, (8, 8, 1)) * 100
    both = np.concatenate([weak, strong], axis=2)
    assert np.allclose(
        hog_features(both, 6, (4, 4)), hog_features(strong, 6, (4, 4))
    )
