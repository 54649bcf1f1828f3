"""Viola–Jones Haar cascade: XML parsing, integral-image evaluation,
planted-rectangle detection, escalating retry, detect_crop wiring.

The fixture cascade (tests/fixtures/tiny_cascade.xml, hand-crafted in
the published OpenCV BOOST/HAAR layout) fires on a dark square centered
in a lighter 12x12 window; both stages use the center-surround feature
whole(+1) - 4*center(-4), so a flat window scores exactly 0 against
node thresholds 0.8/1.2 and is rejected.
"""

import os

import numpy as np
import pytest

from protosc_spark.haar import (
    HaarCascade,
    _integrals,
    detect_multiscale,
    load_cascade_xml,
    search_object,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_cascade.xml")


def _planted(h=60, w=80, cx=40, cy=30, size=12, bg=200, fg=20):
    """Light background with a dark size x size square centered at
    (cx, cy) — the pattern the fixture cascade detects."""
    img = np.full((h, w), bg, dtype=np.float64)
    half = size // 2
    img[cy - half : cy + half, cx - half : cx + half] = fg
    return img


def test_parse_fixture_cascade():
    c = load_cascade_xml(FIXTURE)
    assert isinstance(c, HaarCascade)
    assert (c.window_w, c.window_h) == (12, 12)
    assert len(c.stages) == 2 and len(c.features) == 2
    fi, nthr, left, right = c.stages[0].stumps[0]
    assert (fi, left, right) == (0, -1.0, 1.0)
    assert abs(nthr - 0.8) < 1e-12
    assert c.features[0] == ((0, 0, 12, 12, 1.0), (3, 3, 6, 6, -4.0))


def test_integral_images_hand_checked():
    img = np.arange(6, dtype=np.float64).reshape(2, 3)
    ii, ii2 = _integrals(img)
    assert ii.shape == (3, 4)
    assert ii[2, 3] == img.sum()
    assert ii2[2, 3] == (img * img).sum()
    # rect sum of img[0:2, 1:3] via the 4-corner identity
    assert ii[2, 3] - ii[0, 3] - ii[2, 1] + ii[0, 1] == img[0:2, 1:3].sum()


def test_detects_planted_square_rejects_flat():
    c = load_cascade_xml(FIXTURE)
    img = _planted()
    faces = detect_multiscale(
        img, c, scale_factor=1.3, min_neighbors=1, min_size=10
    )
    assert len(faces) >= 1
    # best detection covers the planted square's center (40, 30)
    covered = [
        (x, y, w, h)
        for x, y, w, h in faces
        if x <= 40 <= x + w and y <= 30 <= y + h
    ]
    assert covered, f"no detection covers the planted center: {faces}"

    flat = np.full((60, 80), 127.0)
    assert len(detect_multiscale(flat, c, min_neighbors=1, min_size=10)) == 0


def test_min_neighbors_grouping():
    """The planted square yields a cluster of overlapping raw hits; a
    sane min_neighbors keeps it, an absurd one (more neighbors than raw
    hits exist) drops everything."""
    c = load_cascade_xml(FIXTURE)
    img = _planted()
    some = detect_multiscale(img, c, min_neighbors=2, min_size=10)
    assert len(some) >= 1
    none = detect_multiscale(img, c, min_neighbors=10_000, min_size=10)
    assert len(none) == 0


def test_search_object_escalating_retry_and_failure():
    """search_object retries with shrinking scale steps (reference
    _search_face contract) and raises the reference's error when no
    setting ever fires."""
    c = load_cascade_xml(FIXTURE)
    # detectable image: retry finds it even though the first
    # scale_factor (1.8) pyramid is coarse
    faces = search_object(_planted(), [c], min_neighbors=1, min_size=10)
    assert len(faces) >= 1
    with pytest.raises(ValueError, match="Cannot find face"):
        search_object(np.full((60, 80), 127.0), [c], min_size=10)


def test_detect_crop_real_cascade_path():
    """detect_crop(cascade=...) runs the real detector end to end:
    margin arithmetic + nearest resize on the detected box, 3-D shape
    contract preserved."""
    from protosc_spark.visual import detect_crop

    img = _planted()[:, :, None]  # (h, w, 1) like the engine's frames
    out = detect_crop(
        img, add_perc=20, out_size=16, cascade=FIXTURE,
        min_neighbors=1, min_size=10,
    )
    assert out.shape == (16, 16, 1)
    # the crop is centered on the dark square: its minimum is the
    # planted foreground value
    assert out.min() == 20.0
    # stand-in path unchanged (the gate's deterministic contract)
    legacy = detect_crop(img, add_perc=20, out_size=16)
    assert legacy.shape == (16, 16, 1)
