"""Visual preprocessing + feature extractors over decoded images.

Numpy re-derivations of the reference's visual pipeline semantics
(cv2/skimage are not in this container, so the math is implemented
from the published definitions; the codec boundary itself is stubbed
in multimodal.py):

* :func:`greyscale` — BGR luminance weights, keeps the 3-D (h, w, 1)
  shape and is idempotent, TypeError on non-ndarray (reference
  protosc/preprocessing.py:41-48 via cv2.cvtColor).
* :func:`cut_circle` — zero pixels outside the inscribed circle about
  the image center (reference protosc/preprocessing.py:110-125).
* :func:`detect_crop` — the ViolaJones STAND-IN: a deterministic fake
  detector (center box at half the image size) followed by the
  reference's margin arithmetic and a resize to a fixed square
  (reference protosc/preprocessing.py:51-107 — the Haar-cascade search
  itself needs cv2 and is replaced by the fake detector; margin crop +
  fixed-size contract preserved).
* :func:`fourier_features` — fft2(img − channel mean) → fftshift →
  abs → polar coarse-graining summed per (angle, radius) bin inside
  the inscribed circle (reference
  protosc/feature_extraction/fourier_features.py:83-169; the sparse
  matrix is replaced by np.bincount over the same bin ids —
  bin-identical assignment, no scipy).
* :func:`hog_features` — skimage.feature.hog VALUE parity for the
  reference's exact call: per-channel [-1,0,1] gradients with
  channel-max pixel votes, floor orientation binning, per-cell mean
  histograms, L2-Hys 1x1-block normalization, feature count
  (h//ch)·(w//cw)·orientations (reference
  protosc/feature_extraction/hog.py:95-102; algorithm re-derived from
  the published skimage source, values pinned against an independent
  loop transcription in tests).

All are plain numpy kernels so the SAME function runs inside the
Arrow-batched Spark UDF (visual_feature_udf) and in the pandas oracle
used by tests — parity by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

_BGR_WEIGHTS = np.array([0.114, 0.587, 0.299])


def _require_ndarray(img, op: str) -> None:
    if not isinstance(img, np.ndarray):
        raise TypeError(f"{op} needs np.ndarray as input type (not: {type(img)})")


def greyscale(img: np.ndarray) -> np.ndarray:
    """(h, w, c) -> (h, w, 1); idempotent on single-channel input."""
    _require_ndarray(img, "greyscale")
    if img.shape[2] == 1:
        return img
    w = _BGR_WEIGHTS[: img.shape[2]]
    w = w / w.sum()
    # fixed-order scalar sum, NOT a BLAS matmul: BLAS picks SIMD kernels
    # by runtime thread count, giving ~1e-12 drift across executors —
    # which breaks the engine's bitwise determinism-across-parallelism
    # contract (reference pins it in tests/test_parallel.py)
    grey = np.zeros(img.shape[:2])
    for ch in range(img.shape[2]):
        grey += img[:, :, ch] * w[ch]
    return grey.reshape(*grey.shape, 1)


# sRGB -> XYZ (D65, 2-degree observer) — the same published matrix and
# white point skimage.color.rgb2lab uses (reference SetColorChannels,
# protosc/feature_extraction/color_channels.py:30-41, calls
# sk.color.rgb2lab; skimage absent here, so the conversion is
# implemented from the CIE definition directly).
_XYZ_FROM_RGB = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ]
)
_D65_WHITE = np.array([0.95047, 1.0, 1.08883])


def rgb_to_cielab(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) RGB -> (h, w, 3) CIELAB (L in [0,100], a/b signed).

    Accepts floats in [0, 1] or byte-scaled [0, 255] (divided by 255,
    matching skimage's img_as_float on uint8 input). Pure numpy from
    the published sRGB gamma + XYZ + Lab formulas; pinned in
    tests/test_visual.py against the standard primary-color Lab values.
    """
    _require_ndarray(img, "rgb_to_cielab")
    if img.shape[2] != 3:
        raise ValueError("rgb_to_cielab needs a 3-channel image")
    rgb = img.astype(np.float64)
    if rgb.max() > 1.0:
        rgb = rgb / 255.0
    # sRGB gamma expansion
    lin = np.where(
        rgb <= 0.04045, rgb / 12.92, ((rgb + 0.055) / 1.055) ** 2.4
    )
    xyz = lin @ _XYZ_FROM_RGB.T
    t = xyz / _D65_WHITE
    f = np.where(t > 0.008856, np.cbrt(t), 7.787 * t + 16.0 / 116.0)
    lab = np.empty_like(xyz)
    lab[..., 0] = 116.0 * f[..., 1] - 16.0
    lab[..., 1] = 500.0 * (f[..., 0] - f[..., 1])
    lab[..., 2] = 200.0 * (f[..., 1] - f[..., 2])
    return lab


def set_color_channels(
    img: np.ndarray, convert_to_cielab: bool = False, get_layers=()
) -> np.ndarray:
    """Optional RGB->CIELAB then channel projection — the reference's
    only projection operator (protosc/feature_extraction/
    color_channels.py:30-41), empty get_layers keeps every channel."""
    _require_ndarray(img, "set_color_channels")
    if convert_to_cielab:
        img = rgb_to_cielab(img)
    layers = list(get_layers) if len(get_layers) else list(range(img.shape[2]))
    return img[:, :, layers]


def _center_radius_mask(shape) -> np.ndarray:
    ys, xs = np.meshgrid(
        np.arange(shape[0]) - shape[0] // 2,
        np.arange(shape[1]) - shape[1] // 2,
        indexing="ij",
    )
    return np.sqrt(xs**2 + ys**2)


def cut_circle(img: np.ndarray) -> np.ndarray:
    _require_ndarray(img, "cut_circle")
    radius = _center_radius_mask(img.shape)
    out = img.copy()
    out[radius > min(img.shape[0] // 2, img.shape[1] // 2), :] = 0
    return out


def detect_crop(
    img: np.ndarray,
    add_perc: int = 20,
    out_size: int = 16,
    cascade=None,
    scale_factor: float = 1.3,
    min_neighbors: int = 3,
    min_size: int = 30,
) -> np.ndarray:
    """ViolaJones face-crop (reference protosc/preprocessing.py:75-107).

    With ``cascade`` (a :class:`protosc_spark.haar.HaarCascade`, a list
    of them, or a cascade XML path — the published OpenCV format) the
    REAL Viola–Jones pipeline runs: detectMultiScale at the reference's
    settings, the escalating-scale retry of ``_search_face`` when the
    first pass finds nothing, the last detection kept (the reference's
    loop quirk), the +/-add_perc% margin arithmetic, and a
    nearest-neighbor resize to (out_size, out_size, c).

    Without a cascade (the sandbox default — no cascade file ships in
    the test data) the detection box is the deterministic centered
    half-size stand-in, with identical margin/resize arithmetic.
    """
    _require_ndarray(img, "detect_crop")
    h, w = img.shape[:2]
    if cascade is None:
        faces = [(w // 4, h // 4, w // 2, h // 2)]  # fake detection box
    else:
        from protosc_spark.haar import (
            detect_multiscale,
            load_cascade_xml,
            search_object,
        )

        cascades = cascade if isinstance(cascade, (list, tuple)) else [cascade]
        cascades = [
            load_cascade_xml(c) if isinstance(c, str) else c
            for c in cascades
        ]
        faces = detect_multiscale(
            img,
            cascades[0],
            scale_factor=scale_factor,
            min_neighbors=min_neighbors,
            min_size=min_size,
        )
        if len(faces) == 0:
            faces = search_object(
                img, cascades, min_neighbors=min_neighbors, min_size=min_size
            )
    mplus, mmin = 1 + add_perc / 100, 1 - add_perc / 100
    for x, y, bw, bh in faces:  # reference keeps the LAST detection
        roi = img[
            int(y * mmin) : int(y * mplus) + bh,
            int(x * mmin) : int(x * mplus) + bw,
        ]
    yy = (np.arange(out_size) * roi.shape[0] // out_size).clip(0, roi.shape[0] - 1)
    xx = (np.arange(out_size) * roi.shape[1] // out_size).clip(0, roi.shape[1] - 1)
    return roi[np.ix_(yy, xx)]


def _polar_bin_ids(shape, n_angular: int, n_spatial: int):
    """(bin id per pixel, n_bins); id = -1 outside the inscribed circle."""
    ys, xs = np.meshgrid(
        np.arange(shape[0]) - shape[0] // 2,
        np.arange(shape[1]) - shape[1] // 2,
        indexing="ij",
    )
    radius = np.sqrt(xs**2 + ys**2)
    angle = np.arctan2(xs, ys)
    d_angle = 2 * np.pi / n_angular
    d_radius = min(shape[0] // 2, shape[1] // 2) / n_spatial
    # half-bin rotation so bin 0 straddles angle 0 (reference
    # fourier_features.py:98-101), then fold opposite sides together
    angle_id = ((2 * angle / d_angle + 0.5 * (2 * n_angular + 1))
                % (2 * n_angular)).astype(int) % n_angular
    radius_id = (radius / d_radius).astype(int)
    ids = angle_id + radius_id * n_angular
    ids[radius_id >= n_spatial] = -1
    # compact to consecutive ids
    uniq = np.unique(ids[ids >= 0])
    remap = np.full(ids.max() + 1 if ids.max() >= 0 else 1, -1, dtype=int)
    remap[uniq] = np.arange(len(uniq))
    out = np.where(ids >= 0, remap[np.clip(ids, 0, None)], -1)
    return out, len(uniq)


def fourier_bin_count(shape, n_angular: int = 8, n_spatial: int = 7) -> int:
    """Feature width for a given image shape — computed at PLAN time so
    the Spark UDF can declare a static return width (the reference
    infers it from sample 0, protosc/feature_matrix.py:48-67)."""
    return _polar_bin_ids(shape, n_angular, n_spatial)[1]


def fourier_features(
    img: np.ndarray, n_angular: int = 8, n_spatial: int = 7
) -> np.ndarray:
    """Per channel: coarse-grained |fftshift(fft2(img - mean))| summed
    over polar bins. Output (n_bins, c)."""
    _require_ndarray(img, "fourier_features")
    fft_map = np.abs(
        np.fft.fftshift(
            np.fft.fft2(img - img.mean(axis=(0, 1)), axes=(0, 1)), axes=(0, 1)
        )
    )
    ids, n_bins = _polar_bin_ids(img.shape, n_angular, n_spatial)
    flat_ids = ids.reshape(-1)
    keep = flat_ids >= 0
    out = np.empty((n_bins, img.shape[2]))
    for ch in range(img.shape[2]):
        out[:, ch] = np.bincount(
            flat_ids[keep],
            weights=fft_map[:, :, ch].reshape(-1)[keep],
            minlength=n_bins,
        )
    return out


def hog_width(shape, orientations: int = 9, cellsize=(4, 4)) -> int:
    return (shape[0] // cellsize[0]) * (shape[1] // cellsize[1]) * orientations


_HOG_EPS = 1e-5  # skimage's block-normalization epsilon


def hog_features(
    img: np.ndarray, orientations: int = 9, cellsize=(4, 4)
) -> np.ndarray:
    """skimage.feature.hog VALUE parity for the reference's exact call
    (cells_per_block=(1,1), block_norm='L2-Hys', multichannel=True —
    reference protosc/feature_extraction/hog.py:95-102), re-derived in
    vectorized numpy from the published algorithm (skimage
    feature/_hog.py + _hoghistogram.pyx semantics):

    * per-channel [-1,0,1] central-difference gradients, border rows/
      cols 0; each PIXEL votes with the channel whose gradient
      magnitude is largest (ties -> first channel, like argmax)
    * unsigned orientation deg(arctan2(g_row, g_col)) % 180, floor
      binning: bin i covers [i, i+1) * 180/orientations
    * per-cell histogram over exact non-overlapping cy x cx blocks,
      magnitude sum divided by the CELL AREA (skimage cell_hog's
      `total / (cell_rows * cell_columns)`)
    * per-cell L2-Hys normalization (L2 -> clip at 0.2 -> L2), the
      1x1-block case of skimage's block normalizer, eps = 1e-5

    Flattened row-major (cell_row, cell_col, orientation) — the layout
    of skimage's normalized_blocks.ravel() at 1x1 blocks. Values are
    pinned against an independent loop transcription of the pyx
    algorithm + a hand-computed fixture in tests/test_visual.py
    (skimage itself is absent from this container).
    """
    _require_ndarray(img, "hog_features")
    h, w, n_ch = img.shape
    g_row = np.zeros(img.shape, dtype=np.float64)
    g_col = np.zeros(img.shape, dtype=np.float64)
    g_row[1:-1] = img[2:] - img[:-2]
    g_col[:, 1:-1] = img[:, 2:] - img[:, :-2]
    if n_ch == 1:
        gr, gc = g_row[..., 0], g_col[..., 0]
    else:
        mag_ch = np.hypot(g_row, g_col)
        idx = mag_ch.argmax(axis=2)
        rr, cc = np.meshgrid(
            np.arange(h), np.arange(w), indexing="ij", sparse=True
        )
        gr, gc = g_row[rr, cc, idx], g_col[rr, cc, idx]
    mag = np.hypot(gr, gc)
    ori = np.rad2deg(np.arctan2(gr, gc)) % 180.0
    unit = 180.0 / orientations
    # bin = #{edges <= ori}; identical comparisons to skimage's
    # per-bin [i*unit, (i+1)*unit) interval checks
    edges = unit * np.arange(1, orientations + 1)
    bins = np.searchsorted(edges, ori, side="right")
    # float quirk preserved: a tiny negative angle mod 180 can round to
    # exactly 180.0, which skimage's interval checks exclude from EVERY
    # bin — zero the pixel's vote rather than clipping it into bin n-1
    valid = bins < orientations
    cy, cx = cellsize
    n_cy, n_cx = h // cy, w // cx
    m = np.where(valid, mag, 0.0)[: n_cy * cy, : n_cx * cx]
    b = np.where(valid, bins, 0)[: n_cy * cy, : n_cx * cx]
    cell_y = np.repeat(np.arange(n_cy), cy)[:, None]
    cell_x = np.repeat(np.arange(n_cx), cx)[None, :]
    flat = ((cell_y * n_cx + cell_x) * orientations + b).reshape(-1)
    hist = np.bincount(
        flat, weights=m.reshape(-1), minlength=n_cy * n_cx * orientations
    ).reshape(n_cy, n_cx, orientations) / (cy * cx)
    # L2-Hys per (1,1) block, vectorized across cells
    norm = np.sqrt((hist**2).sum(axis=2, keepdims=True) + _HOG_EPS**2)
    clipped = np.minimum(hist / norm, 0.2)
    norm2 = np.sqrt((clipped**2).sum(axis=2, keepdims=True) + _HOG_EPS**2)
    return (clipped / norm2).reshape(-1)


# ---------------------------------------------------------------------------
# Spark stage: preprocess + both extractors in ONE Arrow pass
# ---------------------------------------------------------------------------


def visual_feature_udf(
    image_shape,
    n_angular: int = 4,
    n_spatial: int = 2,
    orientations: int = 6,
    cellsize=(4, 4),
    add_perc: int = 20,
    crop_size: int | None = None,
):
    """pandas UDF computing the full visual chain
    detect_crop? -> greyscale -> cut_circle -> concat(fourier, hog)
    per decoded image (the reference's default_visual_pipeline,
    protosc/settings.py:20-24, with the shared prefix computed once).
    Returns (udf, width) — width is fixed at plan time from the shape.
    """
    shape = (
        (crop_size, crop_size, 1) if crop_size else (image_shape[0], image_shape[1], 1)
    )
    w_fourier = fourier_bin_count(shape, n_angular, n_spatial)
    w_hog = hog_width(shape, orientations, cellsize)

    @F.pandas_udf(ArrayType(DoubleType()))
    def _vis(
        pixels: pd.Series, w: pd.Series, h: pd.Series, c: pd.Series
    ) -> pd.Series:
        out = []
        for px, wi, hi, ci in zip(pixels, w, h, c):
            img = np.asarray(px, dtype=np.float64).reshape(hi, wi, ci)
            if crop_size:
                img = detect_crop(img, add_perc=add_perc, out_size=crop_size)
            img = cut_circle(greyscale(img))
            fo = fourier_features(img, n_angular, n_spatial)[:, 0]
            hg = hog_features(img, orientations, cellsize)
            out.append(np.concatenate([fo, hg]))
        return pd.Series(out)

    return _vis, w_fourier + w_hog


def multichannel_fourier_udf(
    image_shape, n_channels: int, n_angular: int = 4, n_spatial: int = 2
):
    """Per-channel Fourier features kept SEPARATE (no greyscale): each
    polar bin is one logical feature owning ``n_channels`` adjacent
    columns, laid out row-major (bin, channel) — the multi-channel
    registry path (reference features own one column per channel,
    protosc/feature_matrix.py:48-67; Fourier emits (n_bins, c) there
    too, protosc/feature_extraction/fourier_features.py:162-169).

    Returns (udf, total_width, n_bins); pair with
    ``Extractor(width=total_width, channels=n_channels)``.
    """
    shape = (image_shape[0], image_shape[1], n_channels)
    n_bins = fourier_bin_count(shape, n_angular, n_spatial)

    @F.pandas_udf(ArrayType(DoubleType()))
    def _f(
        pixels: pd.Series, w: pd.Series, h: pd.Series, c: pd.Series
    ) -> pd.Series:
        out = []
        for px, wi, hi, ci in zip(pixels, w, h, c):
            assert ci == n_channels, (ci, n_channels)
            img = np.asarray(px, dtype=np.float64).reshape(hi, wi, ci)
            fo = fourier_features(img, n_angular, n_spatial)  # (n_bins, c)
            out.append(fo.reshape(-1))  # row-major (bin, channel)
        return pd.Series(out)

    return _f, n_bins * n_channels, n_bins


def visual_features(decoded: DataFrame, image_shape=(8, 8)) -> tuple[DataFrame, int]:
    """decoded images (multimodal.decode_images output) -> per-media
    Fourier+HOG vector. Declared width; single select, no shuffle."""
    udf, width = visual_feature_udf(image_shape)
    return (
        decoded.select(
            "media_id",
            udf(
                F.col("pixels"), F.col("width"), F.col("height"), F.col("channels")
            ).alias("vis_features"),
        ),
        width,
    )
