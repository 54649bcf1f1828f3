"""Plot sinks: feature-space -> image-space saliency reconstruction
plus a dependency-free greyscale PNG writer.

Closes SURVEY §2.1 "plot sinks". Reference mapping:

* ``FeatureMatrix.plot`` (reference protosc/feature_matrix.py:295-332)
  -> :func:`plot_features`: group the selected feature ids per
  pipeline, warn for pipelines that have no plotter, emit one image
  per pipeline into ``plot_dir``.
* ``hog_plot`` + ``hog_ref_func``
  (reference protosc/feature_extraction/hog.py:68-91): each selected
  sub-feature adds ``1/orientations`` to its cell. The reference's
  ref grid enumerates feature ids COLUMN-major (x outer, y inner,
  orientation fastest) even though the extracted vector is row-major
  — that quirk is preserved verbatim so plots match the reference
  pixel-for-pixel.
* ``fourier_plot_func`` + ``fourier_ref_func``
  (reference protosc/feature_extraction/fourier_features.py:65-80):
  the inverse coarse-graining matrix with every stored weight forced
  to 1 paints every pixel belonging to any selected polar bin with 1.
* ``plt.imshow(cmap="binary", vmin=0, vmax=1)`` + ``plt.savefig`` ->
  :func:`write_png_grey`. matplotlib is absent from this container,
  so the PNG file is produced directly (8-bit greyscale, zlib,
  stdlib only); "binary" maps 0 -> white, 1 -> black.

Scale note: plot sinks are driver-side BY DESIGN, exactly like the
reference — they consume a *selection* (tens of feature ids plus an
image shape), never data-scale rows. Nothing here touches a
DataFrame; the Spark side ends at the feature registry.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path
from collections.abc import Callable, Sequence

import numpy as np

from .visual import _polar_bin_ids


def hog_saliency(
    sub_ids: Sequence[int],
    img_shape,
    cellsize=(4, 4),
    orientations: int = 6,
) -> np.ndarray:
    """Cell grid with ``1/orientations`` added per selected sub-feature
    (reference hog_plot, protosc/feature_extraction/hog.py:68-77).

    The reference's ref grid (hog_ref_func, hog.py:80-91) assigns ids
    column-major: ``id = x * (rows * orientations) + y * orientations
    + z`` over a ``(rows, cols, orientations)`` grid — preserved.
    """
    rows = img_shape[0] // cellsize[0]
    cols = img_shape[1] // cellsize[1]
    data = np.zeros((rows, cols))
    n_ids = rows * cols * orientations
    for i in sub_ids:
        if not 0 <= i < n_ids:
            raise IndexError(f"hog sub-feature {i} out of range {n_ids}")
        cell = i // orientations  # column-major cell index: x * rows + y
        data[cell % rows, cell // rows] += 1.0 / orientations
    return data


def fourier_saliency(
    sub_ids: Sequence[int],
    img_shape,
    n_angular: int = 4,
    n_spatial: int = 2,
) -> np.ndarray:
    """Indicator image of every pixel in any selected polar bin
    (reference fourier_plot_func with the all-ones inverse matrix,
    protosc/feature_extraction/fourier_features.py:65-80). Pixels
    outside the inscribed circle belong to no bin and stay 0.
    """
    ids, n_bins = _polar_bin_ids(img_shape, n_angular, n_spatial)
    for i in sub_ids:
        if not 0 <= i < n_bins:
            raise IndexError(f"fourier sub-feature {i} out of range {n_bins}")
    return np.isin(ids, np.asarray(list(sub_ids), dtype=int)).astype(float)


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def write_png_grey(
    arr: np.ndarray, path, vmin: float = 0.0, vmax: float = 1.0
) -> Path:
    """Write a 2-D array as an 8-bit greyscale PNG using matplotlib's
    "binary" colormap convention (vmin -> white, vmax -> black), the
    rendering the reference's plot sinks produce
    (protosc/feature_extraction/hog.py:73, fourier_features.py:76).
    """
    a = np.asarray(arr, dtype=float)
    if a.ndim != 2:
        raise ValueError(f"expected 2-D array, got shape {a.shape}")
    span = vmax - vmin
    norm = np.zeros_like(a) if span <= 0 else (a - vmin) / span
    px = (255 - np.clip(np.round(norm * 255), 0, 255)).astype(np.uint8)
    h, w = px.shape
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(h))  # filter 0
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # grey, 8-bit
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )
    path = Path(path)
    path.write_bytes(png)
    return path


def read_png_grey(path) -> np.ndarray:
    """Decode a PNG written by :func:`write_png_grey` back to uint8
    pixels (filter-0 greyscale only). Test/verification helper."""
    buf = Path(path).read_bytes()
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    pos, w = 8, None
    idat = b""
    while pos < len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bits, ctype = struct.unpack(">IIBB", data[:10])
            assert (bits, ctype) == (8, 0), "not 8-bit greyscale"
        elif tag == b"IDAT":
            idat += data
        pos += 12 + length
    rows = zlib.decompress(idat)
    out = np.empty((h, w), dtype=np.uint8)
    for r in range(h):
        line = rows[r * (w + 1) : (r + 1) * (w + 1)]
        assert line[0] == 0, "only filter 0 supported"
        out[r] = np.frombuffer(line[1:], dtype=np.uint8)
    return out


# pipeline name -> saliency function (sub_ids -> 2-D array). The
# reference attaches these per PipeElement (_plot_func properties);
# here they key off the Extractor/pipeline name in the registry.
Plotters = dict[str, Callable[[Sequence[int]], np.ndarray]]


def default_plotters(
    img_shape,
    n_angular: int = 4,
    n_spatial: int = 2,
    orientations: int = 6,
    cellsize=(4, 4),
) -> Plotters:
    return {
        "fourier": lambda ids: fourier_saliency(ids, img_shape, n_angular, n_spatial),
        "hog": lambda ids: hog_saliency(ids, img_shape, cellsize, orientations),
    }


def plot_features(
    registry,
    feature_ids: Sequence,
    plot_dir,
    plotters: Plotters,
) -> tuple[dict[str, Path], int]:
    """Write one saliency PNG per pipeline for the selected features —
    the reference's FeatureMatrix.plot
    (protosc/feature_matrix.py:295-332) with files instead of a
    display. ``feature_ids`` may be registry indices (int) or feature
    id strings. Returns ({pipeline: written path}, n_not_plottable);
    features whose pipeline has no plotter are counted, not fatal
    (reference's "could not be plotted" warning path).
    """
    split: dict[str, list[int]] = {}
    n_noplot = 0
    for fid in feature_ids:
        entry = registry.entries[
            fid if isinstance(fid, (int, np.integer)) else registry.index_of(fid)
        ]
        if entry["pipeline"] in plotters:
            split.setdefault(entry["pipeline"], []).append(entry["sub_feature_id"])
        else:
            n_noplot += 1

    plot_dir = Path(plot_dir)
    plot_dir.mkdir(parents=True, exist_ok=True)
    written: dict[str, Path] = {}
    for pipe, sub_ids in split.items():
        img = plotters[pipe](sub_ids)
        written[pipe] = write_png_grey(img, plot_dir / f"{pipe}.png", 0.0, 1.0)
    return written, n_noplot
