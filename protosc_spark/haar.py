"""Viola–Jones Haar-cascade object detection in pure numpy.

Implements the PUBLISHED algorithm (Viola & Jones 2001, "Rapid Object
Detection using a Boosted Cascade of Simple Features") and loads the
PUBLISHED OpenCV cascade XML format ("new"/BOOST format, the one
``haarcascade_frontalface_default.xml`` ships in), so a user can point
the engine at any stock OpenCV cascade file. Written from the paper +
the format description; no OpenCV code in this container (verified
absent) and none copied.

Reference parity target: ``protosc/preprocessing.py:51-107``
(``viola_jones`` / ``_search_face``) — detectMultiScale semantics,
escalating-scale retry, margin arithmetic. The deterministic-crop
stand-in remains the default for the driver gate (no cascade file in
the sandbox test data); this module makes the real path available and
is tested against a committed hand-crafted cascade fixture with
planted detections (tests/test_haar.py).

Evaluation semantics (standard Viola–Jones):

* integral image + squared integral per frame;
* per window, variance normalization factor
  ``sigma = sqrt(max(0, E[x^2] - E[x]^2))`` computed over the window
  INSET by one pixel on each side (offset (1,1), size (w-2,h-2)) —
  OpenCV's normalization rect, which stock cascade thresholds are
  calibrated against (advice r4); 1 if degenerate;
* each weak classifier is a decision stump on one Haar feature:
  ``feature_sum * inv_area < node_threshold * sigma`` selects the left
  leaf, else the right; a stage rejects the window when the sum of its
  stumps' leaves falls below the stage threshold;
* the detector slides the BASE window over the image at a pyramid of
  scales, scaling the feature RECTS (not the image); per scale the
  step is ``max(1, round(scale))``;
* raw hits are grouped by rectangle similarity (union-find over the
  ``|dx| <= eps * 0.5 * (w1 + w2)``-style rule) and groups with fewer
  than ``min_neighbors`` members are dropped; survivors are averaged.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class HaarStage:
    threshold: float
    # each stump: (feature_idx, node_threshold, left_leaf, right_leaf)
    stumps: tuple[tuple[int, float, float, float], ...]


@dataclass(frozen=True)
class HaarCascade:
    window_w: int
    window_h: int
    stages: tuple[HaarStage, ...]
    # features[i] = tuple of (x, y, w, h, weight) rects in BASE window
    features: tuple[tuple[tuple[int, int, int, int, float], ...], ...]


def load_cascade_xml(source: str) -> HaarCascade:
    """Parse an OpenCV 'new format' (BOOST/HAAR) cascade XML — a path
    or an XML string. Tilted features are rejected explicitly (the
    stock frontal-face cascades are untilted)."""
    text = source
    if not source.lstrip().startswith("<"):
        with open(source) as fh:
            text = fh.read()
    root = ET.fromstring(text)
    casc = root.find("cascade") if root.tag != "cascade" else root
    if casc is None:
        raise ValueError("no <cascade> element found")
    ftype = (casc.findtext("featureType") or "").strip()
    if ftype != "HAAR":
        raise ValueError(f"unsupported featureType {ftype!r} (need HAAR)")
    w = int(casc.findtext("width"))
    h = int(casc.findtext("height"))

    features = []
    for f in casc.find("features"):
        tilted = (f.findtext("tilted") or "0").strip()
        if tilted not in ("0", ""):
            raise ValueError("tilted Haar features are not supported")
        rects = []
        for r in f.find("rects"):
            vals = r.text.split()
            rects.append(
                (
                    int(vals[0]),
                    int(vals[1]),
                    int(vals[2]),
                    int(vals[3]),
                    float(vals[4]),
                )
            )
        features.append(tuple(rects))

    stages = []
    for st in casc.find("stages"):
        thr = float(st.findtext("stageThreshold"))
        stumps = []
        for wc in st.find("weakClassifiers"):
            nodes = wc.findtext("internalNodes").split()
            leaves = [float(v) for v in wc.findtext("leafValues").split()]
            if len(nodes) != 4 or len(leaves) != 2:
                raise ValueError(
                    "only stump (single-node) weak classifiers supported"
                )
            # internalNodes: left_child right_child feature_idx threshold
            stumps.append(
                (int(nodes[2]), float(nodes[3]), leaves[0], leaves[1])
            )
        stages.append(HaarStage(thr, tuple(stumps)))

    return HaarCascade(w, h, tuple(stages), tuple(features))


def _integrals(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(ii, ii2): zero-padded integral and squared-integral images,
    shape (h+1, w+1), float64 — ``ii[y, x]`` = sum over img[:y, :x]."""
    g = img.astype(np.float64)
    ii = np.zeros((g.shape[0] + 1, g.shape[1] + 1))
    ii2 = np.zeros_like(ii)
    np.cumsum(np.cumsum(g, axis=0), axis=1, out=ii[1:, 1:])
    np.cumsum(np.cumsum(g * g, axis=0), axis=1, out=ii2[1:, 1:])
    return ii, ii2


def _rect_sums(ii, ys, xs, x, y, w, h):
    """Vectorized rect sums at every window origin (ys, xs) for one
    scaled rect (x, y, w, h) relative to the origin."""
    y0, x0 = ys + y, xs + x
    return (
        ii[y0 + h, x0 + w] - ii[y0, x0 + w] - ii[y0 + h, x0] + ii[y0, x0]
    )


def detect_multiscale(
    img: np.ndarray,
    cascade: HaarCascade,
    scale_factor: float = 1.3,
    min_neighbors: int = 3,
    min_size: int = 30,
) -> np.ndarray:
    """All detections as an int array [N, 4] of (x, y, w, h); empty
    [0, 4] when nothing survives grouping. ``img`` is 2-D grey (a 3-D
    array is collapsed by channel mean for detection)."""
    if img.ndim == 3:
        img = img.mean(axis=2)
    ii, ii2 = _integrals(img)
    H, W = img.shape
    hits: list[tuple[int, int, int, int]] = []

    scale = max(1.0, min_size / max(cascade.window_w, cascade.window_h))
    while True:
        ww = int(round(cascade.window_w * scale))
        wh = int(round(cascade.window_h * scale))
        if ww > W or wh > H:
            break
        step = max(1, int(round(scale)))
        ys0 = np.arange(0, H - wh + 1, step)
        xs0 = np.arange(0, W - ww + 1, step)
        ys, xs = [a.ravel() for a in np.meshgrid(ys0, xs0, indexing="ij")]
        if len(ys):
            # OpenCV normalization rect: window inset by 1px per side
            # ((1,1), (w-2,h-2)) — stock cascade thresholds are
            # calibrated to it; fall back to the full window when the
            # window is too small to inset
            if ww > 2 and wh > 2:
                nx, ny, nw, nh = 1, 1, ww - 2, wh - 2
            else:
                nx, ny, nw, nh = 0, 0, ww, wh
            inv_area = 1.0 / (nw * nh)
            total = _rect_sums(ii, ys, xs, nx, ny, nw, nh)
            total2 = _rect_sums(ii2, ys, xs, nx, ny, nw, nh)
            mean = total * inv_area
            var = total2 * inv_area - mean * mean
            sigma = np.where(var > 0, np.sqrt(np.maximum(var, 0)), 1.0)

            # scaled rects per feature (OpenCV-style integer rounding)
            alive = np.ones(len(ys), dtype=bool)
            for stage in cascade.stages:
                if not alive.any():
                    break
                ssum = np.zeros(alive.sum())
                ay, ax = ys[alive], xs[alive]
                asig = sigma[alive]
                for fi, nthr, left, right in stage.stumps:
                    # integer-round the rects to this scale, then
                    # renormalize rect 0's weight so the weighted areas
                    # still sum to zero (the published OpenCV
                    # correction — without it rounding error makes a
                    # FLAT window score nonzero and pass stages)
                    scaled = []
                    for rx, ry, rw, rh, wgt in cascade.features[fi]:
                        scaled.append(
                            (
                                int(round(rx * scale)),
                                int(round(ry * scale)),
                                int(round(rw * scale)),
                                int(round(rh * scale)),
                                wgt,
                            )
                        )
                    area0 = scaled[0][2] * scaled[0][3]
                    rest = sum(r[2] * r[3] * r[4] for r in scaled[1:])
                    w0 = -rest / area0 if area0 else 0.0
                    scaled[0] = scaled[0][:4] + (w0,)
                    fval = np.zeros(len(ay))
                    for sx, sy, sw, sh, wgt in scaled:
                        fval += wgt * _rect_sums(ii, ay, ax, sx, sy, sw, sh)
                    ssum += np.where(
                        fval * inv_area < nthr * asig, left, right
                    )
                keep = ssum >= stage.threshold
                idx = np.flatnonzero(alive)
                alive[idx[~keep]] = False
            for i in np.flatnonzero(alive):
                hits.append((int(xs[i]), int(ys[i]), ww, wh))
        scale *= scale_factor

    return _group_rectangles(hits, min_neighbors)


def _group_rectangles(
    hits: list[tuple[int, int, int, int]], min_neighbors: int, eps: float = 0.2
) -> np.ndarray:
    """Union-find grouping by rectangle similarity; classes smaller
    than ``min_neighbors`` are dropped, survivors averaged."""
    if not hits:
        return np.zeros((0, 4), dtype=np.int64)
    R = np.array(hits, dtype=np.float64)
    n = len(R)
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            delta = eps * 0.5 * (R[i, 2] + R[j, 2])
            if (
                abs(R[i, 0] - R[j, 0]) <= delta
                and abs(R[i, 1] - R[j, 1]) <= delta
                and abs(R[i, 0] + R[i, 2] - R[j, 0] - R[j, 2]) <= delta
                and abs(R[i, 1] + R[i, 3] - R[j, 1] - R[j, 3]) <= delta
            ):
                parent[find(i)] = find(j)

    roots = np.array([find(i) for i in range(n)])
    out = []
    for root in np.unique(roots):
        members = R[roots == root]
        if len(members) >= min_neighbors:
            out.append(np.rint(members.mean(axis=0)).astype(np.int64))
    if not out:
        return np.zeros((0, 4), dtype=np.int64)
    # deterministic output order: by (x, y, w, h)
    arr = np.array(out, dtype=np.int64)
    return arr[np.lexsort((arr[:, 3], arr[:, 2], arr[:, 1], arr[:, 0]))]


def search_object(
    img: np.ndarray,
    cascades: list[HaarCascade],
    min_neighbors: int = 3,
    min_size: int = 30,
) -> np.ndarray:
    """Escalating-scale retry, the reference's ``_search_face``
    contract (protosc/preprocessing.py:51-73): start at d_scale 0.8
    (scale_factor 1.8), shrink by 0.8 each round, try every cascade at
    each setting, raise when d_scale drops to 0.05."""
    d_scale = 0.8
    while d_scale > 0.05:
        for casc in cascades:
            faces = detect_multiscale(
                img,
                casc,
                scale_factor=1 + d_scale,
                min_neighbors=min_neighbors,
                min_size=min_size,
            )
            if len(faces):
                return faces
        d_scale *= 0.8
    raise ValueError("ViolaJones: Cannot find face in picture!")
