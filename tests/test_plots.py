"""Plot sinks: saliency reconstruction + PNG writer.

Pins reference semantics: hog_plot's 1/orientations cell increments
over the COLUMN-major ref grid (protosc/feature_extraction/hog.py:
68-91), fourier_plot_func's all-ones inverse matrix painting
(fourier_features.py:65-80), and FeatureMatrix.plot's per-pipeline
grouping + not-plottable warning count (feature_matrix.py:295-332).
"""

import numpy as np
import pytest

from protosc_spark.extract import Extractor, FeatureRegistry
from protosc_spark.plots import (
    default_plotters,
    fourier_saliency,
    hog_saliency,
    plot_features,
    read_png_grey,
    write_png_grey,
)
from protosc_spark.visual import _polar_bin_ids, fourier_bin_count, hog_width


class TestHogSaliency:
    def test_full_cell_sums_to_one(self):
        # 8x8 image, 4x4 cells -> 2x2 grid, 6 orientations: ids 0..5
        # are all orientations of the first column-major cell (y=0,x=0)
        data = hog_saliency(range(6), (8, 8), (4, 4), 6)
        assert data.shape == (2, 2)
        assert data[0, 0] == pytest.approx(1.0)
        assert np.count_nonzero(data) == 1

    def test_single_id_adds_one_over_orientations(self):
        data = hog_saliency([6], (8, 8), (4, 4), 6)
        # id 6 -> cell 1, column-major -> (y=1, x=0) — the reference's
        # x-outer/y-inner enumeration (hog.py:84-89), NOT row-major
        assert data[1, 0] == pytest.approx(1 / 6)
        assert data.sum() == pytest.approx(1 / 6)

    def test_column_major_quirk(self):
        # id 12 -> cell 2 -> (y=0, x=1) under column-major; row-major
        # would put cell 2 at (y=1, x=0)
        data = hog_saliency([12], (8, 8), (4, 4), 6)
        assert data[0, 1] == pytest.approx(1 / 6)

    def test_repeat_ids_accumulate(self):
        data = hog_saliency([0, 0, 0], (8, 8), (4, 4), 6)
        assert data[0, 0] == pytest.approx(3 / 6)

    def test_out_of_range(self):
        with pytest.raises(IndexError):
            hog_saliency([hog_width((8, 8), 6, (4, 4))], (8, 8), (4, 4), 6)


class TestFourierSaliency:
    def test_selected_bins_paint_their_pixels(self):
        shape = (8, 8, 1)
        ids, n_bins = _polar_bin_ids(shape, 4, 2)
        for b in range(n_bins):
            img = fourier_saliency([b], shape, 4, 2)
            assert np.array_equal(img, (ids == b).astype(float))

    def test_all_bins_cover_circle_only(self):
        shape = (8, 8, 1)
        ids, n_bins = _polar_bin_ids(shape, 4, 2)
        img = fourier_saliency(range(n_bins), shape, 4, 2)
        assert np.array_equal(img, (ids >= 0).astype(float))
        assert img.sum() < img.size  # corners outside the circle stay 0

    def test_empty_selection(self):
        assert fourier_saliency([], (8, 8, 1), 4, 2).sum() == 0

    def test_out_of_range(self):
        n = fourier_bin_count((8, 8, 1), 4, 2)
        with pytest.raises(IndexError):
            fourier_saliency([n], (8, 8, 1), 4, 2)


class TestPngWriter:
    def test_roundtrip_binary_cmap(self, tmp_path):
        rng = np.random.default_rng(7)
        arr = rng.random((5, 9))
        p = write_png_grey(arr, tmp_path / "x.png", 0.0, 1.0)
        px = read_png_grey(p)
        expect = (255 - np.clip(np.round(arr * 255), 0, 255)).astype(np.uint8)
        assert np.array_equal(px, expect)  # vmin -> white, vmax -> black

    def test_clipping_and_degenerate_span(self, tmp_path):
        arr = np.array([[-1.0, 0.0, 0.5, 2.0]])
        px = read_png_grey(write_png_grey(arr, tmp_path / "c.png", 0.0, 1.0))
        assert list(px[0]) == [255, 255, 127, 0]
        flat = read_png_grey(write_png_grey(arr, tmp_path / "d.png", 1.0, 1.0))
        assert set(flat[0]) == {255}


class TestPlotFeaturesSink:
    def _registry(self):
        dummy = lambda df: None  # noqa: E731 — registry never calls build
        n_fourier = fourier_bin_count((8, 8, 1), 4, 2)
        n_hog = hog_width((8, 8), 6, (4, 4))
        return FeatureRegistry.from_extractors(
            [
                Extractor("fourier", n_fourier, dummy),
                Extractor("hog", n_hog, dummy),
                Extractor("stats", 3, dummy),  # no plotter registered
            ]
        )

    def test_group_write_and_noplot_count(self, tmp_path):
        reg = self._registry()
        plotters = default_plotters((8, 8, 1))
        n_fourier = fourier_bin_count((8, 8, 1), 4, 2)
        sel = [0, 1, n_fourier, n_fourier + 6, n_fourier + 24 + 1]  # last is "stats"
        written, n_noplot = plot_features(reg, sel, tmp_path, plotters)
        assert n_noplot == 1
        assert sorted(written) == ["fourier", "hog"]
        hog_px = read_png_grey(written["hog"])
        expect = hog_saliency([0, 6], (8, 8), (4, 4), 6)
        assert np.array_equal(
            hog_px, (255 - np.clip(np.round(expect * 255), 0, 255)).astype(np.uint8)
        )
        fourier_px = read_png_grey(written["fourier"])
        assert np.array_equal(
            fourier_px, 255 - 255 * fourier_saliency([0, 1], (8, 8, 1), 4, 2).astype(np.uint8)
        )

    def test_feature_id_strings_accepted(self, tmp_path):
        reg = self._registry()
        written, n_noplot = plot_features(
            reg, ["fourier:0", "stats:2"], tmp_path, default_plotters((8, 8, 1))
        )
        assert n_noplot == 1 and list(written) == ["fourier"]
