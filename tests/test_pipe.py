"""Pipeline-algebra laws (mirrors reference tests/test_pipeline.py and
tests/test_preprocessing.py:32-33 name pins) + the Spark bridge with
error-as-value semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from protosc_spark.multimodal import decode_images, generate_media
from protosc_spark.pipe import (
    Pipe,
    PipeComplex,
    PipeElement,
    apply_complex,
    assemble_features,
)
from protosc_spark.visual import (
    cut_circle,
    fourier_bin_count,
    fourier_features,
    greyscale,
    hog_features,
    hog_width,
)


class Grey(PipeElement):
    def _apply(self, img):
        return greyscale(img)


class Circle(PipeElement):
    def _apply(self, img):
        return cut_circle(img)


class Fourier(PipeElement):
    def __init__(self, n_angular=4, n_spatial=2):
        self.n_angular = n_angular
        self.n_spatial = n_spatial

    def _apply(self, img):
        return fourier_features(img, self.n_angular, self.n_spatial)[:, 0]


class Hog(PipeElement):
    def __init__(self, orientations=6):
        self.orientations = orientations

    def _apply(self, img):
        return hog_features(img, self.orientations, (4, 4))


class Failing(PipeElement):
    def _apply(self, img):
        raise ValueError("boom")


class Counting(PipeElement):
    calls = 0

    def _apply(self, img):
        Counting.calls += 1
        return img


def test_name_mangles_non_default_params():
    assert Fourier().name == "Fourier"
    assert Fourier(n_angular=8).name == "Fourier_n_angular8"
    assert Hog(orientations=9).name == "Hog_orientations9"


def test_compose_flattens_and_branch_names():
    p = Grey() * Circle() * Fourier()
    assert len(p) == 3 and p.name == "Fourier"
    pc = p + Grey() * Circle() * Hog()
    assert list(pc.branches) == ["Fourier", "Hog"]
    # duplicates get suffixed
    pc2 = PipeComplex(Fourier(), Fourier())
    assert list(pc2.branches) == ["Fourier", "Fourier_2"]


def test_complex_times_element_distributes():
    pc = (Grey() + Circle()) * Fourier()
    assert all(len(p) == 2 for p in pc.branches.values())
    pc_pre = Grey() * (PipeComplex(Fourier(), Hog()))
    assert all(p[0].name == "Grey" for p in pc_pre.branches.values())


def test_shared_prefix_executes_once():
    Counting.calls = 0
    pc = (
        Counting() * Grey() * Fourier()
        + Counting() * Grey() * Hog()
    )
    img = np.random.default_rng(0).uniform(0, 255, (8, 8, 3))
    res = pc.run(img)
    assert Counting.calls == 1  # prefix shared across both branches
    assert set(res) == {"Fourier", "Hog"}
    assert len(res["Fourier"]) == fourier_bin_count((8, 8, 1), 4, 2)
    assert len(res["Hog"]) == hog_width((8, 8, 1), 6, (4, 4))


def test_error_as_value_with_source():
    pc = Grey() * Failing() * Fourier() + Grey() * Hog()
    img = np.random.default_rng(1).uniform(0, 255, (8, 8, 1))
    res = pc.run(img)
    err = res["Fourier"]
    assert isinstance(err, ValueError) and err.source == "Failing"
    assert isinstance(res["Hog"], np.ndarray)  # sibling branch unaffected


class FailOdd(PipeElement):
    """Fails on images whose top-left pixel byte is odd."""

    def _apply(self, img):
        if int(img[0, 0, 0]) % 2 == 1:
            raise ValueError("odd pixel")
        return img


@pytest.fixture(scope="module")
def decoded(spark):
    return decode_images(generate_media(spark, n=32, kind="image")).cache()


def _decode_row(row):
    return np.asarray(row["pixels"], dtype=np.float64).reshape(
        row["height"], row["width"], row["channels"]
    )


def test_spark_bridge_matches_driver_run(spark, decoded):
    pc = Grey() * Circle() * Fourier() + Grey() * Circle() * Hog()
    widths = {
        "Fourier": fourier_bin_count((8, 8, 1), 4, 2),
        "Hog": hog_width((8, 8, 1), 6, (4, 4)),
    }
    out = apply_complex(decoded, pc, widths, _decode_row, ["media_id"])
    got = {r.media_id: (list(r.Fourier), list(r.Hog)) for r in out.collect()}
    for r in decoded.toPandas().itertuples():
        img = np.asarray(r.pixels, dtype=np.float64).reshape(
            r.height, r.width, r.channels
        )
        res = pc.run(img)
        assert np.allclose(got[r.media_id][0], res["Fourier"])
        assert np.allclose(got[r.media_id][1], res["Hog"])


def test_spark_bridge_error_sidecar(spark, decoded):
    pc = FailOdd() * Grey() * Fourier() + Grey() * Hog()
    widths = {
        "Fourier": fourier_bin_count((8, 8, 1), 4, 2),
        "Hog": hog_width((8, 8, 1), 6, (4, 4)),
    }
    out = apply_complex(decoded, pc, widths, _decode_row, ["media_id"]).cache()
    rows = out.collect()
    failed = [r for r in rows if len(r.errors) > 0]
    ok = [r for r in rows if len(r.errors) == 0]
    assert failed and ok  # both populations exist
    for r in failed:
        assert r.Fourier is None and r.Hog is not None
        e = r.errors[0]
        assert (e.branch, e.stage) == ("Fourier", "FailOdd")
        assert "odd pixel" in e.message
    asm = assemble_features(out, ["Fourier", "Hog"])
    n_null = asm.where(F.col("features").isNull()).count()
    assert n_null == len(failed)
    w = asm.where(F.col("features").isNotNull()).select(
        F.size("features").alias("s")
    ).distinct().collect()
    assert [r.s for r in w] == [sum(widths.values())]


def test_settings_tree_and_push_down():
    pc = Grey() * Fourier() + Grey() * Hog()
    s = pc.settings
    assert s["Fourier"]["Fourier"] == {"n_angular": 4, "n_spatial": 2}
    assert s["Hog"]["Hog"] == {"orientations": 6}
    img = np.random.default_rng(2).uniform(0, 255, (16, 16, 1))
    base = pc.run(img)
    pc.push_settings({"Fourier": {"Fourier": {"n_angular": 8}}})
    # the element name re-mangles once the param is non-default
    # (reference behavior: names encode params, pipeline.py:175-183)
    assert pc.branches["Fourier"][1].n_angular == 8
    assert pc.settings["Fourier"]["Fourier_n_angular8"]["n_angular"] == 8
    changed = pc.run(img)
    assert len(changed["Fourier"]) != len(base["Fourier"])
    assert np.allclose(changed["Hog"], base["Hog"])  # other branch untouched
    with pytest.raises(KeyError, match="no parameter"):
        pc.push_settings({"Hog": {"Hog": {"nope": 1}}})
