"""Multimodal plumbing: schemas, batch shapes, determinism across
partitionings, and the stubbed codec boundary."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from protosc_spark.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    decode_images,
    generate_media,
    image_features,
    media_pipeline,
    sample_frames,
)


@pytest.fixture(scope="module")
def images(spark):
    return generate_media(spark, n=48, kind="image").cache()


@pytest.fixture(scope="module")
def videos(spark):
    return generate_media(spark, n=24, kind="video").cache()


def test_media_schema_and_determinism(spark, images):
    assert images.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    again = generate_media(spark, n=48, kind="image").repartition(7)
    a = {r.media_id: bytes(r.data) for r in images.collect()}
    b = {r.media_id: bytes(r.data) for r in again.collect()}
    assert a == b
    assert all(len(v) == 96 for v in a.values())  # 3 sha2 chunks


def test_decode_shapes(images):
    dec = decode_images(images)
    rows = dec.collect()
    assert len(rows) == 48
    for r in rows:
        assert len(r.pixels) == r.width * r.height * r.channels
        assert 1 <= r.channels <= 3
        assert all(0 <= p <= 255 for p in r.pixels[:10])


def test_real_codec_is_stubbed(images):
    with pytest.raises(NotImplementedError, match="cv2"):
        decode_images(images, codec="real")
    with pytest.raises(NotImplementedError):
        sample_frames(images, codec="real")
    with pytest.raises(NotImplementedError):
        audio_features(images, codec="real")


def test_image_features_width_and_stability(spark, images):
    feats, width = image_features(decode_images(images))
    rows = feats.collect()
    assert all(len(r.img_features) == width for r in rows)
    # deterministic across partitionings
    feats2, _ = image_features(decode_images(images.repartition(5)))
    a = {r.media_id: tuple(r.img_features) for r in rows}
    b = {r.media_id: tuple(r.img_features) for r in feats2.collect()}
    assert set(a) == set(b)
    for k in a:
        assert np.allclose(a[k], b[k])


def test_frame_sampling_explodes_videos(videos):
    frames = sample_frames(videos, every_k=2)
    pdf = frames.toPandas()
    meta = {r.media_id: r.meta["n_frames"] for r in videos.collect()}
    counts = pdf.groupby("media_id").size().to_dict()
    for mid, n_frames in meta.items():
        assert counts[mid] == -(-n_frames // 2)  # ceil(n/2)
    # frame payload sizes = w*h*c = 64 bytes
    assert all(len(bytes(b)) == 64 for b in pdf["frame"])
    # frames of one media are distinct slices (tiled payload rotates)
    one = pdf[pdf.media_id == pdf.media_id.iloc[0]]
    assert len({bytes(b) for b in one["frame"]}) > 1


def test_audio_features_width(spark):
    audio = generate_media(spark, n=16, kind="audio")
    rows = audio_features(audio).collect()
    assert len(rows) == 16
    for r in rows:
        assert len(r.audio_features) == 10
        assert 0.0 <= r.audio_features[1] <= 2.0  # zcr sane


def test_pipeline_integration(images):
    feats, width = media_pipeline(images)
    assert feats.columns == ["media_id", "img_features"]
    assert feats.count() == 48 and width == 2 + 8 + 16
