"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

This is the Spark-native home of the reference's visual pipeline
(ReadImage -> GreyScale/ViolaJones/CutCircle -> Color/Pixel/HOG/Fourier
features; reference protosc/io.py:5-26, protosc/preprocessing.py,
protosc/feature_extraction/*): media travel through the engine as a
``binary`` column plus a typed ``meta`` struct, and every decode /
preprocess / feature step is an Arrow-batched ``mapInPandas`` /
``pandas_udf`` stage with a statically declared schema — never
row-at-a-time Python.

The container has no cv2/skimage/PIL, so the codec boundary is STUBBED:
``decode_media(..., codec="fake")`` produces a DETERMINISTIC fake
decode (bytes -> pixel grid / PCM samples, pure numpy, stable across
partitionings), and ``codec="real"`` raises ``NotImplementedError``
with the cv2 call that belongs there. Everything on the Spark side —
schemas, batch iteration, partitioning, output widths, registry
integration — is real and tested (tests/test_multimodal.py).

Scale notes: decode is the bandwidth hog, so it runs as ``mapInPandas``
directly over the scan (no shuffle, column-pruned to (id, data, meta));
per-media feature vectors are fixed-width arrays that drop straight
into the extract() assembly; frame sampling EXPLODES videos into frame
rows — done inside the same mapInPandas pass so the binary blob is
sliced once and never shuffled whole.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

META_TYPE = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("format", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("data", BinaryType()),
        StructField("meta", META_TYPE),
    ]
)


def generate_media(
    spark: SparkSession, n: int = 64, seed: int = 42, kind: str = "image"
) -> DataFrame:
    """Deterministic synthetic media table (JVM-side expressions only):
    payload bytes come from chained sha2 chunks of (seed, media_id), so
    the same rows appear at any parallelism. Images are 8x8x1..3,
    audio is 1 s at 800 Hz, video is 4..9 frames of 8x8."""
    df = spark.range(n).select(
        F.concat(F.lit(f"{kind[:2]}-"), F.format_string("%05d", "id")).alias(
            "media_id"
        ),
        F.lit(kind).alias("kind"),
        F.col("id"),
    )
    # 32 bytes per sha2-chunk; chain chunks for longer payloads
    chunks = [
        F.unhex(F.sha2(F.concat(F.lit(str(seed)), F.col("media_id"), F.lit(i)), 256))
        for i in range(6 if kind == "video" else 3)
    ]
    df = df.withColumn("data", F.concat(*chunks))
    if kind == "image":
        meta = F.struct(
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int").alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit("fake-img").alias("format"),
        )
    elif kind == "audio":
        meta = F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(1).alias("channels"),
            F.lit(800).alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit("fake-pcm8").alias("format"),
        )
    else:
        meta = F.struct(
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(1).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.pmod(F.col("id"), F.lit(6)) + 4).cast("int").alias("n_frames"),
            F.lit("fake-vid").alias("format"),
        )
    return df.select("media_id", "kind", "data", meta.alias("meta"))


# ---------------------------------------------------------------------------
# decode (codec boundary — stubbed)
# ---------------------------------------------------------------------------


def _fake_pixels(data: bytes, w: int, h: int, c: int) -> np.ndarray:
    """Deterministic fake decode: tile payload bytes into (h, w, c) in
    [0, 255]. Pure function of (bytes, dims) — the test invariant."""
    raw = np.frombuffer(data, dtype=np.uint8)
    need = w * h * c
    reps = int(np.ceil(need / len(raw)))
    return np.tile(raw, reps)[:need].astype(np.float64).reshape(h, w, c)


def _fake_pcm(data: bytes, n_samples: int) -> np.ndarray:
    raw = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
    reps = int(np.ceil(n_samples / len(raw)))
    return (np.tile(raw, reps)[:n_samples] - 127.5) / 127.5


DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("pixels", ArrayType(DoubleType())),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def decode_images(df: DataFrame, codec: str = "fake") -> DataFrame:
    """binary -> flat pixel array (row-major h,w,c) + dims, via ONE
    mapInPandas pass (the ReadImage analog, protosc/io.py:5-26).

    ``codec="png"`` decodes REAL PNG blobs (protosc_spark.png — pure
    stdlib-zlib + numpy, all five scanline filters, grey/RGB/RGBA/
    palette); ``codec="jpeg"`` decodes REAL baseline/extended-
    sequential AND progressive JPEG blobs (protosc_spark.jpeg — pure
    numpy: Huffman, dequant, exact IDCT, 4:2:0/4:2:2 upsample, YCbCr,
    all four T.81 Annex-G progressive scan kinds, plus lossless SOF3
    with all 7 Annex-H predictors). Dims come from the blob's own
    header, not the meta column. ``codec="real"``
    (arithmetic-coded JPEG & exotic formats) still needs cv2
    and raises with the production call documented. ``codec="fake"``
    is the deterministic sandbox codec.
    """
    if codec == "real":
        raise NotImplementedError(
            "arithmetic-coded JPEG and other exotic formats "
            "need cv2 (cv2.imdecode(np.frombuffer(data, np.uint8), "
            "cv2.IMREAD_COLOR)); not available in this container — PNG "
            "decodes for real via codec='png', sequential + "
            "progressive + lossless + hierarchical JPEG via "
            "codec='jpeg'"
        )
    if codec in ("png", "jpeg"):
        if codec == "png":
            from protosc_spark.png import decode_png as _decode_fn
        else:
            from protosc_spark.jpeg import decode_jpeg as _decode_fn

        def _decode_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                px, ws, hs, cs = [], [], [], []
                for blob in pdf["data"]:
                    img = _decode_fn(bytes(blob))
                    px.append(img.astype(np.float64).ravel())
                    hs.append(img.shape[0])
                    ws.append(img.shape[1])
                    cs.append(img.shape[2])
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "pixels": px,
                        "width": pd.Series(ws, dtype="int32"),
                        "height": pd.Series(hs, dtype="int32"),
                        "channels": pd.Series(cs, dtype="int32"),
                    }
                )

        return df.select("media_id", "data", "meta").mapInPandas(
            _decode_real, schema=DECODED_IMAGE_SCHEMA
        )
    if codec != "fake":
        raise ValueError(codec)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "pixels": [
                    _fake_pixels(d, m["width"], m["height"], m["channels"]).ravel()
                    for d, m in zip(pdf["data"], pdf["meta"])
                ],
                "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                "channels": pdf["meta"].map(lambda m: m["channels"]).astype("int32"),
            }
            yield pd.DataFrame(out)

    return df.select("media_id", "data", "meta").mapInPandas(
        _decode, schema=DECODED_IMAGE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_k: int = 2, codec: str = "fake") -> DataFrame:
    """Video frame sampling: explode every k-th frame to its own row
    (media_id, frame_idx, frame bytes) inside one mapInPandas pass —
    the blob is sliced where it is scanned, never shuffled whole.

    ``codec="mjpeg"`` parses REAL AVI/Motion-JPEG containers
    (protosc_spark.avi — RIFF chunk walk; each sampled frame is one
    complete JPEG blob, decodable by decode_images(codec='jpeg'));
    ``codec="real"`` (inter-frame codecs: H.264/VP9/AV1) still needs
    cv2/pyav and raises with the production call documented;
    ``codec="fake"`` is the deterministic sandbox codec."""
    if codec == "real":
        raise NotImplementedError(
            "inter-frame video codecs need cv2.VideoCapture / pyav; "
            "not available in this container — AVI/MJPEG inputs are "
            "parsed for real via codec='mjpeg'"
        )
    if codec not in ("fake", "mjpeg"):
        raise ValueError(codec)
    if codec == "mjpeg":
        from protosc_spark.avi import parse_avi

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            # column zips, not iterrows (engine rule: no per-row pandas
            # iteration inside Arrow kernels; zip over columns is the
            # decode_images pattern)
            for mid, data, m in zip(pdf["media_id"], pdf["data"], pdf["meta"]):
                if codec == "mjpeg":
                    _meta, frames = parse_avi(bytes(data))
                    for fi in range(0, len(frames), every_k):
                        ids.append(mid)
                        idxs.append(fi)
                        blobs.append(frames[fi])
                    continue
                n_frames = int(m["n_frames"])
                frame_bytes = int(m["width"]) * int(m["height"]) * int(m["channels"])
                raw = bytes(data)
                reps = -(-n_frames * frame_bytes // len(raw))
                raw = (raw * reps)[: n_frames * frame_bytes]
                for fi in range(0, n_frames, every_k):
                    ids.append(mid)
                    idxs.append(fi)
                    blobs.append(raw[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame": blobs}
            )

    return df.select("media_id", "data", "meta").mapInPandas(
        _frames, schema=FRAME_SCHEMA
    )


# ---------------------------------------------------------------------------
# feature extractors over decoded media (protosc visual-pipeline analogs)
# ---------------------------------------------------------------------------

HIST_STEPS = 8
RESIZE_TO = 4  # PixelFeatures newsize analog (4x4)


def image_feature_udf(hist_steps: int = HIST_STEPS, resize_to: int = RESIZE_TO):
    """pandas UDF: pixels+dims -> fixed-width feature vector
    [grey mean, grey std, intensity histogram(hist_steps, density),
    resize_to x resize_to block-mean thumbnail] — the GreyScale +
    ColorFeatures (protosc/feature_extraction/color.py:36-39) +
    PixelFeatures (pixel.py:7-47) analogs, vectorized per Arrow batch."""
    width = 2 + hist_steps + resize_to * resize_to

    @F.pandas_udf(ArrayType(DoubleType()))
    def _feats(
        pixels: pd.Series, w: pd.Series, h: pd.Series, c: pd.Series
    ) -> pd.Series:
        out = []
        for px, wi, hi, ci in zip(pixels, w, h, c):
            img = np.asarray(px, dtype=np.float64).reshape(hi, wi, ci)
            grey = img.mean(axis=2)
            hist, _ = np.histogram(grey, bins=hist_steps, range=(0, 255),
                                   density=True)
            bh, bw = hi // resize_to, wi // resize_to
            thumb = grey[: bh * resize_to, : bw * resize_to].reshape(
                resize_to, bh, resize_to, bw
            ).mean(axis=(1, 3))
            out.append(
                np.concatenate(
                    [[grey.mean(), grey.std()], hist, thumb.ravel() / 255.0]
                )
            )
        return pd.Series(out)

    return _feats, width


def image_features(decoded: DataFrame) -> DataFrame:
    udf, width = image_feature_udf()
    return decoded.select(
        "media_id",
        udf(F.col("pixels"), F.col("width"), F.col("height"), F.col("channels"))
        .alias("img_features"),
    ), width


AUDIO_WIN = 100


def audio_features(df: DataFrame, codec: str = "fake") -> DataFrame:
    """binary audio -> [rms, zero-crossing rate, 8-window rms
    envelope]; one mapInPandas pass, width fixed at 10.

    ``codec="wav"`` decodes REAL RIFF/WAVE blobs (protosc_spark.wav —
    pure numpy, PCM 8/16/24/32 + IEEE float, G.711 mu-law/A-law and
    IMA ADPCM telephony compression, multi-channel averaged to mono);
    ``codec="flac"`` decodes REAL FLAC blobs (protosc_spark.flac —
    pure numpy, full subframe/residual surface, losslessly bit-exact);
    ``codec="real"`` (the lossy PERCEPTUAL codecs: MP3/AAC/Opus/
    Vorbis) still needs soundfile/librosa and raises with the
    production call documented; ``codec="fake"`` is the deterministic
    sandbox codec."""
    if codec == "real":
        raise NotImplementedError(
            "perceptual-codec audio decode needs soundfile (soundfile."
            "read(io.BytesIO(data))) or librosa; not available in this "
            "container — WAV (PCM/float/G.711/IMA-ADPCM) inputs are "
            "decoded for real via codec='wav', FLAC via codec='flac'"
        )
    if codec not in ("fake", "wav", "flac"):
        raise ValueError(codec)

    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("audio_features", ArrayType(DoubleType())),
        ]
    )
    if codec == "wav":
        from protosc_spark.wav import decode_wav as _decode_audio
    elif codec == "flac":
        from protosc_spark.flac import decode_flac as _decode_audio

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for data, m in zip(pdf["data"], pdf["meta"]):
                if codec in ("wav", "flac"):
                    _sr, ch = _decode_audio(bytes(data))
                    pcm = ch.mean(axis=1)  # mono mixdown
                else:
                    sr = int(m["sample_rate"])
                    pcm = _fake_pcm(bytes(data), sr)  # 1 second
                rms = float(np.sqrt(np.mean(pcm**2)))
                zcr = float(np.mean(np.abs(np.diff(np.sign(pcm))) > 0))
                env = (
                    pcm[: (len(pcm) // 8) * 8]
                    .reshape(8, -1)
                )
                env_rms = np.sqrt((env**2).mean(axis=1))
                vecs.append(np.concatenate([[rms, zcr], env_rms]))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "audio_features": vecs}
            )

    return df.select("media_id", "data", "meta").mapInPandas(_feats, schema)


def media_pipeline(df: DataFrame) -> tuple[DataFrame, int]:
    """decode -> image features, returning (media_id, img_features)."""
    decoded = decode_images(df)
    return image_features(decoded)
