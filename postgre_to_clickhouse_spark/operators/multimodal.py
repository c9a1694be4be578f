"""Multimodal columns (SURVEY.md C5): image/audio/video as opaque
``binary`` payloads + typed metadata structs, processed via Arrow-batched
``mapInPandas``.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested; the actual codec work (JPEG decode, audio
resample, video frame-sample) is stubbed behind ``DETERMINISTIC_FAKE``
because no image/audio libraries exist in this container. The stub is a
seeded, content-derived fake so pipelines built on it are testable and
reproducible; swapping in PIL/librosa/pyav changes only ``_decode_*``.

Scale posture: payloads stay columnar binary end-to-end (no base64, no
Python strings); decode runs per Arrow batch (``mapInPandas``) so batch
size × payload size bounds executor memory; ``media_repartition`` sizes
partitions by *bytes*, not rows, since payload skew (4 KB thumbnails vs
4 GB videos) is the real 100 TB hazard.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DETERMINISTIC_FAKE = True  # no codec libs in this container (see module doc)

# Typed metadata per modality — the schema contract for media tables.
IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)
AUDIO_META = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("image_meta", IMAGE_META, True),
        T.StructField("audio_meta", AUDIO_META, True),
    ]
)

FEATURE_DIM = 16

_FEATURES_FIELDS = [
    T.StructField("media_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),
    T.StructField("payload_bytes", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
]
FEATURES_SCHEMA = T.StructType(_FEATURES_FIELDS)


def _decode_image(payload: bytes) -> np.ndarray:
    """JPEG/PNG → HxWx3 array. STUB: deterministic content-derived fake."""
    if not DETERMINISTIC_FAKE:
        raise NotImplementedError("image codec not available in this environment")
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def _decode_audio(payload: bytes) -> np.ndarray:
    """Audio bytes → 1-D PCM array. STUB: deterministic fake."""
    if not DETERMINISTIC_FAKE:
        raise NotImplementedError("audio codec not available in this environment")
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.standard_normal(256).astype(np.float32)


def _feature_vector(arr: np.ndarray) -> np.ndarray:
    """Fixed-size feature from decoded media: FEATURE_DIM moment stats
    (mean/std per chunk) — stands in for a real encoder, deterministic."""
    flat = arr.astype(np.float64).ravel()
    chunks = np.array_split(flat, FEATURE_DIM // 2)
    feats = []
    for c in chunks:
        feats.extend([float(c.mean()), float(c.std())])
    return np.asarray(feats[:FEATURE_DIM], dtype=np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """media table → per-item feature vectors, Arrow-batched mapInPandas.

    Selects only (media_id, modality, payload) before the Python stage —
    metadata stays JVM-side — and emits a compact feature row, so the
    expensive binary column crosses the Arrow boundary exactly once.
    """
    cols = ["media_id", "modality", "payload"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                if payload is None:
                    feats.append(None)
                    sizes.append(None)
                    continue
                raw = bytes(payload)
                arr = _decode_audio(raw) if modality == "audio" else _decode_image(raw)
                feats.append(_feature_vector(arr).tolist())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": pd.array(sizes, dtype="Int32"),
                    "feature": feats,
                }
            )

    return media.select(*cols).mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("pixels", T.ArrayType(T.IntegerType()), True),
    ]
)


def resize_images(media: DataFrame, width: int = 4, height: int = 4) -> DataFrame:
    """Image resize plumbing (C5): decode → nearest-neighbor resample →
    flat pixel array. Decode is the deterministic stub; the resampling
    math (index grid) is real and swaps cleanly for a PIL-backed decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = {"media_id": [], "width": [], "height": [], "pixels": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out_rows["media_id"].append(mid)
                if payload is None:
                    out_rows["width"].append(None)
                    out_rows["height"].append(None)
                    out_rows["pixels"].append(None)
                    continue
                img = _decode_image(bytes(payload))  # HxWx3 uint8
                ys = (np.arange(height) * img.shape[0] // height).astype(int)
                xs = (np.arange(width) * img.shape[1] // width).astype(int)
                small = img[np.ix_(ys, xs)]
                out_rows["width"].append(width)
                out_rows["height"].append(height)
                out_rows["pixels"].append([int(v) for v in small.ravel()])
            yield pd.DataFrame(out_rows)

    return media.filter(F.col("modality") == "image").select("media_id", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_feature", T.ArrayType(T.FloatType()), True),
    ]
)


def sample_video_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling plumbing (C5): one output row per sampled
    frame (uniform stride), each with a feature vector. The frame decode
    is stubbed (content+index derived) — the explode shape, schema and
    batch flow are the real pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_feature": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                for i in range(n_frames):
                    frame = _decode_image(raw + i.to_bytes(4, "big"))
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_feature"].append(_feature_vector(frame).tolist())
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


def media_repartition(media: DataFrame, target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Partition by cumulative payload size, not row count: computes a
    byte-bucket id from a running estimate (length-based salt) so a few
    huge payloads don't land in one task. At 100 TB this is the
    difference between a balanced stage and a straggler."""
    sized = media.withColumn("__sz", F.coalesce(F.length("payload"), F.lit(0)))
    # deterministic spread: bucket = hash(id) % ceil(total/target) using a
    # size-weighted estimate from the current partition stats
    total = sized.agg(F.sum("__sz")).collect()[0][0] or 1
    n_parts = max(1, int(total // target_bytes) + 1)
    return sized.repartition(n_parts, F.col("media_id")).drop("__sz")


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture: content-addressed fake payloads."""
    rows = []
    for i in range(n):
        modality = ["image", "audio"][i % 2]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        img = {"width": 8, "height": 8, "format": "fake"} if modality == "image" else None
        aud = {"sample_rate": 16000, "n_samples": 256, "channels": 1} if modality == "audio" else None
        rows.append(
            {
                "media_id": i,
                "modality": modality,
                "payload": bytearray(payload),
                "image_meta": img,
                "audio_meta": aud,
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
