"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode step needs media libraries (Pillow/librosa/av) that this
container does not ship — each decoder is a clearly-marked deterministic
fake behind an import-try (per the task contract), while the Spark-side
plumbing is real and tested: schema, Arrow batch shape, ``mapInPandas``
iterator protocol, partition sizing, and the explode of variable-length
outputs (audio windows, video frame samples).

At 100 TB the shape matters more than the decoder: media bytes dominate row
size, so ``spark.sql.files.maxPartitionBytes`` governs batch memory, the
metadata struct carries everything filterable (codec, dims, duration) so
scans prune WITHOUT touching bytes, and every UDF is iterator-style
``mapInPandas`` so one Arrow batch of blobs is in memory at a time.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_ts_ms", IntegerType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)


def _fake_embedding(content: bytes, dim: int = 16) -> np.ndarray:
    """STUB DECODER: deterministic bytes->vector fake. A real deployment
    replaces this with PIL/torchvision decode + model inference; the Spark
    plumbing around it is unchanged."""
    h = hashlib.sha256(content).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def decode_image_real(content: bytes):  # pragma: no cover - lib not shipped
    """Real decode path, import-gated (container ships no Pillow)."""
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(content))
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow, not installed in this environment"
        ) from e


def image_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """images -> (media_id, width, height, embedding) via mapInPandas.

    Iterator-of-batches form: one Arrow batch of blobs resident at a time.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": [int(m["width"]) for m in pdf["meta"]],
                    "height": [int(m["height"]) for m in pdf["meta"]],
                    "embedding": [
                        _fake_embedding(bytes(c), dim).tolist() for c in pdf["content"]
                    ],
                }
            )

    return media.mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


def video_frame_samples(media: DataFrame, every_ms: int = 1000, dim: int = 16) -> DataFrame:
    """videos -> one row per sampled frame (variable-length explode inside
    mapInPandas): (media_id, frame_idx, frame_ts_ms, embedding)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            if pdf.empty:
                continue
            out = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "embedding": []}
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                dur = int(meta["duration_ms"] or 0)
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(ts)
                    # STUB: frame decode faked as hash(content || ts)
                    out["embedding"].append(
                        _fake_embedding(bytes(content) + ts.to_bytes(4, "little"), dim).tolist()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, FRAME_SCHEMA)


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("window_idx", IntegerType(), False),
        StructField("start_ms", IntegerType(), False),
        StructField("end_ms", IntegerType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)


def audio_windows(media: DataFrame, window_ms: int = 500, dim: int = 16) -> DataFrame:
    """audio -> one row per fixed-length analysis window (the audio twin
    of video_frame_samples): (media_id, window_idx, start_ms, end_ms,
    embedding). Decode is STUBBED (no audio libs in this container) as a
    deterministic hash of (content, window start); the Spark plumbing —
    variable-length explode inside iterator-batched mapInPandas — is real.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "audio"]
            if pdf.empty:
                continue
            out = {"media_id": [], "window_idx": [], "start_ms": [], "end_ms": [], "embedding": []}
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                dur = int(meta["duration_ms"] or 0)
                for i, ts in enumerate(range(0, max(dur, 1), window_ms)):
                    out["media_id"].append(mid)
                    out["window_idx"].append(i)
                    out["start_ms"].append(ts)
                    out["end_ms"].append(min(ts + window_ms, dur))
                    # STUB: window decode faked as hash(content || ts)
                    out["embedding"].append(
                        _fake_embedding(bytes(content) + ts.to_bytes(4, "little"), dim).tolist()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, AUDIO_WINDOW_SCHEMA)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media corpus for plumbing tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        content = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        meta = {
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
            "width": 64 + i % 8 if kind == "image" else None,
            "height": 48 + i % 8 if kind == "image" else None,
            "duration_ms": 3000 + 100 * (i % 5) if kind != "image" else None,
        }
        rows.append((i, kind, bytearray(content), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
