"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Design (BASELINE.json north star; no decode libraries exist in this
container, so the byte->pixels step is stubbed — everything Spark-side is
real and tested):

- payloads are opaque BINARY columns + a typed metadata struct
  (modality/format/width/height/duration_ms/sample_rate), the standard
  lakehouse layout for mixed media;
- decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  over Arrow batches — bytes never pass through Python row-at-a-time;
- batches are size-bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  and ``maxPartitionBytes`` so a partition of large blobs still fits executor
  memory; repartition by id before heavy extraction for even load.

The stub decoder is deterministic (seeded from the payload bytes) so tests
pin exact values; swap `_decode_stub` with a real codec (PIL/ffmpeg) on a
cluster image that has one — the signature is the contract.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
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
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("fmt", StringType(), True),  # jpeg | png | wav | mp4 ...
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_hash", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("frame_payload", BinaryType(), False),
    ]
)

DECODE_IS_STUBBED = True  # flip when a real codec is wired in


def _decode_stub(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decode + embed': sha256-seeded feature vector.

    Replaces PIL/ffmpeg decode (NOT available in this container).  Keeps the
    exact shape/dtype contract a real decoder would have: float32[dim]."""
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """payload -> (n_bytes, content_hash, feature float32[dim]) per media row.

    Arrow-batched mapInPandas: numpy work per batch, no row-at-a-time Python.
    The real-decoder swap point is `_decode_stub`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            feats = [_decode_stub(p, dim) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) for p in payloads],
                    "content_hash": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return df.select("media_id", "modality", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Stubbed image resize: passes metadata through with new dims; payload
    transform raises until a codec is wired in (clearly-marked stub)."""
    if DECODE_IS_STUBBED:
        # metadata-only path: real pipelines use this to plan storage before
        # running the (expensive, codec-bound) pixel pass
        return df.withColumn("width", F.lit(width).cast("int")).withColumn(
            "height", F.lit(height).cast("int")
        )
    raise NotImplementedError("wire a codec into _decode_stub first")


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: emit one (deterministic stub) frame per
    `every_ms` of duration.  Real plumbing: the row explosion, timestamps and
    per-frame payload column are exactly what a real ffmpeg pass produces."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_payload": []}
            for _, row in pdf.iterrows():
                dur = 0 if pd.isna(row["duration_ms"]) else int(row["duration_ms"])
                payload = bytes(row["payload"] or b"")
                n = max(dur // every_ms, 1) if row["modality"] == "video" else 0
                for i in range(n):
                    # stub "frame": content-addressed slice marker, NOT pixels
                    marker = hashlib.sha256(
                        payload + i.to_bytes(4, "big")
                    ).digest()
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame_payload"].append(marker)
            yield pd.DataFrame(out)

    return df.select("media_id", "modality", "duration_ms", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-SQL metadata aggregation over a media table (no Python)."""
    return df.groupBy("modality").agg(
        F.count("*").alias("cnt"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max("width").alias("max_w"),
        F.max("height").alias("max_h"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests/benches (no codec needed)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        rows.append(
            (
                i,
                modality,
                {"image": "jpeg", "audio": "wav", "video": "mp4"}[modality],
                payload,
                64 if modality == "image" else None,
                48 if modality == "image" else None,
                3000 if modality == "video" else None,
                16000 if modality == "audio" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
