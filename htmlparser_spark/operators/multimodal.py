"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, Arrow batch shapes, partitioning,
UDF signatures) is real and tested; the actual media decode is STUBBED
(this container ships no image/audio libs): ``decode_image_features``
raises NotImplementedError unless ``fake=True``, in which case it
produces a deterministic feature vector derived from the bytes — so
downstream operators (dedup, ANN) are exercised end-to-end.

At 100 TB, media bytes dominate IO: keep blobs in their own column
(Parquet column pruning skips them for metadata-only queries), size
`spark.sql.files.maxPartitionBytes` so one task holds a bounded number
of blobs, and cap Arrow batches (session.py) so a batch of large blobs
fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

__all__ = ["MEDIA_SCHEMA", "attach_media_blob", "media_metadata",
           "decode_image_features", "frame_sample_stub"]

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("media_type", StringType(), False),   # image|audio|video
    StructField("blob", BinaryType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])


def attach_media_blob(df: DataFrame, text_col: str = "text",
                      media_type: str = "image") -> DataFrame:
    """Synthesize a deterministic binary blob column from text (stand-in
    for real media bytes; exercises BinaryType through Arrow)."""
    return (df
            .withColumn("media_type", F.lit(media_type))
            .withColumn("blob", F.encode(F.col(text_col), "UTF-8"))
            .withColumn("width", (F.length(text_col) % 640 + 1).cast("int"))
            .withColumn("height", (F.length(text_col) % 480 + 1).cast("int"))
            .withColumn("duration_ms", F.lit(None).cast("int")))


def media_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Metadata-only pass: byte length + sha256 — JVM-side, and Parquet
    column pruning means a metadata query never reads other columns."""
    return df.withColumn("n_bytes", F.length(F.col(blob_col)).cast("long")) \
             .withColumn("sha", F.sha2(F.col(blob_col), 256))


def decode_image_features(df: DataFrame, blob_col: str = "blob",
                          n_features: int = 8, fake: bool = False,
                          key_cols=("doc_id",)) -> DataFrame:
    """Decode → feature-extract stage over mapInPandas.

    Real decode is NOT available in this environment; with fake=True a
    deterministic sha256-derived vector stands in so the batch shape,
    schema and partitioning are real. With fake=False this raises
    NotImplementedError (clearly-marked stub).
    """
    key_cols = list(key_cols)
    schema = StructType(
        [df.schema[k] for k in key_cols]
        + [StructField("features", ArrayType(FloatType()), True)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/libvips — not present in "
                    "this container; pass fake=True for the deterministic "
                    "stand-in feature extractor")
            feats = []
            for blob in pdf[blob_col]:
                if blob is None:
                    feats.append(None)
                    continue
                digest = hashlib.sha256(bytes(blob)).digest()
                v = np.frombuffer(digest[:4 * n_features], dtype=np.uint32)
                feats.append((v.astype(np.float32)
                              / np.float32(2**32)).tolist())
            out = pdf[key_cols].copy()
            out["features"] = feats
            yield out

    return df.select(*key_cols, blob_col).mapInPandas(fn, schema)


def frame_sample_stub(df: DataFrame, blob_col: str = "blob",
                      every_ms: int = 1000, key_cols=("doc_id",)) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    (frame_idx, ts_ms, frame_blob). Decode stubbed: frame_blob is a
    deterministic slice of the source bytes."""
    key_cols = list(key_cols)
    schema = StructType(
        [df.schema[k] for k in key_cols] + [
            StructField("frame_idx", IntegerType(), False),
            StructField("ts_ms", IntegerType(), False),
            StructField("frame_blob", BinaryType(), True),
        ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = {k: [] for k in key_cols}
            fidx, ts, blobs = [], [], []
            for row in pdf[key_cols + [blob_col]].itertuples(index=False):
                blob = row[-1]
                if blob is None:
                    continue
                b = bytes(blob)
                n_frames = max(1, min(4, len(b) // 64))
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    for k, v in zip(key_cols, row[:-1]):
                        keys[k].append(v)
                    fidx.append(i)
                    ts.append(i * every_ms)
                    blobs.append(b[i * step:(i + 1) * step])
            yield pd.DataFrame({**keys, "frame_idx": fidx, "ts_ms": ts,
                                "frame_blob": blobs})

    return df.select(*key_cols, blob_col).mapInPandas(fn, schema)
