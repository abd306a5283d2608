"""Per-partition checkpoint lineage + idempotent resume.

Mechanism (SURVEY §3.2 stage 2/6):

- The input is bucketed by ``pmod(xxhash64(conv_id), n_buckets)`` — a
  *stable* partition id, independent of file layout, so a resumed run
  sees the same buckets whatever the cluster shape.
- After each successful bucket write, one lineage row
  (partition_id, n_rows, content_hash) is appended to the manifest.
  content_hash is an order-insensitive XOR of per-row
  xxhash64(conv_id, turn_idx, extracted_text) — so a re-run can verify
  integrity, and duplicated work is detectable, not just avoidable.
- Resume = left_anti join of the input against completed manifest
  partition ids. The parse kernel is a pure function of `text`, so
  re-running a bucket is idempotent by construction; output is written
  with partitionBy(partition_id) + dynamic partition overwrite, making
  bucket-level retries atomic-enough on a filesystem and exactly the
  Iceberg overwrite-partition commit in production.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["with_partition_id", "load_manifest", "completed_partitions",
           "filter_resume", "lineage_rows", "append_manifest",
           "run_checkpointed"]

MANIFEST_SCHEMA = ("partition_id long, n_rows long, content_hash long, "
                   "run_id string")


def with_partition_id(df: DataFrame, n_buckets: int,
                      key_col: str = "conv_id") -> DataFrame:
    return df.withColumn(
        "partition_id",
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("long"))


def load_manifest(spark: SparkSession, path: str) -> Optional[DataFrame]:
    if not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def completed_partitions(spark: SparkSession, path: str) -> Optional[DataFrame]:
    m = load_manifest(spark, path)
    if m is None:
        return None
    return m.select("partition_id").distinct()


def filter_resume(df: DataFrame, spark: SparkSession,
                  manifest_path: str) -> DataFrame:
    """Drop rows whose bucket is already committed (left_anti)."""
    done = completed_partitions(spark, manifest_path)
    if done is None:
        return df
    return df.join(F.broadcast(done), "partition_id", "left_anti")


def lineage_rows(out: DataFrame, run_id: str) -> DataFrame:
    """(partition_id, n_rows, content_hash, run_id) per bucket.
    content_hash: order-insensitive XOR of per-row content hashes."""
    row_hash = F.xxhash64("conv_id", "turn_idx", "extracted_text")
    return (out.groupBy("partition_id")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.bit_xor(row_hash).alias("content_hash"))
            .withColumn("run_id", F.lit(run_id)))


def append_manifest(lineage: DataFrame, path: str) -> None:
    lineage.write.mode("append").parquet(path)


def run_checkpointed(spark: SparkSession, df: DataFrame, output_path: str,
                     manifest_path: str, n_buckets: int = 64,
                     run_id: str = "run-0", key_col: str = "conv_id",
                     extract_kwargs: Optional[dict] = None) -> DataFrame:
    """Full checkpointed pipeline: bucket → resume-filter → extract →
    write(partitionBy bucket, dynamic overwrite) → lineage append.
    Returns the lineage rows of THIS run (empty if nothing to do)."""
    from .extract import extract_transcripts

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    bucketed = with_partition_id(df, n_buckets, key_col)
    todo = filter_resume(bucketed, spark, manifest_path)
    if todo.isEmpty():
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    out = extract_transcripts(todo, **(extract_kwargs or {}))
    out.write.mode("overwrite").partitionBy("partition_id") \
        .parquet(output_path)
    written = spark.read.parquet(output_path).join(
        F.broadcast(todo.select("partition_id").distinct()),
        "partition_id", "left_semi")
    lineage = lineage_rows(written, run_id)
    append_manifest(lineage, manifest_path)
    return lineage
