"""SparkSession helper with scale-aware defaults.

Settings rationale (targets a multi-executor cluster; local[N] here):
- AQE on: runtime coalescing + skew-split for the ordering shuffle.
- Arrow batches capped: one mega-turn (multi-MB text) times 10k rows
  per batch would OOM an executor; 512 rows bounds batch memory while
  keeping Arrow transfer efficient.
- shuffle.partitions ≈ cores locally; on a real cluster set it to
  2-3× total executor cores via spark-submit conf.
- session timezone pinned UTC so timestamp semantics match the DuckDB
  oracle and are cluster-invariant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "default_parallelism"]


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app: str = "htmlparser_spark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              arrow_max_records: int = 512) -> SparkSession:
    cores = cores or default_parallelism()
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    return (
        SparkSession.builder.appName(app)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # runtime skew-split for the dedup/selector self-joins: one
        # hot LSH band or selector key gets split across tasks even
        # below the explicit cap_buckets threshold
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(arrow_max_records))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
