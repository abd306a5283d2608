"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship extraction pipeline on sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-equivalent SQL for every SQL-expressible query;
                 non-expressible ops (kernel quirks, LSH, …) are
                 deliberately omitted → rows-only check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from htmlparser_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts extraction pipeline (salted repartition →
    fused parse/extract kernel → stable turn ordering) at sf0.001."""
    return QUERIES["transcripts_e2e"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
