"""Bucketed-table co-location: the shuffle-elimination pattern for
repeated big-big joins at 100 TB.

The engine's own sink already clusters output by
``pmod(xxhash64(conv_id), n_buckets)`` (jobs/extract.py), which
bounds file counts and makes resume bucket-atomic — but a plain
parquet directory does not RECORD its clustering, so Spark must
re-shuffle both sides of every later join on that key. Writing
through the catalog with ``bucketBy`` persists the bucket spec in
table metadata; any subsequent equi-join (or aggregation) on the
bucket key between tables with the same bucket count is planned
WITHOUT an Exchange on either side — at 10^12-turn scale that is the
difference between re-shuffling tens of TB per downstream join and
reading co-located files.

When to use which (the 100-TB decision):
- one-shot join against a small side  -> ``broadcast()`` (no shuffle
  at all; see dedup/similarity operators);
- one-shot join of two big sides      -> let AQE plan the exchange
  (paying it once is cheaper than bucketing first);
- a big table joined/aggregated on the same key by MANY downstream
  jobs (the corpus<->signature / corpus<->metadata shape of a
  training-data pipeline) -> write it bucketed ONCE with
  ``write_bucketed``; every later job skips its side of the shuffle.

``sortBy(key)`` is included so the sort-merge join's per-task sort is
also satisfied from file order where Spark can use it; bucket counts
must match across the tables being joined (document the count next
to the table, as done here via the returned spec).

Sandbox note: uses the in-memory catalog with an explicit
``option("path", ...)`` (external table) — no Hive metastore needed;
on a real cluster the same code against a shared catalog (HMS/Glue/
Unity) makes the co-location visible to every job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join"]


def write_bucketed(df: DataFrame, table: str, path: str, key: str,
                   n_buckets: int = 64) -> dict:
    """Persist ``df`` as a bucketed+sorted external table and return
    its spec ``{table, path, key, n_buckets}`` (callers keep it next
    to the table name: joins only co-locate when bucket counts
    match)."""
    (df.write.format("parquet")
       .bucketBy(n_buckets, key)
       .sortBy(key)
       .option("path", path)
       .mode("overwrite")
       .saveAsTable(table))
    return {"table": table, "path": path, "key": key,
            "n_buckets": n_buckets}


def bucketed_join(spark: SparkSession, left: dict, right: dict,
                  how: str = "inner") -> DataFrame:
    """Join two ``write_bucketed`` outputs on their shared bucket key.
    Validates that the specs actually co-locate (same key, same
    bucket count) — a silent mismatch would still run, just with the
    full shuffle this function exists to avoid."""
    if left["key"] != right["key"]:
        raise ValueError(f"bucket keys differ: {left['key']} vs "
                         f"{right['key']}")
    if left["n_buckets"] != right["n_buckets"]:
        raise ValueError(
            f"bucket counts differ ({left['n_buckets']} vs "
            f"{right['n_buckets']}): Spark would insert an Exchange "
            "to reconcile them — rewrite one table")
    lt = spark.table(left["table"])
    rt = spark.table(right["table"])
    return lt.join(rt, left["key"], how)
