"""Streaming extraction: readStream → parse kernel → stateful ops → sink."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernel import extract_result_schema, make_extract_fn
from ..sources.transcripts import TRANSCRIPTS_SCHEMA_DDL

__all__ = [
    "read_transcripts_stream", "extract_stream", "conv_running_state",
    "turn_rates", "write_extracted_stream", "dedup_stream",
]


def dedup_stream(sdf: DataFrame, watermark: str = "10 minutes",
                 key_cols=("conv_id", "turn_idx", "text")) -> DataFrame:
    """Streaming exact dedup: drop duplicate deliveries (source
    retries, at-least-once upstreams) by content hash within the
    event-time watermark. State is bounded by the watermark horizon —
    the streaming analogue of exact_dedup's hash-key design: the dedup
    state stores a 12-byte (hash, length) key, never documents. The
    total length of the key columns is the same cheap second
    discriminator the batch exact path uses, so two distinct rows
    colliding in the 64-bit hash are only merged if they ALSO share
    total key length (P ≈ 2⁻⁶⁴ · P(len equal) per in-horizon pair)."""
    cols = [F.col(c) for c in key_cols]
    hashed = (sdf.withColumn("_h", F.xxhash64(*cols))
              .withColumn("_hl", sum((F.length(c.cast("string"))
                                      for c in cols[1:]),
                                     F.length(cols[0].cast("string")))))
    return (hashed.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["_h", "_hl"]).drop("_h", "_hl"))


def read_transcripts_stream(spark: SparkSession, path: str,
                            fmt: str = "parquet",
                            max_files_per_trigger: int | None = None
                            ) -> DataFrame:
    """File-source stream of the transcripts table (new files under
    ``path`` become micro-batches; with Iceberg on the cluster this is
    ``readStream.format('iceberg')`` over table snapshots)."""
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def extract_stream(sdf: DataFrame, *, strip: bool = True,
                   include_raw: bool = False,
                   keep_text: bool = False) -> DataFrame:
    """The batch parse kernel applied to a streaming DataFrame —
    identical Arrow-batch function, so streaming output is byte-equal
    to the batch pipeline on the same rows."""
    schema = extract_result_schema(
        sdf.schema, include_raw=include_raw,
        drop_cols=() if keep_text else ("text",))
    fn = make_extract_fn(text_col="text", strip=strip,
                         include_raw=include_raw, drop_text=not keep_text)
    return sdf.mapInPandas(fn, schema)


_CONV_STATE_SCHEMA = StructType([
    StructField("n_turns", LongType()),
    StructField("max_turn_idx", IntegerType()),
    StructField("content_hash", LongType()),
])

_CONV_OUT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("n_turns", LongType()),
    StructField("max_turn_idx", IntegerType()),
    StructField("content_hash", LongType()),
])


def _conv_state_fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: per-conversation running lineage —
    turns seen, max turn_idx, and an order-insensitive XOR content
    hash. The per-row hash is the ``row_hash`` column — computed
    JVM-side in the plan (xxhash64(conv_id, turn_idx, extracted_text),
    see conv_running_state) with EXACTLY the inputs the batch
    checkpoint manifest uses (operators.checkpoint.lineage_rows), so a
    streaming deployment's per-conversation record XORs to the same
    64-bit value as a batch run over the same rows and the two are
    directly comparable. The Python side only XOR-reduces int64s —
    vectorized, no per-row hashing."""
    import numpy as np

    n, mx, h = (state.get if state.exists else (0, -1, 0))
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, int(pdf["turn_idx"].max()))
            h ^= int(np.bitwise_xor.reduce(
                pdf["row_hash"].to_numpy(dtype=np.int64)))
    state.update((n, mx, h))
    yield pd.DataFrame({"conv_id": [key[0]], "n_turns": [n],
                        "max_turn_idx": [mx], "content_hash": [h]})


def conv_running_state(extracted: DataFrame) -> DataFrame:
    """applyInPandasWithState over conv_id: emits the running
    per-conversation record each micro-batch (update semantics).
    content_hash is bit-compatible with the batch manifest: the
    xxhash64 row hash is computed in the Spark plan (JVM, codegen)
    before the stateful op."""
    hashed = extracted.withColumn(
        "row_hash", F.xxhash64("conv_id", "turn_idx", "extracted_text"))
    return (hashed.groupBy("conv_id").applyInPandasWithState(
        _conv_state_fn,
        outputStructType=_CONV_OUT_SCHEMA,
        stateStructType=_CONV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))


def turn_rates(sdf: DataFrame, window: str = "1 minute",
               watermark: str = "10 minutes") -> DataFrame:
    """Windowed event-time aggregation with late-data watermark:
    turns/minute per role (the streaming ops checklist item)."""
    return (sdf.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), F.col("role"))
            .agg(F.count("*").alias("n_turns"),
                 F.sum(F.length("text")).alias("n_bytes")))


def write_extracted_stream(extracted: DataFrame, path: str,
                           checkpoint: str, available_now: bool = True):
    """Parquet sink with exactly-once file-source → file-sink
    semantics via the streaming checkpoint; availableNow drains the
    backlog then stops (batch-like runs on a streaming plan)."""
    writer = (extracted.writeStream.format("parquet")
              .option("path", path)
              .option("checkpointLocation", checkpoint)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
