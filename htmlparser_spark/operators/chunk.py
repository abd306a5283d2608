"""Document chunking and dataset splitting for training pipelines.

Two pre-training staples the rest of the dedup/curation family feeds
into:

- ``chunk_tokens``: split each document into fixed-size token windows
  with overlap (the context-window prep step for embedding / RAG /
  packing pipelines). One pass, pure Catalyst: whitespace tokenize
  once, ``posexplode`` a ``sequence`` of window indexes, ``slice`` +
  ``array_join`` per window — whole-stage codegen, no Python, no
  shuffle (chunking is embarrassingly row-parallel; output order is
  whatever downstream asks for). Window count and boundaries are
  integer arithmetic, so any engine replays them exactly.
- ``dataset_split``: deterministic train/val/test assignment from the
  portable md5-u32 hash (sample.py's ``hash_u32_col``) of the id plus
  a salt. Content- and partitioning-independent: re-running on a
  bigger cluster, or on the corpus re-shuffled, yields the identical
  split — the property that makes eval contamination auditable.
  Changing the salt re-rolls the split; keeping it pins it forever.

At 100 TB: both are map-only over the documents scan (the split is a
projection; chunking fans rows out ~len/step×, which the writer's own
exchange absorbs). Nothing here adds a shuffle or a driver action.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sample import hash_u32_col

__all__ = ["chunk_tokens", "dataset_split", "leakage_safe_split"]

# Java \s spelled out so RE2 (DuckDB) tokenizes identically — same
# class text_stats.py uses for token counts.
_WS = "[ \\t\\n\\x0b\\f\\r]+"


def chunk_tokens(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", size: int = 48,
                 overlap: int = 8) -> DataFrame:
    """(id, chunk_idx, n_chunk_tokens, chunk_text) token windows.

    Window i covers tokens [i*step, i*step+size) with
    step = size - overlap; the last window may be short; a document
    with ≤ size tokens (including an empty one) yields exactly one
    window. n_windows = 1 + ceil((n - size) / step) for n > size —
    every start below n-overlap is emitted, so consecutive windows
    share exactly ``overlap`` tokens and no token is dropped."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    t = F.trim(F.col(text_col))
    toks = F.when(t == "", F.array().cast("array<string>")) \
        .otherwise(F.split(t, _WS))
    n = F.size(toks)
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        (F.lit(1) + F.floor((n - size + step - 1) / step)).cast("int"))
    out = (df.select(F.col(id_col), toks.alias("_toks"),
                     n_chunks.alias("_nc"))
           .select(id_col, "_toks",
                   F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1))
                   .alias("chunk_idx", "_i")))
    sl = F.slice(F.col("_toks"), F.col("chunk_idx") * step + 1, size)
    return out.select(
        id_col, F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(sl).cast("long").alias("n_chunk_tokens"),
        F.array_join(sl, " ").alias("chunk_text"))


def dataset_split(df: DataFrame, key_col: str = "doc_id",
                  salt: str = ":split7", train_pct: int = 90,
                  val_pct: int = 5) -> DataFrame:
    """Adds (bucket, split): bucket = md5-u32(key || salt) % 100,
    split = 'train' below train_pct, 'val' below train_pct+val_pct,
    else 'test'. Pure projection — deterministic on any engine or
    partitioning."""
    b = (hash_u32_col(F.col(key_col), salt) % 100).cast("long")
    split = (F.when(b < train_pct, "train")
             .when(b < train_pct + val_pct, "val")
             .otherwise("test"))
    return df.withColumn("bucket", b).withColumn("split", split)


def leakage_safe_split(df: DataFrame, components: DataFrame,
                       id_col: str = "doc_id", salt: str = ":split7",
                       train_pct: int = 90,
                       val_pct: int = 5) -> DataFrame:
    """Duplicate-aware split: every member of a near-dup component
    gets the split of the component ROOT (its minimum id), so a
    near-duplicate of a training document can never leak into val or
    test — the contamination `dataset_split` alone cannot prevent.

    ``components``: (node, component) from ``connected_components``
    over near-dup pairs; documents absent from it are singletons and
    root to themselves. One narrow left join (8-byte keys) + the same
    salted-hash projection as dataset_split — the corpus text never
    moves.

    The root is coalesced in the ID COLUMN'S OWN TYPE and hashed via
    the same string-form ``hash_u32_col`` as ``dataset_split`` — so a
    singleton document gets bit-identically the split dataset_split
    would give it (no silent long-cast: a non-numeric string id used
    to cast to NULL and fall through every branch into 'test'). A
    NULL root (only possible from a NULL id) raises rather than
    silently landing in a split."""
    id_type = df.schema[id_col].dataType
    roots = components.select(F.col("node").cast(id_type).alias(id_col),
                              F.col("component").cast(id_type)
                              .alias("root"))
    j = (df.join(roots, id_col, "left")
         .withColumn("root", F.coalesce(F.col("root"), F.col(id_col))))
    b = (hash_u32_col(F.col("root"), salt) % 100).cast("long")
    guard = F.assert_true(
        b.isNotNull(), F.lit("leakage_safe_split: NULL split bucket "
                             "(NULL document id?)"))
    split = (F.when(b < train_pct, "train")
             .when(b < train_pct + val_pct, "val")
             .otherwise("test"))
    return (j.withColumn("_chk", guard).withColumn("split", split)
            .drop("_chk"))
