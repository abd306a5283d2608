"""Alignment-robust exact-substring dedup audit via content-defined
chunking (CDC).

Fixed-stride substring windows cannot catch the same boilerplate at
DIFFERENT offsets in different documents (a 1-char prefix shift
misaligns every window). Content-defined chunking cuts where a hash
of the trailing ``w`` characters satisfies a condition, so cut points
depend only on LOCAL content: two documents sharing a long substring
produce identical interior chunks for it regardless of position — the
standard alignment-robust trick behind dedup/delta systems (rsync's
rolling checksum, LBFS/Rabin chunking; and the "repeated substring"
flavor of training-data dedup à la the public exact-substring work).

- ``cdc_chunks_expr``: pure Catalyst — boundary at char position i
  when md5 of the trailing w-char window starts with ``zeros`` hex
  zeros (P = 16^-zeros → mean chunk ≈ 16^zeros chars). md5-of-UTF-8
  keeps every boundary decision bit-replayable in any engine (the
  portability rule sample.py standardizes on). A production run at
  10^12 turns would swap the boundary hash for a cheap rolling
  polynomial in a Pandas UDF — same plan shape, cheaper per char;
  md5 is the cross-engine-exact default.
- ``repeated_chunks``: the corpus audit — explode chunks, group by
  chunk hash, report chunks appearing in ≥ ``min_docs`` distinct
  documents with exact doc/occurrence counts and a CAPPED sorted
  sample of carrier ids (row_number-before-collect, the same
  spill-safe min-k shape as index.py — a boilerplate chunk carried
  by every document of a 100-TB corpus never buffers its posting
  list in one aggregation buffer).

Scale shape: chunking is map-only (the explode fans out ~len/16^zeros
rows per doc); the audit shuffle carries (16-byte md5, id) pairs plus
one chunk-text exemplar per group via min() — document text itself
never moves. Output is report-sized (top_k rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.columns import bind

__all__ = ["cdc_chunks_expr", "cdc_chunks", "repeated_chunks",
           "dup_chunk_stats"]


def cdc_chunks_expr(text_col: str, w: int = 8,
                    zeros: int = 1) -> Column:
    """array<string> of content-defined chunks of ``text_col``.

    Boundary AFTER 1-based char position i (i ≥ w) iff
    md5(utf8(substr(text, i-w+1, w))) starts with ``zeros`` '0' hex
    chars. Chunks partition the text exactly (concat(chunks) == text);
    a text shorter than ``w`` is one chunk; empty text → empty array.
    Character-based (not byte) positions so DuckDB ``substr`` replays
    identically for non-ASCII."""
    text = F.col(text_col)
    n = F.length(text)
    prefix = "0" * zeros
    cut = (lambda i: F.substring(
        F.md5(F.encode(F.substr(text, i - (w - 1), F.lit(w)), "UTF-8")),
        1, zeros) == prefix)
    bpos = F.when(n >= w, F.filter(F.sequence(F.lit(w), n), cut)) \
        .otherwise(F.array().cast("array<int>"))
    bnds0 = F.concat(F.array(F.lit(0)).cast("array<int>"),
                     bpos.cast("array<int>"),
                     F.array(n).cast("array<int>"))

    # boundary array lambda-bound (bind): lo/hi each reference it and
    # so does each slice length — unbound, the md5 boundary scan
    # would run 4× per row
    def _chunks(bnds):
        lo = F.slice(bnds, 1, F.size(bnds) - 1)
        hi = F.slice(bnds, 2, F.size(bnds) - 1)
        chunks = F.zip_with(lo, hi,
                            lambda a, b: F.substr(text, a + 1, b - a))
        return F.filter(chunks, lambda c: F.length(c) > 0)

    return bind(bnds0, _chunks)


def cdc_chunks(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", w: int = 8,
               zeros: int = 1) -> DataFrame:
    """(id, chunk_idx, chunk) — one row per content-defined chunk, in
    document order. Map-only (no shuffle, no Python)."""
    return (df.select(F.col(id_col),
                      F.posexplode(cdc_chunks_expr(text_col, w, zeros))
                      .alias("chunk_idx", "chunk"))
            .select(id_col,
                    F.col("chunk_idx").cast("long").alias("chunk_idx"),
                    "chunk"))


def repeated_chunks(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", w: int = 8,
                    zeros: int = 1, min_docs: int = 2,
                    min_len: int = 12, max_ids: int = 5,
                    top_k: int = 200) -> DataFrame:
    """Cross-document repeated-substring report: chunks of length
    ≥ ``min_len`` occurring in ≥ ``min_docs`` distinct documents,
    with exact counts and the ``max_ids`` smallest carrier ids.
    Ordered (n_docs desc, chunk asc) — a total order (chunk text is
    unique per group), so the ``top_k`` cut is deterministic."""
    ch = (cdc_chunks(df, text_col, id_col, w, zeros)
          .filter(F.length("chunk") >= min_len)
          .select(F.col(id_col).alias("_id"), "chunk",
                  F.md5(F.encode(F.col("chunk"), "UTF-8")).alias("_h")))
    # exact occurrence count per chunk (map-side combined)
    occ = ch.groupBy("_h").agg(F.count("*").cast("long").alias("n_occ"))
    # distinct carriers, capped ids via spillable row_number (index.py
    # pattern), exact doc count from the same distinct frame
    dist = ch.select("_h", "chunk", "_id").distinct()
    rn = F.row_number().over(Window.partitionBy("_h").orderBy("_id"))
    docs = (dist.withColumn("_rn", rn)
            .groupBy("_h")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.min("chunk").alias("chunk"),
                 F.sort_array(F.collect_list(
                     F.when(F.col("_rn") <= max_ids, F.col("_id"))))
                 .alias("doc_ids")))
    return (docs.join(occ, "_h")
            .filter(F.col("n_docs") >= min_docs)
            .select("chunk", "n_docs", "n_occ", "doc_ids")
            .orderBy(F.col("n_docs").desc(), F.col("chunk").asc())
            .limit(top_k))


def dup_chunk_stats(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", w: int = 8,
                    zeros: int = 1, min_docs: int = 2) -> DataFrame:
    """Per-document duplicated-substring metric — the curation-gate
    number on top of the CDC audit (the "fraction of the document that
    is substring-duplicated elsewhere" signal of the public
    exact-substring dedup work): (id, n_chunks, n_dup_chunks,
    dup_char_ppm) where a chunk counts as duplicated when its content
    occurs in ≥ ``min_docs`` DISTINCT documents, and dup_char_ppm =
    duplicated chars · 10⁶ // total chunk chars (0 for empty docs).
    Feed the ppm into a curation gate exactly like clf_score.

    Scale shape: two shuffles over (16-byte md5, id | length) rows —
    distinct carriers → per-hash doc frequency (map-side combined),
    then an equi-join back to the per-doc chunk rows and one per-doc
    aggregate. Chunk text never travels beyond its length."""
    ch = (cdc_chunks(df, text_col, id_col, w, zeros)
          .select(F.col(id_col),
                  F.md5(F.encode(F.col("chunk"), "UTF-8")).alias("_h"),
                  F.length("chunk").alias("_len")))
    freq = (ch.select("_h", id_col).distinct()
            .groupBy("_h")
            .agg(F.countDistinct(id_col).alias("_nd")))
    flagged = ch.join(freq, "_h") \
        .withColumn("_dup", (F.col("_nd") >= min_docs).cast("int"))
    per_doc = (flagged.groupBy(id_col)
               .agg(F.count("*").cast("long").alias("n_chunks"),
                    F.sum("_dup").cast("long").alias("n_dup_chunks"),
                    F.sum("_len").cast("long").alias("_tot"),
                    F.sum(F.col("_len") * F.col("_dup")).cast("long")
                    .alias("_dupc")))
    out = per_doc.withColumn(
        "dup_char_ppm",
        F.expr("CAST(CASE WHEN _tot > 0 THEN _dupc * 1000000 DIV _tot "
               "ELSE 0 END AS LONG)")).drop("_tot", "_dupc")
    # empty documents produce no chunks — restore them with zeros so
    # the metric is total over the corpus
    return (df.select(F.col(id_col)).distinct()
            .join(out, id_col, "left")
            .select(id_col,
                    F.coalesce("n_chunks", F.lit(0)).cast("long")
                    .alias("n_chunks"),
                    F.coalesce("n_dup_chunks", F.lit(0)).cast("long")
                    .alias("n_dup_chunks"),
                    F.coalesce("dup_char_ppm", F.lit(0)).cast("long")
                    .alias("dup_char_ppm")))
