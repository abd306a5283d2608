"""Inverted-index build: term → document-frequency + capped postings.

The corpus-exploration/search primitive (and the lookup side of
n-gram decontamination): for the highest-df terms, the sorted list of
documents containing each. Spark-shaped for 100 TB:

- The (term, doc) pairs come from a map-local explode of per-document
  DISTINCT tokens — the shuffle carries one row per distinct term per
  document, never per occurrence.
- Postings are capped at ``max_postings`` ids per term with the same
  two-stage min-k pattern the brute-force ANN uses
  (similarity.py): stage 1 keeps the k smallest doc_ids per
  (term, salt) group, stage 2 merges the ≤ n_salts×k partials. The
  stage-1 cut is a ``row_number`` window BEFORE any ``collect_list``
  — the window's sort spills to disk, so a stopword appearing in
  every document of a 100-TB corpus costs a spillable sort, never an
  in-memory aggregation buffer of df/n_salts ids; the subsequent
  ``collect_list`` only ever sees the ≤ max_postings survivors. df
  counts stay exact (summed over all rows, not just survivors).
- The final top-terms cut is a TakeOrdered over the vocabulary-sized
  aggregate on the total order (df desc, term asc) — deterministic,
  no global sort of the corpus.

Postings keep the SMALLEST doc_ids (min-k, ascending) — an arbitrary
but deterministic, engine-replayable cap, hence the exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["inverted_index"]

_WS = "[ \\t\\n\\x0b\\f\\r]+"


def inverted_index(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", top_terms: int = 100,
                   max_postings: int = 50, n_salts: int = 8,
                   lowercase: bool = True) -> DataFrame:
    """(term, df_count, postings) for the ``top_terms`` highest-df
    terms; postings = the ``max_postings`` smallest doc_ids, sorted.
    Ties at the top_terms boundary break by term asc (total order)."""
    t = F.trim(F.col(text_col))
    if lowercase:
        t = F.lower(t)
    toks = F.when(t == "", F.array().cast("array<string>")) \
        .otherwise(F.array_distinct(F.split(t, _WS)))
    pairs = (df.select(F.col(id_col).alias("_id"),
                       F.explode(toks).alias("term"))
             .filter(F.col("term") != "")
             .withColumn("_s", F.col("_id") % n_salts))
    # min-k cut first (spillable window sort), THEN collect: the agg
    # buffer holds at most max_postings ids per (term, salt) group.
    # The groupBy below reuses the window's (term, _s) distribution —
    # one shuffle total for stage 1.
    rn = F.row_number().over(
        Window.partitionBy("term", "_s").orderBy("_id"))
    partial = (pairs
               .withColumn("_rn", rn)
               .groupBy("term", "_s")
               .agg(F.count("*").alias("_c"),
                    F.sort_array(F.collect_list(
                        F.when(F.col("_rn") <= max_postings,
                               F.col("_id")))).alias("_p")))
    merged = (partial.groupBy("term")
              .agg(F.sum("_c").cast("long").alias("df_count"),
                   F.slice(F.sort_array(F.flatten(F.collect_list("_p"))),
                           1, max_postings).alias("postings")))
    return (merged
            .orderBy(F.col("df_count").desc(), F.col("term").asc())
            .limit(top_terms))
