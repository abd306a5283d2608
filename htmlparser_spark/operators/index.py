"""Inverted-index build: term → document-frequency + capped postings.

The corpus-exploration/search primitive (and the lookup side of
n-gram decontamination): for the highest-df terms, the sorted list of
documents containing each. Spark-shaped for 100 TB:

- The (term, doc) pairs come from a map-local explode of per-document
  DISTINCT tokens — the shuffle carries one row per distinct term per
  document, never per occurrence.
- Postings are capped at ``max_postings`` ids per term with the same
  two-stage min-k pattern the brute-force ANN uses
  (similarity.py): stage 1 takes the k smallest doc_ids per
  (term, salt) group, stage 2 merges the ≤ n_salts×k partials — a
  stopword appearing in every document of a 100-TB corpus never
  materializes more than n_salts×k ids in any task, while df counts
  stay exact (summed from stage-1 partial counts).
- The final top-terms cut is a TakeOrdered over the vocabulary-sized
  aggregate on the total order (df desc, term asc) — deterministic,
  no global sort of the corpus.

Postings keep the SMALLEST doc_ids (min-k, ascending) — an arbitrary
but deterministic, engine-replayable cap, hence the exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
             .filter(F.col("term") != ""))
    partial = (pairs
               .groupBy("term", (F.col("_id") % n_salts).alias("_s"))
               .agg(F.count("*").alias("_c"),
                    F.slice(F.sort_array(F.collect_list("_id")),
                            1, max_postings).alias("_p")))
    merged = (partial.groupBy("term")
              .agg(F.sum("_c").cast("long").alias("df_count"),
                   F.slice(F.sort_array(F.flatten(F.collect_list("_p"))),
                           1, max_postings).alias("postings")))
    return (merged
            .orderBy(F.col("df_count").desc(), F.col("term").asc())
            .limit(top_terms))
