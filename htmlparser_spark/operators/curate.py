"""Corpus curation: the composed filter → dedup → keep-one pass that
turns a raw extracted corpus into training data.

Composition of the primitives in text_stats / dedup, arranged so the
whole pass is two shuffles at any scale:

1. quality + language gates — pure Catalyst expressions (codegen,
   no Python), evaluated in the scan stage so Parquet row groups that
   fail pushable predicates are never decoded;
2. exact dedup keep-one — one shuffle on (xxhash64(text), length),
   documents never move, ties keep the minimum id (deterministic);
3. (optional) near-dup keep-one — minhash pairs → connected
   components → drop every non-minimum member. Off by default
   because it is the expensive path; the exact pass already removed
   byte-identical documents.

The integer-ratio quality gates (e.g. ``n_alpha * 10 >= n_chars * 3``)
are deliberate: they are exactly reproducible in ANSI SQL with no
float rounding, so the whole default pipeline is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_stats import token_count_col

__all__ = ["curate_corpus"]


def curate_corpus(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", lang: str | None = None,
                  lang_col: str = "lang", min_tokens: int = 5,
                  max_tokens: int | None = None,
                  min_alpha_pct: int = 30,
                  near_dedup: bool = False,
                  minhash_threshold: float = 0.8) -> DataFrame:
    """Surviving documents after quality gates + dedup keep-one.

    Gates (all integer arithmetic, all codegen):
    - token count within [min_tokens, max_tokens]
    - alpha ratio: n_alpha * 100 >= n_chars * min_alpha_pct
    - optional language equality on ``lang_col``

    Keep-one: per distinct text, the MINIMUM id survives. With
    ``near_dedup`` additionally collapses minhash-LSH near-dup
    components to their minimum id.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = (n_chars - F.length(F.regexp_replace(t, "[A-Za-z]", "")))
    cond = (token_count_col(t) >= min_tokens) & \
        (n_alpha * 100 >= n_chars * min_alpha_pct)
    if max_tokens is not None:
        cond = cond & (token_count_col(t) <= max_tokens)
    if lang is not None:
        cond = cond & (F.col(lang_col) == lang)
    gated = docs.filter(cond)

    # exact keep-one: min id per distinct text; hash+length key so the
    # shuffle carries 16 bytes per row, not documents
    w = Window.partitionBy(F.xxhash64(t), F.length(t)).orderBy(id_col)
    kept = (gated.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))

    if near_dedup:
        from .dedup import fuzzy_dedup_keep

        kept = fuzzy_dedup_keep(kept, text_col=text_col, id_col=id_col,
                                threshold=minhash_threshold)
    return kept
