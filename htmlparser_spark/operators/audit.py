"""Corpus audit reports: the per-source (domain) statistics a curation
team reads before setting dedup/budget policy.

``source_stats`` is the standard pre-training corpus report: one row
per source/domain with document, token, character and unique-content
counts plus an integer duplicate ratio — the numbers that drive
per-domain sampling budgets (sample.py:take_token_budget) and flag
boilerplate-heavy domains for paragraph dedup.

Scale shape (100 TB): everything is ONE groupBy over the scan with
map-side combine; the only per-row payload that shuffles for the
distinct-content count is a 32-hex md5 digest (portable across
engines, unlike xxhash64 — which keeps the report exactly
SQL-replayable), never document text. Output is domain-cardinality
(10⁵-10⁷ rows), trivially collectable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_stats import token_count_col

__all__ = [
    "conversation_integrity","source_stats"]


def source_stats(df: DataFrame, source_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """(source, n_docs, n_tokens, n_chars, n_unique, dup_ppm) per
    source. ``n_unique`` counts distinct document contents (md5 — the
    portable fingerprint sample.py standardizes on); ``dup_ppm`` =
    (n_docs - n_unique)·10⁶ // n_docs, the integer exact-duplicate
    rate the dedup family is later measured against."""
    g = (df.groupBy(F.col(source_col).alias("source"))
         .agg(F.count("*").cast("long").alias("n_docs"),
              F.sum(token_count_col(F.col(text_col))).cast("long")
              .alias("n_tokens"),
              F.sum(F.length(text_col)).cast("long").alias("n_chars"),
              F.countDistinct(F.md5(F.encode(F.col(text_col), "UTF-8")))
              .cast("long").alias("n_unique")))
    return g.withColumn(
        "dup_ppm",
        F.expr("CAST((n_docs - n_unique) * 1000000 DIV n_docs AS LONG)"))


def conversation_stats(extracted: DataFrame,
                       conv_col: str = "conv_id",
                       text_col: str = "extracted_text",
                       role_col: str = "role", tool_col: str = "tool",
                       ts_col: str = "ts") -> DataFrame:
    """Per-conversation audit over the north-rule transcripts table
    AFTER extraction: turn counts by role, tool-call counts and
    distinct tools, extracted-character volume, and the wall-clock
    span of the conversation in seconds — the report that sizes
    mega-conversation skew (sources/transcripts salting) and drives
    per-conversation packing budgets.

    Takes the OUTPUT of extract_transcripts (or any frame carrying
    the transcript keys plus an extracted-text column), so the parse
    kernel runs once and this is a pure relational stage on top.

    Scale shape: ONE map-side-combined groupBy(conv_id); the shuffle
    carries small ints + the tool-name set (bounded: tool vocabulary,
    not turns). Conversation count ~ corpus/50 rows out."""
    empty_tool = (F.col(tool_col).isNull()) | (F.col(tool_col) == "")
    g = (extracted.groupBy(F.col(conv_col).alias("conv_id"))
         .agg(F.count("*").cast("long").alias("n_turns"),
              F.sum((F.col(role_col) == "user").cast("long"))
              .cast("long").alias("n_user"),
              F.sum((F.col(role_col) == "assistant").cast("long"))
              .cast("long").alias("n_assistant"),
              F.sum((~empty_tool).cast("long")).cast("long")
              .alias("n_tool_calls"),
              F.countDistinct(F.when(~empty_tool, F.col(tool_col)))
              .cast("long").alias("n_tools"),
              F.sum(F.length(text_col)).cast("long")
              .alias("chars_extracted"),
              (F.max(F.unix_timestamp(F.col(ts_col)))
               - F.min(F.unix_timestamp(F.col(ts_col))))
              .cast("long").alias("span_seconds")))
    return g


def conversation_integrity(df: DataFrame, conv_col: str = "conv_id",
                           idx_col: str = "turn_idx",
                           role_col: str = "role",
                           text_col: str = "text",
                           user_role: str = "user") -> DataFrame:
    """Per-conversation structural validation — the gate a transcript
    corpus passes before assembly into training documents: one row per
    conversation with

    - ``n_turns``
    - ``n_role_violations`` — adjacent turns (in turn order) with the
      SAME role (broken user/assistant alternation)
    - ``starts_with_user`` — first turn's role == ``user_role``
    - ``contiguous_turns`` — turn_idx values form an unbroken integer
      run (no gaps, no duplicates)
    - ``n_empty_turns`` — NULL or whitespace-only text

    Same scale shape as assemble_conversations: ONE keyed shuffle
    (groupBy conv) with map-side partial collect, the per-task memory
    bound = one conversation's (idx, role, empty-bit) triples — a few
    bytes per turn, far lighter than assembly's full text. All the
    per-conversation logic is higher-order array expressions
    (codegen), no UDF."""
    s = F.struct(F.col(idx_col).cast("long").alias("i"),
                 F.col(role_col).alias("r"),
                 (F.col(text_col).isNull()
                  | (F.trim(F.col(text_col)) == "")).alias("e"))
    g = (df.select(F.col(conv_col), s.alias("_s"))
         .groupBy(conv_col)
         .agg(F.array_sort(F.collect_list("_s")).alias("_a")))
    a = F.col("_a")
    n = F.size(a)
    viol = F.size(F.filter(
        F.zip_with(a, F.slice(a, 2, F.greatest(n - 1, F.lit(0))),
                   lambda x, y: x["r"] == y["r"]),
        lambda b: b))
    idxs = F.transform(a, lambda x: x["i"])
    contiguous = (
        (F.size(F.array_distinct(idxs)) == n)
        & (F.element_at(idxs, -1) - F.element_at(idxs, 1) + 1 == n))
    return g.select(
        conv_col,
        n.cast("long").alias("n_turns"),
        viol.cast("long").alias("n_role_violations"),
        (F.element_at(a, 1)["r"] == user_role).alias("starts_with_user"),
        contiguous.alias("contiguous_turns"),
        F.size(F.filter(a, lambda x: x["e"])).cast("long")
        .alias("n_empty_turns"))
