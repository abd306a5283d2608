"""The flagship pipeline: transcripts table → per-turn extracted text.

Stage layout (SURVEY §3.2), designed for 10^12-turn scale:

1. scan          — parquet/iceberg read; Catalyst prunes to the needed
                   columns (verify with .explain: ReadSchema).
2. resume        — left_anti join against the checkpoint manifest
                   (operators.checkpoint), skipping completed partitions.
3. skew spread   — explicit repartition on xxhash64(conv_id, turn_idx):
                   a mega-conversation (millions of turns sharing
                   conv_id) is spread uniformly because the hash
                   includes turn_idx; the parse stage is row-
                   independent so any uniform distribution is correct.
4. parse kernel  — ONE fused mapInPandas stage (tokenize → DOM →
                   strip → serialize); pure function of `text`.
5. order         — window over (conv_id) ordered by turn_idx restores
                   stable turn ordering (turn_seq column); this is the
                   only keyed shuffle and hash-partitions well.
6. sink          — partitioned write + per-partition lineage row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..kernel import extract_text

__all__ = ["extract_transcripts", "salted_repartition",
           "order_turns_scalable"]


def order_turns_scalable(df: DataFrame, bucket_width: int = 1 << 20,
                         out_col: str = "turn_seq") -> DataFrame:
    """Mega-conversation-safe turn_seq: a two-phase distributed rank.

    The plain ``Window.partitionBy(conv_id).orderBy(turn_idx)`` puts an
    ENTIRE conversation into one task — fine for chat-sized convs,
    a skew wall for a 10^8-turn agent trace. Two phases instead:

    1. local rank within (conv_id, bucket) where bucket =
       floor(turn_idx / bucket_width) — each task holds at most one
       bucket's turns, so no conversation ever serializes;
    2. per-bucket offsets: one COUNT row per (conv_id, bucket) (tiny —
       ≤ max_turn_idx/bucket_width rows per conv), cumulative-summed by
       a window whose partitions are those tiny per-conv row sets,
       then joined back on (conv_id, bucket) — co-partitioned with
       phase 1's exchange, so the join reuses the shuffle.

    turn_seq equals the plain window's output whenever turn_idx is
    unique per conversation (the table's contract); with duplicate
    turn_idx both formulations are tie-ambiguous anyway.
    """
    bucket = F.floor(F.col("turn_idx") / F.lit(bucket_width))
    w_local = Window.partitionBy("conv_id", "_bk").orderBy("turn_idx")
    local = (df.withColumn("_bk", bucket)
             .withColumn("_lr", F.row_number().over(w_local)))
    counts = (local.groupBy("conv_id", "_bk")
              .agg(F.max("_lr").alias("_cnt")))
    w_off = (Window.partitionBy("conv_id").orderBy("_bk")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)))
    return (local
            .join(offsets.select("conv_id", "_bk", "_off"),
                  ["conv_id", "_bk"])
            .withColumn(out_col,
                        (F.col("_off") + F.col("_lr")).cast("int"))
            .drop("_bk", "_lr", "_off"))


def salted_repartition(df: DataFrame, num_partitions: int | None = None,
                       cols=("conv_id", "turn_idx")) -> DataFrame:
    """Spread skewed conversations uniformly before the parse stage.

    Hashing (conv_id, turn_idx) — not conv_id alone — is the salt: every
    turn of a mega-conversation lands in a different partition, so one
    hot key cannot serialize the CPU-bound parse stage.
    """
    key = F.xxhash64(*[F.col(c) for c in cols])
    if num_partitions:
        return df.repartition(num_partitions, key)
    return df.repartition(key)


def extract_transcripts(df: DataFrame, *, strip: bool = True,
                        include_raw: bool = True,
                        order: bool = True,
                        num_partitions: int | None = None,
                        repartition: bool | None = None,
                        keep_text: bool = False,
                        order_impl: str = "window") -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) →
    - text (unless keep_text), + extracted_text, raw_html, n_nodes,
    n_errors [, turn_seq].

    The source HTML is dropped inside the kernel by default: the
    ordering shuffle and the sink then carry only the extracted
    payload (raw HTML is the widest column at transcript scale).

    ``repartition``: the parse kernel is row-independent, so it runs
    directly on scan partitions — for splittable columnar sources
    (parquet/Iceberg) those are uniform in bytes regardless of how
    conversations skew, and skipping the shuffle saves a full pass of
    the raw-HTML payload. Enable the salted repartition only when the
    source layout itself is unbalanced (non-splittable files, one
    giant file, or a pre-keyed layout): hashing (conv_id, turn_idx)
    spreads even a single mega-conversation uniformly.
    Default (None): salt iff an explicit ``num_partitions`` is given.

    ``order_impl``: 'window' (default) ranks with one window — the
    whole conversation lands in a single task, bounded by the largest
    conversation's extracted payload fitting one executor (see
    BASELINE.md for the measured bound); 'two_phase' uses
    order_turns_scalable, which no conversation size can skew —
    choose it when mega-conversations (≫10^6 turns sharing conv_id)
    are expected."""
    if repartition is None:
        repartition = num_partitions is not None
    out = df
    if repartition:
        out = salted_repartition(out, num_partitions)
    out = extract_text(out, text_col="text", strip=strip,
                       include_raw=include_raw, drop_text=not keep_text)
    if order:
        if order_impl == "two_phase":
            out = order_turns_scalable(out)
        else:
            w = Window.partitionBy("conv_id").orderBy("turn_idx")
            out = out.withColumn("turn_seq", F.row_number().over(w))
    return out
