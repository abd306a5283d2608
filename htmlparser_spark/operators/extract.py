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

__all__ = ["extract_transcripts", "salted_repartition"]


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
                        keep_text: bool = False) -> DataFrame:
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
    Default (None): salt iff an explicit ``num_partitions`` is given."""
    if repartition is None:
        repartition = num_partitions is not None
    out = df
    if repartition:
        out = salted_repartition(out, num_partitions)
    out = extract_text(out, text_col="text", strip=strip,
                       include_raw=include_raw, drop_text=not keep_text)
    if order:
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        out = out.withColumn("turn_seq", F.row_number().over(w))
    return out
