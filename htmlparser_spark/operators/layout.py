"""Data-layout keys: Z-order (Morton) interleave for multi-dimension
scan pruning.

At 100 TB the scan is the job: a table range-partitioned (or sorted
within files) by a Z-order key over its hot filter dimensions lets a
predicate on ANY of those dimensions prune most files, because the
space-filling curve keeps every dimension's locality simultaneously —
the reason Delta/Iceberg expose OPTIMIZE ... ZORDER BY. Usage:

    keyed = df.withColumn("zkey", zorder_key_col(
        [F.col("len_bucket"), F.col("domain_bucket")], bits=16))
    keyed.repartitionByRange(n, "zkey").sortWithinPartitions("zkey") \
         .write.parquet(...)          # min/max stats now prune both dims

The interleave is a pure bit round-robin: output bit (i·n + c) is bit
i of column c — plain shift/mask integer arithmetic (no UDF, constant-
folded into codegen), identical in any engine, so the driver oracle
replays every key bit-for-bit. Inputs must already be bucketized to
``bits``-bit non-negative ints (values are masked to ``bits`` to make
out-of-range inputs loud in tests rather than silently colliding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key_col", "zorder_keys"]


def zorder_key_col(cols: list[Column], bits: int = 16) -> Column:
    """Morton key of ``len(cols)`` dimensions, ``bits`` bits each →
    one BIGINT with n·bits significant bits (n·bits ≤ 62). Column 0
    holds the LOWEST interleaved bit of each group (bit i of column c
    lands at output bit i·n + c)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least 2 columns")
    if n * bits > 62:
        raise ValueError(f"{n} cols × {bits} bits exceeds 62")
    terms = []
    for c_idx, col in enumerate(cols):
        masked = col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(masked, i).bitwiseAND(F.lit(1)),
                            i * n + c_idx))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zorder_keys(df: DataFrame, col_names: list[str],
                bits: int = 16, out: str = "zkey") -> DataFrame:
    """df + the Morton key column over ``col_names`` (pre-bucketized
    ints). Narrow projection, no shuffle — pair with
    repartitionByRange(out) at write time."""
    return df.withColumn(
        out, zorder_key_col([F.col(c) for c in col_names], bits=bits))
