"""Mergeable cardinality / frequency sketches, integer-exact.

At 100 TB the questions "how many distinct tokens per source?" and
"what does this token's count look like?" can't afford an exact
distinct (a full shuffle of every token) on every run — the standard
answers are HyperLogLog registers and count-min counters, both of
which are MAP-SIDE MERGEABLE: registers combine with max, counters
with sum, so Spark's partial aggregation does the heavy lifting and
only (group, register/bucket) rows — m or depth×width per group,
constants — ever cross the wire.

Everything here is replayable bit-for-bit by any engine with md5
(Flajolet et al. 2007 HLL; Cormode & Muthukrishnan 2005 count-min):
the hash is the portable md5-u32 (operators/sample.py), rho comes
from the engines' shared minimal-bin() length, the estimate is pure
integer arithmetic (the 2^-M harmonic sum is computed as a scaled
power-of-two BIGINT sum, alpha as a ppm constant, floor division
throughout) — no float ever enters, so the DuckDB oracle reproduces
every estimate exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sample import hash_u32_col

__all__ = ["hll_distinct", "countmin_counters", "countmin_estimate",
           "HLL_ALPHA_PPM"]

# alpha_m scaled to ppm for the supported register counts
# (0.7213 / (1 + 1.079/m), Flajolet et al. 2007 §4)
HLL_ALPHA_PPM = {16: 673000, 32: 697000, 64: 709340, 128: 715270,
                 256: 718272}


def _tokens(df: DataFrame, group_col: str, item_col: str) -> DataFrame:
    return (df.select(group_col,
                      F.explode(F.split(F.trim(F.col(item_col)),
                                        "[ \\t\\n\\x0b\\f\\r]+"))
                      .alias("_tok"))
            .filter(F.col("_tok") != ""))


def hll_distinct(df: DataFrame, group_col: str,
                 item_col: str = "text", m: int = 64,
                 salt: str = ":hll7",
                 with_exact: bool = False,
                 pre_itemized: bool = False) -> DataFrame:
    """Per-group distinct-token estimate via HyperLogLog(m) over the
    shared whitespace tokenization → (group, n_regs, n_zero_regs,
    harmonic_sum, est_distinct [, exact_distinct, err_ppm]).
    ``pre_itemized``: item_col is already one item per row (shingles,
    URLs, ids …) — skip the tokenizing explode.

    Register j = h % m takes M_j = max over its items of
    rho(h // m) — the 1-based leading-zero rank of the remaining
    (32 - log2 m)-bit word. The harmonic sum is kept exact as
    S = Σ_j 2^(wbits+1-M_j) (BIGINT; empty registers contribute
    2^(wbits+1)), and the raw HLL estimate is the all-integer
    est = alpha_ppm·m²·2^(wbits+1) // S // 10^6. The small-range
    linear-counting correction is NOT applied (it needs ln); callers
    in that regime (est ≤ 2.5·m with zero registers present) should
    read n_zero_regs and correct — the columns carry everything
    needed.

    Two narrow aggregates, both map-side combined: (group, j) → max
    rho (≤ m rows per group survive the partial), then group →
    register-sum. Tokens never shuffle raw; only (group, j, rho)
    triples do. ``with_exact`` adds an exact distinct count and the
    signed ppm error — the audit mode the tests and the driver oracle
    use; production runs leave it off (that exact count is the full
    shuffle the sketch exists to avoid)."""
    if m not in HLL_ALPHA_PPM:
        raise ValueError(f"m must be one of {sorted(HLL_ALPHA_PPM)}")
    p = m.bit_length() - 1
    wbits = 32 - p
    scale = wbits + 1  # empty register term = 2^scale
    if pre_itemized:
        toks = df.select(group_col, F.col(item_col).alias("_tok"))
    else:
        toks = _tokens(df, group_col, item_col)
    h = hash_u32_col(F.col("_tok"), salt)
    w = F.expr(f"_h div {m}")
    rho = (F.when(w == 0, F.lit(scale))
           .otherwise(F.lit(scale) - F.length(F.bin(w))))
    regs = (toks.withColumn("_h", h)
            .select(group_col, (F.col("_h") % m).alias("_j"),
                    rho.alias("_rho"))
            .groupBy(group_col, "_j").agg(F.max("_rho").alias("_m")))
    per = (regs.groupBy(group_col)
           .agg(F.count("*").cast("long").alias("n_regs"),
                F.sum(F.expr(f"shiftleft(cast(1 as bigint), "
                             f"{scale} - _m)")).alias("_s_present")))
    s = (F.col("_s_present")
         + (F.lit(m) - F.col("n_regs"))
         * F.lit(1 << scale)).cast("long")
    alpha = HLL_ALPHA_PPM[m]
    out = per.select(
        group_col, "n_regs",
        (F.lit(m) - F.col("n_regs")).cast("long").alias("n_zero_regs"),
        s.alias("harmonic_sum"),
        F.expr(f"(cast({alpha} as bigint) * {m * m} * "
               f"shiftleft(cast(1 as bigint), {scale})) "
               f"div ((_s_present + ({m} - n_regs) * "
               f"shiftleft(cast(1 as bigint), {scale}))) div 1000000")
        .alias("est_distinct"))
    if not with_exact:
        return out
    exact = (toks.groupBy(group_col)
             .agg(F.countDistinct("_tok").cast("long")
                  .alias("exact_distinct")))
    j = out.join(exact, group_col)
    return j.withColumn(
        "err_ppm",
        F.expr("(est_distinct - exact_distinct) * 1000000L "
               "div exact_distinct"))


def countmin_counters(df: DataFrame, item_col: str = "text",
                      depth: int = 4, width: int = 256,
                      salt: str = ":cm") -> DataFrame:
    """Count-min counter table over the shared whitespace
    tokenization → (d, bucket, cnt): depth independent md5 rows
    (salt ':cm<d>'), width buckets each. depth×width rows total —
    ONE map-side-combined aggregate however large the corpus; the
    counters merge across runs/partitions with plain addition."""
    toks = (df.select(
        F.explode(F.split(F.trim(F.col(item_col)),
                          "[ \\t\\n\\x0b\\f\\r]+")).alias("_tok"))
        .filter(F.col("_tok") != ""))
    rows = toks.select(F.explode(F.array(*[
        F.struct(F.lit(d).alias("d"),
                 (hash_u32_col(F.col("_tok"), f"{salt}{d}") % width)
                 .alias("bucket"))
        for d in range(depth)])).alias("_db"))
    return (rows.select(F.col("_db.d").alias("d"),
                        F.col("_db.bucket").alias("bucket"))
            .groupBy("d", "bucket")
            .agg(F.count("*").cast("long").alias("cnt")))


def countmin_estimate(counters: DataFrame, words: DataFrame,
                      word_col: str = "word", depth: int = 4,
                      width: int = 256,
                      salt: str = ":cm") -> DataFrame:
    """Point-query the sketch: for each word, est = min over the
    depth rows of its bucket's counter (classic count-min upper
    bound: est >= true count, overshoot only from collisions).
    The counter table is depth×width rows → broadcast; the probe is
    a map-side join + one narrow (word, depth-way min) aggregate."""
    probes = words.select(word_col, F.explode(F.array(*[
        F.struct(F.lit(d).alias("d"),
                 (hash_u32_col(F.col(word_col), f"{salt}{d}") % width)
                 .alias("bucket"))
        for d in range(depth)])).alias("_db")) \
        .select(word_col, F.col("_db.d").alias("d"),
                F.col("_db.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(counters), ["d", "bucket"])
    return (joined.groupBy(word_col)
            .agg(F.min("cnt").cast("long").alias("cm_est")))
