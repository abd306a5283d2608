"""Deduplication operators for web-scale training-data pipelines.

Scale design notes (every operator targets ~10^10 docs):

- exact_dedup groups by (xxhash64(text), length(text)) — a 64-bit key
  plus length, NOT the text itself — so the shuffle moves 16 bytes per
  row instead of whole documents. Map-side partial aggregation applies.
- minhash/simhash signatures are computed in ONE embarrassingly
  parallel Arrow stage (numpy, no shuffle); only the small signatures
  shuffle. Candidate generation is a self-join on (band_id, band_hash)
  buckets — the standard LSH trick that avoids the O(n²) pair space.
- Candidate pairs carry doc ids only; exact verification re-joins text
  for the (tiny) candidate set.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.functions import pandas_udf

__all__ = [
    "exact_dedup", "exact_dup_groups",
    "minhash_signature_udf", "minhash_candidates", "minhash_dedup_pairs",
    "simhash_udf", "simhash_candidates",
    "ngram_jaccard_pairs", "embedding_near_dups",
]

# ------------------------------------------------------------------ #
# exact                                                              #
# ------------------------------------------------------------------ #

def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(keep_id, n_dups) per distinct text. Shuffles 64-bit hashes, not
    documents."""
    h = F.xxhash64(F.col(text_col))
    ln = F.length(F.col(text_col))
    return (df.select(h.alias("h"), ln.alias("ln"), F.col(id_col))
            .groupBy("h", "ln")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").cast("long").alias("n_dups"))
            .select("keep_id", "n_dups"))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per distinct text (window over the hash —
    one shuffle, no text movement in the aggregate)."""
    w = Window.partitionBy(F.xxhash64(F.col(text_col)),
                           F.length(F.col(text_col))).orderBy(id_col)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


# ------------------------------------------------------------------ #
# MinHash + LSH                                                      #
# ------------------------------------------------------------------ #

_WORD_RE = re.compile(r"\S+")
_MERSENNE = np.uint64((1 << 61) - 1)


_crc32 = zlib.crc32


def _shingle_hashes(s: str, k: int) -> np.ndarray:
    """Hashes of word k-shingles. crc32 (zlib, C-speed) is deterministic
    across workers — unlike Python's str hash — and two salted crcs
    give 64 usable bits."""
    words = _WORD_RE.findall(s.lower())
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    if not shingles:
        return np.zeros(1, dtype=np.uint64)
    lo = np.fromiter((_crc32(sh.encode("utf-8")) for sh in shingles),
                     dtype=np.uint64, count=len(shingles))
    hi = np.fromiter((_crc32(sh.encode("utf-8"), 0x9E3779B9)
                      for sh in shingles),
                     dtype=np.uint64, count=len(shingles))
    return ((hi << np.uint64(32)) | lo) | np.uint64(1)


def make_minhash_udf(num_perm: int = 64, shingle_k: int = 5,
                     seed: int = 1234567):
    """Vectorized MinHash signature UDF: per doc, num_perm universal-
    hash minima over word-shingle hashes. One numpy matmul-free
    broadcast per doc: (n_shingles × num_perm) via outer ops."""
    rng = np.random.RandomState(seed)
    A = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    B = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)

    @pandas_udf(ArrayType(LongType()))
    def minhash_udf(texts: pd.Series) -> pd.Series:
        res = []
        with np.errstate(over="ignore"):
            for s in texts:
                if not s:
                    res.append([0] * num_perm)
                    continue
                h = _shingle_hashes(s, shingle_k)  # (m,)
                # (m, P): (a*h + b) mod mersenne61 — wraparound-safe
                vals = (h[:, None] * A[None, :] + B[None, :]) % _MERSENNE
                res.append(vals.min(axis=0).astype(np.int64).tolist())
        return pd.Series(res)

    return minhash_udf


minhash_signature_udf = make_minhash_udf()


def minhash_candidates(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = 64,
                       bands: int = 16, shingle_k: int = 5,
                       parallelism: int | None = None) -> DataFrame:
    """LSH candidate pairs: banded signature buckets self-joined.
    Returns (id_a, id_b) with id_a < id_b, distinct.

    The CPU-bound signature stage is fanned out explicitly: a 1-file
    parquet input would otherwise pin it to one task."""
    rows_per_band = num_perm // bands
    udf = make_minhash_udf(num_perm=num_perm, shingle_k=shingle_k)
    src = df.select(F.col(id_col), F.col(text_col))
    if parallelism is None:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    if parallelism:
        src = src.repartition(parallelism, F.col(id_col))
    sig = src.select(F.col(id_col), udf(F.col(text_col)).alias("sig"))
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(*[F.col("sig")[b * rows_per_band + r]
                         for r in range(rows_per_band)]).alias("band_hash"),
        )
        for b in range(bands)
    ]
    banded = sig.select(id_col, F.explode(F.array(*band_cols)).alias("bk")) \
                .select(id_col, "bk.band_id", "bk.band_hash")
    # the self-join would otherwise run the signature UDF once PER SIDE;
    # signatures are tiny (ids + 16 hashes) — cache them
    banded = banded.cache()
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                   & (F.col("a.band_hash") == F.col("b.band_hash"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.8,
                        num_perm: int = 64, bands: int = 16,
                        shingle_k: int = 5,
                        parallelism: int | None = None) -> DataFrame:
    """Candidates verified by exact shingle-set Jaccard ≥ threshold.
    Only candidate pairs re-join text (tiny vs the corpus)."""
    cand = minhash_candidates(df, text_col, id_col, num_perm, bands,
                              shingle_k, parallelism=parallelism)
    texts = df.select(F.col(id_col), F.col(text_col))
    joined = (cand
              .join(texts.withColumnRenamed(id_col, "id_a")
                    .withColumnRenamed(text_col, "text_a"), "id_a")
              .join(texts.withColumnRenamed(id_col, "id_b")
                    .withColumnRenamed(text_col, "text_b"), "id_b"))
    return (joined
            .withColumn("jaccard",
                        _jaccard_expr("text_a", "text_b", shingle_k))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def _shingle_array_expr(text_col: str, k: int):
    """Distinct word-k-shingle array as a Catalyst expression (JVM-side
    transform over token positions — no UDF)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    count = F.greatest(n - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(0), count - 1)
    return F.array_distinct(F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")))


def _jaccard_expr(col_a: str, col_b: str, k: int):
    """Exact word-k-shingle Jaccard of two text columns (one-shot;
    for joins precompute _shingle_array_expr per side instead)."""
    sa = _shingle_array_expr(col_a, k)
    sb = _shingle_array_expr(col_b, k)
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(1.0))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.5,
                        bucket_col: str | None = None,
                        max_len_delta: int = 32,
                        parallelism: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs.

    Pair space is pruned BEFORE the expensive array work: pairs must
    share ``bucket_col`` (when given) and have text lengths within
    ``max_len_delta`` — a sound filter, since Jaccard ≥ t implies the
    lengths cannot differ much for near-dup thresholds. This keeps the
    join from degenerating to O(n²) inside big buckets; at full scale
    always pre-bucket via LSH (minhash_candidates) instead."""
    # shingle arrays are computed ONCE per doc (cheap, embarrassingly
    # parallel) and only set-intersected per pair — never rebuilt in
    # the join.
    base = df.select(
        F.col(id_col), F.length(F.col(text_col)).alias("len"),
        _shingle_array_expr(text_col, k).alias("sh"),
        *([F.col(bucket_col).alias("bk")] if bucket_col else [])).cache()
    # Length banding makes the length constraint an EQUI-join key:
    # |len_a - len_b| <= D implies |band_a - band_b| <= 1 for
    # band = floor(len / D), so exploding one side into its three
    # adjacent bands covers every qualifying pair exactly once. Pair
    # generation drops from O(n²) per bucket to O(n) per (bucket,
    # band) — the difference between 5k docs and 5B docs.
    band = F.floor(F.col("len") / F.lit(max(max_len_delta, 1)))
    a = base.select(F.col(id_col).alias("id_a"), F.col("len").alias("len_a"),
                    F.col("sh").alias("sh_a"), band.alias("band"),
                    *([F.col("bk")] if bucket_col else []))
    if parallelism:
        a = a.repartition(parallelism, "band",
                          *(["bk"] if bucket_col else []))
    b = base.select(F.col(id_col).alias("id_b"), F.col("len").alias("len_b"),
                    F.col("sh").alias("sh_b"),
                    F.explode(F.array(band - 1, band, band + 1))
                    .alias("band"),
                    *([F.col("bk").alias("bk2")] if bucket_col else []))
    cond = (F.col("id_a") < F.col("id_b")) & \
        (F.abs(F.col("len_a") - F.col("len_b")) <= max_len_delta)
    keys = [a["band"] == b["band"]]
    if bucket_col:
        keys.append(F.col("bk") == F.col("bk2"))
    joined = a.join(b, keys[0] if len(keys) == 1 else keys[0] & keys[1]) \
        .filter(cond)
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(1.0))
    return (joined
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


# ------------------------------------------------------------------ #
# SimHash                                                            #
# ------------------------------------------------------------------ #

def make_simhash_udf(seed: int = 7654321):
    @pandas_udf(LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        """64-bit SimHash over word tokens: sign of per-bit weighted
        sums of token hashes. Vectorized with numpy bit unpacking."""
        out = np.empty(len(texts), dtype=np.int64)
        with np.errstate(over="ignore"):
            for i, s in enumerate(texts):
                if not s:
                    out[i] = 0
                    continue
                toks = _WORD_RE.findall(s.lower())
                if not toks:
                    out[i] = 0
                    continue
                hs = np.fromiter(
                    (_crc32(t.encode("utf-8"), seed) for t in toks),
                    dtype=np.uint64, count=len(toks))
                hs |= np.fromiter(
                    (_crc32(t.encode("utf-8"), seed ^ 0x5BD1E995)
                     for t in toks),
                    dtype=np.uint64, count=len(toks)) << np.uint64(32)
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                        & np.uint64(1)).astype(np.int64)
                score = (2 * bits - 1).sum(axis=0)
                sh = np.uint64(0)
                sh = np.bitwise_or.reduce(
                    (score > 0).astype(np.uint64)
                    << np.arange(64, dtype=np.uint64))
                out[i] = np.int64(sh.astype(np.int64))
        return pd.Series(out)

    return simhash_udf


simhash_udf = make_simhash_udf()


def simhash_candidates(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", chunks: int = 4,
                       parallelism: int | None = None) -> DataFrame:
    """Near-dup candidates: equal 16-bit SimHash chunk ⇒ candidate
    (pigeonhole: hamming ≤ chunks-1 guarantees ≥1 equal chunk)."""
    src = df.select(F.col(id_col), F.col(text_col))
    if parallelism is None:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    if parallelism:
        src = src.repartition(parallelism, F.col(id_col))
    sh = src.select(F.col(id_col), simhash_udf(F.col(text_col)).alias("sh"))
    width = 64 // chunks
    sh = sh.cache()  # self-join below reuses the signature frame
    chunk_cols = [
        F.struct(F.lit(c).alias("chunk_id"),
                 F.shiftrightunsigned(F.col("sh"), c * width)
                 .bitwiseAND(F.lit((1 << width) - 1)).alias("chunk_val"))
        for c in range(chunks)
    ]
    ch = sh.select(id_col, "sh",
                   F.explode(F.array(*chunk_cols)).alias("ck")) \
           .select(id_col, "sh", "ck.chunk_id", "ck.chunk_val")
    a, b = ch.alias("a"), ch.alias("b")
    pairs = (a.join(b, (F.col("a.chunk_id") == F.col("b.chunk_id"))
                    & (F.col("a.chunk_val") == F.col("b.chunk_val"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col("a.sh").alias("sh_a"),
                     F.col("b.sh").alias("sh_b"))
             .distinct())
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.withColumn("hamming", hamming.cast("long")) \
                .select("id_a", "id_b", "hamming")


# ------------------------------------------------------------------ #
# embedding near-dup                                                 #
# ------------------------------------------------------------------ #

def embedding_near_dups(df: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id", threshold: float = 0.95,
                        n_planes: int = 16, seed: int = 97) -> DataFrame:
    """Cosine near-duplicates via random-hyperplane LSH buckets +
    exact cosine verification inside buckets (JVM-side arithmetic)."""
    from .similarity import random_hyperplane_bucket_udf, cosine_expr

    bucket = random_hyperplane_bucket_udf(n_planes=n_planes, seed=seed)
    base = df.select(F.col(id_col), F.col(vec_col).alias("v"),
                     bucket(F.col(vec_col)).alias("bk")).cache()
    a, b = base.alias("a"), base.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col("a.v").alias("va"), F.col("b.v").alias("vb")))
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return (pairs.withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", F.round("cosine", 6).alias("cosine")))
