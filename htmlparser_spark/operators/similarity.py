"""Similarity search over embedding columns (array<float>).

Two paths, per the scale playbook:

- **Brute-force top-k** (baseline, exact): broadcast the (small) query
  set, compute cosine with JVM-side ``aggregate``/``zip_with`` higher-
  order functions (whole-stage codegen, NO Python), window-rank per
  query. Scales linearly in corpus size — the right baseline and the
  correctness oracle for the approximate paths.
- **Random-hyperplane LSH** (scale path): a bit-signature bucket per
  vector (one vectorized numpy stage), candidates = bucket equality
  (optionally multi-probe), exact cosine re-rank inside buckets.
  Shuffles signatures, not the O(n·q) score space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType
from pyspark.sql.functions import pandas_udf

__all__ = ["cosine_expr", "dot_expr", "brute_force_topk",
           "random_hyperplane_bucket_udf", "lsh_topk"]


def dot_expr(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] in double precision, JVM-side (zip_with+aggregate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_expr(a: Column, b: Column) -> Column:
    denom = _norm_expr(a) * _norm_expr(b)
    return F.when(denom > 0, dot_expr(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k per query: broadcast-join the query set
    against the corpus (no shuffle of the corpus), rank per query.
    Output: (query_id, vec_id, rank) — ints only, rank 1 = best,
    ties broken by vec_id for determinism."""
    from pyspark.sql import Window

    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("cv"))
    scored = (c.crossJoin(F.broadcast(q))
              .withColumn("cosine", cosine_expr(F.col("cv"), F.col("qv"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", id_col, "rank",
                    F.round("cosine", 6).alias("cosine")))


def random_hyperplane_bucket_udf(n_planes: int = 16, seed: int = 97,
                                 dim: int | None = None):
    """Signature UDF: sign-bit pattern of projections onto n_planes
    random hyperplanes (numpy matmul per Arrow batch — one BLAS call)."""
    @pandas_udf(LongType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        arrs = [np.asarray(v, dtype=np.float64) if v is not None else None
                for v in vecs]
        d = dim
        if d is None:
            d = next((len(a) for a in arrs if a is not None), 0)
        if d == 0:
            return pd.Series(np.zeros(len(vecs), dtype=np.int64))
        rng = np.random.RandomState(seed)
        planes = rng.randn(d, n_planes)
        M = np.stack([a if a is not None else np.zeros(d) for a in arrs])
        bits = (M @ planes) > 0
        sig = np.zeros(len(vecs), dtype=np.int64)
        for p in range(n_planes):
            sig |= bits[:, p].astype(np.int64) << p
        return pd.Series(sig)

    return bucket_udf


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id", n_planes: int = 12,
             seed: int = 97) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane
    bucket; exact cosine re-rank on candidates only. Recall grows with
    fewer planes / multi-probe; this is the IVF-style scale path."""
    from pyspark.sql import Window

    bucket = random_hyperplane_bucket_udf(n_planes=n_planes, seed=seed)
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("cv"),
                      bucket(F.col(vec_col)).alias("bk"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       bucket(F.col(vec_col)).alias("qbk"))
    cand = c.join(F.broadcast(q), F.col("bk") == F.col("qbk"))
    scored = cand.withColumn("cosine", cosine_expr(F.col("cv"), F.col("qv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", id_col, "rank",
                    F.round("cosine", 6).alias("cosine")))
