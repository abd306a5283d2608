"""Distributed k-means topic clustering over embedding columns.

The training-data use: cluster the corpus's embedding space to drive
data mixing (per-topic token budgets), cluster-level dedup, and
diversity sampling. Classic Lloyd iterations, Spark-shaped:

- Centroids live on the DRIVER between iterations (k × dim longs —
  kilobytes) and enter each assignment pass as a broadcast literal
  table: the corpus never shuffles for assignment, only (id, cid)
  pairs and per-dimension partial sums do. This is the same bounded
  driver step the IVF index build documents (similarity.py) — the
  standard distributed k-means recipe (MLlib's KMeans does the same).
- Every per-row computation is a Catalyst expression (zip_with /
  aggregate / min-struct) — whole-stage codegen, no Python UDF.
- The centroid update aggregates with map-side combine on
  (cid, dim) — the shuffle is k·dim rows of partial sums, independent
  of corpus size.

Exactness: ``kmeans_fit_quantized`` snaps vectors to an integer
lattice (round(x·scale)) and updates centroids with FLOOR-division
means, so distances, argmins (ties → smallest cid), and updates are
exact integer arithmetic end-to-end — bit-reproducible on any engine
and any partitioning, hence the exact cross-engine oracle
(queries.py `kmeans_quantized`). Quantization at scale=128 (int8-ish
product-quantization granularity) perturbs each coordinate by
≤ 1/256 — far below any real cluster separation; swap in float
centroids without changing the plan shape if bit-reproducibility is
not required.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_vec", "kmeans_assign", "kmeans_fit_quantized",
           "topic_mix", "perceptron_train", "semantic_dedup"]


def quantize_vec(col: Column, scale: int = 128) -> Column:
    """array<float> → array<long> on the integer lattice: round
    half-away-from-zero of x·scale (Spark round and DuckDB round agree
    on doubles; x·128 is exact in double for float32 x, a power-of-two
    product)."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * scale, 0).cast("long"))


def _sq_dist(v: Column, c: Column) -> Column:
    """Exact squared L2 distance of two array<long> columns (codegen:
    zip_with + aggregate, no Python)."""
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def kmeans_assign(df: DataFrame, centroids: DataFrame,
                  vec_col: str = "qv", id_col: str = "vec_id") -> DataFrame:
    """Assign each row to its nearest centroid → (id, cid, dist).

    ``centroids``: (cid long, cv array<long>) — k rows, broadcast, so
    the corpus-side plan is scan → k distance expressions → one
    map-side argmin; the only exchange is the caller's (if any). Ties
    break to the smallest cid (min over (dist, cid) structs — a total
    order, so assignment is deterministic)."""
    d = (df.select(F.col(id_col), F.col(vec_col))
         .crossJoin(F.broadcast(centroids))
         .select(id_col,
                 F.struct(_sq_dist(F.col(vec_col), F.col("cv"))
                          .alias("dist"),
                          F.col("cid").alias("cid")).alias("dc")))
    best = (d.groupBy(id_col).agg(F.min("dc").alias("dc"))
            .select(id_col, F.col("dc.cid").alias("cid"),
                    F.col("dc.dist").alias("dist")))
    return best


def kmeans_fit_quantized(df: DataFrame, vec_col: str = "embedding",
                         id_col: str = "vec_id", k: int = 10,
                         iters: int = 2, scale: int = 128,
                         init_sample: int = 2048
                         ) -> tuple[DataFrame, List]:
    """Integer-lattice Lloyd: quantize → k iterations of
    (assign → floor-division centroid update) → final assignment.

    Init: deterministic farthest-point traversal (Gonzalez 1985) over
    a bounded sample — the ``init_sample`` smallest ids, ONE corpus
    pass to fetch (≈1 MB at 2048×64 longs, the same bounded driver
    step the IVF build documents), then exact integer farthest-point
    on the driver: seed 0 is the smallest id's vector, each next seed
    maximizes distance to its nearest chosen seed (ties → smallest
    id). Partitioning-independent, and it cannot collapse all seeds
    into one dense cluster the way a fixed-id init can. Running
    Gonzalez on the full corpus instead would cost k-1 extra corpus
    scans — the sample keeps total passes at iters+2 regardless of k.
    Empty clusters keep their previous centroid. Returns (assignments
    DataFrame (id, cid, dist), final centroids as a driver-side list
    of (cid, [long]*dim)).

    Per iteration: ONE corpus pass for assignment (broadcast
    centroids, no corpus shuffle) + ONE map-side-combined aggregate of
    (cid, dim, partial sum/count) — shuffle volume k·dim·partitions
    partial rows, independent of corpus size. Centroid collects are
    k·dim longs — the bounded driver step documented above."""
    spark = df.sparkSession
    q = df.select(F.col(id_col),
                  quantize_vec(F.col(vec_col), scale).alias("qv"))
    import numpy as np
    sample = q.orderBy(id_col).limit(int(init_sample)).collect()
    ids = np.array([int(r[0]) for r in sample], dtype=np.int64)
    vecs = np.array([r.qv for r in sample], dtype=np.int64)
    # exact integer farthest-point on the sample: nd = squared L2 to
    # the nearest chosen seed; next seed = argmax nd, ties -> smallest
    # id (ids are sorted ascending, so the first argmax hit wins)
    seed_idx = [0]
    nd = ((vecs - vecs[0]) ** 2).sum(axis=1)
    for _ in range(1, min(k, len(sample))):
        j = int(np.argmax(nd))
        seed_idx.append(j)
        nd = np.minimum(nd, ((vecs - vecs[j]) ** 2).sum(axis=1))
    cents = [(i, [int(x) for x in vecs[j]])
             for i, j in enumerate(seed_idx[:k])]

    def cent_df(cs):
        return spark.createDataFrame(
            [(c, v) for c, v in cs], "cid long, cv array<bigint>")

    assigned = None
    for _ in range(max(1, int(iters))):
        assigned = kmeans_assign(q, cent_df(cents), vec_col="qv",
                                 id_col=id_col)
        upd = (assigned.join(q, id_col)
               .select("cid", F.posexplode("qv").alias("pos", "v"))
               .groupBy("cid", "pos")
               .agg(F.floor(F.sum("v") / F.count("*")).cast("long")
                    .alias("mv")))
        new = (upd.groupBy("cid")
               .agg(F.transform(
                   F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                   lambda s: s.mv).alias("cv"))
               .collect())
        got = {int(r.cid): [int(x) for x in r.cv] for r in new}
        # empty clusters keep their previous centroid
        cents = [(c, got.get(c, v)) for c, v in cents]
    final = kmeans_assign(q, cent_df(cents), vec_col="qv", id_col=id_col)
    return final, cents


def topic_mix(assigned: DataFrame, tokens: DataFrame,
              id_col: str = "vec_id", doc_id_col: str = "doc_id",
              tok_col: str = "n_tokens",
              ppm_scale: int = 1_000_000) -> DataFrame:
    """Per-cluster data-mixing budgets: join cluster assignments with
    per-document token counts → (cid, n_docs, n_tokens, weight_ppm)
    where weight_ppm = n_tokens·scale // total_tokens (integer floor —
    exact on any engine; weights sum to ≤ scale with the remainder
    deliberately unassigned rather than smeared non-deterministically).

    This is the step between clustering and sampling: the weights
    drive per-topic token budgets (plug into take_token_budget) or
    temperature-scaled mixture sampling. Plan: one equi-join
    (assignments are (id, cid) — narrow), one k-row aggregate with
    map-side combine, and a 1-row total broadcast-joined back. No
    corpus text moves."""
    j = (assigned.select(F.col(id_col).alias("_id"), "cid")
         .join(tokens.select(F.col(doc_id_col).alias("_id"),
                             F.col(tok_col).alias("_nt")), "_id"))
    g = (j.groupBy("cid")
         .agg(F.count("*").cast("long").alias("n_docs"),
              F.sum("_nt").cast("long").alias("n_tokens")))
    total = g.agg(F.sum("n_tokens").alias("_tot"))
    return (g.crossJoin(F.broadcast(total))
            .select("cid", "n_docs", "n_tokens",
                    F.expr(f"CAST(n_tokens * {ppm_scale} DIV _tot "
                           "AS LONG)").alias("weight_ppm")))


def perceptron_train(df: DataFrame, feat_col: str = "features",
                     label_col: str = "label", id_col: str = "doc_id",
                     dim: int = 32, iters: int = 2) -> DataFrame:
    """Train the linear quality gate distributedly: integer batch
    perceptron over hashed-feature vectors (text_stats.py:
    hashed_features produces them; text_stats.py:classifier_gate is
    the inference side this closes the loop for). Labels are ±1;
    weights start at zero; per iteration every misclassified document
    (label·margin ≤ 0) contributes label·features to the weight
    update. All-integer arithmetic with a fixed iteration count — any
    engine replays training bit-for-bit (same contract as the
    quantized k-means above).

    Returns the learned weight vector as (pos, weight) rows — ``dim``
    of them.

    Scale shape (100 TB): per iteration ONE corpus pass — margins are
    a codegen zip_with/aggregate against the closure-captured weight
    vector (dim longs, no join), the update a map-side-combined
    posexplode → groupBy(pos) whose shuffle is dim·partitions partial
    rows, independent of corpus size; the driver step collects dim
    longs. Documents never shuffle."""
    w = [0] * dim
    for _ in range(max(1, int(iters))):
        w_lit = F.array(*[F.lit(int(v)).cast("long") for v in w])
        margin = F.aggregate(
            F.zip_with(F.col(feat_col), w_lit, lambda a, b: a * b),
            F.lit(0).cast("long"), lambda acc, x: acc + x)
        upd = (df.select(F.col(label_col).cast("long").alias("y"),
                         F.col(feat_col).alias("x"),
                         margin.alias("m"))
               .filter(F.col("y") * F.col("m") <= 0)
               .select("y", F.posexplode("x").alias("pos", "v"))
               .groupBy("pos")
               .agg(F.sum(F.col("y") * F.col("v")).cast("long")
                    .alias("dw"))
               .collect())
        for r in upd:
            w[int(r["pos"])] += int(r["dw"])
    spark = df.sparkSession
    return spark.createDataFrame(
        [(int(i), int(v)) for i, v in enumerate(w)],
        "pos long, weight long")


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, x: acc + x)


def semantic_dedup(vecs: DataFrame, k: int = 10, iters: int = 2,
                   scale: int = 128, thr_ppm: int = 950_000,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """SemDeDup (arXiv:2303.09540): k-means cluster the embedding
    space, then compare pairs only WITHIN each cluster and drop every
    vector that has a near-duplicate (cosine ≥ thr_ppm/1e6) with a
    smaller id — keep-smallest is our deterministic stand-in for the
    paper's keep-one-per-group. Returns (id, cid, kept 0/1).

    Exactness: vectors live on the integer lattice (quantize_vec),
    and the cosine test is the cross-multiplied integer comparison
    (dot·1e6)² ≥ thr²·|a|²·|b|² evaluated in 128-bit decimals — no
    floats anywhere, so the full pipeline (k-means fit included)
    replays bit-for-bit in SQL.

    Scale shape (100 TB): the quadratic work is confined to clusters —
    k must grow with the corpus so n/k stays bounded (the paper runs
    50k clusters for LAION); a skewed hot cluster concentrates one
    join key and should be sub-split (re-cluster within, or cap like
    the LSH buckets in dedup.py:cap_buckets). Pairs carry ids +
    quantized vectors; the join key is the cluster id."""
    assigned, _cents = kmeans_fit_quantized(
        vecs, k=k, iters=iters, scale=scale,
        vec_col=vec_col, id_col=id_col)
    q = (vecs.select(F.col(id_col).alias("_id"),
                     quantize_vec(F.col(vec_col), scale).alias("qv"))
         .join(assigned.select(F.col(id_col).alias("_id"), "cid"), "_id")
         .withColumn("n2", _dot(F.col("qv"), F.col("qv"))))
    a = q.select(F.col("_id").alias("ida"), "cid",
                 F.col("qv").alias("qa"), F.col("n2").alias("na2"))
    b = q.select(F.col("_id").alias("idb"), "cid",
                 F.col("qv").alias("qb"), F.col("n2").alias("nb2"))
    t2 = int(thr_ppm) * int(thr_ppm)
    pairs = (a.join(b, "cid")
             .filter(F.col("ida") < F.col("idb"))
             .withColumn("_dot", _dot(F.col("qa"), F.col("qb")))
             .filter(F.col("_dot") > 0)
             # (dot·1e6)² ≥ thr²·na2·nb2, exact: dot·1e6 ≤ ~1e12 fits
             # DECIMAL(15); products stay ≤ DECIMAL(37) — no overflow,
             # no rounding
             .filter(F.expr(
                 "CAST(_dot * 1000000 AS DECIMAL(15,0)) "
                 "* CAST(_dot * 1000000 AS DECIMAL(15,0)) "
                 f">= CAST({t2} AS DECIMAL(15,0)) "
                 "* CAST(na2 AS DECIMAL(10,0)) "
                 "* CAST(nb2 AS DECIMAL(10,0))")))
    drops = pairs.select(F.col("idb").alias("_id")).distinct() \
        .withColumn("_drop", F.lit(1))
    return (q.join(drops, "_id", "left")
            .select(F.col("_id").alias(id_col), "cid",
                    F.when(F.col("_drop").isNull(), F.lit(1))
                    .otherwise(F.lit(0)).cast("long").alias("kept")))
