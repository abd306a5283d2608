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
           "random_hyperplane_bucket_udf", "multi_table_bucket_udf",
           "lsh_topk", "train_ivf_centroids", "ivf_topk",
           "IvfIndex", "ivf_build", "ivf_query", "ivf_recall_report"]


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


def _merge_topk(scored: DataFrame, k: int, id_col: str,
                score_col: str = "cosine", ascending: bool = False,
                round_score: int | None = 6) -> DataFrame:
    """Two-stage exact top-k of (query_id, id, cosine) rows:

    1. partial: a vectorized pandas stage reduces every Arrow batch to
       ≤ k rows per query BEFORE any exchange, so the only shuffled
       data is O(q · k · n_batches) narrow rows — a global window over
       raw scores would instead move ALL candidate rows to q reducer
       tasks (the single-hot-task killer when one query's candidate
       set is huge: a hot IVF cell, a stopword-dense LSH bucket);
    2. merge: an exact window over the tiny partial set.

    Exactness: the per-batch selection uses the same total order as
    the final rank (score, id asc), so any row dropped early is
    dominated by ≥ k surviving rows from its own batch — the merged
    top-k is identical to the single-window answer.

    ``score_col``/``ascending`` generalize the order: cosine callers
    rank descending and round to 6 dp; the integer-lattice recall
    report ranks squared distance ascending with no rounding
    (``round_score=None``)."""
    from pyspark.sql import Window

    out_schema = scored.schema

    def partial_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            yield (pdf.sort_values([score_col, id_col],
                                   ascending=[ascending, True])
                   .groupby("query_id", sort=False).head(k))

    partial = scored.mapInPandas(partial_topk, out_schema)
    order = (F.col(score_col).asc() if ascending
             else F.col(score_col).desc())
    w = Window.partitionBy("query_id").orderBy(order, F.col(id_col).asc())
    score_out = (F.col(score_col) if round_score is None
                 else F.round(score_col, round_score).alias(score_col))
    return (partial.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", id_col, "rank", score_out))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k per query, in two stages:

    1. score: broadcast-join the (small) query set against the corpus
       — cosine stays a JVM codegen expression, the corpus is never
       shuffled;
    2. partial top-k: a vectorized pandas stage reduces every Arrow
       batch to ≤ k rows per query BEFORE any exchange, so the only
       shuffled data is O(q · k · n_batches) narrow rows — a global
       window over raw scores would instead move ALL n·q scored rows
       to q reducer tasks, the classic single-hot-task killer at
       10^10-row corpora;
    3. merge: an exact window over the tiny partial set.

    Exactness: see :func:`_merge_topk` — the two-stage reduction is
    identical to the single-window answer.
    Output: (query_id, vec_id, rank, cosine), rank 1 = best, ties
    broken by vec_id for determinism."""
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("cv"))
    scored = (c.crossJoin(F.broadcast(q))
              .withColumn("cosine", cosine_expr(F.col("cv"), F.col("qv")))
              .select("query_id", id_col, "cosine"))
    return _merge_topk(scored, k, id_col)


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


def train_ivf_centroids(corpus: DataFrame, n_centroids: int = 16,
                        sample_size: int = 2048,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id", n_iter: int = 10,
                        seed: int = 41) -> np.ndarray:
    """IVF coarse quantizer: Lloyd k-means on a BOUNDED deterministic
    sample, run driver-side. Centroid training is the one step of IVF
    that belongs on the driver — the sample and the centroid set are
    both tiny and fixed-size regardless of corpus scale (the classic
    IVF recipe: train on a sample, assign distributed). Sample =
    first ``sample_size`` rows by id (a distributed top-k, not a full
    sort), so training is reproducible run-to-run.

    Returns (n_centroids, dim) float64, rows L2-normalized (cosine
    metric — matches the rest of this module)."""
    rows = (corpus.select(id_col, vec_col)
            .orderBy(id_col).limit(sample_size).collect())
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    k = min(n_centroids, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(n_iter):
        assign = (X @ C.T).argmax(axis=1)        # cosine = dot (unit)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                c = members.sum(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C


def _ivf_assign_udf(centroids: np.ndarray, n_probe: int):
    """array<long> of the n_probe nearest centroid ids per vector —
    one numpy matmul per Arrow batch."""
    from pyspark.sql.types import ArrayType

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf(ArrayType(LongType()))
    def assign_udf(vecs: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = M @ C.T                               # (n, k)
        p = min(n_probe, sims.shape[1])
        top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
        # order probes best-first for interpretability
        rows = np.take_along_axis(sims, top, axis=1).argsort(axis=1)[:, ::-1]
        ordered = np.take_along_axis(top, rows, axis=1)
        return pd.Series([r.astype(np.int64).tolist() for r in ordered])

    return assign_udf


class IvfIndex:
    """A built IVF index: the (tiny) centroid array plus the corpus
    assigned to cells — either persisted in memory or written to
    parquet at ``path``. Build once with :func:`ivf_build`, query any
    number of times with :func:`ivf_query`: repeat queries touch the
    assigned table only (scan / cached read), never the assignment
    UDF — the round-2 shape retrained centroids and re-assigned the
    whole corpus on EVERY call."""

    def __init__(self, centroids: np.ndarray, assigned: DataFrame,
                 id_col: str, path: str | None = None):
        self.centroids = centroids
        self.assigned = assigned
        self.id_col = id_col
        self.path = path

    def unpersist(self) -> None:
        """Release the in-memory assigned table (no-op for a
        parquet-backed index — the files are the caller's to delete).
        Call when the index is retired; an IvfIndex is deliberately
        long-lived, so its cache is NOT scope-managed."""
        if self.path is None:
            self.assigned.unpersist()


def ivf_build(corpus: DataFrame, n_centroids: int = 16,
              vec_col: str = "embedding", id_col: str = "vec_id",
              seed: int = 41, sample_size: int = 2048,
              path: str | None = None,
              centroids: np.ndarray | None = None) -> IvfIndex:
    """Build the reusable IVF index: driver k-means on a bounded
    sample (train_ivf_centroids), then ONE distributed assignment
    pass over the corpus. With ``path`` the assigned table is written
    to parquet and read back (survives the session, scan-only probes,
    partitioned by cell for partition pruning); otherwise it is
    persisted in executor memory."""
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids=n_centroids, sample_size=sample_size,
            vec_col=vec_col, id_col=id_col, seed=seed)
    corpus_cell = _ivf_assign_udf(centroids, 1)
    assigned = corpus.select(
        F.col(id_col), F.col(vec_col).alias("cv"),
        F.element_at(corpus_cell(F.col(vec_col)), 1).alias("cell"))
    if path is not None:
        (assigned.repartition(len(centroids), "cell")
         .write.mode("overwrite").partitionBy("cell").parquet(path))
        spark = corpus.sparkSession
        assigned = (spark.read.parquet(path)
                    .select(id_col, "cv",
                            F.col("cell").cast("long").alias("cell")))
    else:
        assigned = assigned.persist()
    return IvfIndex(centroids, assigned, id_col, path)


def ivf_query(index: IvfIndex, queries: DataFrame, k: int = 10,
              vec_col: str = "embedding",
              query_id_col: str = "query_id",
              n_probe: int = 4) -> DataFrame:
    """Probe a built index: each query fans out to its ``n_probe``
    nearest cells (tiny query side explodes, corpus side never does),
    candidates come from a cell equi-join against the assigned table,
    exact cosine re-ranks them. The corpus-side plan is a scan — no
    assignment UDF runs over it (plan-asserted in tests).

    The re-rank is the two-stage :func:`_merge_topk` — a hot cell
    (skewed corpus) reduces to ≤ k rows per query per Arrow batch
    before the exchange instead of buffering one query's whole
    candidate set in a single window task."""
    id_col = index.id_col
    query_cells = _ivf_assign_udf(index.centroids, n_probe)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(query_cells(F.col(vec_col))).alias("cell"))
    cand = index.assigned.join(F.broadcast(q), "cell")
    scored = (cand.withColumn("cosine",
                              cosine_expr(F.col("cv"), F.col("qv")))
              .select("query_id", id_col, "cosine"))
    return _merge_topk(scored, k, id_col)


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id", n_centroids: int = 16,
             n_probe: int = 4, centroids: np.ndarray | None = None,
             seed: int = 41) -> DataFrame:
    """IVF approximate top-k, one-shot convenience: corpus vectors
    live in their single nearest-centroid cell; each query probes its
    ``n_probe`` nearest cells and exact-reranks only those candidates.
    Recall is tuned by n_probe/n_centroids, cost per query drops from
    O(n) to O(n·n_probe/n_centroids). For repeated querying build the
    index once with ivf_build and probe with ivf_query."""
    index = ivf_build(corpus, n_centroids=n_centroids, vec_col=vec_col,
                      id_col=id_col, seed=seed, centroids=centroids)
    return ivf_query(index, queries, k=k, vec_col=vec_col,
                     query_id_col=query_id_col, n_probe=n_probe)


def ivf_recall_report(corpus: DataFrame, n_queries: int = 8,
                      k: int = 10, n_probe: int = 4,
                      n_centroids: int = 10, iters: int = 2,
                      scale: int = 128,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> DataFrame:
    """Recall@k audit of an IVF probe against exact brute force — the
    number a user tunes ``n_probe`` / ``n_centroids`` by. Output one
    row per sampled query: (query_id, n_hit, recall_ppm) where n_hit =
    |ivf top-k ∩ brute top-k| and recall_ppm = n_hit·10⁶ // k.

    Cross-engine exactness: the whole computation runs on the INTEGER
    lattice (round(x·scale), cluster.py's quantization): centroids
    come from the integer Lloyd fit, cell assignment / probe selection
    / both top-k rankings use exact integer squared L2 with
    (dist, id) total order — so a SQL oracle replays every hit count
    bit-for-bit (float IVF recall, which no SQL engine can replay
    seed-exactly, is pytest-covered against brute force in
    tests/test_dedup_scale.py).

    Scale shape: queries are a bounded sample (broadcast); the brute
    side is the two-stage partial top-k over one corpus scan (the
    exact baseline costs one full scan BY DEFINITION — this is an
    audit you run on a sampled query set, not per production query);
    the IVF side joins the (id, cid) assignment to the broadcast probe
    set — candidates only. Both re-ranks reduce per Arrow batch before
    any exchange; the recall join is k·q rows."""
    from .cluster import kmeans_fit_quantized, quantize_vec, _sq_dist

    spark = corpus.sparkSession
    assigned, cents = kmeans_fit_quantized(
        corpus, vec_col=vec_col, id_col=id_col, k=n_centroids,
        iters=iters, scale=scale)
    q = corpus.select(F.col(id_col),
                      quantize_vec(F.col(vec_col), scale).alias("qv"))
    queries = (q.filter(F.col(id_col) < n_queries)
               .select(F.col(id_col).alias("query_id"),
                       F.col("qv").alias("qqv")))

    # exact baseline: one corpus scan, per-batch partial top-k
    brute_scored = (q.crossJoin(F.broadcast(queries))
                    .select("query_id", id_col,
                            _sq_dist(F.col("qv"), F.col("qqv"))
                            .alias("dist")))
    brute = _merge_topk(brute_scored, k, id_col, score_col="dist",
                        ascending=True, round_score=None) \
        .select("query_id", id_col)

    # probe cells: n_probe nearest centroids per query (tiny: q × k
    # centroid rows, one window over ≤ n_centroids rows per query)
    from pyspark.sql import Window
    cent_df = spark.createDataFrame(
        [(c, v) for c, v in cents], "cid long, cv array<bigint>")
    probe_rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy("cdist", "cid"))
    probes = (queries.crossJoin(F.broadcast(cent_df))
              .select("query_id", "qqv", "cid",
                      _sq_dist(F.col("qqv"), F.col("cv")).alias("cdist"))
              .withColumn("_rn", probe_rn).filter(F.col("_rn") <= n_probe)
              .select("query_id", "qqv", "cid"))

    # IVF candidates: assignment (id, cid) ⋈ broadcast probes, then
    # the same two-stage exact re-rank over candidates only
    cand = (assigned.select(id_col, "cid")
            .join(F.broadcast(probes), "cid")
            .join(q, id_col)
            .select("query_id", id_col,
                    _sq_dist(F.col("qv"), F.col("qqv")).alias("dist")))
    ivf = _merge_topk(cand, k, id_col, score_col="dist",
                      ascending=True, round_score=None) \
        .select("query_id", id_col)

    hits = (brute.join(ivf, ["query_id", id_col])
            .groupBy("query_id")
            .agg(F.count("*").cast("long").alias("n_hit")))
    return (queries.select("query_id")
            .join(hits, "query_id", "left")
            .select("query_id",
                    F.coalesce(F.col("n_hit"), F.lit(0)).cast("long")
                    .alias("n_hit"))
            .withColumn("recall_ppm",
                        F.expr(f"CAST(n_hit * 1000000 DIV {k} AS LONG)")))


def multi_table_bucket_udf(n_planes: int = 8, n_tables: int = 4,
                           seed: int = 97, dim: int | None = None):
    """Signatures for ``n_tables`` INDEPENDENT hyperplane tables in
    one numpy matmul (d × n_tables·n_planes). Returns array<long> of
    one bucket per table. Multiple independent tables are the standard
    recall amplifier for hyperplane LSH: a true near-dup pair missed
    by one table (P ≈ 1-(1-p_match)) is caught by another — recall
    1-(1-p)^L instead of p — at linear, not quadratic, cost."""
    from pyspark.sql.types import ArrayType

    @pandas_udf(ArrayType(LongType()))
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        arrs = [np.asarray(v, dtype=np.float64) if v is not None else None
                for v in vecs]
        d = dim
        if d is None:
            d = next((len(a) for a in arrs if a is not None), 0)
        if d == 0:
            return pd.Series([[0] * n_tables] * len(vecs))
        rng = np.random.RandomState(seed)
        planes = rng.randn(d, n_tables * n_planes)
        M = np.stack([a if a is not None else np.zeros(d) for a in arrs])
        bits = (M @ planes) > 0                     # (n, T*P)
        weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
        sigs = (bits.reshape(len(vecs), n_tables, n_planes)
                .astype(np.int64) * weights).sum(axis=2)   # (n, T)
        return pd.Series(list(sigs))

    return buckets_udf


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id", n_planes: int = 12,
             seed: int = 97) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane
    bucket; exact cosine re-rank on candidates only. Recall grows with
    fewer planes / multi-probe; this is the IVF-style scale path.

    The re-rank is the two-stage :func:`_merge_topk` (see ivf_query) —
    a stopword-dense hot bucket cannot buffer one query's candidates
    in a single window task."""
    bucket = random_hyperplane_bucket_udf(n_planes=n_planes, seed=seed)
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("cv"),
                      bucket(F.col(vec_col)).alias("bk"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       bucket(F.col(vec_col)).alias("qbk"))
    cand = c.join(F.broadcast(q), F.col("bk") == F.col("qbk"))
    scored = (cand.withColumn("cosine",
                              cosine_expr(F.col("cv"), F.col("qv")))
              .select("query_id", id_col, "cosine"))
    return _merge_topk(scored, k, id_col)
