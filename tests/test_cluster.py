"""Distributed k-means (integer-lattice Lloyd): recovery of planted
clusters, determinism, and plan hygiene. The exact cross-engine
iteration replay is certified by the `kmeans_quantized` driver oracle
(queries.py); these tests cover what the oracle can't — that the
clustering is USEFUL (label purity) and stays out of Python."""

import pytest

from pyspark.sql import functions as F

from htmlparser_spark.operators.cluster import (
    kmeans_assign,
    kmeans_fit_quantized,
    quantize_vec,
)

from test_plans import assert_no_python_row_udf  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_kmeans_recovers_separated_clusters(spark):
    """On deterministically synthesized WELL-SEPARATED clusters
    (testdata's embeddings.label is near-isotropic — inter-centroid
    distance ~0.2 vs intra spread ~0.99, unrecoverable by any
    clusterer), Lloyd must reach near-perfect majority-label purity."""
    k, per_c, dim = 5, 40, 16
    rows = []
    for c in range(k):
        for j in range(per_c):
            # cluster center = 3.0 on axis c, deterministic jitter
            # in (-0.25, 0.25) from a hash-free LCG of (c, j, d)
            v = [(((c * 40 + j) * 16 + d) * 2654435761 % 1000) / 2000.0
                 - 0.25 + (3.0 if d == c else 0.0) for d in range(dim)]
            rows.append((c * per_c + j, c, [float(x) for x in v]))
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<float>")
    assigned, cents = kmeans_fit_quantized(df, k=k, iters=4)
    joined = assigned.join(df.select("vec_id", "label"), "vec_id")
    per = (joined.groupBy("cid", "label").count()
           .groupBy("cid").agg(F.max("count").alias("maj"),
                               F.sum("count").alias("tot")))
    tot = per.agg(F.sum("maj"), F.sum("tot")).first()
    purity = tot[0] / tot[1]
    assert purity >= 0.9, purity
    assert len(cents) == k and all(len(v) == dim for _, v in cents)


def test_kmeans_objective_improves(spark, emb):
    """More Lloyd iterations must not worsen the clustering objective
    (sum of squared distances) on the real embeddings table — floor
    means are within 1 lattice unit of exact means, far below the
    objective deltas here."""
    a1, _ = kmeans_fit_quantized(emb, k=8, iters=1)
    a4, _ = kmeans_fit_quantized(emb, k=8, iters=4)
    o1 = a1.agg(F.sum("dist")).first()[0]
    o4 = a4.agg(F.sum("dist")).first()[0]
    assert o4 <= o1, (o1, o4)


def test_kmeans_deterministic_across_partitioning(spark, emb):
    """Same assignments whatever the input partitioning — integer
    arithmetic plus total-order tie-breaks leave nothing
    order-dependent."""
    a1, _ = kmeans_fit_quantized(emb.repartition(2), k=5, iters=2)
    a2, _ = kmeans_fit_quantized(emb.repartition(13), k=5, iters=2)
    r1 = sorted(tuple(r) for r in a1.collect())
    r2 = sorted(tuple(r) for r in a2.collect())
    assert r1 == r2


def test_kmeans_assign_plan_shape(spark, emb):
    """Assignment must broadcast the centroid table (corpus side never
    shuffles for assignment) and stay Python-free."""
    q = emb.select("vec_id", quantize_vec(F.col("embedding")).alias("qv"))
    cents = spark.createDataFrame(
        [(i, [i] * 64) for i in range(5)], "cid long, cv array<bigint>")
    out = kmeans_assign(q, cents)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert_no_python_row_udf(out)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """A centroid that captures no points must survive unchanged, not
    vanish (k stays k)."""
    rows = [(i, [float(100 + i % 2)] * 4) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # k=3 but only 2 distinct point positions -> >=1 empty cluster
    assigned, cents = kmeans_fit_quantized(df, k=3, iters=2)
    assert len(cents) == 3
    assert assigned.count() == 20


def test_topic_mix_weights_sum_and_join(spark):
    from htmlparser_spark.operators.cluster import topic_mix
    asn = spark.createDataFrame(
        [(i, i % 3, 0) for i in range(30)],
        "vec_id long, cid long, dist long")
    toks = spark.createDataFrame(
        [(i, 10 + i) for i in range(30)],
        "doc_id long, n_tokens long")
    out = topic_mix(asn, toks).collect()
    assert len(out) == 3
    tot = sum(r.n_tokens for r in out)
    assert tot == sum(10 + i for i in range(30))
    # floor weights sum to <= 1e6 and within 3 ulp of it
    s = sum(r.weight_ppm for r in out)
    assert 1_000_000 - 3 <= s <= 1_000_000
    for r in out:
        assert r.weight_ppm == r.n_tokens * 1_000_000 // tot
