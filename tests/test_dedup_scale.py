"""Scale-hardening tests for the dedup/ANN family (VERDICT round 1
items 4-7):

- hot LSH buckets are capped: a corpus of N identical docs must NOT
  run a quadratic in-bucket join — it degrades to N-1 star pairs on an
  exact-equality key, and completes;
- the minhash verify stage joins precomputed shingle arrays (not raw
  text re-shingled per pair) and its jaccard matches an independent
  Python recompute exactly;
- embedding near-dup LSH recovers REAL near-dups (perturbed vectors at
  cosine ~0.96), not just exact copies — multi-table + multi-probe.
"""

from __future__ import annotations

import re

import numpy as np
import pytest

from pyspark.sql import functions as F

from htmlparser_spark.operators.dedup import (
    bucket_stats,
    cap_buckets,
    connected_components,
    embedding_near_dups,
    minhash_candidates,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_candidates,
)

_SPLIT = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_shingles(text: str, k: int) -> set:
    """Python replica of dedup._shingle_array_expr (Spark semantics:
    trim strips ASCII spaces only; split keeps empty edge tokens)."""
    toks = _SPLIT.split(text.lower().strip(" "))
    count = max(len(toks) - k + 1, 1)
    return {" ".join(toks[i:i + k]) for i in range(count)}


def _py_jaccard(a: str, b: str, k: int) -> float:
    sa, sb = _py_shingles(a, k), _py_shingles(b, k)
    u = len(sa | sb)
    return (len(sa & sb) / u) if u else 1.0


def test_cap_buckets_split(spark):
    rows = [(i, "hot") for i in range(10)] + [(100, "cold"), (101, "cold")]
    df = spark.createDataFrame(rows, "id long, bk string")
    ok, over = cap_buckets(df, ["bk"], max_bucket_size=5)
    assert ok.count() == 2 and over.count() == 10
    stats = {r.bk: r.n_members for r in bucket_stats(df, ["bk"]).collect()}
    assert stats == {"hot": 10, "cold": 2}


def test_cap_buckets_no_window_in_plan(spark):
    """The cap must protect against hot buckets WITHOUT itself
    funneling a hot bucket into one task: sizing is groupBy (map-side
    partial) + broadcast anti/semi join — no `count() over (partition
    by bucket keys)` window, which would buffer the whole degenerate
    bucket in a single reducer. Asserted on the physical plan of the
    full candidate pipeline with a planted degenerate bucket."""
    same = [(i, "the same boilerplate page text repeated many words "
                "over and over for every single crawled url")
            for i in range(2000)]
    df = spark.createDataFrame(same, "doc_id long, text string")
    cand = minhash_candidates(df, max_bucket_size=100, parallelism=4)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastExchange" in plan      # the tiny oversize key set
    sh = simhash_candidates(df, max_bucket_size=100, parallelism=4)
    plan_sh = sh._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan_sh


def test_minhash_hot_bucket_degrades_to_star_pairs(spark):
    """2000 identical docs: every band bucket is oversize. The
    quadratic join must see NONE of them; the output is the 1999-star,
    not the ~2M-clique."""
    n = 2000
    same = [(i, "the same boilerplate page text repeated many words "
                "over and over for every single crawled url")
            for i in range(n)]
    distinct = [(10_000 + i, f"unique document number {i} with its own "
                             f"words entirely different content {i * 7}")
                for i in range(5)]
    df = spark.createDataFrame(same + distinct, "doc_id long, text string")
    cand = minhash_candidates(df, max_bucket_size=100, parallelism=4)
    pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    star = {(0, i) for i in range(1, n)}
    # the hot group appears exactly as the star — no clique blowup;
    # candidates among the 5 distinct docs (overlapping wording) are
    # legitimate LSH output and irrelevant here
    assert {p for p in pairs if p[0] < 10_000} == star
    # verified pairs: identical docs have jaccard 1 ≥ any threshold
    ver = minhash_dedup_pairs(df, threshold=0.8, max_bucket_size=100,
                              parallelism=4)
    got = {(r.id_a, r.id_b): r.jaccard
           for r in ver.collect() if r.id_a < 10_000}
    assert set(got) == star
    assert all(j == 1.0 for j in got.values())


def test_simhash_hot_bucket_degrades_to_star_pairs(spark):
    n = 500
    same = [(i, "identical template words for the hot bucket case")
            for i in range(n)]
    df = spark.createDataFrame(
        same + [(9000, "something else entirely unrelated here")],
        "doc_id long, text string")
    out = simhash_candidates(df, max_bucket_size=50, parallelism=4)
    rows = out.collect()
    pairs = {(r.id_a, r.id_b) for r in rows}
    assert pairs == {(0, i) for i in range(1, n)}
    assert all(r.hamming == 0 for r in rows)


def test_minhash_verify_matches_python_jaccard(spark):
    """Rework regression: output pairs and jaccard values equal the
    straight Python shingle-set computation (planted near-dups)."""
    base = [(i, f"alpha beta gamma delta epsilon zeta eta theta common "
                f"prefix words document {i} iota kappa lambda mu nu xi")
            for i in range(40)]
    planted = [(1000 + i, t + " tail") for i, t in base if i % 4 == 0]
    df = spark.createDataFrame(base + planted, "doc_id long, text string")
    out = minhash_dedup_pairs(df, threshold=0.5, shingle_k=5,
                              parallelism=4)
    texts = dict(base + planted)
    for r in out.collect():
        exp = _py_jaccard(texts[r.id_a], texts[r.id_b], 5)
        assert r.jaccard == pytest.approx(round(exp, 6), abs=1e-9)
    got_pairs = {(r.id_a, r.id_b) for r in out.collect()}
    for i, _t in base:
        if i % 4 == 0:
            assert (i, 1000 + i) in got_pairs, i
    # exact_counts form carries the integer witness
    cnt = minhash_dedup_pairs(df, threshold=0.5, shingle_k=5,
                              parallelism=4, exact_counts=True)
    for r in cnt.collect():
        sa = _py_shingles(texts[r.id_a], 5)
        sb = _py_shingles(texts[r.id_b], 5)
        assert (r.n_intersect, r.n_union) == (len(sa & sb), len(sa | sb))


def test_ngram_exact_counts_match_python(spark):
    base = [(i, f"one two three four five six seven eight nine ten "
                f"doc {i}") for i in range(30)]
    planted = [(500 + i, t + " tail") for i, t in base if i % 3 == 0]
    df = spark.createDataFrame(base + planted, "doc_id long, text string")
    out = ngram_jaccard_pairs(df, k=3, threshold=0.5, max_len_delta=8,
                              parallelism=4, exact_counts=True)
    texts = dict(base + planted)
    rows = out.collect()
    assert rows
    for r in rows:
        sa = _py_shingles(texts[r.id_a], 3)
        sb = _py_shingles(texts[r.id_b], 3)
        assert (r.n_intersect, r.n_union) == (len(sa & sb), len(sa | sb))


def test_embedding_near_dups_recovers_perturbed_vectors(spark):
    """REAL near-dups (cosine ≈ 0.96, not exact copies): multi-table
    multi-probe LSH must recover every planted pair at threshold 0.95.
    Deterministic: fixed data seed + fixed LSH seed."""
    rng = np.random.RandomState(7)
    d, n = 64, 200
    base = rng.randn(n, d)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].astype(np.float32).tolist()) for i in range(n)]
    planted = []
    for i in range(0, n, 10):          # 20 perturbed near-copies
        noise = rng.randn(d)
        noise -= noise.dot(base[i]) * base[i]          # ⊥ component
        noise /= np.linalg.norm(noise)
        v = base[i] + 0.28 * noise                     # cos ≈ 0.963
        v /= np.linalg.norm(v)
        assert 0.95 < float(v.dot(base[i])) < 0.975
        planted.append((1_000_000 + i, v.astype(np.float32).tolist()))
    df = spark.createDataFrame(rows + planted,
                               "vec_id long, embedding array<float>")
    out = embedding_near_dups(df, threshold=0.95)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    expected = {(i, 1_000_000 + i) for i in range(0, n, 10)}
    assert expected <= got, expected - got
    # precision is exact by construction: nothing below threshold
    assert all(r.cosine >= 0.95 for r in out.collect())
    # random unit vectors in d=64 never reach cosine 0.95 naturally
    assert got == expected


def test_brute_force_topk_two_stage_exact(spark):
    """The per-batch partial top-k must produce EXACTLY the
    single-window answer (numpy ground truth), across many small
    Arrow batches."""
    from htmlparser_spark.operators.similarity import brute_force_topk

    rng = np.random.RandomState(3)
    n, d, k = 400, 16, 10
    M = rng.randn(n, d)
    corpus = spark.createDataFrame(
        [(i, M[i].astype(np.float32).tolist()) for i in range(n)],
        "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        out = brute_force_topk(corpus, queries, k=k)
        got = {(r.query_id, r.rank): r.vec_id for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    # ground truth: float32 vectors scored in float64, ties by id
    Mf = M.astype(np.float32).astype(np.float64)
    norms = np.linalg.norm(Mf, axis=1)
    for qid in range(3):
        cos = (Mf @ Mf[qid]) / (norms * norms[qid])
        order = sorted(range(n), key=lambda i: (-cos[i], i))[:k]
        for rank, vid in enumerate(order, start=1):
            assert got[(qid, rank)] == vid, (qid, rank)


def test_brute_force_topk_plan_shape(spark):
    """The merge window's input is the pandas partial stage — the
    full scored set is never exchanged (plan: Window above
    MapInPandas, which sits above the broadcast join)."""
    from htmlparser_spark.operators.similarity import brute_force_topk
    from htmlparser_spark.plans import explain_string

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>")
    queries = corpus.limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding")
    plan = explain_string(brute_force_topk(corpus, queries, k=3))
    assert "MapInPandas" in plan
    assert "Window" in plan
    # tree prints parents first: the window must sit ABOVE the
    # partial-topk python stage
    assert plan.index("Window") < plan.index("MapInPandas")


def test_scoped_caches_release_blocks(spark):
    """Deterministic cache reclamation (round-3 verdict item): after a
    scoped_caches block completes (build + action inside), the cache
    manager holds ZERO cached plans — library callers no longer depend
    on LRU eviction. Covers the minhash, simhash, n-gram, embedding
    and fuzzy-dedup builders, which all route through cache_df."""
    from htmlparser_spark.operators.caching import scoped_caches
    from htmlparser_spark.operators.dedup import (embedding_near_dups,
                                                  fuzzy_dedup_keep,
                                                  simhash_candidates)

    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    rng = np.random.RandomState(7)
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{rng.randint(0, 1000)}" for _ in range(12)))
         for i in range(60)], "doc_id long, text string")
    emb = spark.createDataFrame(
        [(i, rng.randn(16).astype(np.float32).tolist())
         for i in range(60)], "vec_id long, embedding array<float>")

    with scoped_caches():
        minhash_dedup_pairs(docs, threshold=0.5, parallelism=4).count()
        assert not cm.isEmpty()          # caches live inside the scope
        simhash_candidates(docs).count()
        embedding_near_dups(emb, threshold=0.9, n_planes=6).count()
        fuzzy_dedup_keep(docs, threshold=0.5).count()
    assert cm.isEmpty()                  # ...and are all released after

    # without a scope: documented LRU policy (blocks stay, clearCache
    # reclaims) — unchanged behavior for existing callers
    minhash_dedup_pairs(docs, threshold=0.5, parallelism=4).count()
    assert not cm.isEmpty()
    spark.catalog.clearCache()
    assert cm.isEmpty()


def test_ann_probe_rerank_is_two_stage(spark, tmp_path):
    """Round-3 verdict item: the lsh_topk / ivf_query re-rank must use
    the per-batch partial top-k (MapInPandas reduction BEFORE the
    merge window's exchange), not a raw window over all of one query's
    candidates — a hot cell/bucket must never buffer one query's whole
    candidate set in a single task. Tree prints parents first, so the
    partial stage must appear BELOW (after) the window."""
    from htmlparser_spark.operators.similarity import (ivf_build,
                                                       ivf_query,
                                                       lsh_topk)
    from htmlparser_spark.plans import explain_string

    rng = np.random.RandomState(23)
    n, d = 100, 16
    M = rng.randn(n, d)
    corpus = spark.createDataFrame(
        [(i, M[i].astype(np.float32).tolist()) for i in range(n)],
        "vec_id long, embedding array<float>")
    queries = corpus.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding")
    index = ivf_build(corpus, n_centroids=4,
                      path=str(tmp_path / "ivf_idx2"))
    for out in (lsh_topk(corpus, queries, k=5, n_planes=4),
                ivf_query(index, queries, k=5, n_probe=2)):
        plan = explain_string(out)
        assert "MapInPandas" in plan
        assert plan.index("Window") < plan.index("MapInPandas"), plan


def _py_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize every node's component to the MIN id of its component
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), []).append(x)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def test_connected_components_random_graph(spark):
    """CC over a random pair set equals a Python union-find, including
    long chains (pointer jumping must shortcut them)."""
    rng = np.random.RandomState(11)
    edges = set()
    # random clusters
    for _ in range(300):
        a, b = rng.randint(0, 400, size=2)
        if a != b:
            edges.add((int(a), int(b)))
    # one 60-node chain (diameter stress)
    edges |= {(1000 + i, 1001 + i) for i in range(60)}
    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    got = {r.node: r.component
           for r in connected_components(df).collect()}
    assert got == _py_components(edges)


def test_connected_components_on_minhash_pairs(spark):
    """End-to-end: near-dup pairs → dedup clusters. Chained planting
    (A≈B, B≈C) must merge transitively even when (A, C) was never
    emitted as a pair."""
    rng = np.random.RandomState(5)
    # per-doc random vocabulary → base docs are NOT near-dups of each
    # other; only the planted chains are
    base = [(i, " ".join(f"w{rng.randint(0, 100000)}" for _ in range(16)))
            for i in range(20)]
    chain1 = [(100 + i, t + " tail") for i, t in base]
    chain2 = [(200 + i, t + " tail more") for i, t in base]
    df = spark.createDataFrame(base + chain1 + chain2,
                               "doc_id long, text string")
    pairs = minhash_dedup_pairs(df, threshold=0.5, shingle_k=5,
                                parallelism=4)
    comp = {r.node: r.component
            for r in connected_components(pairs).collect()}
    for i in range(20):
        assert comp.get(100 + i) == i, (i, comp.get(100 + i))
        assert comp.get(200 + i) == i, (i, comp.get(200 + i))


def test_ivf_topk_self_and_recall(spark):
    """IVF: rank-1 is always self for corpus-drawn queries
    (structural: the query's best probe cell IS its own cell), and
    recall@10 vs brute force is high at n_probe=4/16 cells."""
    from htmlparser_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    rng = np.random.RandomState(19)
    n, d, k = 500, 32, 10
    M = rng.randn(n, d)
    corpus = spark.createDataFrame(
        [(i, M[i].astype(np.float32).tolist()) for i in range(n)],
        "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    ivf = ivf_topk(corpus, queries, k=k, n_centroids=16, n_probe=4)
    rows = ivf.collect()
    self_rank1 = {r.query_id: r.vec_id for r in rows if r.rank == 1}
    assert self_rank1 == {q: q for q in range(8)}
    brute = brute_force_topk(corpus, queries, k=k)
    bset = {(r.query_id, r.vec_id) for r in brute.collect()}
    iset = {(r.query_id, r.vec_id) for r in rows}
    recall = len(bset & iset) / len(bset)
    # deterministic with the fixed seeds; comfortably above the bound
    assert recall >= 0.5, recall


def test_ivf_index_reusable_no_corpus_udf_on_probe(spark, tmp_path):
    """The two-step API: build once, probe many — a second query run
    must not re-run the assignment UDF over the corpus. With a
    parquet-backed index this is structural (the corpus side of the
    probe plan is a parquet scan of precomputed (id, cv, cell)); the
    only Python stage left is the tiny query side's probe-cell UDF."""
    from htmlparser_spark.operators.similarity import ivf_build, ivf_query

    rng = np.random.RandomState(31)
    n, d = 200, 16
    M = rng.randn(n, d)
    corpus = spark.createDataFrame(
        [(i, M[i].astype(np.float32).tolist()) for i in range(n)],
        "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    index = ivf_build(corpus, n_centroids=8,
                      path=str(tmp_path / "ivf_idx"))
    for _ in range(2):                      # second run = repeat probe
        out = ivf_query(index, queries, k=5, n_probe=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the only per-ROW Python stage is the query-side probe-cell
        # UDF (the candidate partial-topk reducer is MapInPandas)
        assert plan.count("ArrowEvalPython") == 1
        # corpus side = parquet scan of the precomputed assignment
        assert any("FileScan parquet" in ln and "cell" in ln
                   for ln in plan.splitlines())
        rows = out.collect()
        assert {r.query_id: r.vec_id for r in rows if r.rank == 1} \
            == {q: q for q in range(4)}


def test_curate_corpus_near_dedup_keep_one(spark):
    """Full curation with near-dedup: quality gates drop junk, exact
    dedup keeps min id, near-dup components collapse to one survivor."""
    from htmlparser_spark.operators.curate import curate_corpus

    rng = np.random.RandomState(23)

    def word():
        return "".join(chr(97 + rng.randint(0, 26)) for _ in range(6))

    base = [(i, " ".join(word() for _ in range(16)), "en")
            for i in range(20)]
    near = [(100 + i, t + " tail", lg) for i, t, lg in base]
    exact = [(300 + i, t, lg) for i, t, lg in base]
    junk = [(900, "!!! 123 ???", "en"),       # fails alpha gate
            (901, "one two", "en"),           # fails min_tokens
            (902, base[0][1], "de")]          # fails lang gate
    df = spark.createDataFrame(base + near + exact + junk,
                               "doc_id long, text string, lang string")
    out = curate_corpus(df, lang="en", min_tokens=5, min_alpha_pct=30,
                        near_dedup=True, minhash_threshold=0.5)
    got = sorted(r.doc_id for r in out.collect())
    # exact copies (300+i) die in exact keep-one; near copies (100+i)
    # die in the components pass; junk dies at the gates
    assert got == list(range(20))


def test_embedding_hot_bucket_star_pairs(spark):
    """Identical vectors flooding one bucket: capped, star-paired."""
    v = [float(x) for x in range(8)]
    dup = [(i, v) for i in range(300)]
    other = [(5000, [1.0, -2.0, 3.0, -4.0, 5.0, -6.0, 7.0, -8.0])]
    df = spark.createDataFrame(dup + other,
                               "vec_id long, embedding array<float>")
    out = embedding_near_dups(df, threshold=0.95, max_bucket_size=50)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert pairs == {(0, i) for i in range(1, 300)}


def test_fuzzy_dedup_keep_best_prefers_high_score(spark):
    """Three near-identical docs; the middle id has the best score —
    best-keep must retain it (min-id keep would retain id 1)."""
    from htmlparser_spark.operators.dedup import fuzzy_dedup_keep
    base = "the quick brown fox jumps over the lazy dog again " * 6
    rows = [(1, base + "x", 10), (2, base + "y", 99), (3, base, 50),
            (40, "completely different unrelated tiny text", 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, clf_score long")
    kept = sorted(r.doc_id for r in
                  fuzzy_dedup_keep(df, threshold=0.5, bands=32,
                                   score_col="clf_score").collect())
    assert kept == [2, 40]
    # min-id policy on the same corpus keeps 1 instead
    kept_min = sorted(r.doc_id for r in
                      fuzzy_dedup_keep(df, threshold=0.5,
                                       bands=32).collect())
    assert kept_min == [1, 40]


def test_hamming_candidates_pigeonhole_recall(spark):
    """The generic kernel's recall GUARANTEE: chunks=4 means any pair
    at hamming < 4 differs in at most 3 chunks, so at least one
    16-bit chunk matches and the pair MUST surface as a candidate —
    for any signature distribution. Fuzz 48 seeded signatures
    (including planted low-hamming pairs) and check the candidate
    set against a local all-pairs replay; also pin reported hamming
    values and that no self/reversed pairs leak."""
    from htmlparser_spark.operators.dedup import hamming_candidates

    rng = np.random.RandomState(11)
    sigs = [int(x) for x in
            rng.randint(-(2 ** 63), 2 ** 63 - 1, 40, dtype=np.int64)]
    # planted pairs at EVERY guaranteed distance (hamming 1, 2, 3):
    # contiguous masks 0b1 / 0b11 / 0b111 at staggered offsets, plus
    # a repeat hamming-1 plant at a high bit position
    for i, (bits, off) in enumerate([(1, 0), (2, 7), (3, 17), (1, 60)]):
        base = sigs[2 * i]
        flipped = base ^ (((1 << bits) - 1) << off)
        if flipped >= 1 << 63:
            flipped -= 1 << 64
        elif flipped < -(1 << 63):
            flipped += 1 << 64
        sigs.append(flipped)
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc_id long, sh long")
    got = {(r.id_a, r.id_b): r.hamming
           for r in hamming_candidates(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    for a in range(len(sigs)):
        for b in range(a + 1, len(sigs)):
            h = ham(sigs[a], sigs[b])
            if h < 4:
                assert got[(a, b)] == h, (a, b, h)
    for (a, b), h in got.items():
        assert a < b
        assert h == ham(sigs[a], sigs[b])


def test_hamming_candidates_drop_null_signatures(spark):
    """Quarantined (null) signatures — e.g. image_ahash on an
    undecodable blob — must vanish from the candidate set, not crash
    or pair with each other."""
    from htmlparser_spark.operators.dedup import hamming_candidates
    df = spark.createDataFrame(
        [(1, 5), (2, 5), (3, None), (4, None)], "doc_id long, sh long")
    rows = hamming_candidates(df).collect()
    assert sorted((r.id_a, r.id_b, r.hamming) for r in rows) == [(1, 2, 0)]
