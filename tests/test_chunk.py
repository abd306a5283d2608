"""Chunking + dataset split: coverage/overlap invariants, edge cases
(empty, single-token, exact-boundary docs), split determinism and
proportions. Cross-engine byte-exactness is certified by the
`chunk_overlap` / `dataset_split` driver oracles (queries.py)."""

import pytest

from pyspark.sql import functions as F

from htmlparser_spark.operators.chunk import chunk_tokens, dataset_split

from test_plans import assert_no_python_row_udf  # noqa: E402


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def test_chunks_cover_all_tokens_with_overlap(spark):
    words = " ".join(f"w{i}" for i in range(103))
    out = chunk_tokens(_df(spark, [words]), size=10, overlap=3)
    rows = sorted(out.collect(), key=lambda r: r.chunk_idx)
    # step 7: starts 0,7,...,98 -> 15 chunks; last covers 98..102
    assert len(rows) == 15
    assert rows[0].chunk_text.split() == [f"w{i}" for i in range(10)]
    # consecutive windows share exactly `overlap` tokens
    for a, b in zip(rows, rows[1:]):
        ta, tb = a.chunk_text.split(), b.chunk_text.split()
        assert ta[-3:] == tb[:3]
    # no token dropped: union of windows == original sequence
    seen = rows[0].chunk_text.split()
    for r in rows[1:]:
        seen += r.chunk_text.split()[3:]
    assert seen == words.split()
    assert rows[-1].n_chunk_tokens == 5


@pytest.mark.parametrize("text,n_chunks,first_n", [
    ("", 1, 0),              # empty -> one empty window
    ("   ", 1, 0),           # blank -> one empty window
    ("one", 1, 1),           # short doc -> single window
    (" ".join(["t"] * 10), 1, 10),   # exactly size -> single window
    (" ".join(["t"] * 11), 2, 10),   # size+1 -> second short window
])
def test_chunk_edges(spark, text, n_chunks, first_n):
    rows = chunk_tokens(_df(spark, [text]), size=10, overlap=3).collect()
    assert len(rows) == n_chunks
    assert sorted(r.chunk_idx for r in rows) == list(range(n_chunks))
    assert max(r.n_chunk_tokens for r in rows) == first_n


def test_chunk_rejects_bad_overlap(spark):
    df = _df(spark, ["x"])
    with pytest.raises(ValueError):
        chunk_tokens(df, size=10, overlap=10)
    with pytest.raises(ValueError):
        chunk_tokens(df, size=10, overlap=-1)


def test_chunk_plan_is_codegen(spark):
    out = chunk_tokens(_df(spark, ["a b c"]), size=2, overlap=1)
    assert_no_python_row_udf(out)
    # map-only: no exchange in the chunking plan itself
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_split_deterministic_and_proportioned(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s1 = dataset_split(df).groupBy("split").count().collect()
    got = {r.split: r["count"] for r in s1}
    assert set(got) == {"train", "val", "test"}
    assert abs(got["train"] / 5000 - 0.90) < 0.02
    assert abs(got["val"] / 5000 - 0.05) < 0.01
    # partitioning-independent: identical assignment after reshuffle
    a = sorted(tuple(r) for r in dataset_split(df).collect())
    b = sorted(tuple(r) for r in
               dataset_split(df.repartition(17)).collect())
    assert a == b
    # different salt re-rolls the split
    c = dataset_split(df, salt=":other")
    diff = (dataset_split(df).alias("x")
            .join(c.alias("y"), "doc_id")
            .filter(F.col("x.split") != F.col("y.split")).count())
    assert diff > 0


def test_leakage_safe_split_groups_components(spark):
    from htmlparser_spark.operators.chunk import leakage_safe_split
    docs = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    # components: {0,1,2} root 0, {10,11} root 10
    comp = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)],
        "node long, component long")
    out = {r.doc_id: r for r in
           leakage_safe_split(docs, comp).collect()}
    assert out[0].split == out[1].split == out[2].split
    assert out[10].split == out[11].split
    assert out[1].root == 0 and out[11].root == 10
    # singleton roots to itself and matches plain dataset_split
    assert out[50].root == 50
    from htmlparser_spark.operators.chunk import dataset_split
    plain = {r.doc_id: r.split for r in dataset_split(docs).collect()}
    assert out[50].split == plain[50]
    # EVERY singleton agrees with dataset_split (long-cast hash paths
    # used to diverge from dataset_split's raw-key hash)
    for d in range(12, 40):
        assert out[d].split == plain[d], d


def test_leakage_safe_split_string_ids(spark):
    """Non-numeric string doc ids: the old long-cast produced NULL
    buckets and silently dumped every such doc into 'test'. Now the
    hash runs on the id's own type and singletons match
    dataset_split exactly."""
    from htmlparser_spark.operators.chunk import (dataset_split,
                                                  leakage_safe_split)
    docs = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(200)], "doc_id string")
    comp = spark.createDataFrame(
        [("doc-1", "doc-0"), ("doc-0", "doc-0")],
        "node string, component string")
    out = {r.doc_id: r for r in leakage_safe_split(docs, comp).collect()}
    plain = {r.doc_id: r.split for r in dataset_split(docs).collect()}
    assert out["doc-0"].split == out["doc-1"].split == plain["doc-0"]
    splits = {r.split for r in out.values()}
    assert splits == {"train", "val", "test"}
    # singletons must match dataset_split bit-for-bit
    for i in range(2, 200):
        assert out[f"doc-{i}"].split == plain[f"doc-{i}"], i
