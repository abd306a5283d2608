"""Bloom pre-gate (operators/decontam.py:bloom_gate) and Z-order
layout keys (operators/layout.py). Cross-engine exactness is
certified by the `bloom_gate` / `zorder_key` driver oracles."""

import pytest
from pyspark.sql import functions as F

from htmlparser_spark.operators.decontam import benchmark_grams, bloom_gate
from htmlparser_spark.operators.layout import zorder_key_col, zorder_keys

from test_plans import assert_no_python_row_udf  # noqa: E402


def _corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "completely unrelated text about spark shuffle plans"),
        (2, "the quick brown fox jumps over something else entirely"),
        (3, "another clean document with its own distinct words"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_no_false_negatives_and_upper_bound(spark):
    docs = _corpus(spark)
    bench = docs.filter(F.col("doc_id") == 0)
    out = {r.doc_id: r
           for r in bloom_gate(docs, benchmark_grams(bench, k=5),
                               k=5).collect()}
    # doc 0 hits itself exactly; doc 2 shares two 5-grams ('the quick
    # brown fox jumps', 'quick brown fox jumps over') — both MUST be
    # bloom-flagged (no false negatives); every row has
    # n_bloom_hits >= n_exact_hits
    assert out[0].bloom_flagged and out[0].n_exact_hits == out[0].n_grams
    assert out[2].bloom_flagged and out[2].n_exact_hits == 2
    assert all(r.n_bloom_hits >= r.n_exact_hits for r in out.values())
    # all docs present, including clean ones
    assert out[1].n_exact_hits == 0 and out[3].n_exact_hits == 0


def test_bloom_filter_side_is_bounded(spark):
    docs = _corpus(spark)
    bench = docs  # whole corpus as "benchmark"
    from htmlparser_spark.operators.sample import hash_u32_col
    bg = benchmark_grams(bench, k=5)
    occ = bg.select(F.explode(F.array(*[
        (hash_u32_col(F.col("gram"), f":bf{d}") % 64).alias(f"p{d}")
        for d in range(4)])).alias("pos")).distinct()
    # with m=64 the occupied set can never exceed m rows — the
    # bounded-broadcast property the gate exists for
    assert occ.count() <= 64
    out = bloom_gate(docs, bg, k=5, m_bits=64)
    assert_no_python_row_udf(out)
    # tiny m => heavy collisions, but the bound still holds
    assert all(r.n_bloom_hits >= r.n_exact_hits for r in out.collect())


def _py_morton(vals, bits):
    out = 0
    n = len(vals)
    for c, v in enumerate(vals):
        v &= (1 << bits) - 1
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * n + c)
    return out


def test_zorder_matches_python_and_decodes(spark):
    rows = [(3, 5), (0, 0), (65535, 65535), (1234, 40000), (70000, 2)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.zkey
           for r in zorder_keys(df, ["x", "y"], bits=16).collect()}
    for x, y in rows:
        assert got[(x, y)] == _py_morton([x, y], 16)
    # masking makes out-of-range inputs wrap, not explode
    assert got[(70000, 2)] == _py_morton([70000 & 0xFFFF, 2], 16)


def test_zorder_three_columns_and_errors(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    r = df.select(zorder_key_col(
        [F.col("a"), F.col("b"), F.col("c")], bits=8).alias("z")) \
        .collect()[0]
    assert r.z == _py_morton([1, 2, 3], 8)
    with pytest.raises(ValueError):
        zorder_key_col([F.col("a")])
    with pytest.raises(ValueError):
        zorder_key_col([F.col("a"), F.col("b")], bits=32)


def test_zorder_plan_no_shuffle_no_python(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    out = zorder_keys(df, ["x", "y"])
    assert_no_python_row_udf(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
