"""Sketches (operators/sketch.py): HLL register math vs a Python
replay, mergeability (the property that makes them map-side safe),
count-min upper-bound property, plan shape. Cross-engine exactness is
certified by the `hll_distinct` / `countmin_topk` driver oracles."""

import hashlib

import pytest
from pyspark.sql import functions as F

from htmlparser_spark.operators.sketch import (countmin_counters,
                                               countmin_estimate,
                                               hll_distinct)

from test_plans import assert_no_python_row_udf  # noqa: E402


def _u32(s, salt):
    return int(hashlib.md5((s + salt).encode()).hexdigest()[:8], 16)


def _py_hll(items, m=64, salt=":hll7"):
    """Reference replay of the operator's integer HLL."""
    p = m.bit_length() - 1
    scale = 32 - p + 1
    regs = {}
    for it in set(items):
        h = _u32(it, salt)
        j, w = h % m, h // m
        rho = scale if w == 0 else scale - w.bit_length()
        regs[j] = max(regs.get(j, 0), rho)
    s = sum(1 << (scale - v) for v in regs.values()) \
        + (m - len(regs)) * (1 << scale)
    est = (709340 * m * m * (1 << scale)) // s // 1000000
    return regs, s, est


def _items(spark, words, group="g"):
    return spark.createDataFrame([(group, w) for w in words],
                                 "grp string, item string")


def test_hll_matches_python_replay(spark):
    words = [f"word-{i}" for i in range(500)]
    out = hll_distinct(_items(spark, words), "grp", "item",
                       with_exact=True, pre_itemized=True).collect()[0]
    regs, s, est = _py_hll(words)
    assert out.n_regs == len(regs)
    assert out.harmonic_sum == s
    assert out.est_distinct == est
    assert out.exact_distinct == 500
    # raw-HLL regime accuracy sanity: within ~20% at n=500, m=64
    assert abs(out.err_ppm) < 200000


def test_hll_registers_merge(spark):
    """max-merge of two halves' registers == one-shot registers —
    the property that makes the sketch partial-aggregation safe."""
    a = [f"a-{i}" for i in range(300)]
    b = [f"b-{i}" for i in range(300)]
    whole = hll_distinct(_items(spark, a + b), "grp", "item",
                         pre_itemized=True).collect()[0]
    ra, _, _ = _py_hll(a)
    rb, _, _ = _py_hll(b)
    merged = {j: max(ra.get(j, 0), rb.get(j, 0)) for j in set(ra) | set(rb)}
    s = sum(1 << (27 - v) for v in merged.values()) \
        + (64 - len(merged)) * (1 << 27)
    assert whole.harmonic_sum == s


def test_hll_duplicates_do_not_move_registers(spark):
    words = [f"w-{i % 50}" for i in range(1000)]  # 50 distinct, 20×
    out = hll_distinct(_items(spark, words), "grp", "item",
                       pre_itemized=True).collect()[0]
    regs, s, est = _py_hll(words)
    assert out.harmonic_sum == s
    assert out.est_distinct == est


def test_hll_rejects_unsupported_m(spark):
    with pytest.raises(ValueError):
        hll_distinct(_items(spark, ["x"]), "grp", "item", m=48)


def test_hll_plan_no_python(spark):
    out = hll_distinct(_items(spark, ["x", "y"]), "grp", "item",
                       pre_itemized=True)
    assert_no_python_row_udf(out)


def test_countmin_upper_bound_and_exact_when_sparse(spark):
    # 40 words, counts i+1 — far under 256 buckets, so most words
    # collide with nothing and the min equals the true count; every
    # estimate is >= truth regardless
    rows = [(f"tok{i} " * (i + 1)).strip() for i in range(40)]
    df = spark.createDataFrame([(t,) for t in rows], "text string")
    counters = countmin_counters(df, "text")
    words = spark.createDataFrame([(f"tok{i}",) for i in range(40)],
                                  "word string")
    est = {r.word: r.cm_est
           for r in countmin_estimate(counters, words).collect()}
    exact = {f"tok{i}": i + 1 for i in range(40)}
    assert all(est[w] >= exact[w] for w in exact)
    # the counter table is exactly depth×(occupied buckets) rows and
    # total mass = depth × corpus tokens
    tot = sum(r.cnt for r in counters.collect())
    assert tot == 4 * sum(exact.values())


def test_countmin_counters_single_aggregate(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    out = countmin_counters(df, "text")
    assert_no_python_row_udf(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
