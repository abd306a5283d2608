"""Preference tier (operators/preference.py) and conversation
prefix-containment dedup (operators/sft.py:prefix_containment).
Cross-engine byte-exactness is certified by the `preference_pairs` /
`best_of_n` / `prefix_dups` driver oracles (queries.py)."""

import hashlib

from htmlparser_spark.operators.preference import best_of_n, preference_pairs
from htmlparser_spark.operators.sft import prefix_containment

from test_plans import assert_no_python_row_udf  # noqa: E402


def _cands(spark):
    rows = [
        # p1: clear winner/loser plus a middle candidate
        (1, 10, "meh", 3),
        (1, 11, "best", 9),
        (1, 12, "worst", 1),
        # p2: all tied — no preference signal, must emit nothing
        (2, 20, "tie a", 5),
        (2, 21, "tie b", 5),
        # p3: single candidate — no pair
        (3, 30, "only", 7),
        # p4: tie at the TOP and at the BOTTOM — chosen is the
        # min-id top candidate, rejected the max-id bottom one
        (4, 40, "top early", 8),
        (4, 41, "top late", 8),
        (4, 42, "low early", 2),
        (4, 43, "low late", 2),
    ]
    return spark.createDataFrame(
        rows, "prompt_id long, sample_id long, completion string, "
              "score long")


def test_preference_pairs(spark):
    out = {r.prompt_id: r for r in
           preference_pairs(_cands(spark)).collect()}
    # tied (p2) and singleton (p3) groups emit nothing
    assert set(out) == {1, 4}
    r = out[1]
    assert (r.chosen_id, r.rejected_id) == (11, 12)
    assert (r.chosen, r.rejected) == ("best", "worst")
    assert (r.chosen_score, r.rejected_score, r.margin) == (9, 1, 8)
    assert r.n_cands == 3
    # deterministic tie-breaks: max score -> MIN id, min score -> MAX id
    r = out[4]
    assert (r.chosen_id, r.rejected_id) == (40, 43)
    assert (r.chosen, r.rejected) == ("top early", "low late")
    assert r.margin == 6


def test_best_of_n(spark):
    out = {r.prompt_id: r for r in best_of_n(_cands(spark)).collect()}
    # every prompt keeps its best — ties and singletons included
    assert set(out) == {1, 2, 3, 4}
    assert (out[1].best_id, out[1].completion) == (11, "best")
    assert (out[2].best_id, out[2].completion) == (20, "tie a")  # min id
    assert out[3].best_id == 30
    assert out[4].best_id == 40
    # reward threshold drops prompts whose best is below it
    kept = {r.prompt_id for r in
            best_of_n(_cands(spark), min_score=7).collect()}
    assert kept == {1, 3, 4}


def test_preference_plan_single_aggregate(spark):
    out = preference_pairs(_cands(spark))
    assert_no_python_row_udf(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    # struct-typed agg buffers aren't hash-aggregable, so Spark plans
    # SortAggregate — the invariant that matters is the map-side
    # combine: a partial max_by/min_by BELOW the single Exchange, so
    # only one winner struct per group per direction crosses the wire
    assert plan.count("SortAggregate") == 2
    assert "partial_max_by" in plan and "partial_min_by" in plan


# ------------------------------------------------------------------ #
# prefix containment                                                  #
# ------------------------------------------------------------------ #

def _prefix_turns(spark):
    base = [
        # conv 1: 4 turns
        (1, 0, "user", "alpha"), (1, 1, "assistant", "beta"),
        (1, 2, "user", "gamma"), (1, 3, "assistant", "delta"),
        # conv 2: strict 2-turn prefix of conv 1 (truncated re-crawl)
        (2, 0, "user", "alpha"), (2, 1, "assistant", "beta"),
        # conv 3: exact duplicate of conv 2 — equal length, min key
        # must be the container, one direction only
        (3, 0, "user", "alpha"), (3, 1, "assistant", "beta"),
        # conv 4: same texts as conv 1's prefix but a DIFFERENT role
        # on turn 1 — not a prefix (role is part of the identity)
        (4, 0, "user", "alpha"), (4, 1, "user", "beta"),
        # conv 5: same turns as conv 1's prefix but REVERSED idx
        # order in the input rows — ordering is by turn_idx, so this
        # IS a prefix of conv 1 (input row order must not matter)
        (5, 1, "assistant", "beta"), (5, 0, "user", "alpha"),
        # conv 6: exact duplicate of conv 1 (the maximal conv) — its
        # only container is 1 (equal length, smaller key), is_exact
        (6, 0, "user", "alpha"), (6, 1, "assistant", "beta"),
        (6, 2, "user", "gamma"), (6, 3, "assistant", "delta"),
    ]
    return spark.createDataFrame(
        base, "conv_id long, turn_idx int, role string, text string")


def _chain(turns):
    h = ""
    out = []
    for role, text in turns:
        th = hashlib.md5(f"{role}: {text}".encode()).hexdigest()
        h = hashlib.md5((h + th).encode()).hexdigest()
        out.append(h)
    return out


def test_prefix_containment(spark):
    out = {r.contained: r for r in
           prefix_containment(_prefix_turns(spark)).collect()}
    # conv 2, 3, 5, 6 are contained; containers are the min eligible key
    assert set(out) == {2, 3, 5, 6}
    # conv 2's containers are {1 (strict), 6 (strict)} -> min 1; the
    # equal-length dups 3 and 5 have LARGER keys so they don't contain
    assert out[2].container == 1
    assert (out[2].n_contained, out[2].n_container) == (2, 4)
    assert not out[2].is_exact
    # conv 3 == conv 2 exactly: containers {1, 6 (strict), 2 (equal,
    # smaller key)} -> min key 1, a strict container, not exact
    assert out[3].container == 1
    assert (out[3].n_contained, out[3].n_container) == (2, 4)
    assert not out[3].is_exact
    # conv 5 sorts into the same sequence as conv 2 despite reversed
    # input rows: containers {1, 6 (strict), 2, 3 (equal, smaller
    # key)} -> min = 1, the strict container
    assert out[5].container == 1
    assert not out[5].is_exact
    # conv 6 == conv 1 exactly (the maximal sequence): its only
    # container is 1 (equal length, smaller key) — the is_exact path
    assert out[6].container == 1
    assert (out[6].n_contained, out[6].n_container) == (4, 4)
    assert out[6].is_exact
    # conv 4 (role mismatch) and conv 1 (maximal, min key of its
    # duplicate pair) are not contained
    assert 1 not in out and 4 not in out


def test_prefix_chain_matches_python_replay(spark):
    # pin the hash-chain construction itself: conv 1's full chain
    # equals a local md5 fold in turn order
    from pyspark.sql import functions as F
    df = _prefix_turns(spark).filter(F.col("conv_id") == 1)
    turns = df.select(
        F.col("conv_id").alias("conv"), F.col("turn_idx").alias("i"),
        F.md5(F.concat("role", F.lit(": "), "text")).alias("th"))
    chains = (turns.groupBy("conv")
              .agg(F.expr("transform(array_sort(collect_list("
                          "struct(i, th))), s -> s.th)").alias("hs"))
              .select(F.expr(
                  "slice(aggregate(hs, array(''), (acc, x) -> "
                  "concat(acc, array(md5(concat(element_at(acc, -1), "
                  "x))))), 2, size(hs))").alias("chain")))
    [row] = chains.collect()
    expect = _chain([("user", "alpha"), ("assistant", "beta"),
                     ("user", "gamma"), ("assistant", "delta")])
    assert row.chain == expect


def test_prefix_containment_no_python(spark):
    out = prefix_containment(_prefix_turns(spark))
    assert_no_python_row_udf(out)
