"""Conversation assembly (turns → training document): ordering,
truncation, single-shuffle plan. Cross-engine byte-exactness is
certified by the `conv_assemble` driver oracle (queries.py)."""

from pyspark.sql import functions as F

from htmlparser_spark.operators.extract import assemble_conversations

from test_plans import assert_no_python_row_udf  # noqa: E402


def _turns(spark):
    rows = [
        ("c1", 2, "user", "third"),
        ("c1", 0, "user", "first"),
        ("c1", 1, "assistant", "second"),
        ("c2", 5, "tool", "only"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")


def test_assemble_orders_by_turn_idx(spark):
    out = {r.conv_id: r for r in
           assemble_conversations(_turns(spark)).collect()}
    assert out["c1"].n_turns == 3
    assert out["c1"].doc_text == (
        "user: first\n\nassistant: second\n\nuser: third")
    assert out["c2"].doc_text == "tool: only"


def test_assemble_max_turns_keeps_prefix_and_full_count(spark):
    out = {r.conv_id: r for r in
           assemble_conversations(_turns(spark), max_turns=2).collect()}
    assert out["c1"].doc_text == "user: first\n\nassistant: second"
    # n_turns still reports the pre-truncation total
    assert out["c1"].n_turns == 3


def test_assemble_plan_single_shuffle_no_python(spark):
    out = assemble_conversations(_turns(spark))
    assert_no_python_row_udf(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    # map-side partial collect before the exchange
    assert "partial_count" in plan or "HashAggregate" in plan


def test_conversation_integrity(spark):
    from htmlparser_spark.operators.audit import conversation_integrity

    rows = [
        # c1: clean alternation, contiguous 0..2, starts with user
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "hello"),
        ("c1", 2, "user", "thanks"),
        # c2: double-assistant violation, gap (0,1,3), empty turn,
        # starts with assistant
        ("c2", 0, "assistant", "x"),
        ("c2", 1, "assistant", "  "),
        ("c2", 3, "user", None),
        # c3: duplicate turn_idx -> not contiguous
        ("c3", 0, "user", "a"),
        ("c3", 0, "assistant", "b"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    got = {r["conv_id"]: (r["n_turns"], r["n_role_violations"],
                          r["starts_with_user"], r["contiguous_turns"],
                          r["n_empty_turns"])
           for r in conversation_integrity(df).collect()}
    assert got["c1"] == (3, 0, True, True, 0)
    assert got["c2"] == (3, 1, False, False, 2)
    # duplicate idx: sort tie breaks by role ('assistant' < 'user'),
    # so the first element is the assistant turn
    assert got["c3"] == (2, 0, False, False, 0)
