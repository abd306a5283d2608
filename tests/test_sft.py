"""SFT tier (operators/sft.py): prompt/completion assembly, context
truncation, loss-mask accounting, tool audit. Cross-engine
byte-exactness is certified by the `sft_pairs` / `loss_mask_budget` /
`tool_stats` driver oracles (queries.py)."""

from pyspark.sql import functions as F

from htmlparser_spark.operators.sft import (loss_mask_budget, sft_pairs,
                                            tool_stats)

from test_plans import assert_no_python_row_udf  # noqa: E402


def _turns(spark):
    rows = [
        # c1: u a u a — two examples, second sees 3 turns of context
        ("c1", 0, "user", "q one", ""),
        ("c1", 1, "assistant", "a one", ""),
        ("c1", 2, "user", "q two", ""),
        ("c1", 3, "assistant", "a two", ""),
        # c2: assistant FIRST (no context), then tool turn at the end
        # (lead(role) is NULL there — the not-followed case)
        ("c2", 0, "assistant", "cold open", ""),
        ("c2", 1, "user", "ok", ""),
        ("c2", 2, "tool", "result 42", "tool-x"),
        # c3: tool call followed by an assistant turn
        ("c3", 0, "user", "run it", ""),
        ("c3", 1, "tool", "ran", "tool-x"),
        ("c3", 2, "assistant", "done", ""),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string")


def test_sft_pairs_full_context(spark):
    out = {(r.conv_id, r.turn_idx): r
           for r in sft_pairs(_turns(spark)).collect()}
    assert set(out) == {("c1", 1), ("c1", 3), ("c2", 0), ("c3", 2)}
    assert out[("c1", 1)].prompt == "user: q one"
    assert out[("c1", 1)].completion == "a one"
    assert out[("c1", 3)].prompt == (
        "user: q one\n\nassistant: a one\n\nuser: q two")
    assert out[("c1", 3)].n_ctx_turns == 3
    # cold-open assistant: empty prompt, zero context
    assert out[("c2", 0)].prompt == ""
    assert out[("c2", 0)].n_ctx_turns == 0
    # tool turns render in context like any other role
    assert out[("c3", 2)].prompt == "user: run it\n\ntool: ran"


def test_sft_pairs_last_k_truncates_but_counts_all(spark):
    out = {(r.conv_id, r.turn_idx): r
           for r in sft_pairs(_turns(spark), last_k=2).collect()}
    # only the last 2 prior turns render; n_ctx_turns still says 3
    assert out[("c1", 3)].prompt == (
        "assistant: a one\n\nuser: q two")
    assert out[("c1", 3)].n_ctx_turns == 3


def test_sft_pairs_plan_single_shuffle_no_python(spark):
    out = sft_pairs(_turns(spark), last_k=4)
    assert_no_python_row_udf(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_loss_mask_budget(spark):
    out = {r.conv_id: r for r in
           loss_mask_budget(_turns(spark)).collect()}
    # c1: prompt tokens = "q one" + "q two" = 4, completion = 4
    assert out["c1"].n_turns == 4
    assert out["c1"].n_target_turns == 2
    assert out["c1"].prompt_tokens == 4
    assert out["c1"].completion_tokens == 4
    assert out["c1"].completion_ratio_ppm == 500000
    # c2: completion = "cold open" (2), context = "ok"+"result 42" (3)
    assert out["c2"].completion_tokens == 2
    assert out["c2"].prompt_tokens == 3
    assert out["c2"].completion_ratio_ppm == 400000


def test_loss_mask_budget_plan_single_aggregate(spark):
    out = loss_mask_budget(_turns(spark))
    assert_no_python_row_udf(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_tool_stats_lead_before_filter(spark):
    out = {r.tool: r for r in tool_stats(_turns(spark)).collect()}
    assert set(out) == {"tool-x"}
    r = out["tool-x"]
    assert r.n_calls == 2
    assert r.n_convs == 2
    # c2's call is conversation-final (lead NULL), c3's is followed
    assert r.n_followed_by_assistant == 1
    # mean turn idx = (2 + 1) // 2 = 1 (floor)
    assert r.mean_turn_idx == 1
