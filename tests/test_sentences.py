"""Sentence splitter (operators/sentences.py) goldens + Spark shape."""

import pytest

from htmlparser_spark.operators.sentences import (
    split_sentences,
    split_sentences_str,
)


class TestSplitStr:
    def test_basic_boundaries(self):
        assert split_sentences_str(
            "Hello world. It rained! Did it? Yes") == [
            "Hello world.", "It rained!", "Did it?", "Yes"]

    def test_abbreviations_do_not_split(self):
        assert split_sentences_str(
            "Dr. Smith met Mr. Jones. They left.") == [
            "Dr. Smith met Mr. Jones.", "They left."]

    def test_single_initials_do_not_split(self):
        assert split_sentences_str("J. K. Row wrote it. Fine.") == [
            "J. K. Row wrote it.", "Fine."]

    def test_decimals_never_split(self):
        assert split_sentences_str("Pi is 3.14 today. Next one") == [
            "Pi is 3.14 today.", "Next one"]

    def test_close_quote_after_punct(self):
        assert split_sentences_str('He said "Stop." Then left.') == [
            'He said "Stop."', "Then left."]

    def test_ellipsis_is_one_run(self):
        assert split_sentences_str("Wait... Then go.") == [
            "Wait...", "Then go."]

    def test_digit_opener_counts_as_boundary(self):
        assert split_sentences_str("It was late. 7 men left.") == [
            "It was late.", "7 men left."]

    def test_lowercase_continuation_not_boundary(self):
        # "e.g. apples" — lowercase after the period, no split
        assert split_sentences_str("Fruit, e.g. apples, is fine. Ok") == [
            "Fruit, e.g. apples, is fine.", "Ok"]

    def test_tail_without_punctuation(self):
        assert split_sentences_str("The end") == ["The end"]

    def test_empty_and_whitespace(self):
        assert split_sentences_str("") == []
        assert split_sentences_str(None) == []
        assert split_sentences_str("   \n\t ") == []

    def test_no_boundary_without_whitespace(self):
        # "a.B" — no whitespace after the run, never splits
        assert split_sentences_str("ver 1.2.Final shipped") == [
            "ver 1.2.Final shipped"]

    def test_paren_close_before_punct(self):
        assert split_sentences_str("Yes (7 times). The end") == [
            "Yes (7 times).", "The end"]


class TestSplitSpark:
    def test_explode_shape_and_order(self, spark):
        df = spark.createDataFrame(
            [("a", "One. Two! Three"), ("b", None), ("c", ""),
             ("d", "Only")],
            "doc_id string, text string")
        out = split_sentences(df).orderBy("doc_id", "sent_idx").collect()
        assert [(r.doc_id, r.sent_idx, r.sentence) for r in out] == [
            ("a", 0, "One."), ("a", 1, "Two!"), ("a", 2, "Three"),
            ("d", 0, "Only")]

    def test_schema(self, spark):
        df = spark.createDataFrame(
            [("a", 1, "Hi there. Bye")],
            "doc_id string, extra int, text string")
        out = split_sentences(df, key_cols=("doc_id", "extra"))
        assert [f.name for f in out.schema.fields] == [
            "doc_id", "extra", "sent_idx", "sentence"]
        assert dict((f.name, f.dataType.simpleString())
                    for f in out.schema.fields)["sent_idx"] == "int"

    def test_map_only_plan(self, spark):
        # one Arrow stage, no shuffle: the physical plan has no Exchange
        df = spark.createDataFrame([("a", "Hi. Bye")],
                                   "doc_id string, text string")
        plan = split_sentences(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan


class TestPackSentences:
    def test_greedy_packing_str(self):
        from htmlparser_spark.operators.sentences import pack_sentences_str
        text = ("Pi is 3.14 today. J. K. Row read no. 7! "
                "Was it fine? Yes (7 times). The end")
        # token counts: 4, 6, 3, 3, 2 — budget 8 packs [s0][s1][s2,s3,s4]
        assert pack_sentences_str(text, 8) == [
            (1, 4, "Pi is 3.14 today."),
            (1, 6, "J. K. Row read no. 7!"),
            (3, 8, "Was it fine? Yes (7 times). The end")]

    def test_oversized_sentence_gets_own_chunk(self):
        from htmlparser_spark.operators.sentences import pack_sentences_str
        assert pack_sentences_str("one two three four five. Ok", 3) == [
            (1, 5, "one two three four five."), (1, 1, "Ok")]

    def test_empty(self):
        from htmlparser_spark.operators.sentences import pack_sentences_str
        assert pack_sentences_str("", 8) == []
        assert pack_sentences_str(None, 8) == []

    def test_spark_shape_and_plan(self, spark):
        from htmlparser_spark.operators.sentences import pack_sentences
        df = spark.createDataFrame(
            [("a", "One two. Three four. Five six seven"), ("b", None)],
            "doc_id string, text string")
        out = pack_sentences(df, budget=4)
        got = [(r.doc_id, r.chunk_idx, r.n_sentences, r.n_tokens,
                r.chunk_text)
               for r in out.orderBy("doc_id", "chunk_idx").collect()]
        assert got == [("a", 0, 2, 4, "One two. Three four."),
                       ("a", 1, 1, 3, "Five six seven")]
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_budget_validation(self, spark):
        from htmlparser_spark.operators.sentences import pack_sentences
        df = spark.createDataFrame([("a", "x")],
                                   "doc_id string, text string")
        with pytest.raises(ValueError):
            pack_sentences(df, budget=0)


class TestSentenceDedup:
    def test_global_keep_first(self, spark):
        from htmlparser_spark.operators.sentences import sentence_dedup
        df = spark.createDataFrame(
            [(1, "Common intro. Unique one."),
             (2, "Common intro. Unique two. Common intro."),
             (3, "Common intro.")],
            "doc_id long, text string")
        got = {r.doc_id: r.text_deduped
               for r in sentence_dedup(df).collect()}
        # doc 1 holds the global first "Common intro."; later copies
        # (doc 2 twice, doc 3) are removed
        assert got == {1: "Common intro. Unique one.",
                       2: "Unique two.",
                       3: ""}

    def test_rule_splitter_is_used(self, spark):
        from htmlparser_spark.operators.sentences import sentence_dedup
        # "Mr. Smith agreed." is ONE sentence under the rule splitter;
        # a naive period split would dedup the "Smith agreed." tail
        df = spark.createDataFrame(
            [(1, "Mr. Smith agreed."), (2, "Mr. Smith agreed. More.")],
            "doc_id long, text string")
        got = {r.doc_id: r.text_deduped
               for r in sentence_dedup(df).collect()}
        assert got == {1: "Mr. Smith agreed.", 2: "More."}

    def test_no_window_in_plan(self, spark):
        from htmlparser_spark.operators.sentences import sentence_dedup
        df = spark.createDataFrame([(1, "A. B.")],
                                   "doc_id long, text string")
        plan = sentence_dedup(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Window" not in plan
