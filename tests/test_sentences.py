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
