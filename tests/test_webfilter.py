"""Edge-case pins for the C4/RefinedWeb web-filter family
(operators/webfilter.py) and C4 span dedup (dedup.span_dedup) —
the happy paths are oracle-checked corpus-wide by
test_driver_contract; these pin the corners the synthetic corpus
never hits."""

import pytest
from pyspark.sql import functions as F

from htmlparser_spark.operators.webfilter import (
    c4_quality_flags,
    line_filter,
    url_canonicalize,
    url_dedup,
)
from htmlparser_spark.operators.dedup import span_dedup


def _rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).orderBy(cols[0]).collect()]


# ---------------------------------------------------------------- #
# c4_quality_flags                                                  #
# ---------------------------------------------------------------- #

def test_c4_flags_basic(spark):
    df = spark.createDataFrame(
        [(1, 'One good sentence here. Two follows!\nNav "quoted."'),
         (2, "lorem IPSUM mix. a. b. c."),
         (3, "{ json page }. s one. s two. s three.")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_quality_flags(df).collect()}
    assert out[1]["n_lines"] == 2
    assert out[1]["n_terminal_lines"] == 2      # '!' line and '."' line
    # fragments after [.!?] split: the trailing '"' counts too
    assert out[1]["n_sentences"] == 4
    assert not out[1]["has_lorem"] and not out[1]["has_brace"]
    assert out[1]["c4_keep"]
    assert out[2]["has_lorem"] and not out[2]["c4_keep"]
    assert out[3]["has_brace"] and not out[3]["c4_keep"]


def test_c4_flags_keep_requires_three_sentences(spark):
    df = spark.createDataFrame(
        [(1, "First full sentence. Second one here! Third asks?")],
        "doc_id long, text string")
    r = c4_quality_flags(df).collect()[0]
    assert r["n_sentences"] == 3 and r["c4_keep"]


def test_c4_flags_empty_text(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = c4_quality_flags(df).collect()[0]
    assert r["n_lines"] == 1 and r["n_sentences"] == 0
    assert r["n_short_lines"] == 1              # '' trims to 0 words
    assert not r["c4_keep"]


# ---------------------------------------------------------------- #
# line_filter                                                       #
# ---------------------------------------------------------------- #

def test_line_filter_blocklist_and_short(spark):
    df = spark.createDataFrame(
        [(1, "  HOME  \nSign In\nab\nthis line has five words total")],
        "doc_id long, text string")
    r = line_filter(df).collect()[0]
    assert r["text_filtered"] == "this line has five words total"
    assert r["n_lines_removed"] == 3


def test_line_filter_all_removed_yields_empty(spark):
    df = spark.createDataFrame(
        [(1, "home\nabout\nx y")], "doc_id long, text string")
    r = line_filter(df, min_words=3).collect()[0]
    assert r["text_filtered"] == "" and r["n_lines_removed"] == 3


def test_line_filter_schema_stable(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = line_filter(df)
    assert out.columns == ["doc_id", "text", "text_filtered",
                           "n_lines_removed"]


# ---------------------------------------------------------------- #
# url_canonicalize / url_dedup                                      #
# ---------------------------------------------------------------- #

@pytest.mark.parametrize("url,expect", [
    ("HTTP://WWW.Ex.COM:80/A/b/?utm_x=1&id=2#f", "http://ex.com/A/b/?id=2"),
    ("https://Ex.ORG:443/", "https://ex.org"),
    ("https://ex.org", "https://ex.org"),
    ("http://ex.com/p?utm_a=1", "http://ex.com/p"),
    ("http://ex.com/p?utm_a=1&utm_b=2", "http://ex.com/p"),
    ("http://ex.com/p?id=1&utm_b=2", "http://ex.com/p?id=1"),
    # path case preserved; params NOT reordered
    ("http://ex.com/CaseSensitive?b=2&a=1", "http://ex.com/CaseSensitive?b=2&a=1"),
    # :8080 is not a default port
    ("http://ex.com:8080/x", "http://ex.com:8080/x"),
    # www only stripped as the first host label
    ("http://notwww.ex.com/x", "http://notwww.ex.com/x"),
])
def test_url_canonicalize_cases(spark, url, expect):
    df = spark.createDataFrame([(1, url)], "doc_id long, url string")
    got = url_canonicalize(df).collect()[0]["canonical_url"]
    assert got == expect, (url, got, expect)


def test_url_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(5, "http://ex.com/x/"), (2, "HTTP://WWW.ex.com:80/x"),
         (9, "http://ex.com/x#frag"), (1, "http://ex.com/other")],
        "doc_id long, url string")
    rows = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert rows["http://ex.com/x"]["doc_id"] == 2
    assert rows["http://ex.com/x"]["n_dups"] == 2
    assert rows["http://ex.com/other"]["n_dups"] == 0


# ---------------------------------------------------------------- #
# span_dedup                                                        #
# ---------------------------------------------------------------- #

def _sd(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = span_dedup(df, **kw)
    return {r["doc_id"]: r["text_deduped"] for r in out.collect()}


def test_span_dedup_removes_later_occurrence(spark):
    got = _sd(spark, [(1, "A. B. C. u1"), (2, "A. B. C. u2")])
    assert got[1] == "A. B. C. u1"
    assert got[2] == "u2"


def test_span_dedup_within_one_document(spark):
    # the same 3-sentence span twice in ONE doc: second occurrence
    # (positions 3-5) is removed, first kept
    got = _sd(spark, [(1, "A. B. C. A. B. C")])
    assert got[1] == "A. B. C"


def test_span_dedup_full_duplicate_doc_empties(spark):
    got = _sd(spark, [(1, "A. B. C"), (2, "A. B. C")])
    assert got[1] == "A. B. C" and got[2] == ""


def test_span_dedup_overlapping_spans_union(spark):
    # doc2 duplicates doc1's spans at pos 0 and pos 1 (overlap 1-2):
    # covered = union {0,1,2} ∪ {1,2,3}
    got = _sd(spark, [(1, "A. B. C. D. u1"), (2, "A. B. C. D. u2")])
    assert got[1] == "A. B. C. D. u1"
    assert got[2] == "u2"


def test_span_dedup_short_docs_pass_through(spark):
    got = _sd(spark, [(1, "A. B"), (2, "A. B"), (3, "solo")])
    assert got == {1: "A. B", 2: "A. B", 3: "solo"}


def test_span_dedup_keeper_is_min_id_pos(spark):
    # same span at pos 1 of doc 1 and pos 0 of doc 2: doc 1 wins
    # (lower id), doc 2 loses sentences 0-2
    got = _sd(spark, [(1, "z1. A. B. C"), (2, "A. B. C. z2")])
    assert got[1] == "z1. A. B. C"
    assert got[2] == "z2"


def test_span_dedup_custom_span_length(spark):
    got = _sd(spark, [(1, "A. B. u1"), (2, "A. B. u2")], span=2)
    assert got[1] == "A. B. u1"
    assert got[2] == "u2"


def test_url_features(spark):
    from htmlparser_spark.operators.webfilter import url_features
    rows = [
        (1, "https://www.Site.com/a/b/c?x=1&y=2#frag"),
        (2, "http://ex.org"),
        (3, "https://one.two.three.net/p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r for r in url_features(df).collect()}
    r = got[1]
    assert (r["scheme"], r["host"], r["registered_domain"]) == \
        ("https", "www.Site.com", "Site.com")
    assert (r["path_depth"], r["n_query_params"], r["is_https"]) == \
        (3, 2, True)
    r = got[2]
    assert (r["scheme"], r["registered_domain"], r["path_depth"],
            r["n_query_params"], r["is_https"]) == \
        ("http", "ex.org", 0, 0, False)
    assert got[3]["registered_domain"] == "three.net"
    assert got[3]["path_depth"] == 1


def test_crawl_gate(spark):
    from htmlparser_spark.operators.webfilter import crawl_gate

    def page(canon=None, robots=None):
        head = ""
        if canon:
            head += f'<link rel=canonical href="{canon}">'
        if robots:
            head += f'<meta name=robots content="{robots}">'
        return f"<html><head>{head}</head><body>x</body></html>"

    rows = [
        (1, page("https://ex.com/a", "index,follow")),
        (2, page("https://ex.com/a")),            # dup canonical
        (3, page("https://ex.com/b", "noindex")),  # gated out
        (4, page()),                               # no canonical
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["canonical_url"]: (r["doc_id"], r["n_dups"])
           for r in crawl_gate(df).collect()}
    assert got == {
        "https://ex.com/a": (1, 1),
        "_self:4": (4, 0),
    }
