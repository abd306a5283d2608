"""Main-content DOM heuristics: block scoring semantics on hand
fixtures, the Spark surfaces, and the map-only plan shape."""

from __future__ import annotations

from pyspark.sql import Row

from htmlparser_spark.htmldom.content import main_content, score_blocks
from htmlparser_spark.htmldom.parse import parse
from htmlparser_spark.operators.content import (
    content_blocks,
    extract_main_content,
)
from htmlparser_spark.plans import explain_string


ARTICLE = (
    '<html><body>'
    '<nav><ul><li><a href="/h">Home</a></li>'
    '<li><a href="/p">About</a></li></ul></nav>'
    '<div><p>This paragraph is the article body, long and linkless.</p>'
    '<p>More prose with one <a href="/r">tiny ref</a> inside a long '
    'paragraph of ordinary sentences.</p></div>'
    '<footer><p>Copyright two thousand twenty-six, long footer line'
    '</p></footer></body></html>')


def test_score_blocks_article():
    blocks = score_blocks(parse(ARTICLE))
    # nav <li>s and the footer <p> are chrome-dropped entirely;
    # only the two article <p>s are candidates, both kept
    assert [(t, k) for _n, t, _tc, _ac, k in blocks] == \
        [("p", True), ("p", True)]
    ac = blocks[1][3]
    assert ac == len("tiny ref")


def test_link_density_drops_menu_like_div():
    # a link farm OUTSIDE chrome tags still gets density-dropped
    html = ('<div><p><a href="/1">one two three four five six</a> '
            '<a href="/2">seven eight nine ten eleven twelve</a></p>'
            '</div>')
    blocks = score_blocks(parse(html))
    assert len(blocks) == 1
    _n, _t, tc, ac, kept = blocks[0]
    assert not kept and ac > 0 and tc > 20  # dropped by density alone


def test_min_text_len_gate():
    assert score_blocks(parse("<p>tiny</p>"))[0][4] is False
    assert score_blocks(parse("<p>tiny</p>"), min_text_len=3)[0][4] is True


def test_innermost_blocks_only_no_double_count():
    html = "<div><div><p>aaaa bbbb cccc dddd eeee</p></div></div>"
    blocks = score_blocks(parse(html))
    assert len(blocks) == 1 and blocks[0][1] == "p"


def test_script_excluded_from_mass():
    html = "<p>twenty characters of prose here<script>var x=1;</script></p>"
    _n, _t, tc, _ac, kept = score_blocks(parse(html))[0]
    assert tc == len("twenty characters of prose here") and kept


def test_main_content_join_and_counts():
    text, n_kept, n_cand = main_content(parse(ARTICLE))
    assert n_kept == 2 and n_cand == 2
    assert text.startswith("This paragraph is the article body")
    assert "\n" in text and "Home" not in text and "Copyright" not in text


def test_no_blocks_returns_empty():
    assert main_content(parse("just bare text, no block tags")) == ("", 0, 0)


def test_spark_surfaces_and_plan(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=ARTICLE),
         Row(doc_id=2, text="<p>tiny</p>"),
         Row(doc_id=3, text=None)])
    out = extract_main_content(df, drop_text=True)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].n_kept_blocks == 2
    assert rows[2].n_kept_blocks == 0 and rows[2].n_candidate_blocks == 1
    assert rows[3].main_text is None
    assert "text" not in out.columns  # dropped inside the kernel
    # map-only: no exchange anywhere in either surface's plan
    plan = explain_string(out)
    assert "Exchange" not in plan

    blk = content_blocks(df, key_cols=("doc_id",))
    assert "Exchange" not in explain_string(blk)
    got = [(r.doc_id, r.tag_name, r.kept) for r in
           blk.orderBy("doc_id", "node_id").collect()]
    assert got == [(1, "p", True), (1, "p", True), (2, "p", False)]


def test_content_blocks_empty_batch(spark):
    # every doc filters to zero blocks -> empty Arrow batches must
    # still convert (explicit dtypes in the kernel)
    df = spark.createDataFrame([Row(doc_id=1, text="no blocks here")])
    assert content_blocks(df, key_cols=("doc_id",)).count() == 0
