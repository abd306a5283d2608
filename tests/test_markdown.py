"""Pins for the HTML → Markdown serializer (htmldom/markdown.py) and
its Spark surface (operators/content.py::extract_markdown)."""

import pytest

from htmlparser_spark.htmldom.markdown import to_markdown
from htmlparser_spark.htmldom.parse import parse


CASES = [
    ("<h1>Title</h1><p>Body text.</p>", "# Title\n\nBody text."),
    ("<h3>deep</h3>", "### deep"),
    ("<ul><li>one</li><li>two <b>bold</b></li></ul>",
     "- one\n- two **bold**"),
    ("<ol><li>a</li><li>b</li></ol>", "1. a\n2. b"),
    ("<p>See <a href=\"/x\">link</a>.</p>", "See [link](/x)."),
    ("<pre><code>x=1\ny=2</code></pre>", "```\nx=1\ny=2\n```"),
    ("<p>inline <code>f()</code> here</p>", "inline `f()` here"),
    ("<blockquote>quoted<br>lines</blockquote>", "> quoted\n> lines"),
    ("<ul><li>top<ul><li>nested</li></ul></li></ul>",
     "- top\n  - nested"),
    ("<div>a</div><div>b</div>", "a\n\nb"),
    ("<script>junk</script><p>keep</p><!--c-->", "keep"),
    ("<style>.x{}</style>ok", "ok"),
    ("<img src=\"/i.png\" alt=\"pic\">", "![pic](/i.png)"),
    ("<h2>s</h2><hr><p>t</p>", "## s\n\n---\n\nt"),
    ("<em></em><p>x</p>", "x"),                 # empty emphasis drops
    ("<a>bare</a>", "[bare]()"),                # missing href
    ("<ul><p>stray</p><li>kept</li></ul>", "- kept"),
    ("", ""),
]


@pytest.mark.parametrize("html,want", CASES)
def test_markdown_cases(html, want):
    assert to_markdown(parse(html)) == want


def test_markdown_plain_text_identity():
    assert to_markdown(parse("no markup at all")) == "no markup at all"


def test_markdown_depth_proof():
    deep = "<div>" * 200_000 + "x"
    assert to_markdown(parse(deep)) == "x"


def test_markdown_entities_opt_in():
    d = parse("<p>a &amp; b</p>")
    assert to_markdown(d) == "a &amp; b"
    assert to_markdown(d, decode_entities=True) == "a & b"


def test_extract_markdown_spark_surface(spark):
    from pyspark.sql import functions as F
    from htmlparser_spark.operators.content import extract_markdown
    from htmlparser_spark.plans import assert_no_python_row_udf

    df = spark.createDataFrame(
        [(1, "<h1>T</h1><p>b</p>"), (2, None)],
        "doc_id long, text string")
    out = extract_markdown(df, drop_text=True)
    assert out.columns == ["doc_id", "markdown"]
    assert_no_python_row_udf(out)
    rows = {r["doc_id"]: r["markdown"] for r in out.collect()}
    assert rows[1] == "# T\n\nb"
    assert rows[2] is None

    kept = extract_markdown(df.filter(F.col("text").isNotNull()))
    assert kept.columns == ["doc_id", "text", "markdown"]
