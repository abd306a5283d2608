"""Extraction/serialization goldens ported from the reference
(README/example + verified probes — FIXTURES.md §3.2, E1-E25).

Expected outputs were produced by compiling and running the reference
parser (/root/reference/html.cpp) — see FIXTURES.md. These are the
byte-equality contract for the kernel.
"""

import sys

sys.path.insert(0, "/root/repo")

from htmlparser_spark.htmldom import (
    KIND_COMMENT,
    KIND_DOCTYPE,
    KIND_TAG,
    KIND_TEXT,
    parse,
    to_html,
    to_raw_html,
    to_text,
    to_text_stripped,
)


def test_e1_to_text():
    d = parse("<div><p><b>First</b> p</p><p><i>Second</i> p</p>Text<br />Text</div>")
    assert to_text(d) == "First p\nSecond p\nText\nText"


def test_e2_to_text_raw():
    d = parse("<div><p><b>First</b> p</p><p><i>Second</i> p</p>Text<br />Text</div>")
    assert to_text(d, raw=True) == "First p Second p Text Text"


def test_e3_no_entity_decoding():
    d = parse("<p>a &amp; b &#60; c</p>")
    assert to_text(d) == "a &amp; b &#60; c"


def test_e4_text_verbatim_block_newline():
    d = parse("<div>  a  \n  b  </div><span> c </span>")
    assert to_text(d) == "  a  \n  b  \n c "


def test_e5_script_style_included_comment_excluded():
    d = parse("<body><script>var x=1;</script><style>.a{}</style><p>hi</p><!--note--></body>")
    assert to_text(d) == "var x=1;\n.a{}\nhi"


def test_e5b_boilerplate_strip():
    d = parse("<body><script>var x=1;</script><style>.a{}</style><p>hi</p><!--note--></body>")
    assert to_text_stripped(d) == "hi"


def test_e6_no_leading_newline():
    assert to_text(parse("<p>a</p><p>b</p>")) == "a\nb"


def test_e7_duplicate_attrs_concatenate():
    d = parse('<a href="x" href="y">t</a>')
    a = d.attrs[0]
    assert a == {"href": "xy"}


def test_e8_attrs_alphabetical():
    assert to_raw_html(parse('<a z="1" b="2" m="3">x</a>')) == '<a b="2" m="3" z="1">x</a>'


def test_e9_implicit_closure_stray_close_dropped():
    assert to_raw_html(parse("<div><p>a</div>b</p>c")) == "<div><p>a</p></div>bc"


def test_e10_name_lowercased_value_verbatim():
    assert to_raw_html(parse('<DIV CLASS="MiXeD">T</DIV>')) == '<div class="MiXeD">T</div>'


def test_e11_rawtext_mismatched_close_kept():
    assert to_raw_html(parse("<script>if(a</b>){x;}</script>done")) == \
        "<script>if(a</b>){x;}</script>done"


def test_e12_void_tags_serialize_self_closed():
    assert to_raw_html(parse("<div><br><img src=x>t</div>")) == \
        '<div><br /><img src="x" />t</div>'


def test_e13_doctype_content_verbatim():
    d = parse('<!DOCTYPE html PUBLIC "x">v')
    assert d.kind[0] == KIND_DOCTYPE
    assert d.content[0] == 'html PUBLIC "x"'


def test_e14_question_mark_bogus_comment():
    d = parse("<?php echo ?><p>t</p>")
    assert d.kind[0] == KIND_COMMENT
    assert d.content[0] == "?php echo ?"


def test_e15_unquoted_attr_values():
    assert to_raw_html(parse("<a href=foo.html class=x>t</a>")) == \
        '<a class="x" href="foo.html">t</a>'


def test_e16_eof_closes_no_error():
    d = parse("<div><p>unclosed")
    assert to_raw_html(d) == "<div><p>unclosed</p></div>"
    assert d.errors == []


def test_e17_rawtext_eof():
    assert to_raw_html(parse("<script>trailing")) == "<script>trailing</script>"


def test_e18_allspace_text_skipped_in_raw():
    assert to_raw_html(parse("<div> <p>a</p> </div>")) == "<div><p>a</p></div>"


def test_e19_nul_handling():
    assert to_raw_html(parse("<di\x00v>a\x00b</di_v>")) == "<di_v>a\x00b</di_v>"


def test_e20_leading_equals_attr_name():
    assert to_raw_html(parse("<a =b>t</a>")) == '<a =b="">t</a>'


def test_e23_error_callback_tag_not_closed():
    d = parse("<div><p><a></p></div>")
    assert len(d.errors) == 1
    nid, tag_name, path = d.errors[0]
    assert tag_name == "a"
    assert path == "div p a"


def test_e24_tree_shape():
    d = parse('<!DOCTYPE html><body><div attr="val">text</div><!--comment--></body>')
    assert [d.kind[i] for i in d.root_children] == [KIND_DOCTYPE, KIND_TAG]
    body = d.root_children[1]
    assert d.tag[body] == "body"
    kids = d.children[body]
    assert [d.kind[i] for i in kids] == [KIND_TAG, KIND_COMMENT]
    div = kids[0]
    assert d.attrs[div] == {"attr": "val"}
    assert [d.content[i] for i in d.children[div]] == ["text"]
    assert d.content[kids[1]] == "comment"


def test_e25_to_html_pretty():
    d = parse("<ul><li>li1</li><li>li2</li></ul><ol><li>li</li></ol>")
    assert to_html(d, " ") == \
        "<ul>\n <li>li1</li>\n <li>li2</li>\n</ul>\n<ol>\n <li>li</li>\n</ol>"


# ---- probe-verified tokenizer edge cases (run against the compiled
# reference in the survey + build sessions) ----

PROBES_RAW = [
    ("<!--a-b-->", "<!--a--->"),        # comment_end_dash drops next char
    ("<!---xy-->", "<!---y-->"),        # comment_start_dash drops next char
    ("<!--a--b-->", "<!--a--b-->"),
    ("<!--a--->", "<!--a--->"),
    ("x<!--abc", "xabc"),               # EOF mid-comment -> text node
    ("x<!--abc-", "xabc"),
    ("x<!--abc--", "xabc"),
    ("x<!--", "x"),
    ("<div><!DOCTYPE foo", "<div>foo</div>"),
    ("ab<", "ab"),
    ("ab</", "ab"),
    ("a</>b", "ab"),
    ('<a href="x', ""),                  # EOF mid-attr: tag dropped
    ("<script>x</scr", "<script>x</script>"),
    ("<script>x<", "<script>x</script>"),
    ("<script>x</SCRIPX>y</script>", "<script>x</scripx>y</script>"),
    ("<!DOCTYPE>v", "<!DOCTYPE >v"),
    ("<!x y>t", "<!--x y-->t"),
    ("<a b/c>t</a>", '<a b="" c="">t</a>'),
    ("<a/ b>t</a>", '<a b="">t</a>'),
    ("</div a='1'>x", "x"),
    ("<p>a<div>b</p>c</div>d", "<p>a<div>b</div></p>cd"),
    ("<script>s</script >t", "<script>s</script>t"),
    ("<title>A</title><p>b</p>", "<title>A</title><p>b</p>"),
    ("<div \v>x</div>", '<div \v="">x</div>'),
    ("<p>x\vy</p>", "<p>x y</p>"),
    ("<p>\v</p>z", "<p> </p>z"),
]

PROBES_TEXT = [
    ("<p>a<div>b</p>c</div>d", "a\nb\ncd"),
    ("<ul><li>li1</li><li>li2</li></ul>", "li1\nli2"),
    ("<script>s</script >t", "s\nt"),
    ("<title>A</title><p>b</p>", "A\nb"),
    ("<p>x\vy</p>", "x\vy"),
    ("<p>\v</p>z", "\v\nz"),
    ("<script>x</SCRIPX>y</script>", "x</scripx>y"),
]


def test_probe_raw_html():
    for inp, expected in PROBES_RAW:
        assert to_raw_html(parse(inp)) == expected, repr(inp)


def test_probe_to_text():
    for inp, expected in PROBES_TEXT:
        assert to_text(parse(inp)) == expected, repr(inp)
