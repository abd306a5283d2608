"""Selector-engine goldens ported from the reference test suite
(/root/reference/test/selectors.cpp, via FIXTURES.md §3.1).

Assertions are result-set sizes + tag names in document order, exactly
as the reference's GoogleTest suite checks them.
"""

import sys

sys.path.insert(0, "/root/repo")

import pytest

from htmlparser_spark.htmldom import Selector, parse, select

FIXTURE = """\t<!DOCTYPE html>
\t<html>
\t\t<head>
\t\t\t<meta charset="utf-8" />
\t\t\t<meta name="author" content="mylogin" />
\t\t\t<title>Selectors</title>
\t\t</head>
\t\t<body>
\t\t\t<h1 id="h1_id" attr2="value" class="h1_class">h1</h1>
\t\t\t<div id="div_id"></div>
\t\t\t<p>
\t\t\t\t<i attr="attr-val1" class="class_alt_name class_name">italic</i>
\t\t\t\t<b attr="attr-val2" class="class_name">bold</b>
\t\t\t</p>
\t\t\t<!--comment-->
\t\t</body>
\t</html>"""

CASES = [
    ("*", 11, ["html", "head", "meta", "meta", "title", "body", "h1", "div", "p", "i", "b"]),
    ("body p i", 1, ["i"]),
    ("meta", 2, ["meta", "meta"]),
    ("#div_id", 1, ["div"]),
    (".class_name", 2, ["i", "b"]),
    (".class_name.class_alt_name", 1, ["i"]),
    (":first", 5, ["html", "head", "meta", "h1", "i"]),
    (":last", 5, ["html", "title", "body", "p", "b"]),
    (":eq(1)", 4, ["meta", "body", "div", "b"]),
    (":gt(1)", 2, ["title", "p"]),
    (":lt(1)", 5, ["html", "head", "meta", "h1", "i"]),
    ("[attr]", 2, ["i", "b"]),
    ("[attr='attr-val2']", 1, ["b"]),
    ("[attr!='attr-val2']", 10,
     ["html", "head", "meta", "meta", "title", "body", "h1", "div", "p", "i"]),
    ("[attr^='attr']", 2, ["i", "b"]),
    ("[attr$='val1']", 1, ["i"]),
    ("[attr2*='alu']", 1, ["h1"]),
    ("[class~='class_name']", 2, ["i", "b"]),
    ("[attr|='attr'],[attr2|='value']", 3, ["h1", "i", "b"]),
    ("#h1_id,p,i", 3, ["h1", "p", "i"]),
    ("h1#h1_id.h1_class:first:eq(0):lt(1)[attr2][attr2*='alu']", 1, ["h1"]),
]


@pytest.mark.parametrize("sel,count,tags", CASES, ids=[c[0] for c in CASES])
def test_selector_suite(sel, count, tags):
    doc = parse(FIXTURE)
    got = select(doc, sel)
    assert len(got) == count, f"{sel}: {[doc.tag[i] for i in got]}"
    assert [doc.tag[i] for i in got] == tags


NEST = "<div><div><div><p><p><p><b></b><i></i></p></p></p></div></div></div>"

DC_CASES = [
    ("div>div>div>p>p>p>b,i", ["b", "i"]),
    ("div>p>p>p>b,i", ["b", "i"]),
    ("p>b,i", ["b", "i"]),
    ("div>p>p>b", []),
    ("div>div>div p>p>p b", ["b"]),
    ("div>div div p>p p b", ["b"]),
    ("div div>div p>p>b,i", ["b", "i"]),
    ("div p p>b", ["b"]),
    ("div div div p>p>p b", ["b"]),
    ("div>div>p b", ["b"]),
    ("div div>p>p>b", []),
]


@pytest.mark.parametrize("sel,tags", DC_CASES, ids=[c[0] for c in DC_CASES])
def test_direct_child_combinations(sel, tags):
    doc = parse(NEST)
    got = select(doc, sel)
    assert [doc.tag[i] for i in got] == tags


def test_nested_flag():
    doc = parse("<div><div><div>x")
    assert len(select(doc, "div", nested=True)) == 3
    assert len(select(doc, "div", nested=False)) == 1


def test_e21_contains_word_first_occurrence_quirk():
    doc = parse('<i class="xab ab">t</i>')
    assert select(doc, ".ab") == []


def test_e22_attr_endswith_first_occurrence_quirk():
    doc = parse('<i attr="valval">t</i>')
    assert select(doc, "[attr$='val']") == []
    doc2 = parse('<i attr="xyzval">t</i>')
    assert len(select(doc2, "[attr$='val']")) == 1


def test_empty_or_group_matches_all_tags():
    # "a,,b" leaves an empty OR-group, which vacuously matches every tag
    doc = parse("<x></x><y></y>")
    got = select(doc, "a,,b")
    assert [doc.tag[i] for i in got] == ["x", "y"]


def test_star_only_global():
    # '*' mid-selector compiles to the literal tag name '*'
    doc = parse("<div><p>t</p></div>")
    assert select(doc, "div *") == []


def test_callback_mode_first_matcher_only():
    # multi-level selectors never fire in callback mode (html.cpp:545-549)
    doc = parse(FIXTURE)
    s1 = Selector("meta")
    hits = [i for i in range(len(doc)) if s1.match_first(doc, i)]
    assert len(hits) == 2
    s2 = Selector("body p i")
    hits2 = [i for i in range(len(doc)) if s2.match_first(doc, i)]
    assert hits2 == []
