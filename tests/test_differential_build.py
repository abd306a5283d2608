"""Differential fuzzing of the BUILD surface vs the compiled reference.

ref_build_tool.cpp parses two docs, appends the first select-match of
doc2 into the first select-match of doc1 (root fallback), then appends
make_node(tag 'x1', id=mk) and make_node(text 'mt') to the same
target, and echoes the mutated doc's raw/pretty serializations plus
three post-append probe selects. This pins node::append's deep copy
with DESTINATION-side tag-index reassignment (html.cpp:515-537,
262-273) and utils::make_node's void-tag/attr handling
(html.cpp:1013-1028) — the one reference surface the other
differential harnesses don't reach.

Skips when g++ or the read-only reference tree is unavailable.
"""

import random
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, "/root/repo")

from htmlparser_spark.htmldom import parse, select, to_html, to_raw_html
from htmlparser_spark.htmldom.build import append, make_node
from htmlparser_spark.htmldom.constants import KIND_TAG, KIND_TEXT
from tests.test_differential_reference import REF, gen_doc, gen_selector

BUILD_TOOL_SRC = Path(__file__).parent / "tools" / "ref_build_tool.cpp"
BUILD_TOOL_BIN = Path("/tmp/htmlparser_ref_build_tool")

_PROBES = ("x1:last", "[id='mk']", "li:eq(2)")


@pytest.fixture(scope="module")
def ref_build_tool():
    if not REF.exists() or shutil.which("g++") is None:
        pytest.skip("reference tree or g++ unavailable")
    if (not BUILD_TOOL_BIN.exists()
            or BUILD_TOOL_BIN.stat().st_mtime < BUILD_TOOL_SRC.stat().st_mtime):
        r = subprocess.run(
            ["g++", "-std=c++11", "-O1", f"-I{REF}", str(BUILD_TOOL_SRC),
             str(REF / "html.cpp"), "-o", str(BUILD_TOOL_BIN)],
            capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"build tool build failed: {r.stderr[:500]}")
    return BUILD_TOOL_BIN


def run_reference_build(tool: Path, cases):
    inp = []
    for blobs in cases:
        for b in blobs:
            eb = b.encode("latin-1")
            inp.append(str(len(eb)).encode() + b"\n" + eb + b"\n")
    out = subprocess.run([str(tool)], input=b"".join(inp),
                         capture_output=True).stdout
    res = []
    pos = 0
    for _ in cases:
        fields = []
        for _f in range(5):
            nl = out.index(b"\n", pos)
            ln = int(out[pos:nl])
            fields.append(out[nl + 1:nl + 1 + ln].decode("latin-1"))
            pos = nl + 1 + ln + 1
        res.append(fields)
    return res


def py_build(doc1, sel1, doc2, sel2):
    d1 = parse(doc1)
    d2 = parse(doc2)
    target = -1
    if sel1:
        m = select(d1, sel1)
        if m:
            target = m[0]
    src = select(d2, sel2)
    if src:
        append(d1, target, d2, src[0])
    append(d1, target, make_node(KIND_TAG, "x1", attrs={"id": "mk"}))
    append(d1, target, make_node(KIND_TEXT, content="mt"))
    probes = ["\x1f".join(to_raw_html(d1, node_id=i)
                          for i in select(d1, pr)) for pr in _PROBES]
    return [to_raw_html(d1), to_html(d1)] + probes


def _run_cases(tool, cases):
    expected = run_reference_build(tool, cases)
    for (doc1, sel1, doc2, sel2), exp in zip(cases, expected):
        got = py_build(doc1, sel1, doc2, sel2)
        assert got == exp, (sel1, sel2, doc1[:120], doc2[:120])


def test_differential_build_fuzz(ref_build_tool):
    rng = random.Random(20260821)
    cases = [(gen_doc(rng), gen_selector(rng),
              gen_doc(rng), gen_selector(rng)) for _ in range(400)]
    _run_cases(ref_build_tool, cases)


def test_differential_build_index_reassignment(ref_build_tool):
    """Targeted: append into parents that already have tag children so
    the copied subtree's reassigned indices are probe-visible (li:eq)."""
    cases = [
        ("<ul><li>a</li><li>b</li></ul>", "ul",
         "<ol><li>z</li></ol>", "li"),
        ("<ul><li>a</li><li>b</li><li>c</li></ul>", "ul",
         "<div><ul><li>q</li><li>r</li></ul></div>", "ul"),
        ("<div><p>t</p></div>", "div",
         "<span>s</span><b>u</b>", "b"),
        ("<div><p>t</p></div>", "nomatch",
         "<li>only</li>", "li"),
        ("<div></div>", "div", "<img><br>", "img"),  # void: self-closing
        ("<p>x</p>", "p", "<script>a</script>", "script"),  # rawtext
        ("<p>x</p>", "p", "<div>d</div>", "nomatch"),  # make_node only
    ]
    _run_cases(ref_build_tool, cases)
