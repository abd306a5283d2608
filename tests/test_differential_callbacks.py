"""Differential fuzzing of the CALLBACK surface vs the compiled reference.

ref_cb_tool.cpp registers one unconditional node callback, K
selector-guarded callbacks and one error callback against the reference
parser and echoes the fired-event stream (callback index, node
tag_name, id attribute). The Python mirror drives CallbackParser the
same way; streams must match byte-for-byte. This pins the dispatch
quirks the tree/serializer differentials cannot see:

- registration-order dispatch and the first-matcher-only quirk
  (html.cpp:545-549);
- ZERO-matcher selectors are falsy in dispatch (html.cpp:541) and
  therefore fire UNCONDITIONALLY (e.g. a NUL byte kills the only
  matcher mid-compile);
- transient close-tag nodes carry their parsed attrs (incl. rawtext
  closes, html.cpp:745-747);
- the EOF flush (html.cpp:1008-1010) reuses the pending node, so a
  doc truncated mid ``</clos...`` inside rawtext flushes a TEXT node
  still carrying the partial close-tag name and committed attrs;
- tag_not_closed error events, innermost first, before the close
  dispatch.

Skips when g++ or the read-only reference tree is unavailable.
"""

import random
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, "/root/repo")

from htmlparser_spark.htmldom.callbacks import CallbackParser
from tests.test_differential_reference import REF, _gen_rawtext, gen_doc
from tests.test_differential_reference import gen_selector

CB_TOOL_SRC = Path(__file__).parent / "tools" / "ref_cb_tool.cpp"
CB_TOOL_BIN = Path("/tmp/htmlparser_ref_cb_tool")


@pytest.fixture(scope="module")
def ref_cb_tool():
    if not REF.exists() or shutil.which("g++") is None:
        pytest.skip("reference tree or g++ unavailable")
    if (not CB_TOOL_BIN.exists()
            or CB_TOOL_BIN.stat().st_mtime < CB_TOOL_SRC.stat().st_mtime):
        r = subprocess.run(
            ["g++", "-std=c++11", "-O1", f"-I{REF}", str(CB_TOOL_SRC),
             str(REF / "html.cpp"), "-o", str(CB_TOOL_BIN)],
            capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"callback tool build failed: {r.stderr[:500]}")
    return CB_TOOL_BIN


def run_reference_cb(tool: Path, cases):
    inp = []
    for doc, sels in cases:
        db = doc.encode("latin-1")
        inp.append(str(len(db)).encode() + b"\n" + db + b"\n")
        inp.append(str(len(sels)).encode() + b"\n")
        for s in sels:
            sb = s.encode("latin-1")
            inp.append(str(len(sb)).encode() + b"\n" + sb + b"\n")
    out = subprocess.run([str(tool)], input=b"".join(inp),
                         capture_output=True).stdout
    res = []
    pos = 0
    for _ in cases:
        nl = out.index(b"\n", pos)
        n = int(out[pos:nl])
        pos = nl + 1
        events = []
        for _e in range(n):
            nl = out.index(b"\n", pos)
            idx_s, tl_s = out[pos:nl].split(b" ")
            tl = int(tl_s)
            tag = out[nl + 1:nl + 1 + tl].decode("latin-1")
            pos = nl + 1 + tl + 1
            nl = out.index(b"\n", pos)
            il = int(out[pos:nl])
            idv = out[nl + 1:nl + 1 + il].decode("latin-1")
            pos = nl + 1 + il + 1
            events.append((int(idx_s), tag, idv))
        res.append(events)
    return res


def py_cb_events(doc_s, sels):
    """Python mirror of ref_cb_tool: same registrations, same echo."""
    p = CallbackParser()
    events = []

    def rec(idx, obj, nid):
        at = obj.attrs[nid]
        events.append((idx, obj.tag[nid],
                       at.get("id", "") if at else ""))

    p.set_callback(lambda o, n: rec(0, o, n))
    for i, sel in enumerate(sels):
        p.set_callback(sel, lambda o, n, i=i: rec(i + 1, o, n))
    p.set_err_callback(lambda _err, d, nid: rec(-1, d, nid))
    p.parse(doc_s)
    return events


# Selectors engineered to compile to ZERO matchers (NUL terminates the
# compile loop and the in-progress matcher is only saved if it has a
# condition) plus shape edge cases around them.
_POISON_SELECTORS = [
    "", "\x00", "#", ".", ":", "[", ",", "#\x00", ".\x00", ":\x00x",
    "div\x00p", "#x\x00y", "a b", "div>p", "a,,b", "*", " ", ">",
    "[id='x'", ":eq(", "p:last\x00",
]


def _gen_sels(rng: random.Random):
    k = rng.randint(0, 3)
    sels = [gen_selector(rng) for _ in range(k)]
    if rng.random() < 0.5:
        sels.append(rng.choice(_POISON_SELECTORS))
    return sels


def _run_cases(tool, cases):
    expected = run_reference_cb(tool, cases)
    for (doc, sels), exp in zip(cases, expected):
        got = py_cb_events(doc, sels)
        assert got == exp, (sels, doc[:200])


def test_differential_callback_fuzz(ref_cb_tool):
    rng = random.Random(20260819)
    cases = [(gen_doc(rng), _gen_sels(rng)) for _ in range(400)]
    # EOF-in-every-state coverage: truncations of the same docs
    cases += [(d[: rng.randint(0, len(d))], s)
              for d, s in cases[:200] if d]
    _run_cases(ref_cb_tool, cases)


def test_differential_callback_rawtext_eof(ref_cb_tool):
    """The EOF-leak family: rawtext torture + every truncation point
    of closer-shaped tails, so the flushed node's leaked tag/attrs are
    compared at each tokenizer position."""
    rng = random.Random(20260820)
    cases = [(_gen_rawtext(rng), _gen_sels(rng)) for _ in range(250)]
    tails = [
        "<script>x</scr", "<script>x</script id=3",
        "<script>x</script id=\"a b", "<script>x</script id='y",
        "<script>x</script/", "<script>x</script /",
        "<script>x</script id", "<script>x</script id=",
        "<script>x</script id=3 class=\"c",
        "<title>t</title x=1>after", "<textarea>a</textareax",
    ]
    for t in tails:
        for cut in range(1, len(t) + 1):
            cases.append((t[:cut], ["scr", "script", "", "\x00"]))
    _run_cases(ref_cb_tool, cases)


def test_differential_callback_poison_selectors(ref_cb_tool):
    """Every poison selector over a fixed doc battery: the zero-matcher
    unconditional quirk and its near-misses."""
    docs = [
        "<div id=a><p id=b>t</p></div>",
        "<ul><li id=1>x<li id=2>y</ul>",
        "<script>s</script><b id=z>w</b>",
        "<div><div><div id=d3>deep</div></div>",
        "text only",
        "<img id=i><br><meta id=m>",
    ]
    cases = [(d, [s]) for d in docs for s in _POISON_SELECTORS]
    _run_cases(ref_cb_tool, cases)


def _gen_soup_selector(rng: random.Random) -> str:
    """Raw byte soup weighted toward selector structural chars — the
    compile loop must terminate/save identically on arbitrary bytes
    (a 9k-case offline campaign over select + callbacks found zero
    mismatches; CI-sized here as regression insurance)."""
    alphabet = ("#.:,>[]'=^$!~|*() abAB01\x00"
                + "".join(chr(rng.randint(1, 255)) for _ in range(6)))
    return "".join(rng.choice(alphabet)
                   for _ in range(rng.randint(0, 25)))


def test_differential_callback_soup_selectors(ref_cb_tool):
    rng = random.Random(31337)
    cases = [(gen_doc(rng),
              [_gen_soup_selector(rng) for _ in range(rng.randint(1, 3))])
             for _ in range(250)]
    _run_cases(ref_cb_tool, cases)
