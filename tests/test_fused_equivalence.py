"""Differential test: fused single-pass extract vs the Doc-based path.

The fused kernel must be byte-identical to parse()+serializers on
every input: the fuzz grammar (same generator as the reference
differential test), the transcripts quirk grammar, and the golden
fixtures."""

import random
import sys

sys.path.insert(0, "/root/repo")

from htmlparser_spark.htmldom import parse, to_raw_html, to_text, to_text_stripped
from htmlparser_spark.htmldom.fused import extract_fused
from htmlparser_spark.sources.transcripts import generate_rows
from tests.test_differential_reference import gen_doc
from tests.test_extraction_goldens import PROBES_RAW


def assert_equiv(s: str) -> None:
    doc = parse(s)
    exp = (to_text_stripped(doc), to_raw_html(doc), len(doc),
           len(doc.errors))
    got = extract_fused(s, strip=True, want_raw=True)
    assert got == exp, repr(s)
    # unstripped + raw-collapse variants
    t2, _, _, _ = extract_fused(s, strip=False, want_raw=False)
    assert t2 == to_text(doc), repr(s)
    t3, _, _, _ = extract_fused(s, strip=False, want_raw=False,
                                raw_collapse=True)
    assert t3 == to_text(doc, raw=True), repr(s)


def test_fused_fuzz_grammar():
    rng = random.Random(99887766)
    docs = [gen_doc(rng) for _ in range(800)]
    docs += [d[: rng.randint(0, len(d))] for d in docs[:300] if d]
    for d in docs:
        assert_equiv(d)


def test_fused_transcripts_grammar():
    rows = generate_rows(n_convs=40, n_turns=400, seed=3, mega_text=False)
    for r in rows:
        assert_equiv(r[3])


def test_fused_probe_cases():
    for inp, _ in PROBES_RAW:
        assert_equiv(inp)
    for inp in ["", "x", "<script>a</script>", "<script/>x",
                "<style> .a{} </style><p> hi </p>",
                "<div><script>s", "<br>", "a<br>b",
                "<p>t</p><script>x</script>tail"]:
        assert_equiv(inp)
