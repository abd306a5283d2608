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


def assert_equiv_decoded(s: str) -> None:
    doc = parse(s)
    exp = to_text_stripped(doc, decode_entities=True)
    got, _, _, _ = extract_fused(s, strip=True, want_raw=False,
                                 decode_entities=True)
    assert got == exp, repr(s)


def test_decode_entities_hand_cases():
    """Opt-in decoding: named/numeric/hex/legacy forms decode in text
    nodes; rawtext (script/style) content never decodes; raw_html
    stays verbatim; default-off is byte-identity."""
    s = "<p>&amp;&lt;&gt;&#65;&#x42;&quot;&nbsp;&copy;&amp</p>"
    doc = parse(s)
    assert to_text(doc, decode_entities=True) == '&<>AB"\xa0\xa9&'
    assert to_text(doc) == "&amp;&lt;&gt;&#65;&#x42;&quot;&nbsp;&copy;&amp"
    got, raw, _, _ = extract_fused(s, strip=True, want_raw=True,
                                   decode_entities=True)
    assert got == '&<>AB"\xa0\xa9&'
    assert "&amp;" in raw                      # raw_html never decodes
    # rawtext content is never decoded (HTML5 rawtext states)
    s2 = "<style>a &amp; b</style><p>c &amp; d</p>"
    assert to_text(parse(s2), decode_entities=True) \
        == "a &amp; b\nc & d"
    got2, _, _, _ = extract_fused(s2, strip=False, want_raw=False,
                                  decode_entities=True)
    assert got2 == "a &amp; b\nc & d"
    # per-node decoding: an entity never assembles across a tag
    # boundary — '&am' + <b> + 'p;' stays the five LITERAL characters
    # "&amp;" in the output (each node decodes to itself), never '&'
    s3 = "<p>&am<b>p;</b></p>"
    assert to_text(parse(s3), decode_entities=True) == "&am" + "p;"
    got3, _, _, _ = extract_fused(s3, strip=True, want_raw=False,
                                  decode_entities=True)
    assert got3 == "&am" + "p;"


def test_decode_entities_fused_equivalence_fuzz():
    """Fused and Doc paths agree under decode_entities=True over the
    fuzz grammar with entity snippets spliced in."""
    rng = random.Random(424242)
    ents = ["&amp;", "&lt;", "&#65;", "&#x4a;", "&nbsp;", "&bogus;",
            "&amp", "&", "&#", "&;"]
    docs = [gen_doc(rng) for _ in range(300)]
    for d in docs:
        cut = rng.randint(0, len(d)) if d else 0
        s = d[:cut] + rng.choice(ents) + d[cut:]
        assert_equiv_decoded(s)
        assert_equiv(s)                        # default path unchanged
