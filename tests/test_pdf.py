"""PDF layout-parse subset: round-trip identity, string/escape/
operator goldens, structural validity of the synthesizer, Spark
plumbing. Corpus-wide round-trip exactness is certified by the
`pdf_extract` driver oracle (identity on documents.text)."""

import pytest

from pyspark.sql import functions as F

from htmlparser_spark.operators.pdf import (
    extract_pdf_text,
    synth_pdf_blob,
    synth_pdf_col,
    with_pdf_text,
)


@pytest.mark.parametrize("text", [
    "hello world",
    "a\nb\nc",
    "",
    "\nleading blank",
    "trailing\n",
    "a\n\nb",                      # empty middle line survives
    "par(en)s )( mix",             # parens escaped
    "back\\slash and \\( fake",
    "tab\there",
    "unicode: café 中文 🎉",
    "quote ' and \" operators",
])
def test_round_trip_identity(text):
    assert extract_pdf_text(synth_pdf_blob(text)) == text


def test_synth_is_structurally_valid_pdf():
    blob = synth_pdf_blob("x\ny")
    assert blob.startswith(b"%PDF-1.4\n") and blob.endswith(b"%%EOF\n")
    # xref offsets must point at the object headers
    xref_at = int(blob.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    lines = blob[xref_at:].split(b"\n")
    assert lines[0] == b"xref"
    offs = [int(ln.split(b" ")[0]) for ln in lines[3:8]]
    for i, off in enumerate(offs, start=1):
        assert blob[off:].startswith(str(i).encode() + b" 0 obj")
    # declared /Length equals the stream byte count
    import re
    m = re.search(rb"/Length (\d+) >>\nstream\n", blob)
    start = m.end()
    assert blob[start + int(m.group(1)):].startswith(b"\nendstream")


def test_extractor_goldens_beyond_generator():
    """Constructs the generator never emits: TJ kerning arrays, hex
    strings (odd length pads 0), 1-3 digit octal, balanced inner
    parens unescaped, line-continuation backslash, ' operator."""
    pdf = (b"x\nstream\nBT "
           b"[(ker) -120 (ned)] TJ "
           b"0 -12 Td <48692100> Tj "
           b"T* (oct\\101l \\61) Tj "
           b"0 -12 Td ((inner (nested)) ok) Tj "
           b"(split\\\nline) Tj "
           b"(next) ' "
           b"ET\nendstream\n")
    got = extract_pdf_text(pdf)
    assert got == ("kerned\nHi!\x00\noctAl 1\n(inner (nested)) ok"
                   "splitline\nnext")


def test_text_outside_bt_et_ignored_and_flate_yields_nothing():
    pdf = (b"stream\n(not shown) Tj BT (shown) Tj ET\nendstream\n"
           b"stream\n\x78\x9c\x0b\xc9\xc8,\x06\x00\x00\x00\xff\xff"
           b"\nendstream\n")
    assert extract_pdf_text(pdf) == "shown"


def test_flate_compressed_round_trip_and_corrupt_stream():
    text = "compressed\nstream (with) escapes \\ fine"
    blob = synth_pdf_blob(text, compress=True)
    assert b"FlateDecode" in blob and text.encode() not in blob
    assert extract_pdf_text(blob) == text
    # corrupt Flate body: extractor shows nothing, does not raise
    bad = b"<< /Filter /FlateDecode >>\nstream\nnotzlib\nendstream\n"
    assert extract_pdf_text(bad) == ""


def test_spark_roundtrip_batch(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}\nline(two) \\ {i}") for i in range(50)],
        "doc_id long, text string")
    out = with_pdf_text(
        df.select("doc_id", "text",
                  synth_pdf_col(F.col("text")).alias("pdf_blob")))
    bad = out.filter(F.col("pdf_text") != F.col("text")).count()
    assert bad == 0
