"""Pins for text normalization (operators/normalize.py)."""

import pytest

from htmlparser_spark.operators.normalize import (
    fix_mojibake_str,
    normalize_str,
    normalize_text,
    normalize_text_col,
)


def test_mojibake_two_and_three_byte():
    assert fix_mojibake_str("cafÃ©") == "café"          # 2-byte seq
    assert fix_mojibake_str("a â€” b") == "a — b"       # 3-byte seq
    assert fix_mojibake_str("nÂ° 5") == "n° 5"


def test_mojibake_conservative():
    # no signature -> untouched (plain text, legit accents, ellipsis)
    assert fix_mojibake_str("plain") == "plain"
    assert fix_mojibake_str("café déjà…") == "café déjà…"
    # mixed legit non-Latin-1 + mojibake fails the whole-string
    # re-encode -> untouched (documented precision choice)
    s = "日本 cafÃ©"
    assert fix_mojibake_str(s) == s
    # 'Ã' followed by a non-continuation char is not a signature
    assert fix_mojibake_str("Ãx") == "Ãx"


def test_normalize_forms():
    assert normalize_str("étude") == "étude"           # NFC
    assert normalize_str("ﬁt ５", form="NFKC") == "fit 5"    # fold
    assert normalize_str("é", form="NFD") == "é"
    with pytest.raises(ValueError):
        normalize_text_col(None, form="NFX")


def test_control_strip_and_ws():
    assert normalize_str("a\x00b\x07c") == "abc"
    # collapse: every ws run (incl. kept \t\n) -> one space, stripped
    assert normalize_str("  a\t\tb\n\nc  ") == "a b c"
    # no collapse: \t and \n survive, other controls still stripped
    assert normalize_str("a\tb\nc\x0bd", collapse_ws=False) == "a\tb\ncd"
    assert normalize_str(None) is None


def test_order_fix_before_normalize():
    # mojibake repair must run first: the repaired bytes decode to a
    # decomposed sequence that NFC then composes.
    # 'e' + U+0301 in UTF-8 = 65 CC 81; 0x81 is a cp1252 hole, so
    # this is the latin-1 flavor of mojibake (repair's 2nd attempt)
    moji = b"caf e\xcc\x81".decode("latin-1")
    assert normalize_str(moji) == "caf é"


def test_spark_surface(spark):
    df = spark.createDataFrame(
        [(1, "cafÃ©  ok"), (2, None), (3, "éa")],
        "doc_id long, text string")
    out = {r.doc_id: r.text_norm
           for r in normalize_text(df).collect()}
    assert out == {1: "caf\u00e9 ok", 2: None, 3: "\u00e9a"}
    assert set(normalize_text(df).columns) == {"doc_id", "text",
                                               "text_norm"}
