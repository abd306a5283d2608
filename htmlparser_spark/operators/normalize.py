"""Text normalization: the cleanup stage between extraction and
every downstream text operator.

Corpus pipelines normalize extracted text before dedup/stats/training
(CCNet, C4, ftfy are the public reference points) because the same
visible text otherwise hashes differently: decomposed vs composed
accents (NFC), UTF-8-decoded-as-Latin-1 mojibake ("cafÃ©"), stray
control bytes, and whitespace-run differences all defeat exact and
near dedup. One vectorized Arrow stage (pandas_udf — never
row-at-a-time Python), steps applied in this order:

1. **Mojibake repair** (``fix_mojibake=True``): whole-string,
   one-pass — if the string re-encodes losslessly via cp1252 (then
   latin-1) and the bytes decode as valid UTF-8, and that round trip
   strictly removes the mojibake signature (a lead char from the
   cp1252/latin-1 view of the UTF-8 lead-byte range C2-EF
   followed by a cp1252-continuation-byte character), the repaired
   string wins. Mixed strings (legit non-Latin-1 text PLUS mojibake)
   don't survive the re-encode and are left unchanged — whole-string-
   or-nothing is the deliberate precision/recall trade; segment-level
   repair is an ftfy-grade project, not attempted here.
2. **Unicode normalization** to ``form`` (NFC default; NFKC for the
   aggressive compatibility fold — caller's choice, affects
   ligatures/width forms).
3. **Control-char strip**: C0 controls except ``\\t``/``\\n``, plus
   DEL, removed.
4. **Whitespace collapse** (``collapse_ws=True``): every whitespace
   run (including the kept tabs/newlines) becomes one space, ends
   stripped — the C4 convention, so line structure is gone; callers
   that need paragraph boundaries normalize BEFORE paragraph split
   or pass ``collapse_ws=False``.

NULL in → NULL out. The operator is a pure column expression
(``normalize_text_col``) plus a DataFrame convenience
(``normalize_text``) appending ``<col>_norm``.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Optional

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fix_mojibake_str", "normalize_str", "normalize_text_col",
           "normalize_text"]

# a cp1252/latin-1 mojibake lead char followed by what a UTF-8
# continuation byte (0x80-0xBF) looks like after a cp1252 decode:
# either the raw U+0080-00BF range (latin-1 view / cp1252 holes) or
# one of cp1252's punctuation remappings of 0x80-0xBF.
_SIG = re.compile(
    "[\u00c2-\u00df\u00e0-\u00ef]"  # cp1252/latin-1 view of UTF-8 lead bytes
    "[\u0080-\u00bf"             # raw continuation range (latin-1 view)
    "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160"
    "\u2039\u0152\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014"
    "\u02dc\u2122\u0161\u203a\u0153\u017e\u0178]")  # cp1252 remaps of 80-BF
_CTRL = re.compile("[\x00-\x08\x0b-\x1f\x7f]")
_WS = re.compile(r"\s+")


def fix_mojibake_str(s: str) -> str:
    """One whole-string repair pass (see module docstring step 1)."""
    if not _SIG.search(s):
        return s
    for enc in ("cp1252", "latin-1"):
        try:
            t = s.encode(enc).decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            continue
        if not _SIG.search(t):
            return t
    return s


def normalize_str(s: Optional[str], form: str = "NFC",
                  fix_mojibake: bool = True,
                  collapse_ws: bool = True) -> Optional[str]:
    if s is None:
        return None
    if fix_mojibake:
        s = fix_mojibake_str(s)
    s = unicodedata.normalize(form, s)
    s = _CTRL.sub("", s)
    if collapse_ws:
        s = _WS.sub(" ", s).strip()
    return s


def normalize_text_col(col: Column, form: str = "NFC",
                       fix_mojibake: bool = True,
                       collapse_ws: bool = True) -> Column:
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(lambda v: normalize_str(
            v, form=form, fix_mojibake=fix_mojibake,
            collapse_ws=collapse_ws))

    return _norm(col)


def normalize_text(df: DataFrame, text_col: str = "text",
                   form: str = "NFC", fix_mojibake: bool = True,
                   collapse_ws: bool = True) -> DataFrame:
    """Append ``<text_col>_norm``; all other columns pass through
    (narrow map stage, no shuffle)."""
    return df.withColumn(
        f"{text_col}_norm",
        normalize_text_col(F.col(text_col), form=form,
                           fix_mojibake=fix_mojibake,
                           collapse_ws=collapse_ws))
