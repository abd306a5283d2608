"""JVM-side Column expressions mirroring the reference's utils.

Differential-tested against the pure-Python kernel versions in
``htmldom.constants`` (tests/test_functions.py) so the two paths can
never drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..htmldom.constants import (
    INLINE_TAGS,
    RAWTEXT_TAGS,
    SPACE_TOKENIZER,
    VOID_TAGS,
)

__all__ = [
    "collapse_spaces", "contains_word", "attr_get", "attr_has",
    "is_void_tag", "is_inline_tag", "is_rawtext_tag", "n_tokens",
    "content_hash", "bind",
]

# serializer collapse set INCLUDES \v (html.cpp:16); tokenizer
# word-boundary set does NOT (html.hpp:231-233). The asymmetry is a
# verified reference behavior — do not "fix" it.
_COLLAPSE_RE = r"[ \f\n\r\t\x0b]+"
_TOKEN_SPLIT_RE = r"[ \t\n\f\r]+"


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def collapse_spaces(col) -> Column:
    """utils::replace_any_copy: collapse runs of the serializer space
    set (incl. ``\\v``) to a single space. Leading/trailing runs also
    become one space (NOT stripped) — html.cpp:1050-1062."""
    return F.regexp_replace(_col(col), _COLLAPSE_RE, " ")


def contains_word(col, word: str) -> Column:
    """utils::contains_word quirk: test ONLY the first occurrence of
    ``word`` for space boundaries (html.cpp:1030-1038). A word that
    first appears embedded and later stands alone does NOT match."""
    c = _col(col)
    wl = len(word)
    spaces = F.lit(SPACE_TOKENIZER)
    if wl == 0:
        # reference semantics for word='': find('') hits position 0 →
        # left boundary trivially ok; right boundary checks s[0], so
        # the result is `s is empty OR s starts with a tokenizer
        # space` — matches htmldom.constants.contains_word exactly
        return (F.length(c) == 0) | (
            F.instr(spaces, F.substring(c, 1, 1)) > 0)
    pos = F.locate(word, c)  # 1-based, 0 = absent
    left_char = F.substring(c, pos - 1, 1)
    left_ok = (pos == 1) | (F.instr(spaces, left_char) > 0)
    right_char = F.substring(c, pos + wl, 1)
    right_ok = (pos + wl - 1 == F.length(c)) | (
        F.instr(spaces, right_char) > 0)
    return (pos > 0) & left_ok & right_ok


def attr_get(attrs, key: str) -> Column:
    """node::get_attr: missing attribute -> '' (html.cpp:496-501)."""
    return F.coalesce(_col(attrs).getItem(key), F.lit(""))


def attr_has(attrs, key: str) -> Column:
    """node::has_attr (html.cpp:491-494)."""
    return _col(attrs).getItem(key).isNotNull()


def is_void_tag(col) -> Column:
    """html.cpp:10-11 — tags never pushed as open containers."""
    return _col(col).isin(*sorted(VOID_TAGS))


def is_inline_tag(col) -> Column:
    """html.cpp:5-8 — the block/inline boundary set of to_text."""
    return _col(col).isin(*sorted(INLINE_TAGS))


def is_rawtext_tag(col) -> Column:
    """html.cpp:13-14 — tags whose content is a single text node."""
    return _col(col).isin(*sorted(RAWTEXT_TAGS))


def attr_set(attrs, key: str, value: str) -> Column:
    """node::set_attr (html.cpp:503-506): insert-or-replace one
    attribute. map_concat with right-bias via map_filter (Spark's
    map_concat rejects duplicate keys under ANSI semantics)."""
    cleaned = F.map_filter(_col(attrs), lambda k, _: k != F.lit(key))
    addition = F.create_map(F.lit(key), F.lit(value))
    return F.map_concat(F.coalesce(cleaned, F.create_map()), addition)


def attr_del(attrs, key: str) -> Column:
    """node::del_attr (html.cpp:511-513)."""
    return F.map_filter(_col(attrs), lambda k, _: k != F.lit(key))


def n_tokens(col) -> Column:
    """Whitespace-token count using the tokenizer space set (no \\v)."""
    c = _col(col)
    trimmed = F.regexp_replace(
        F.regexp_replace(c, f"^{_TOKEN_SPLIT_RE}", ""),
        f"{_TOKEN_SPLIT_RE}$", "")
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, _TOKEN_SPLIT_RE))).cast("long")


def content_hash(*cols) -> Column:
    """Per-row lineage hash (the checkpoint manifest's unit of
    integrity): xxhash64 over the identifying columns."""
    return F.xxhash64(*[_col(c) for c in cols])


def bind(expr: Column, fn) -> Column:
    """Evaluate ``expr`` ONCE per row and pass the materialized value
    into ``fn`` as a lambda variable.

    Catalyst does not common-subexpression-eliminate across
    higher-order-function lambda bodies: a lambda that captures an
    outer expression (e.g. ``split(text)``) re-executes it for EVERY
    array element, turning an O(n) transform into O(n²) on the row's
    data. Routing the expression through a single-element array and a
    ``transform`` lambda binds it to a NamedLambdaVariable, which the
    inner lambdas then reference in O(1). Measured on 30 KB assembled
    conversation docs this is ~40× on the shingle expression (16.1 s
    → 0.4 s for 20 docs, byte-identical output).
    """
    return F.transform(F.array(expr), fn)[0]
