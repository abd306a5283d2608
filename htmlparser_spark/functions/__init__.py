"""Column-level helpers (JVM-side expressions, no Python in the loop).

Each function returns a ``pyspark.sql.Column`` built from built-in
expressions, so Catalyst can constant-fold, push down, and keep the
computation inside whole-stage codegen. They mirror the reference's
utility semantics exactly, including the quirks (SURVEY §2.3):

- ``collapse_spaces``      — utils::replace_any_copy (html.cpp:1050-1062):
  every maximal run of the SERIALIZER space set (includes ``\\v``)
  becomes one space.
- ``contains_word``        — utils::contains_word (html.cpp:1030-1038):
  boundary-checks only the FIRST occurrence (a faithful false-negative:
  ``'xab ab' contains_word 'ab'`` is False), using the TOKENIZER space
  set (no ``\\v``).
- ``attr_get``             — node::get_attr (html.cpp:496-501): missing
  attribute yields ``''``, not NULL.
- ``is_void_tag`` / ``is_inline_tag`` / ``is_rawtext_tag`` — the three
  semantic tag sets (html.cpp:5-14).
"""

from .columns import (
    attr_del,
    attr_get,
    attr_has,
    attr_set,
    bind,
    collapse_spaces,
    contains_word,
    content_hash,
    is_inline_tag,
    is_rawtext_tag,
    is_void_tag,
    n_tokens,
)

__all__ = [
    "attr_del",
    "attr_get",
    "attr_has",
    "attr_set",
    "bind",
    "collapse_spaces",
    "contains_word",
    "content_hash",
    "is_inline_tag",
    "is_rawtext_tag",
    "is_void_tag",
    "n_tokens",
]
