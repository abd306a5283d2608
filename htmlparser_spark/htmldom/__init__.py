"""htmldom — pure-Python HTML parse/select/serialize kernel.

The semantic core of the engine (no Spark dependency): a bulk-scan
HTML5-style tokenizer + node-stack tree builder producing flat
pre-order node arrays, a CSS-selector engine, and three serializers,
all byte-compatible with the reference parser (mylogin/htmlparser).
"""

from .constants import (
    INLINE_TAGS,
    KIND_COMMENT,
    KIND_DOCTYPE,
    KIND_TAG,
    KIND_TEXT,
    RAWTEXT_TAGS,
    VOID_TAGS,
    collapse_spaces,
    contains_word,
)
from .build import append, make_node, walk
from .callbacks import CallbackParser, CloseNode
from .parse import Doc, parse
from .selector import Condition, Matcher, Selector, select
from .serialize import (
    DEFAULT_STRIP_TAGS,
    to_html,
    to_raw_html,
    to_text,
    to_text_stripped,
)

__all__ = [
    "Doc", "parse", "Selector", "Condition", "Matcher", "select",
    "make_node", "append", "walk",
    "to_text", "to_text_stripped", "to_raw_html", "to_html",
    "DEFAULT_STRIP_TAGS", "collapse_spaces", "contains_word",
    "INLINE_TAGS", "VOID_TAGS", "RAWTEXT_TAGS",
    "KIND_TEXT", "KIND_TAG", "KIND_COMMENT", "KIND_DOCTYPE",
]
