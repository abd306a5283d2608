"""Fused single-pass extraction: tokenize → (stripped) text + raw html
+ node/error counts WITHOUT materializing the node arrays.

This is the pipeline hot path. It reuses the exact scanner functions of
``parse.py`` (tag/attr/comment/doctype/bogus/rawtext states — all the
verified quirks live there), and replaces the tree builder with direct
emission:

- extracted text: the reference ``to_text`` logic (html.cpp:449-489)
  evaluated on the event stream — block-boundary newlines, ``<br>``
  newlines, verbatim content — with the boilerplate-strip stage
  (script/style subtree drop) applied inline. Stripping is restricted
  to rawtext tags (script/style have pure-text subtrees), which is what
  makes inline dropping equivalent to tree-filter-then-serialize.
- raw html: the reference ``to_raw_html`` (html.cpp:394-432) emitted in
  event order — identical to a pre-order walk of the finished tree
  because node creation order IS pre-order and closes happen on pop.

Equivalence with the Doc-based path is enforced by differential tests
(tests/test_fused_equivalence.py) over the fuzz grammar and the
transcripts corpus.
"""

from __future__ import annotations

from html import unescape as _unescape
from typing import List, Optional, Tuple

from .constants import (
    INLINE_TAGS,
    LOWER_NUL_TABLE,
    RAWTEXT_TAGS,
    RE_HAS_NONSPACE,
    RE_NAME_END,
    VOID_TAGS,
    collapse_spaces,
)
from .parse import (
    _scan_bogus,
    _scan_comment,
    _scan_doctype,
    _scan_rawtext,
    _scan_tag,
)
from .serialize import DEFAULT_STRIP_TAGS

__all__ = ["extract_fused"]

import re

# Structural-position dispatch (round-3 verdict item 6): ONE compiled
# alternation classifies the next '<' in C instead of a Python
# char-compare chain per token. Ordered alternatives:
#   group 1: no-attribute open tag  <name>         (dominant shape)
#   group 2: simple close tag       </name>
#   empty:   any other '<' — falls through to the verified scanner
#            dispatch below (attrs, comments, doctype, bogus, '</ >',
#            self-closing '<x/>', non-alnum tag names, EOF truncation)
# The fast branches claim EXACTLY the shapes whose semantics are a
# name translate + fixed emission — everything else takes the same
# code path as before, so quirk behavior is untouched (diff fuzzer +
# goldens gate this, tests/test_fused_equivalence.py +
# test_differential_reference.py).
RE_DISPATCH = re.compile(
    r"<(?:([a-zA-Z][a-zA-Z0-9]*)>|/([a-zA-Z][a-zA-Z0-9]*)>|)")


def extract_fused(s: str, strip: bool = True, want_raw: bool = True,
                  raw_collapse: bool = False,
                  decode_entities: bool = False
                  ) -> Tuple[str, Optional[str], int, int]:
    """Returns (extracted_text, raw_html|None, n_nodes, n_errors).

    ``decode_entities=True`` (opt-in; default OFF keeps reference
    byte-equality) decodes HTML5 character references per text node in
    the EXTRACTED text only — raw_html stays verbatim, and rawtext
    (script/style) content is never decoded (the HTML5 tokenizer does
    not decode in rawtext states). Same semantics as
    serialize.to_text(decode_entities=True); equivalence is
    differentially tested (tests/test_fused_equivalence.py)."""
    n = len(s)
    i = 0
    pending: List[str] = []          # data-state text accumulator
    stack: List[str] = []            # open tag names (the node stack)
    n_nodes = 0
    n_errors = 0
    # to_text state
    txt: List[str] = []
    is_block = False
    strip_tags = DEFAULT_STRIP_TAGS if strip else None
    dec = _unescape if decode_entities else None
    # to_raw_html state
    raw: Optional[List[str]] = [] if want_raw else None

    def emit_text(content: str, in_rawtext: bool, suppressed: bool) -> None:
        """A text node entered the tree (non-empty by construction)."""
        nonlocal n_nodes, is_block
        n_nodes += 1
        if not suppressed:
            if is_block:
                if txt:
                    txt.append("\n")
                is_block = False
            if dec is not None and not in_rawtext and "&" in content:
                txt.append(dec(content))
            else:
                txt.append(content)
        if raw is not None:
            # not-isspace() short-circuits at C speed; the regex
            # fallback keeps \v-only runs (unicode-space but
            # reference-NONspace, constants.py) emitting correctly
            if not content.isspace() or RE_HAS_NONSPACE.search(content):
                raw.append(content if in_rawtext else collapse_spaces(content))

    def emit_open_raw(name: str, attrs: dict, selfc: bool) -> None:
        if raw is None:
            return
        if not attrs:
            raw.append(f"<{name} />" if selfc else f"<{name}>")
            return
        raw.append("<")
        raw.append(name)
        for k in sorted(attrs):
            raw.append(f' {k}="{attrs[k]}"')
        raw.append(" />" if selfc else ">")

    def text_block_open(name: str) -> None:
        nonlocal is_block
        if name == "br":
            txt.append("\n")
        if name not in INLINE_TAGS:
            is_block = True

    def text_block_close(name: str) -> None:
        nonlocal is_block
        if name not in INLINE_TAGS:
            is_block = True

    def flush_text() -> None:
        if pending:
            t = "".join(pending)
            pending.clear()
            if t:
                emit_text(t, False, False)

    def close_to(name: str, rawcontent: str, raw_suppressed: bool) -> None:
        """Implicit closure: pop to the matching ancestor (or drop)."""
        nonlocal n_errors, n_nodes, is_block
        if stack and stack[-1] == name:
            # well-nested fast path: no reverse copy, no pop loop
            if rawcontent:
                emit_text(rawcontent, True, raw_suppressed)
            if raw is not None:
                raw.append(f"</{name}>")
            if name not in INLINE_TAGS:
                is_block = True
            stack.pop()
            return
        try:
            j = len(stack) - 1 - stack[::-1].index(name)
        except ValueError:
            return  # unmatched close: dropped silently
        n_errors += len(stack) - 1 - j
        if rawcontent:
            emit_text(rawcontent, True, raw_suppressed)
        for k in range(len(stack) - 1, j - 1, -1):
            t = stack[k]
            if raw is not None:
                raw.append(f"</{t}>")
            text_block_close(t)
        del stack[j:]

    search = RE_DISPATCH.search
    # hot-set / hot-callable locals: the loop below touches these per
    # token, and LOAD_FAST beats LOAD_GLOBAL/LOAD_DEREF in the only
    # Python-level loop of the pipeline
    _void, _inline, _rawtags = VOID_TAGS, INLINE_TAGS, RAWTEXT_TAGS
    pend_append, txt_append = pending.append, txt.append
    while i < n:
        m = search(s, i)
        if m is None:
            pend_append(s[i:])
            break
        j, e = m.span()
        if j > i:
            pend_append(s[i:j])
        oname, cname = m.group(1, 2)
        if oname is not None:
            # fast path: no-attribute open tag <name>
            i = e
            if not oname.islower():
                oname = oname.lower()
            if pending:
                # inline flush (same as the scanner open path below)
                t = pending[0] if len(pending) == 1 else "".join(pending)
                pending.clear()
                if t:
                    n_nodes += 1
                    if is_block:
                        if txt:
                            txt.append("\n")
                        is_block = False
                    if dec is not None and "&" in t:
                        txt.append(dec(t))
                    else:
                        txt.append(t)
                    if raw is not None and (
                            not t.isspace()
                            or RE_HAS_NONSPACE.search(t)):
                        raw.append(collapse_spaces(t))
            n_nodes += 1
            effective_sc = oname in _void
            if raw is not None:
                raw.append(f"<{oname} />" if effective_sc
                           else f"<{oname}>")
            stripped = (strip_tags is not None and oname in strip_tags)
            if not stripped:
                if oname == "br":
                    txt_append("\n")
                if oname not in _inline:
                    is_block = True
            if effective_sc:
                continue
            if oname in _rawtags:
                parts: List[str] = []
                i, closed, _lk, _lat = _scan_rawtext(s, i, n, oname, parts)
                rawc = "".join(parts)
                if closed:
                    if rawc:
                        emit_text(rawc, True, stripped)
                    if raw is not None:
                        raw.append(f"</{oname}>")
                    if not stripped:
                        text_block_close(oname)
                else:
                    # EOF in rawtext: content flushed, closed at EOF
                    if rawc:
                        emit_text(rawc, True, stripped)
                    stack.append(oname)
                    break
            else:
                stack.append(oname)
            continue
        elif cname is not None:
            # fast path: simple close tag </name>
            i = e
            if not cname.islower():
                cname = cname.lower()
            if pending:
                flush_text()
            if stack and stack[-1] == cname:
                if raw is not None:
                    raw.append(f"</{cname}>")
                if cname not in _inline:
                    is_block = True
                stack.pop()
            else:
                close_to(cname, "", False)
            continue
        # bare '<': the verified scanner dispatch (attrs, comments,
        # doctype, bogus, odd names, truncation)
        i = j + 1
        if i >= n:
            break
        c = s[i]
        if ("a" <= c <= "z") or ("A" <= c <= "Z"):
            if pending:
                # inline flush_text/emit_text (hot path: data-state
                # text is never rawtext and never suppressed; chunk
                # count is almost always 1 — skip the join then)
                t = pending[0] if len(pending) == 1 else "".join(pending)
                pending.clear()
                if t:
                    n_nodes += 1
                    if is_block:
                        if txt:
                            txt.append("\n")
                        is_block = False
                    if dec is not None and "&" in t:
                        txt.append(dec(t))
                    else:
                        txt.append(t)
                    if raw is not None and (
                            not t.isspace()
                            or RE_HAS_NONSPACE.search(t)):
                        raw.append(collapse_spaces(t))
            res = _scan_tag(s, i, n)
            if res is None:
                break
            name, at, sc, i = res
            n_nodes += 1
            effective_sc = sc or name in VOID_TAGS
            if raw is not None:
                if at:
                    emit_open_raw(name, at, effective_sc)
                else:
                    raw.append(f"<{name} />" if effective_sc else f"<{name}>")
            stripped = (strip_tags is not None and name in strip_tags)
            if not stripped:
                # inline text_block_open
                if name == "br":
                    txt.append("\n")
                if name not in INLINE_TAGS:
                    is_block = True
            if effective_sc:
                if not stripped and name not in INLINE_TAGS:
                    is_block = True
                continue
            if name in RAWTEXT_TAGS:
                parts: List[str] = []
                i, closed, _lk, _lat = _scan_rawtext(s, i, n, name, parts)
                rawc = "".join(parts)
                if closed:
                    if rawc:
                        emit_text(rawc, True, stripped)
                    if raw is not None:
                        raw.append(f"</{name}>")
                    if not stripped:
                        text_block_close(name)
                else:
                    # EOF in rawtext: content flushed, tag closed at EOF
                    if rawc:
                        emit_text(rawc, True, stripped)
                    stack.append(name)
                    break
            else:
                stack.append(name)
        elif c == "/":
            k = i + 1
            if k >= n:
                break
            d = s[k]
            if ("a" <= d <= "z") or ("A" <= d <= "Z"):
                if pending:
                    flush_text()
                # fast path for the dominant '</name>' shape: skip the
                # attr machinery (and its dict) entirely. Semantics
                # identical to _scan_tag when the name terminator is
                # '>' (same RE_NAME_END, same guarded lowercasing).
                m = RE_NAME_END.search(s, k)
                if m is not None and s[m.start()] == ">":
                    name = s[k:m.start()]
                    if not (name.islower() and "\x00" not in name):
                        name = name.translate(LOWER_NUL_TABLE)
                    i = m.start() + 1
                else:
                    res = _scan_tag(s, k, n)
                    if res is None:
                        break
                    name, _at, _sc, i = res
                if stack and stack[-1] == name:
                    # inline close_to's well-nested fast path
                    if raw is not None:
                        raw.append(f"</{name}>")
                    if name not in INLINE_TAGS:
                        is_block = True
                    stack.pop()
                else:
                    close_to(name, "", False)
            elif d == ">":
                i = k + 1
            else:
                flush_text()
                cont, i, emitted = _scan_bogus(s, k, k, n)
                if emitted:
                    n_nodes += 1  # comment node
                    if raw is not None:
                        raw.append(f"<!--{cont}-->")
                elif cont:
                    emit_text(cont, False, False)
        elif c == "!":
            k = i + 1
            if k >= n:
                break
            if s.startswith("--", k):
                flush_text()
                cont, i, emitted = _scan_comment(s, k + 2, n)
                if emitted:
                    n_nodes += 1
                    if raw is not None:
                        raw.append(f"<!--{cont}-->")
                elif cont:
                    emit_text(cont, False, False)
            elif s[k:k + 7].lower() == "doctype":
                flush_text()
                cont, i, emitted = _scan_doctype(s, k + 7, n)
                if emitted:
                    n_nodes += 1
                    if raw is not None:
                        raw.append(f"<!DOCTYPE {cont}>")
                elif cont:
                    emit_text(cont, False, False)
            else:
                flush_text()
                cont, i, emitted = _scan_bogus(s, k, k + 1, n)
                if emitted:
                    n_nodes += 1
                    if raw is not None:
                        raw.append(f"<!--{cont}-->")
                elif cont:
                    emit_text(cont, False, False)
        elif c == "?":
            flush_text()
            cont, i, emitted = _scan_bogus(s, i, i, n)
            if emitted:
                n_nodes += 1
                if raw is not None:
                    raw.append(f"<!--{cont}-->")
            elif cont:
                emit_text(cont, False, False)
        else:
            pending.append("<")

    flush_text()
    # EOF: implicitly close everything still open (serializers close,
    # no error records — html.cpp:1008-1010)
    if raw is not None:
        for t in reversed(stack):
            raw.append(f"</{t}>")
    text = "".join(txt)
    if raw_collapse:
        text = collapse_spaces(text)
    return text, ("".join(raw) if raw is not None else None), n_nodes, n_errors
