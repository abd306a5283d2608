"""HTML → Markdown serializer over the flat ``Doc`` arrays.

The extraction tier's structured-output surface: where ``to_text``
(serialize.py, html.cpp:449-489 semantics) flattens a page to plain
text, ``to_markdown`` preserves the document structure LLM training
pipelines want to keep — headings, lists, links, emphasis, code
blocks — as CommonMark-style markdown. This is NOT a reference
behavior (the reference has no markdown serializer); it follows the
public CommonMark element mapping.

Deterministic, documented mapping:

- ``h1``-``h6`` → ``#``·level + inner (stripped) + blank line
- ``p``         → inner (stripped) + blank line ('' when empty)
- ``br``        → newline; ``hr`` → ``---`` + blank line
- ``ul``/``ol`` → one ``- `` / ``N. `` line per ``li`` child (other
  children of a list are dropped, as in HTML parsing); nested lists
  indent two spaces under their parent item
- ``a``         → ``[inner](href)``; ``img`` → ``![alt](src)``
- ``strong``/``b`` → ``**inner**``; ``em``/``i`` → ``*inner*``
  (empty inner renders nothing)
- ``code``      → `` `inner` ``, except verbatim when the direct
  parent is ``pre``; ``pre`` → fenced block
- ``blockquote``→ ``> `` per line + blank line
- ``script``/``style``/comments/doctypes → dropped (boilerplate)
- other inline tags (span, small, …) are transparent; other block
  tags are transparent containers whose non-empty inner is
  terminated with a blank line

Text node content is emitted verbatim (``decode_entities=True``
opt-in decodes WHATWG character references per text node, same
contract as serialize.to_text). Output is normalized: runs of 3+
newlines collapse to one blank line, leading/trailing whitespace is
stripped.

Implementation: one bottom-up pass over the flat pre-order arrays —
children always have larger node ids than their parent, so a single
reverse-id loop assembles every node from its already-rendered
children. No recursion (depth-proof for adversarial web input, like
every serializer in this package), O(n) time and memory.
"""

from __future__ import annotations

import re
from html import unescape as _unescape

from .constants import INLINE_TAGS, KIND_TAG, KIND_TEXT
from .parse import Doc

__all__ = ["to_markdown"]

_BLOCK_NL = "\n\n"
_HEADINGS = {f"h{i}": i for i in range(1, 7)}
_WRAP = {"strong": "**", "b": "**", "em": "*", "i": "*"}
_DROP = frozenset(("script", "style"))
_RE_NL3 = re.compile(r"\n{3,}")


def _indent_sublist(s: str) -> str:
    return "\n".join("  " + ln for ln in s.rstrip("\n").split("\n"))


def to_markdown(doc: Doc, decode_entities: bool = False) -> str:
    """Render the whole document to markdown (see module docstring
    for the element mapping)."""
    kind = doc.kind
    tag = doc.tag
    content = doc.content
    attrs = doc.attrs
    children = doc.children
    parent = doc.parent
    n = len(doc)
    rendered = [""] * n

    for nid in range(n - 1, -1, -1):
        k = kind[nid]
        if k == KIND_TEXT:
            c = content[nid]
            if decode_entities and "&" in c:
                p = parent[nid]
                if p < 0 or tag[p] not in _DROP:
                    c = _unescape(c)
            rendered[nid] = c
            continue
        if k != KIND_TAG:
            continue  # comments / doctypes render nothing
        t = tag[nid]
        if t in _DROP:
            continue
        ch = children[nid]

        if t in ("ul", "ol"):
            items = []
            i = 1
            for c in ch:
                if kind[c] == KIND_TAG and tag[c] == "li":
                    prefix = "- " if t == "ul" else f"{i}. "
                    i += 1
                    items.append(prefix + rendered[c])
            rendered[nid] = ("\n".join(items) + _BLOCK_NL) if items else ""
            continue
        if t == "li":
            parts = []
            for c in ch:
                if kind[c] == KIND_TAG and tag[c] in ("ul", "ol"):
                    sub = rendered[c]
                    if sub:
                        parts.append("\n" + _indent_sublist(sub))
                else:
                    parts.append(rendered[c])
            rendered[nid] = "".join(parts).strip()
            continue

        inner = "".join(rendered[c] for c in ch)
        if t in _HEADINGS:
            rendered[nid] = ("#" * _HEADINGS[t] + " " + inner.strip()
                             + _BLOCK_NL)
        elif t == "p":
            s = inner.strip()
            rendered[nid] = s + _BLOCK_NL if s else ""
        elif t == "br":
            rendered[nid] = "\n"
        elif t == "hr":
            rendered[nid] = "---" + _BLOCK_NL
        elif t == "a":
            href = (attrs[nid] or {}).get("href", "")
            rendered[nid] = f"[{inner}]({href})"
        elif t == "img":
            a = attrs[nid] or {}
            rendered[nid] = f"![{a.get('alt', '')}]({a.get('src', '')})"
        elif t in _WRAP:
            w = _WRAP[t]
            rendered[nid] = f"{w}{inner}{w}" if inner else ""
        elif t == "code":
            p = parent[nid]
            if p >= 0 and kind[p] == KIND_TAG and tag[p] == "pre":
                rendered[nid] = inner
            else:
                rendered[nid] = f"`{inner}`"
        elif t == "pre":
            rendered[nid] = ("```\n" + inner.rstrip("\n") + "\n```"
                             + _BLOCK_NL)
        elif t == "blockquote":
            body = inner.strip()
            if body:
                rendered[nid] = "\n".join(
                    ("> " + ln) if ln else ">"
                    for ln in body.split("\n")) + _BLOCK_NL
            else:
                rendered[nid] = ""
        elif t in INLINE_TAGS:
            rendered[nid] = inner
        else:
            # transparent block container: terminate non-empty inner
            if inner and not inner.endswith(_BLOCK_NL):
                inner += _BLOCK_NL
            rendered[nid] = inner

    md = "".join(rendered[c] for c in doc.root_children)
    return _RE_NL3.sub(_BLOCK_NL, md).strip()
