"""DOM-heuristic main-content scoring (boilerpipe / readability
family, public heuristics: Kohlschütter et al., WWW 2010).

The reference parser (html.cpp:449-489) extracts ALL text; its
boilerplate handling stops at dropping script/style subtrees. A
web-scale extraction tier additionally needs the classic DOM
heuristics pass — classify block-level elements by link density and
text mass, keep article-like blocks, drop navigation chrome — which
is what this module adds on top of the ported kernel.

Design for exact engine-replayability (the DuckDB oracle): every
decision is integer arithmetic —

- candidate blocks: TAG nodes whose tag is in ``BLOCK_TAGS``, not
  inside a ``drop_tags`` subtree (nav/header/footer/aside + the
  script/style strip set), with NO candidate block descendant
  (innermost blocks only, so no text is counted twice);
- ``text_chars``: total characters of text nodes in the block's
  subtree (verbatim, matching ``to_text`` which never rewrites
  bytes);
- ``anchor_chars``: the subset of those characters with an ``<a>``
  ancestor;
- keep rule: ``text_chars >= min_text_len`` AND
  ``100 * anchor_chars <= link_density_pct * text_chars``
  (integer cross-multiplication, no floats).

All passes are O(n) over the flat pre-order arrays of ``Doc``
(parents precede children, so ancestor state propagates forward and
subtree sums accumulate in one reverse sweep).
"""

from __future__ import annotations

from typing import FrozenSet, List, Optional, Tuple

from .constants import KIND_TAG, KIND_TEXT
from .parse import Doc
from .serialize import DEFAULT_STRIP_TAGS, to_text

__all__ = [
    "BLOCK_TAGS",
    "CHROME_TAGS",
    "score_blocks",
    "main_content",
]

# Block-level candidates: the elements a readability pass scores.
BLOCK_TAGS: FrozenSet[str] = frozenset((
    "p", "div", "li", "td", "th", "blockquote", "pre", "article",
    "section", "main", "h1", "h2", "h3", "h4", "h5", "h6", "dd", "dt",
))

# Page chrome whose subtrees are boilerplate regardless of density.
CHROME_TAGS: FrozenSet[str] = frozenset((
    "nav", "header", "footer", "aside",
))


def score_blocks(
    doc: Doc,
    min_text_len: int = 20,
    link_density_pct: int = 33,
    drop_tags: Optional[FrozenSet[str]] = None,
) -> List[Tuple[int, str, int, int, bool]]:
    """Score innermost block elements of a parsed ``Doc``.

    Returns ``[(node_id, tag, text_chars, anchor_chars, kept)]`` in
    document (pre-order) order. ``drop_tags`` defaults to
    ``CHROME_TAGS | DEFAULT_STRIP_TAGS``.
    """
    if drop_tags is None:
        drop_tags = CHROME_TAGS | DEFAULT_STRIP_TAGS
    n = len(doc)
    kind = doc.kind
    tag = doc.tag
    content = doc.content
    parent = doc.parent

    dropped = [False] * n   # inside a drop_tags subtree (incl. the tag)
    under_a = [False] * n   # has an <a> ancestor (or is one)
    sub_text = [0] * n      # text chars in subtree (dropped excluded)
    sub_anchor = [0] * n    # ... of which under an <a>
    has_cand_desc = [False] * n

    # forward: ancestor state (parents precede children in pre-order)
    for nid in range(n):
        p = parent[nid]
        pd = dropped[p] if p >= 0 else False
        pa = under_a[p] if p >= 0 else False
        if kind[nid] == KIND_TAG:
            t = tag[nid]
            dropped[nid] = pd or t in drop_tags
            under_a[nid] = pa or t == "a"
        else:
            dropped[nid] = pd
            under_a[nid] = pa

    # reverse: subtree sums + innermost-candidate marking
    for nid in range(n - 1, -1, -1):
        if kind[nid] == KIND_TEXT and not dropped[nid]:
            c = len(content[nid])
            sub_text[nid] += c
            if under_a[nid]:
                sub_anchor[nid] += c
        p = parent[nid]
        if p >= 0:
            sub_text[p] += sub_text[nid]
            sub_anchor[p] += sub_anchor[nid]
            if has_cand_desc[nid] or (
                    kind[nid] == KIND_TAG and not dropped[nid]
                    and tag[nid] in BLOCK_TAGS):
                has_cand_desc[p] = True

    out: List[Tuple[int, str, int, int, bool]] = []
    for nid in range(n):
        if (kind[nid] != KIND_TAG or dropped[nid]
                or tag[nid] not in BLOCK_TAGS or has_cand_desc[nid]):
            continue
        tc, ac = sub_text[nid], sub_anchor[nid]
        kept = tc >= min_text_len and 100 * ac <= link_density_pct * tc
        out.append((nid, tag[nid], tc, ac, kept))
    return out


def main_content(
    doc: Doc,
    min_text_len: int = 20,
    link_density_pct: int = 33,
    drop_tags: Optional[FrozenSet[str]] = None,
    decode_entities: bool = False,
) -> Tuple[str, int, int]:
    """Concatenated text of kept blocks (document order, '\\n'-joined)
    plus ``(n_kept, n_candidates)``. Block text uses the reference
    ``to_text`` serialization (verbatim bytes, block '\\n' rules)."""
    blocks = score_blocks(doc, min_text_len=min_text_len,
                          link_density_pct=link_density_pct,
                          drop_tags=drop_tags)
    parts = [
        to_text(doc, node_id=nid, skip_tags=DEFAULT_STRIP_TAGS,
                decode_entities=decode_entities)
        for nid, _t, _tc, _ac, kept in blocks if kept
    ]
    return "\n".join(parts), sum(1 for b in blocks if b[4]), len(blocks)
