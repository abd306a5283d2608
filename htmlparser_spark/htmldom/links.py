"""Hyperlink extraction over the flat ``Doc`` arrays.

Feeds the web-graph side of a crawl pipeline: per-page outlink rows
(href, anchor text, nofollow bit) are the input to URL frontier
dedup, anchor-text indexing, and PageRank. Not a reference behavior;
anchor-text semantics reuse serialize.to_text (html.cpp:449-489
parity) on the ``<a>`` subtree, attr semantics come from the
reference tokenizer (keys lowercased, values verbatim).

Semantics:

- one row per ``<a>`` element that carries an ``href`` attribute,
  numbered in document order (anchors without href are navigation
  noise and are skipped)
- nested anchors (invalid HTML the parser nevertheless represents)
  each get their own row; the outer anchor's text includes the
  inner's, exactly like to_text of the subtree
- ``anchor_text`` = to_text(raw=True) of the subtree, stripped
- ``nofollow`` = whole-token match on the space-separated rel list,
  case-insensitive
- absolute resolution (``resolve_against``) uses stdlib
  ``urllib.parse.urljoin`` (RFC 3986); empty href resolves to the
  base itself, fragment-only hrefs to base+fragment — both kept,
  the caller filters
"""

from __future__ import annotations

from typing import List, Optional, Tuple
from urllib.parse import urljoin

from .constants import KIND_TAG
from .parse import Doc
from .serialize import to_text

__all__ = ["extract_links"]

Link = Tuple[int, str, Optional[str], str, bool]
# link_idx, href_raw, href_abs, anchor_text, nofollow


def extract_links(doc: Doc,
                  resolve_against: Optional[str] = None) -> List[Link]:
    """All href-bearing anchors in document order (module docstring
    for numbering/text/nofollow semantics). ``href_abs`` is None when
    no base is supplied."""
    out: List[Link] = []
    kind = doc.kind
    tag = doc.tag
    attrs = doc.attrs
    idx = 0
    for nid in range(len(doc)):
        if kind[nid] != KIND_TAG or tag[nid] != "a":
            continue
        a = attrs[nid]
        if not a or "href" not in a:
            continue
        href = a["href"]
        absu = urljoin(resolve_against, href) if resolve_against else None
        text = to_text(doc, raw=True, node_id=nid).strip()
        nofollow = "nofollow" in (a.get("rel") or "").lower().split()
        out.append((idx, href, absu, text, nofollow))
        idx += 1
    return out
