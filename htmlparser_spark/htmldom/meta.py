"""Page-level metadata extraction over the flat ``Doc`` arrays.

The crawl-side sibling of content.py: training pipelines key corpus
decisions (URL canonicalization, index/noindex gating, language
routing, provenance) on document metadata long before they look at
body text. Not a reference behavior (the reference has no metadata
walker); tag/attr semantics come from the reference parser (attr keys
lowercased at tokenize time, values verbatim — html.cpp:647-1007),
title text reuses serialize.to_text (html.cpp:449-489 parity).

Semantics (all "first in document order wins", matching the
reference's first-matcher callback quirk and the browsers' effective
behavior for these fields):

- ``title``      — text of the first ``<title>`` element,
  whitespace-collapsed + stripped
- ``base_href``  — href of the first ``<base href>``
- ``canonical_url`` — href of the first ``<link rel="canonical">``
  (rel compared case-insensitively, whole-token match on the
  space-separated rel list)
- ``meta_description`` / ``meta_robots`` — content of the first
  ``<meta name="...">`` (name compared case-insensitively)
- ``robots_noindex`` — True iff the robots content contains the
  ``noindex`` token (comma/space separated, case-insensitive);
  False when no robots meta exists
- ``og_title`` / ``og_url`` — content of the first
  ``<meta property="og:...">``
- ``lang``       — lang attr of the first ``<html>`` element
- ``charset``    — first ``<meta charset>``, else the charset= param
  of the first ``<meta http-equiv="content-type">`` content

Missing fields are None. Single linear scan of the node arrays —
no tree walk needed because "first in document order" is exactly
node-id order in the flat layout.
"""

from __future__ import annotations

import re
from typing import Optional

from .constants import KIND_TAG
from .parse import Doc
from .serialize import to_text

__all__ = ["extract_page_meta", "META_FIELDS"]

META_FIELDS = (
    "title", "base_href", "canonical_url", "meta_description",
    "meta_robots", "robots_noindex", "og_title", "og_url", "lang",
    "charset",
)

_ROBOTS_SPLIT = re.compile(r"[,\s]+")
_CHARSET_PARAM = re.compile(r"charset\s*=\s*([^\s;]+)", re.IGNORECASE)


def _rel_has(rel: Optional[str], token: str) -> bool:
    return token in (rel or "").lower().split()


def extract_page_meta(doc: Doc) -> dict:
    """First-wins metadata fields (see module docstring); a dict with
    exactly the ``META_FIELDS`` keys, absent fields None."""
    out = dict.fromkeys(META_FIELDS)
    out["robots_noindex"] = False
    kind = doc.kind
    tag = doc.tag
    attrs = doc.attrs
    for nid in range(len(doc)):
        if kind[nid] != KIND_TAG:
            continue
        t = tag[nid]
        a = attrs[nid]
        if t == "title":
            if out["title"] is None:
                out["title"] = to_text(doc, raw=True, node_id=nid).strip()
        elif t == "base":
            if out["base_href"] is None and a and "href" in a:
                out["base_href"] = a["href"]
        elif t == "link":
            if (out["canonical_url"] is None and a
                    and _rel_has(a.get("rel"), "canonical")
                    and "href" in a):
                out["canonical_url"] = a["href"]
        elif t == "meta" and a:
            name = (a.get("name") or "").lower()
            prop = (a.get("property") or "").lower()
            content = a.get("content")
            if name == "description" and content is not None:
                if out["meta_description"] is None:
                    out["meta_description"] = content
            elif name == "robots" and content is not None:
                if out["meta_robots"] is None:
                    out["meta_robots"] = content
                    out["robots_noindex"] = (
                        "noindex" in
                        (s.lower() for s in _ROBOTS_SPLIT.split(content)))
            elif prop == "og:title" and content is not None:
                if out["og_title"] is None:
                    out["og_title"] = content
            elif prop == "og:url" and content is not None:
                if out["og_url"] is None:
                    out["og_url"] = content
            if out["charset"] is None:
                if "charset" in a:
                    out["charset"] = a["charset"]
                elif ((a.get("http-equiv") or "").lower()
                      == "content-type" and content):
                    m = _CHARSET_PARAM.search(content)
                    if m:
                        out["charset"] = m.group(1)
        elif t == "html":
            if out["lang"] is None and a and "lang" in a:
                out["lang"] = a["lang"]
    return out
