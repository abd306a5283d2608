"""HTML table extraction over the flat ``Doc`` arrays.

The layout-parse sibling of markdown.py: web pages carry a large
fraction of their factual content in ``<table>`` markup, and training
pipelines want it as structured (table, row, column, cell-text) rows
rather than flattened prose. Not a reference behavior (the reference
has no table walker); the cell-text semantics reuse serialize.to_text
(html.cpp:449-489 parity) on the cell subtree.

Semantics:

- every ``<table>`` element yields one table, numbered in document
  order (nested tables get their own number; a nested table's cells
  are NOT double-reported under the outer table)
- rows are ``<tr>`` descendants of the table reached without crossing
  another ``table``; section wrappers (thead/tbody/tfoot) are
  transparent, per the HTML table model
- cells are ``<td>``/``<th>`` children of a row (again transparent
  to non-cell wrappers), numbered left to right; ``is_header`` marks
  ``<th>``
- cell text = serialize.to_text of the cell subtree with the
  boilerplate strip (script/style dropped), whitespace-collapsed via
  ``raw=True`` and stripped — a stable scalar for downstream SQL

Iterative walks only (explicit stacks) — adversarial nesting depth
cannot blow the recursion limit.
"""

from __future__ import annotations

from typing import List, Tuple

from .constants import KIND_TAG
from .parse import Doc
from .serialize import DEFAULT_STRIP_TAGS, to_text

__all__ = ["extract_tables"]

_SECTION = frozenset(("thead", "tbody", "tfoot"))
_CELL = frozenset(("td", "th"))

Cell = Tuple[int, int, int, bool, str]  # table, row, col, is_header, text


def _table_rows(doc: Doc, table_id: int) -> List[int]:
    """tr descendants reachable without crossing a nested table."""
    kind = doc.kind
    tag = doc.tag
    rows: List[int] = []
    stack = list(reversed(doc.children[table_id]))
    while stack:
        nid = stack.pop()
        if kind[nid] != KIND_TAG:
            continue
        t = tag[nid]
        if t == "tr":
            rows.append(nid)
        elif t != "table":  # transparent wrappers; stop at nested tables
            for c in reversed(doc.children[nid]):
                stack.append(c)
    return rows


def _row_cells(doc: Doc, tr_id: int) -> List[int]:
    kind = doc.kind
    tag = doc.tag
    cells: List[int] = []
    stack = list(reversed(doc.children[tr_id]))
    while stack:
        nid = stack.pop()
        if kind[nid] != KIND_TAG:
            continue
        t = tag[nid]
        if t in _CELL:
            cells.append(nid)
        elif t not in ("table", "tr"):
            for c in reversed(doc.children[nid]):
                stack.append(c)
    return cells


def extract_tables(doc: Doc) -> List[Cell]:
    """All cells of all tables in document order (see module
    docstring for numbering and text semantics)."""
    out: List[Cell] = []
    kind = doc.kind
    tag = doc.tag
    t_idx = 0
    for nid in range(len(doc)):
        if kind[nid] != KIND_TAG or tag[nid] != "table":
            continue
        for r_idx, tr in enumerate(_table_rows(doc, nid)):
            for c_idx, cell in enumerate(_row_cells(doc, tr)):
                txt = to_text(doc, raw=True, node_id=cell,
                              skip_tags=DEFAULT_STRIP_TAGS).strip()
                out.append((t_idx, r_idx, c_idx,
                            tag[cell] == "th", txt))
        t_idx += 1
    return out
