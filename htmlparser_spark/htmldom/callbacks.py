"""Parse-time callback API (reference EP3: html.cpp:539-573).

``CallbackParser`` reproduces the reference parser's live-tree
callback surface: node callbacks (optionally guarded by a selector),
error callbacks, registration-order dispatch, and the pinned
first-matcher-only quirk (a selector-guarded callback fires only when
the selector has exactly ONE matcher and it matches — html.cpp:545-549
advances one matcher then requires exhaustion).

Semantics are event-replay: ``parse(s, events=...)`` records the exact
handle order (open tags at open time, text/comment/doctype at insert,
matched close tags after their tag_not_closed errors), and dispatch
replays it. Replay is observationally identical to firing mid-parse —
including mid-parse ``:last`` (the live sibling count is recorded per
event) — with one documented exception: callbacks see the COMPLETED
document, so a callback that walks the tree below its node sees
children the reference's mid-parse callback would not yet see. The
reference's own tests only read the callback node itself, where the
two are indistinguishable.

Close-tag events dispatch against the transient close node exactly
like the reference: a tag-kind view carrying the close tag's parsed
name/attrs, index 0 (html.hpp:112 default — close nodes never get an
index assigned), and the allocation-time parent for ``:last``.
Rawtext close tags (``</script foo=1>``) carry their parsed attrs
like any other close tag (the reference parses them into the
transient node via before_attribute_name, html.cpp:745-747).

Two EOF/degenerate corners pinned by the callback differential fuzz:

- a selector that compiles to ZERO matchers (e.g. a NUL byte kills
  the only matcher mid-compile) is falsy in the reference's dispatch
  (``if(!c.first)``, html.cpp:541), making the callback
  UNCONDITIONAL — ``Selector.match_first`` reproduces this;
- the EOF flush (html.cpp:1008-1010) reuses the pending node, so a
  rawtext document truncated mid ``</clos...`` flushes a TEXT node
  that still carries the partial close-tag name and any committed
  attrs; ``parse`` stores them on the Doc row, where unconditional
  callbacks (and nothing else — the matcher rejects non-tag nodes)
  can observe them.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

from .constants import KIND_TAG
from .parse import Doc, parse
from .selector import Selector

__all__ = ["CallbackParser", "CloseNode"]


class CloseNode:
    """Doc-shaped single-node view of a transient close-tag node, so
    ``Matcher.match(view, 0)`` evaluates conditions against it the way
    the reference evaluates them against the close node."""

    __slots__ = ("kind", "tag", "attrs", "tag_index", "parent", "_live")

    def __init__(self, name: str, attrs, pid: int, live: int) -> None:
        self.kind = [KIND_TAG]
        self.tag = [name]
        self.attrs = [attrs]
        self.tag_index = [0]          # close nodes keep the default index
        self.parent = [pid]
        self._live = live

    def node_count_of(self, nid: int) -> int:
        return self._live


class _LiveCountView:
    """Doc proxy whose node_count_of returns the recorded AT-EVENT
    count — mid-parse ``:last`` sees the count so far, not the final
    one (an open tag is always its parent's last child at open time)."""

    __slots__ = ("_doc", "kind", "tag", "attrs", "tag_index", "parent",
                 "_live")

    def __init__(self, doc: Doc, live: int) -> None:
        self._doc = doc
        self.kind = doc.kind
        self.tag = doc.tag
        self.attrs = doc.attrs
        self.tag_index = doc.tag_index
        self.parent = doc.parent
        self._live = live

    def node_count_of(self, nid: int) -> int:
        return self._live


class CallbackParser:
    """Reference ``parser`` API: register callbacks, then ``parse``.

    - ``set_callback(cb)`` — unconditional node callback, fires for
      every handled node (html.cpp:555-558);
    - ``set_callback(selector, cb)`` — selector-guarded, subject to
      the first-matcher-only quirk (html.cpp:560-563);
    - ``set_err_callback(cb)`` — tag_not_closed errors
      (html.cpp:565-568);
    - ``clear_callbacks()`` (html.cpp:570-573).

    Node callbacks receive ``(doc_or_view, nid)`` — for tree nodes the
    completed ``Doc`` and a node id; for close-tag events a
    ``CloseNode`` view and 0. Error callbacks receive
    ``("tag_not_closed", doc, nid)``.
    """

    def __init__(self) -> None:
        self._node_cbs: List[Tuple[Optional[Selector], Callable]] = []
        self._err_cbs: List[Callable] = []

    def set_callback(self, sel_or_cb, cb: Optional[Callable] = None
                     ) -> "CallbackParser":
        if cb is None:
            self._node_cbs.append((None, sel_or_cb))
        else:
            sel = sel_or_cb if isinstance(sel_or_cb, Selector) \
                else Selector(sel_or_cb)
            self._node_cbs.append((sel, cb))
        return self

    def set_err_callback(self, cb: Callable) -> "CallbackParser":
        self._err_cbs.append(cb)
        return self

    def clear_callbacks(self) -> "CallbackParser":
        self._node_cbs.clear()
        self._err_cbs.clear()
        return self

    def parse(self, s: str) -> Doc:
        """Parse and dispatch callbacks in the reference's handle
        order; returns the completed Doc."""
        events: list = []
        doc = parse(s, events=events)
        for ev in events:
            if ev[0] == "node":
                _, nid, live = ev
                view = None
                for sel, cb in self._node_cbs:
                    if sel is None:
                        cb(doc, nid)
                        continue
                    if view is None:
                        view = _LiveCountView(doc, live)
                    if sel.match_first(view, nid):
                        cb(doc, nid)
            elif ev[0] == "close":
                _, name, attrs, pid, live = ev
                view = CloseNode(name, attrs, pid, live)
                for sel, cb in self._node_cbs:
                    if sel is None or sel.match_first(view, 0):
                        cb(view, 0)
            else:  # ("err", nid)
                _, nid = ev
                for cb in self._err_cbs:
                    cb("tag_not_closed", doc, nid)
        return doc
