"""Bulk-scan HTML tokenizer + node-stack tree builder.

Reproduces the 26-state WHATWG-style tokenizer and implicit-closure tree
builder of the reference (mylogin/htmlparser /root/reference/html.cpp:
637-1011 tokenizer, 575-627 tree builder) *semantically*, but with a
different execution strategy suited to Python: instead of a per-char
state loop it jumps between structural positions with ``str.find`` /
compiled-regex scans, so the cost per document is proportional to the
number of tokens, not the number of characters processed one at a time.

Output is a flat **pre-order node array** (parallel lists) — the native
format for the Spark/Arrow boundary — rather than a pointer tree.

Quirks reproduced on purpose (verified against the compiled reference):

- no character-reference (entity) decoding anywhere;
- duplicate attribute names concatenate their values;
- NUL -> '_' in tag/attr names, attr values, comments, doctypes and
  rawtext, but kept raw in data-state text;
- ``<!--a-b-->`` parses to comment ``a-`` (comment_start_dash and
  comment_end_dash consume-and-drop the following char — html.cpp:
  936-963 has no reconsume on those branches);
- EOF mid-comment/doctype/bogus-comment emits the accumulated payload
  as a *text* node (the EOF flush at html.cpp:1008-1010 forces
  ``type_node = text``); EOF mid-tag drops the tag entirely;
- unmatched close tags are dropped silently; implicit closure fires one
  ``tag_not_closed`` error per skipped ancestor, but EOF never does;
- rawtext content is attached as a single text child when the matching
  close tag (or EOF) arrives; a non-matching ``</name`` is re-emitted
  into the content *lowercased*.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .constants import (
    KIND_COMMENT,
    KIND_DOCTYPE,
    KIND_TAG,
    KIND_TEXT,
    LOWER_NUL_TABLE,
    NUL_TABLE,
    RAWTEXT_TAGS,
    RE_ATTRNAME_END,
    RE_FAST_ATTR,
    RE_FAST_ATTRS_TAIL,
    RE_NAME_END,
    RE_NONSPACE,
    RE_RAWNAME,
    RE_UNQUOTED_END,
    VOID_TAGS,
)

__all__ = ["Doc", "parse"]


class Doc:
    """Flat pre-order DOM: parallel lists indexed by node id.

    ``parent[i] == -1`` means the (implicit) root. ``children`` holds
    child ids in document order; ``root_children`` are the root's.
    ``tag_index`` counts *tag* siblings only (reference ``node::index``);
    ``n_tag_children`` is the reference ``node_count``.
    """

    __slots__ = (
        "kind", "tag", "content", "attrs", "self_closing",
        "parent", "depth", "tag_index", "n_tag_children",
        "children", "root_children", "root_tag_count", "errors",
    )

    def __init__(self) -> None:
        self.kind: List[int] = []
        self.tag: List[str] = []
        self.content: List[str] = []
        self.attrs: List[Optional[dict]] = []
        self.self_closing: List[bool] = []
        self.parent: List[int] = []
        self.depth: List[int] = []
        self.tag_index: List[int] = []
        self.n_tag_children: List[int] = []
        self.children: List[List[int]] = []
        self.root_children: List[int] = []
        self.root_tag_count: int = 0
        # (node_id, tag_name, path-from-root "div p a")
        self.errors: List[Tuple[int, str, str]] = []

    def __len__(self) -> int:
        return len(self.kind)

    def node_count_of(self, nid: int) -> int:
        """Reference ``node_count`` of a node (or the root for -1)."""
        if nid < 0:
            return self.root_tag_count
        return self.n_tag_children[nid]


_SPACE_SLASH_GT = " \t\n\f\r/>"


def _scan_value(s: str, i: int, n: int, attrs: dict, k: str) -> Tuple[int, int]:
    """States before_attribute_value..after_attribute_value_quoted.

    Returns ``(res, next_i)`` with res 0=EOF (drop tag), 1=continue in
    before_attribute_name, 2=tag emitted ('>' consumed).
    """
    m = RE_NONSPACE.search(s, i)
    if m is None:
        return 0, n
    i = m.start()
    c = s[i]
    if c == ">":
        return 2, i + 1
    if c == '"' or c == "'":
        j = s.find(c, i + 1)
        if j < 0:
            # EOF mid-value: the reference appends value chars one at a
            # time (html.cpp:841-857), so the partial value IS in the
            # attribute map when the EOF flush reuses the node. Commit
            # it — observable only through the rawtext EOF-leak path
            # (every other EOF caller discards the dict).
            v = s[i + 1:]
            if "\x00" in v:
                v = v.translate(NUL_TABLE)
            attrs[k] = attrs.get(k, "") + v
            return 0, n
        v = s[i + 1:j]
        if "\x00" in v:
            v = v.translate(NUL_TABLE)
        attrs[k] = attrs.get(k, "") + v
        # after_attribute_value_quoted (html.cpp:871-883)
        j += 1
        if j >= n:
            return 0, n
        d = s[j]
        if d == ">":
            return 2, j + 1
        if d == "/":
            j += 1
            if j >= n:
                return 0, n
            if s[j] == ">":
                # self-closing: signal via special res? handled by caller
                # needing the flag — encode by returning emitted with flag.
                return 3, j + 1
            return 1, j  # reconsume in before_attribute_name
        # space consumed or anything-else reconsumed: before_attribute_name
        # handles both identically (it skips spaces first).
        return 1, j if d not in " \t\n\f\r" else j + 1
    # unquoted value
    m2 = RE_UNQUOTED_END.search(s, i)
    if m2 is None:
        v = s[i:]  # EOF mid-value: committed per char in the reference
        if "\x00" in v:
            v = v.translate(NUL_TABLE)
        attrs[k] = attrs.get(k, "") + v
        return 0, n
    v = s[i:m2.start()]
    if "\x00" in v:
        v = v.translate(NUL_TABLE)
    attrs[k] = attrs.get(k, "") + v
    j = m2.start()
    if s[j] == ">":
        return 2, j + 1
    return 1, j + 1  # space: before_attribute_name


def _scan_tag(s: str, i: int, n: int):
    """Tag name + attributes starting at the first name char.

    Returns ``(name, attrs, self_closing, next_i)`` or None on EOF
    (tag dropped). Covers reference state tag_name (html.cpp:704-719)
    plus the attribute states via _scan_attrs.

    Fast path: when the name terminator is whitespace (attributes may
    follow), RE_FAST_ATTRS_TAIL consumes the whole well-formed
    attribute tail in one regex step; its classes are constructed so
    that every input it accepts gets the IDENTICAL result from the
    state machinery below (see constants.py), and anything
    quirk-adjacent (NULs, '= v' spacing, '/'-separated attrs,
    unterminated quotes) fails the match and takes the exact slow
    path. Bare tags keep the original single-search path.
    """
    m = RE_NAME_END.search(s, i)
    if m is None:
        return None
    name = s[i:m.start()]
    if not (name.islower() and "\x00" not in name):
        name = name.translate(LOWER_NUL_TABLE)
    i = m.start()
    c = s[i]
    attrs: dict = {}
    if c == ">":
        return name, attrs, False, i + 1
    if c == "/":
        i += 1
        if i >= n:
            return None
        if s[i] == ">":
            return name, attrs, True, i + 1
        emitted, i, sc = _scan_attrs(s, i, n, attrs)
    else:
        fm = RE_FAST_ATTRS_TAIL.match(s, i)
        if fm is not None:
            astr = fm.group(1)
            if astr:
                for am in RE_FAST_ATTR.finditer(astr):
                    k = am.group(1)
                    if not k.islower():
                        k = k.translate(LOWER_NUL_TABLE)
                    v = am.group(2)
                    if v is None:
                        v = am.group(3)
                        if v is None:
                            v = am.group(4)
                    if v is None:
                        attrs.setdefault(k, "")
                    elif k in attrs:
                        attrs[k] += v
                    else:
                        attrs[k] = v
            return name, attrs, fm.group(2) == "/", fm.end()
        emitted, i, sc = _scan_attrs(s, i + 1, n, attrs)
    if not emitted:
        return None
    return name, attrs, sc, i


def _scan_attrs(s: str, i: int, n: int, attrs: dict):
    """Wrapper translating _scan_value's res==3 (self-closing after a
    quoted value, e.g. ``<a b="c"/>``) into the self_closing flag."""
    k = ""
    after_name = False
    while True:
        m = RE_NONSPACE.search(s, i)
        if m is None:
            return False, n, False
        i = m.start()
        c = s[i]
        if c == ">":
            return True, i + 1, False
        if c == "/":
            i += 1
            if i >= n:
                return False, n, False
            if s[i] == ">":
                return True, i + 1, True
            after_name = False
            continue
        if after_name and c == "=":
            i += 1
            res, i = _scan_value(s, i, n, attrs, k)
            if res == 0:
                return False, n, False
            if res == 2:
                return True, i, False
            if res == 3:
                return True, i, True
            after_name = False
            continue
        if not after_name and c == "=":
            k = "="
            i += 1
        else:
            k = ""
        m2 = RE_ATTRNAME_END.search(s, i)
        if m2 is None:
            return False, n, False
        an = s[i:m2.start()]
        if not (an.islower() and "\x00" not in an):
            an = an.translate(LOWER_NUL_TABLE)
        k += an
        i = m2.start()
        c = s[i]
        if c == "=":
            attrs.setdefault(k, "")
            i += 1
            res, i = _scan_value(s, i, n, attrs, k)
            if res == 0:
                return False, n, False
            if res == 2:
                return True, i, False
            if res == 3:
                return True, i, True
            after_name = False
            continue
        attrs.setdefault(k, "")
        after_name = True


def _scan_comment(s: str, i: int, n: int):
    """States comment_start..comment_end (html.cpp:925-976).

    Returns ``(content, next_i, emitted)``. emitted False = EOF (the
    content becomes a text node if non-empty). Reproduces the verified
    char-drop quirks of comment_start_dash / comment_end_dash.
    """
    parts: List[str] = []
    tr = NUL_TABLE
    # comment_start
    if i >= n:
        return "", n, False
    c = s[i]
    if c == ">":
        return "", i + 1, True
    in_end = False
    if c == "-":
        # comment_start_dash
        i += 1
        if i >= n:
            return "", n, False
        c = s[i]
        if c == ">":
            return "", i + 1, True
        if c == "-":
            i += 1
            in_end = True  # comment_end with empty content
        else:
            parts.append("-")  # '-' kept, current char DROPPED
            i += 1
    while True:
        if in_end:
            # comment_end: extra '-'s appended; '>' emits; else '--'+reconsume
            r = i
            while r < n and s[r] == "-":
                parts.append("-")
                r += 1
            if r >= n:
                return "".join(parts), n, False
            if s[r] == ">":
                return "".join(parts), r + 1, True
            parts.append("--")
            i = r  # reconsume in comment state
            in_end = False
            continue
        j = s.find("-", i)
        if j < 0:
            seg = s[i:]
            parts.append(seg.translate(tr) if "\x00" in seg else seg)
            return "".join(parts), n, False
        seg = s[i:j]
        parts.append(seg.translate(tr) if "\x00" in seg else seg)
        # comment_end_dash at j+1
        if j + 1 >= n:
            return "".join(parts), n, False  # trailing '-' dropped at EOF
        c = s[j + 1]
        if c == "-":
            i = j + 2
            in_end = True
        else:
            parts.append("-")  # '-' folded back, char at j+1 DROPPED
            i = j + 2


def _scan_doctype(s: str, i: int, n: int):
    """States before_doctype_name / doctype_name (html.cpp:977-1000):
    skip leading whitespace, then take everything up to '>' verbatim
    (case preserved, NUL->'_')."""
    m = RE_NONSPACE.search(s, i)
    if m is None:
        return "", n, False
    i = m.start()
    if s[i] == ">":
        return "", i + 1, True
    j = s.find(">", i)
    if j < 0:
        seg = s[i:]
        return (seg.translate(NUL_TABLE) if "\x00" in seg else seg), n, False
    seg = s[i:j]
    return (seg.translate(NUL_TABLE) if "\x00" in seg else seg), j + 1, True


def _scan_bogus(s: str, content_from: int, scan_from: int, n: int):
    """Bogus comment: everything to '>' with NUL->'_' (html.cpp:894-903).

    ``content_from < scan_from`` for the ``<!x`` entry, where the first
    char is consumed unconditionally (even '>') before the scan starts —
    and consumed RAW: markup_dec_open appends it without the NUL check
    (html.cpp:922), so only chars consumed IN the bogus_comment state
    get NUL->'_'. Observable in ``<!\\x00``: content is a raw NUL.
    """
    raw_head = s[content_from:scan_from]
    j = s.find(">", scan_from)
    end = n if j < 0 else j
    seg = s[scan_from:end]
    if "\x00" in seg:
        seg = seg.translate(NUL_TABLE)
    return raw_head + seg, (n if j < 0 else j + 1), j >= 0


def _scan_rawtext(s: str, i: int, n: int, close_name: str, parts: List[str]):
    """Rawtext content until a matching ``</close_name`` end tag.

    Returns ``(next_i, closed, leak_tag, attrs)``. On EOF
    (closed=False) the accumulated parts become the pending text (an
    unfinished ``</nam`` is lost from the CONTENT, as in the
    reference) — but the reference's EOF flush (html.cpp:1008-1010)
    reuses the in-progress node without clearing its fields, so the
    flushed text node still carries the partial end-tag name and any
    attributes committed so far. ``leak_tag``/``attrs`` report them
    (empty/None when the EOF hit plain rawtext). On closed=True,
    ``attrs`` carries the close tag's parsed attributes (``</script
    id=3>`` parses them into the transient close node). A non-matching
    end tag is re-emitted lowercased. Covers reference states
    rawtext..rawtext_end_tag_name (html.cpp:657-665, 720-776).
    """
    tr = NUL_TABLE
    while i < n:
        j = s.find("<", i)
        if j < 0:
            seg = s[i:]
            parts.append(seg.translate(tr) if "\x00" in seg else seg)
            return n, False, "", None
        if j > i:
            seg = s[i:j]
            parts.append(seg.translate(tr) if "\x00" in seg else seg)
        if j + 1 >= n:
            return n, False, "", None  # lone '<' at EOF: lost
        if s[j + 1] != "/":
            parts.append("<")
            i = j + 1
            continue
        k = j + 2
        if k >= n:
            return n, False, "", None  # '</' at EOF: lost
        c = s[k]
        if not (("a" <= c <= "z") or ("A" <= c <= "Z")):
            parts.append("</")
            i = k
            continue
        m = RE_RAWNAME.match(s, k)
        e = m.end()
        name = s[k:e].lower()  # [A-Za-z] only: plain lower is ASCII-safe
        if e >= n:
            # EOF mid end-tag name: content loses it, the node keeps it
            return n, False, name, None
        d = s[e]
        if name == close_name and d in _SPACE_SLASH_GT:
            if d == ">":
                return e + 1, True, name, None
            at: dict = {}
            if d == "/":
                if e + 1 >= n:
                    return n, False, name, None  # EOF in self_closing
                if s[e + 1] == ">":
                    return e + 2, True, name, None
                emitted, i2, _sc = _scan_attrs(s, e + 1, n, at)
            else:  # space: before_attribute_name
                emitted, i2, _sc = _scan_attrs(s, e + 1, n, at)
            if not emitted:
                # EOF mid close-tag attrs: content kept; the committed
                # attrs + name leak into the flushed text node
                return n, False, name, at or None
            return i2, True, name, at or None
        # mismatch (or '=' etc. delimiter): re-emit '</name' lowercased,
        # reconsume the delimiter in rawtext
        parts.append("</")
        parts.append(name)
        i = e
    return n, False, "", None


def parse(s: str, events: Optional[list] = None) -> Doc:
    """Parse one HTML document into a flat pre-order ``Doc``.

    ``events``, if given, is appended with the parse-time callback
    firing sequence in the reference's exact handle order
    (html.cpp:575-627 → operator() at :539):

    - ``("node", nid, live_cnt)`` — a node was handled (open tag at
      open time, non-empty text, comment, doctype). ``live_cnt`` is
      the parent's tag-child count AT THIS MOMENT (for open tags it is
      ``tag_index+1``), because callback-time pseudo-selectors like
      ``:last`` see the mid-parse count, not the final one;
    - ``("err", nid)`` — tag_not_closed fired for an implicitly closed
      node (html.cpp:600-604), innermost first;
    - ``("close", name, attrs, pid, live_cnt)`` — a MATCHED close tag
      was handled; the node is transient (never in the tree), carrying
      its parsed name/attrs and its parent at allocation time
      (html.cpp:592-614). Fires after the err events, like the
      reference. Unmatched closes fire nothing.

    The close-handler's leftover-content text node (html.cpp:605-611)
    is inserted WITHOUT a callback in the reference and produces no
    event here either.
    """
    doc = Doc()
    kind = doc.kind
    tag = doc.tag
    content = doc.content
    attrs_l = doc.attrs
    selfc = doc.self_closing
    parent_l = doc.parent
    depth_l = doc.depth
    tidx = doc.tag_index
    ntc = doc.n_tag_children
    children = doc.children
    root_children = doc.root_children
    errors = doc.errors

    stack: List[int] = [-1]
    pending: List[str] = []
    n = len(s)
    i = 0

    def add_node(k: int, tg: str, cont: str, at: Optional[dict], sc: bool,
                 fire: bool = True) -> int:
        nid = len(kind)
        pid = stack[-1]
        kind.append(k)
        tag.append(tg)
        content.append(cont)
        attrs_l.append(at)
        selfc.append(sc)
        parent_l.append(pid)
        depth_l.append(len(stack) - 1)
        children.append([])
        ntc.append(0)
        if k == KIND_TAG:
            if pid < 0:
                ti = doc.root_tag_count
                doc.root_tag_count += 1
            else:
                ti = ntc[pid]
                ntc[pid] = ti + 1
            tidx.append(ti)
        else:
            tidx.append(0)
        if pid < 0:
            root_children.append(nid)
        else:
            children[pid].append(nid)
        if events is not None and fire:
            events.append(("node", nid, tidx[nid] + 1 if k == KIND_TAG else 0))
        return nid

    def flush_text() -> None:
        if pending:
            txt = "".join(pending)
            pending.clear()
            if txt:
                add_node(KIND_TEXT, "", txt, None, False)

    def emit_open(name: str, at: dict, sc: bool) -> None:
        nid = add_node(KIND_TAG, name, "", at, sc)
        if not sc:
            if name in VOID_TAGS:
                selfc[nid] = True
            else:
                stack.append(nid)

    def emit_close(name: str, rawcontent: str,
                   at: Optional[dict] = None) -> None:
        # implicit closure: find topmost open ancestor with this name
        # (html.cpp:592-614); root never matches; no match -> dropped.
        found = -1
        for j in range(len(stack) - 1, 0, -1):
            if tag[stack[j]] == name:
                found = j
                break
        if found < 0:
            return
        for k2 in range(len(stack) - 1, found, -1):
            nid = stack[k2]
            path = " ".join(tag[stack[x]] for x in range(1, k2 + 1))
            errors.append((nid, tag[nid], path))
            if events is not None:
                events.append(("err", nid))
        if rawcontent:
            # inserted without a callback in the reference (:605-611)
            add_node(KIND_TEXT, "", rawcontent, None, False, fire=False)
        if events is not None:
            pid = stack[-1]
            live = ntc[pid] if pid >= 0 else doc.root_tag_count
            events.append(("close", name, at, pid, live))
        del stack[found:]

    while i < n:
        j = s.find("<", i)
        if j < 0:
            pending.append(s[i:])
            i = n
            break
        if j > i:
            pending.append(s[i:j])
        i = j + 1
        if i >= n:
            break  # trailing '<' lost; pending flushed at EOF
        c = s[i]
        if ("a" <= c <= "z") or ("A" <= c <= "Z"):
            flush_text()
            res = _scan_tag(s, i, n)
            if res is None:
                i = n
                break  # EOF mid-tag: dropped
            name, at, sc, i = res
            emit_open(name, at, sc)
            if (not sc) and (name not in VOID_TAGS) and name in RAWTEXT_TAGS:
                parts: List[str] = []
                i, closed, lk, lat = _scan_rawtext(s, i, n, name, parts)
                raw = "".join(parts)
                if closed:
                    emit_close(name, raw, lat)
                elif raw:
                    # EOF flush (html.cpp:1008-1010): the reference
                    # reuses the pending node, so the flushed TEXT node
                    # keeps the partial close-tag name and committed
                    # attrs. Selectors never see them (the matcher
                    # rejects non-tag nodes, html.cpp:241-243) but the
                    # unconditional callback surface does.
                    add_node(KIND_TEXT, lk, raw, lat, False)
        elif c == "/":
            k = i + 1
            if k >= n:
                i = n
                break  # 'ab</' at EOF: pending flushed without '</'
            d = s[k]
            if ("a" <= d <= "z") or ("A" <= d <= "Z"):
                flush_text()
                res = _scan_tag(s, k, n)
                if res is None:
                    i = n
                    break
                name, _at, _sc, i = res
                emit_close(name, "", _at)
            elif d == ">":
                i = k + 1  # '</>' dropped; pending text keeps accumulating
            else:
                flush_text()
                cont, i, emitted = _scan_bogus(s, k, k, n)
                if emitted:
                    add_node(KIND_COMMENT, "", cont, None, False)
                elif cont:
                    add_node(KIND_TEXT, "", cont, None, False)
        elif c == "!":
            k = i + 1
            if k >= n:
                i = n
                break  # '<!' at EOF: pending flushed without '<!'
            if s.startswith("--", k):
                flush_text()
                cont, i, emitted = _scan_comment(s, k + 2, n)
                if emitted:
                    add_node(KIND_COMMENT, "", cont, None, False)
                elif cont:
                    add_node(KIND_TEXT, "", cont, None, False)
            elif s[k:k + 7].lower() == "doctype":
                flush_text()
                cont, i, emitted = _scan_doctype(s, k + 7, n)
                if emitted:
                    add_node(KIND_DOCTYPE, "", cont, None, False)
                elif cont:
                    add_node(KIND_TEXT, "", cont, None, False)
            else:
                flush_text()
                # first char consumed unconditionally into the content
                cont, i, emitted = _scan_bogus(s, k, k + 1, n)
                if emitted:
                    add_node(KIND_COMMENT, "", cont, None, False)
                elif cont:
                    add_node(KIND_TEXT, "", cont, None, False)
        elif c == "?":
            flush_text()
            cont, i, emitted = _scan_bogus(s, i, i, n)
            if emitted:
                add_node(KIND_COMMENT, "", cont, None, False)
            elif cont:
                add_node(KIND_TEXT, "", cont, None, False)
        else:
            pending.append("<")
            # reconsume c in data state: next find starts at i

    flush_text()
    return doc
