"""Parse-time callback API (EP3, html.cpp:539-573): dispatch order,
first-matcher-only quirk, close-node dispatch, live :last counts."""

from htmlparser_spark.htmldom import CallbackParser
from htmlparser_spark.htmldom.callbacks import CloseNode


def collect(html, *selectors, err=False):
    fired = []
    p = CallbackParser()
    for i, sel in enumerate(selectors):
        def mk(i):
            def cb(d, n):
                if isinstance(d, CloseNode):
                    fired.append((i, "close", d.tag[0]))
                else:
                    fired.append((i, d.kind[n], d.tag[n] or d.content[n]))
            return cb
        if sel is None:
            p.set_callback(mk(i))
        else:
            p.set_callback(sel, mk(i))
    if err:
        p.set_err_callback(lambda e, d, n: fired.append(("err", e, d.tag[n])))
    p.parse(html)
    return fired


def test_handle_order_matches_reference():
    got = collect("<ul><li>one</li></ul>", None)
    assert got == [(0, 1, "ul"), (0, 1, "li"), (0, 0, "one"),
                   (0, "close", "li"), (0, "close", "ul")]


def test_first_matcher_only_quirk():
    """A two-matcher selector NEVER fires as a callback, even when the
    full selector would match (html.cpp:545-549: one matcher advanced,
    then exhaustion required)."""
    html = "<ul><li>x</li></ul>"
    assert [f for f in collect(html, "ul li")] == []
    assert [f[2] for f in collect(html, "li")] == ["li", "li"]


def test_close_node_dispatch_uses_close_tag_attrs():
    """Selectors evaluate against the transient close node's own
    parsed attributes (html.cpp close branch passes the close node)."""
    got = collect('<div a="1">x</div b="2">', "[b='2']")
    assert got == [(0, "close", "div")]
    got = collect('<div a="1">x</div b="2">', "[a='1']")
    assert got == [(0, 1, "div")]


def test_err_fires_before_matched_close():
    got = collect("<div><p>t</div>", None, err=True)
    assert got[-2:] == [("err", "tag_not_closed", "p"),
                        (0, "close", "div")]


def test_unmatched_close_fires_nothing():
    got = collect("<p>t</p></nope>", None)
    assert [f for f in got if f[1] == "close"] == [(0, "close", "p")]


def test_last_sees_live_count():
    """:last at callback time compares against the MID-PARSE sibling
    count: every open tag is its parent's last child at open time, so
    a :last callback fires for all three items (post-parse filtering
    would keep only the third)."""
    got = collect("<ul><li>a</li><li>b</li><li>c</li></ul>", "li:last")
    opens = [f for f in got if f[1] == 1]
    assert len(opens) == 3


def test_clear_callbacks():
    p = CallbackParser()
    fired = []
    p.set_callback(lambda d, n: fired.append(n))
    p.clear_callbacks()
    p.parse("<p>x</p>")
    assert fired == []


def test_events_off_by_default_and_tree_unchanged():
    from htmlparser_spark.htmldom import parse, to_text_stripped
    html = "<div><p>one</p><script>junk</script></div>"
    ev = []
    assert to_text_stripped(parse(html)) == \
        to_text_stripped(parse(html, events=ev))
    assert ev  # events recorded when asked


def test_zero_matcher_selector_is_unconditional():
    """Quirk #16 (html.cpp:541 + compile loop at :43-46): a selector
    that COMPILES to zero matchers — NUL terminates compilation and an
    in-progress matcher with no condition is dropped — is falsy in
    dispatch (``if(!c.first)``), which makes the callback fire for
    EVERY handled node, exactly like the unconditional overload."""
    html = "<div><p>t</p></div>"
    uncond = collect(html, None)
    for poisoned in ("\x00", "#", "#\x00", ".", ":", "div\x00"):
        got = collect(html, poisoned)
        if poisoned == "div\x00":
            # 'div' saves one matcher before the NUL kills the loop:
            # NOT zero matchers -> normal single-matcher dispatch
            assert [f for f in got if f[1] == 1] == [(0, 1, "div")]
        else:
            assert got == uncond, repr(poisoned)
    # node::select is unaffected: zero matchers match nothing there
    from htmlparser_spark.htmldom import parse, select
    assert select(parse(html), "\x00") == []


def test_eof_truncated_rawtext_closer_leaks_into_flushed_node():
    """EOF flush (html.cpp:1008-1010) reuses the pending node: a doc
    truncated mid ``</scr...`` inside rawtext flushes a TEXT node that
    still carries the partial close-tag name and any attrs committed
    so far. Only the unconditional callback can see them — the matcher
    rejects non-tag nodes (html.cpp:241-243)."""
    got = collect("<script>x</scr", None)
    assert got == [(0, 1, "script"), (0, 0, "scr")]
    # selector 'scr' does NOT match the leaked-name text node
    assert collect("<script>x</scr", "scr") == []
    # attrs committed before EOF leak too (incl. a partial value)
    fired = []
    p = CallbackParser()
    p.set_callback(lambda d, n: fired.append((d.kind[n], d.tag[n],
                                              d.attrs[n])))
    p.parse('<script>x</script id="ab')
    assert fired[-1] == (0, "script", {"id": "ab"})
    # ...but a name still being scanned at EOF never commits
    fired.clear()
    p.parse("<script>x</script id")
    assert fired[-1] == (0, "script", None)
    # and the text output is unaffected by the leak
    from htmlparser_spark.htmldom import parse, to_text
    assert to_text(parse("<script>x</scr")) == "x"


def test_rawtext_close_tag_carries_parsed_attrs():
    """Rawtext close tags parse their attrs into the transient close
    node (html.cpp:745-747 routes to before_attribute_name), so
    selector-guarded callbacks can match on them."""
    got = collect("<script>x</script id='3'>", "[id='3']")
    assert got == [(0, "close", "script")]
    got = collect("<script>x</script id='3'>", "[id='4']")
    assert got == []
