"""Build + walk API goldens (reference example/example.cpp:68-176).

The constructed document must be indistinguishable from its parsed
equivalent under every serializer, and walk must honor the
prune-on-False contract (node::walk, html.cpp:275-285).
"""

import sys

sys.path.insert(0, "/root/repo")

from htmlparser_spark.htmldom import (
    KIND_TAG,
    KIND_TEXT,
    append,
    make_node,
    parse,
    select,
    to_html,
    to_raw_html,
    walk,
)


def _example_doc():
    """example.cpp:135-140: div > [text 'Link:', br, a[href,class] > text]."""
    hdiv = make_node(KIND_TAG, "div")
    append(hdiv, 0, make_node(KIND_TEXT, content="Link:"))
    append(hdiv, 0, make_node(KIND_TAG, "br"))
    ha = make_node(KIND_TAG, "a",
                   attrs={"href": "https://github.com/", "class": "a_class"})
    append(ha, 0, make_node(KIND_TEXT, content="Github.com"))
    append(hdiv, 0, ha)
    return hdiv


def test_build_matches_parsed_equivalent():
    built = _example_doc()
    parsed = parse('<div>Link:<br/>'
                   '<a href="https://github.com/" class="a_class">'
                   "Github.com</a></div>")
    assert to_raw_html(built) == to_raw_html(parsed)
    assert to_html(built) == to_html(parsed)
    # attrs serialize alphabetically regardless of construction order
    assert 'class="a_class" href="https://github.com/"' in to_raw_html(built)


def test_make_node_void_tag_self_closing():
    br = make_node(KIND_TAG, "br")
    assert br.self_closing[0]
    assert to_raw_html(br) == "<br />"


def test_make_node_ignores_attrs_on_non_tag_nodes():
    """Reference utils::make_node applies attributes to tag nodes only
    (html.cpp:1017-1026); text/comment kinds can't carry them."""
    t = make_node(KIND_TEXT, content="x", attrs={"id": "nope"})
    assert t.attrs[0] is None
    tag = make_node(KIND_TAG, "div", attrs={"id": "yes"})
    assert tag.attrs[0] == {"id": "yes"}


def test_append_reassigns_indices_and_copies_deep():
    dst = make_node(KIND_TAG, "div")
    src = make_node(KIND_TAG, "p")
    append(src, 0, make_node(KIND_TEXT, content="x"))
    a1 = append(dst, 0, src)
    a2 = append(dst, 0, src)
    # two independent copies with consecutive tag indices
    assert dst.tag_index[a1] == 0 and dst.tag_index[a2] == 1
    assert dst.n_tag_children[0] == 2
    # deep copy: mutating the source later does not affect dst
    src.content[src.children[0][0]] = "CHANGED"
    assert dst.content[dst.children[a1][0]] == "x"
    # built docs work with the selector engine
    assert len(select(dst, "div > p")) == 2


def test_walk_prunes_subtrees():
    """example.cpp:72-82: li tags not inside ol."""
    d = parse("<ul><li>li1</li><li>li2</li></ul><ol><li>li</li></ol>")
    found = []

    def fn(nid):
        if d.kind[nid] == KIND_TAG and d.tag[nid] == "ol":
            return False
        if d.kind[nid] == KIND_TAG and d.tag[nid] == "li":
            found.append(nid)
        return True

    walk(d, fn)
    assert [d.content[d.children[n][0]] for n in found] == ["li1", "li2"]


def test_walk_preorder_matches_select_star():
    d = parse("<div><p><b>x</b></p><span>y</span></div><ul><li>z</li></ul>")
    seen = []
    walk(d, lambda nid: (seen.append(nid) or True))
    tags = [n for n in seen if d.kind[n] == KIND_TAG]
    assert tags == select(d, "*")
