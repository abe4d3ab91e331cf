"""html-text 0.6.2 rendering rules."""

from ragflow_spark.extractlib.dom import parse_html
from ragflow_spark.extractlib.htmltext import extract_text


def test_block_newline_classes():
    assert extract_text("<p>a</p><p>b</p>") == "a\n\nb"
    assert extract_text("<div>a</div><div>b</div>") == "a\nb"
    assert extract_text("<table><tr><td>a</td></tr><tr><td>b</td></tr>"
                        "</table>") == "a\nb"
    assert extract_text("<h1>a</h1><p>b</p>") == "a\n\nb"


def test_consecutive_brs_collapse_to_one_newline():
    assert extract_text("<div>a<br><br>b</div>") == "a\nb"


def test_inline_space_guessing():
    assert extract_text("<span>a</span><span>b</span>") == "a b"
    # no space before binding punctuation
    assert extract_text("<span>word</span><span>, next</span>") == \
        "word, next"
    # no space after open bracket
    assert extract_text("<span>(</span><span>x</span>") == "(x"


def test_whitespace_collapsed_within_fragment():
    assert extract_text("<p>a   b\n\t c</p>") == "a b c"


def test_script_style_skipped():
    assert extract_text(
        "<p>keep</p><script>var x=1;</script><style>p{}</style>"
    ) == "keep"


def test_never_more_than_one_blank_line():
    assert extract_text("<p>a</p><div></div><p>b</p>") == "a\n\nb"


def test_comment_dropped_at_parse():
    root = parse_html("<p>a<!-- hidden -->b</p>")
    assert "hidden" not in extract_text("<p>a<!-- hidden -->b</p>")
    assert root is not None


def test_drop_tag_splices_text_and_tail_like_lxml():
    # lxml drop_tag: the tag goes away, its text/children/tail splice
    # into the parent at the same position
    from ragflow_spark.extractlib.dom import parse_html, tostring

    root = parse_html("<div>a<span>b<i>c</i>d</span>e</div>")
    div = next(root.iter("div"))
    span = next(root.iter("span"))
    span.drop_tag()
    assert tostring(div) == "<div>ab<i>c</i>de</div>"

    # childless drop_tag with a tail, first-child position: both text
    # and tail fold into parent.text
    root = parse_html("<div><span>x</span>y<p>z</p></div>")
    div = next(root.iter("div"))
    next(root.iter("span")).drop_tag()
    assert tostring(div) == "<div>xy<p>z</p></div>"


def test_node_small_api_helpers():
    from ragflow_spark.extractlib.dom import Node, parse_html

    root = parse_html("<div><p>a</p><p>b</p></div>")
    div = next(root.iter("div"))
    p0, p1 = div.children
    assert div.index(p1) == 1
    div.remove(p0)
    assert p0.parent is None and div.children == [p1]
    n = Node("em")
    n.set("k", "v")
    assert n.get("k") == "v" and n.get("z", "d") == "d"
    # insert() re-parents a node that already has a parent
    div.insert(0, p0)
    other = Node("div")
    other.insert(0, p0)
    assert p0.parent is other and div.children == [p1]


def test_layout_guessing_disabled_joins_with_spaces():
    from ragflow_spark.extractlib.htmltext import extract_text_from_node
    t = parse_html("<p>a</p><p>b</p>")
    assert extract_text_from_node(t, guess_layout=False) == "a b"


def test_punct_space_guessing_disabled_always_spaces():
    # html-text inserts the space unconditionally in this mode, even
    # after a newline or before binding punctuation (pipeline-
    # unreachable: the extraction chain always passes the defaults)
    from ragflow_spark.extractlib.htmltext import extract_text_from_node
    t = parse_html("<span>word</span><span>, next</span>")
    assert extract_text_from_node(t, guess_punct_space=False) == \
        "word , next"
    t2 = parse_html("<p>a</p><p>b</p>")
    assert extract_text_from_node(t2, guess_punct_space=False) == \
        "a\n\n b"


def test_skipped_tag_tail_text_kept():
    assert extract_text(
        "<p>keep<script>var x=1;</script> tail kept</p>"
    ) == "keep tail kept"


def test_dom_edge_arms():
    from ragflow_spark.extractlib.dom import (Node, find_first,
                                              get_body)
    # parentless drop_tree / drop_tag are no-ops
    Node("p").drop_tree()
    Node("p").drop_tag()
    # drop_tag with a previous sibling: text and tail splice onto the
    # sibling's tail, lxml-style
    t = parse_html("<div><b>x</b><span>mid</span>after</div>")
    find_first(t, "span").drop_tag()
    assert find_first(t, "b").tail == "midafter"
    # implied close: a second <p> pops the open one
    t2 = parse_html("<p>a<p>b")
    ps = [n for n in t2.iter() if n.tag == "p"]
    assert len(ps) == 2 and ps[0].parent is not ps[1].parent or \
        ps[0] is not ps[1]
    # </br> end tag for a void element is ignored; PIs are dropped
    assert "a" in extract_text("<div>a</br>b</div>")
    assert extract_text("<div><?pi data?>x</div>") == "x"
    # get_body returns <body> when present — including the IMPLIED
    # body a shell-less fragment now gets (libxml2 htmlCheckImplied);
    # the root fallback needs a truly body-less tree (frameset doc)
    assert get_body(parse_html("<html><body><p>x</p></body></html>")
                    ).tag == "body"
    assert get_body(parse_html("<p>x</p>")).tag == "body"
    assert get_body(parse_html(
        "<html><frameset><frame src='a'></frameset></html>")
    ).tag == "#root"


def test_traverse_skips_script_without_predrop():
    # extract_text pre-drops script/style; the in-traverse skip branch
    # is the parity arm for direct etree_to_text-style calls
    from ragflow_spark.extractlib.htmltext import extract_text_from_node
    t = parse_html("<p>keep<script>var x;</script> tail kept</p>")
    assert extract_text_from_node(t) == "keep tail kept"
