"""htmlser: libxml2-parity HTML serialization + readability
clean_attributes.

Frozen goldens were produced by the system libxml2 2.9.14 through
``tools/libxml_oracle.py`` (the same ``htmlNodeDumpFormatOutput`` call
``lxml.etree.tounicode(el, method="html")`` makes); the differential
test re-checks them live when the shared library is present.
"""

from __future__ import annotations

import pytest

from ragflow_spark.extractlib.dom import MINIMIZED, Node, find_first, \
    parse_html
from ragflow_spark.extractlib.htmlser import clean_attributes, \
    serialize_html


def _ser(html: str, tag: str) -> str:
    node = find_first(parse_html(html), tag)
    assert node is not None
    return serialize_html(node)


# (input document, element to dump, libxml2 2.9.14 output)
GOLDENS = [
    # void elements close with > and drop the end tag
    ('<html><body><div><p>hello</p><br><img src="x.png"></div></body></html>',
     'div', '<div><p>hello</p><br><img src="x.png"></div>'),
    # empty non-void elements keep the end tag...
    ('<html><body><div><p></p><span></span></div></body></html>',
     'div', '<div><p></p><span></span></div>'),
    # ...except an empty <li> (libxml2 saveEndTag); non-empty <li> closes
    ('<html><body><ul><li>a</li><li>b<b>c</b></li><li></li></ul></body></html>',
     'ul', '<ul><li>a</li><li>b<b>c</b></li><li></ul>'),
    # boolean attributes drop their value entirely
    ('<html><body><div><input checked type="text"><input disabled>'
     '<em checked="yes">x</em></div></body></html>',
     'div', '<div><input checked type="text"><input disabled>'
            '<em checked>x</em></div>'),
    # quote selection: " in value -> single quotes; both -> &quot;
    ('<html><body><div title=\'say "hi"\'>q</div></body></html>',
     'div', '<div title=\'say "hi"\'>q</div>'),
    ('<html><body><div title="it&#39;s">q</div></body></html>',
     'div', '<div title="it\'s">q</div>'),
    ('<html><body><div title=\'both " and &#39; here\'>q</div></body></html>',
     'div', '<div title="both &quot; and \' here">q</div>'),
    # attribute values escape & < > (not quotes)
    ('<html><body><div data-x="a&b<c>d">q</div></body></html>',
     'div', '<div data-x="a&amp;b&lt;c&gt;d">q</div>'),
    # text escapes & < > only; unicode stays raw
    ('<html><body><p>a &amp; b &lt; c &gt; d "q" é w</p></body></html>',
     'p', '<p>a &amp; b &lt; c &gt; d "q" é w</p>'),
    # URI attributes: %-escape after entity escape, leading blanks skipped
    ('<html><body><div><a href="http://e.com/a b?x=1&y=2#f">t</a>'
     'tail text</div></body></html>',
     'div', '<div><a href="http://e.com/a%20b?x=1&amp;y=2#f">t</a>'
            'tail text</div>'),
    ('<html><body><a href="  http://e.com/%20kept">t</a></body></html>',
     'a', '<a href="http://e.com/%20kept">t</a>'),
    ('<html><body><a href="a\tb\nc$[]^`{|}\\q">t</a></body></html>',
     'a', '<a href="a%09b%0Ac%24%5B%5D%5E%60%7B%7C%7D%5Cq">t</a>'),
    ('<html><body><a href="aéb">t</a></body></html>',
     'a', '<a href="a%C3%A9b">t</a>'),
    # src/action on any element; name only on <a>
    ('<html><body><form action="do thing" name="f">'
     '<input name="q w" src="i m"></form></body></html>',
     'form', '<form action="do%20thing" name="f">'
             '<input name="q w" src="i%20m"></form>'),
    ('<html><body><a name="anchor name">x</a></body></html>',
     'a', '<a name="anchor%20name">x</a>'),
    # explicit empty value keeps ="" ; minimized attribute is bare
    ('<html><body><div attr="">empty</div></body></html>',
     'div', '<div attr="">empty</div>'),
    ('<html><body><div attr data-m>noval</div></body></html>',
     'div', '<div attr data-m>noval</div>'),
    # duplicate attribute: first occurrence wins (libxml2 parser rule)
    ('<html><body><p id href="first" href="second">x</p></body></html>',
     'p', '<p id href="first">x</p>'),
    # unknown/HTML5 tags serialize <tag></tag> when empty
    ('<html><body><article><aside>s</aside><section></section></article>'
     '</body></html>',
     'article', '<article><aside>s</aside><section></section></article>'),
    # tail of the dumped node is included (tounicode with_tail semantics)
    ('<html><body><div><p>tail test</p>after tail</div></body></html>',
     'p', '<p>tail test</p>after tail'),
    # whitespace and CR raw in text and attributes
    ('<html><body><p>a\rb\r\nc</p></body></html>', 'p', '<p>a\rb\r\nc</p>'),
    ('<html><body><div title="a\tb\nc">x</div></body></html>',
     'div', '<div title="a\tb\nc">x</div>'),
    # script/style contents are written raw
    ('<html><body><div><script>if (a<b && c>d) {}</script></div>'
     '</body></html>',
     'div', '<div><script>if (a<b && c>d) {}</script></div>'),
    # the iframe VIDEO case readability produces
    ('<html><body><div><iframe src="http://youtube.com/x">VIDEO</iframe>'
     '</div></body></html>',
     'div', '<div><iframe src="http://youtube.com/x">VIDEO</iframe></div>'),
]


@pytest.mark.parametrize("html,tag,want", GOLDENS,
                         ids=[f"g{i}" for i in range(len(GOLDENS))])
def test_goldens(html, tag, want):
    assert _ser(html, tag) == want


def test_live_differential_against_libxml2():
    """Re-derive every golden from the shared library when present."""
    from tools.libxml_oracle import load_libxml2, serialize_subtree
    if load_libxml2() is None:
        pytest.skip("libxml2 shared library not available")
    for html, tag, want in GOLDENS:
        assert serialize_subtree(html, tag) == want, (html, tag)
        assert _ser(html, tag) == want, (html, tag)


def test_empty_body_and_wrapper_div():
    root = parse_html('<html><body></body></html>')
    body = find_first(root, 'body')
    assert serialize_html(body) == '<body></body>'
    wrapper = Node("div")
    assert serialize_html(wrapper) == '<div></div>'


def test_minimized_sentinel_is_empty_string():
    node = find_first(parse_html('<html><body><p data-m>x</p></body>'
                                 '</html>'), 'p')
    v = node.get("data-m")
    assert v == "" and not v
    assert "%s" % v == ""
    assert v is not None
    assert MINIMIZED == ""


def test_programmatic_set_serializes_with_value():
    node = Node("body")
    node.set("id", "readabilityBody")
    assert serialize_html(node) == '<body id="readabilityBody"></body>'


# ---------------------------------------------------------------------------
# clean_attributes (readability 0.8.1 cleaners.py)

def test_clean_attributes_strips_bad_attrs():
    s = '<div><img width="5" height="3" src="x.png">' \
        '<p style="color: red" class="keep">t</p></div>'
    assert clean_attributes(s) == \
        '<div><img src="x.png"><p class="keep">t</p></div>'


def test_clean_attributes_color_family_and_unquoted():
    s = '<table bgcolor=red background="b.png"><tr bordercolor=\'#fff\'>' \
        '<td>x</td></tr></table>'
    assert clean_attributes(s) == '<table><tr><td>x</td></tr></table>'


def test_clean_attributes_needs_space_prefix():
    # the tag name itself satisfies the "([^>]+) " prefix, so a lone bad
    # attribute is stripped too
    assert clean_attributes('<div style="x">t</div>') == '<div>t</div>'
    # but data-width is protected: no space immediately before "width"
    s2 = '<div a="1" data-width="5">t</div>'
    assert clean_attributes(s2) == s2


def test_clean_attributes_empty_value_survives():
    # style="" matches neither quoted (require 1+ chars) nor the
    # unquoted branch (cannot start with a quote) — the reference keeps it
    s = '<div a="1" style="">t</div>'
    assert clean_attributes(s) == s
