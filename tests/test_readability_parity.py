"""readability 0.8.1 parity: the round-5 divergence fixes.

Each test pins a behavior of the published readability-lxml 0.8.1
source that the corpus never fires (readability.py ``summary`` /
``get_title`` / ``transform_misused_divs_into_paragraphs`` /
``sanitize``, cleaners.py, htmls.py):

* every <body> gets id="readabilityBody" before scoring (+25 via
  positiveRe "body");
* titles use the element's direct .text, the [no-title] fallback
  fires on the RAW text, and norm_title applies normalize_entities;
* divToPElementsRe matches tag-name PREFIXES in the serialized
  children ("<article" via "a", "<param"/"<picture" via "p");
* per-tag-group iteration order in score_paragraphs (p, pre, td) and
  sanitize's reverse_tags;
* input[@type="hidden"] is a case-sensitive value match;
* the un-ruthless retry compares len(clean_attributes(serialized
  article)) — not text length — against retry_length;
* the parse-time Cleaner deletes style/on* attributes and blanks
  javascript:-scheme links.
"""

from __future__ import annotations

import random
import re

from ragflow_spark.extractlib.dom import find_first, parse_html
from ragflow_spark.extractlib.htmlparse import extract_html, \
    parse_html_text
from ragflow_spark.extractlib.htmlser import clean_attributes, \
    serialize_html
from ragflow_spark.extractlib.readability import Document, REGEXES, \
    _clean_doc_attrs


# ---------------------------------------------------------------------------
# readabilityBody

def test_body_gets_readability_id_before_scoring():
    # body is parent of the only scored <p>: with id="readabilityBody"
    # it carries +25 class weight, which the best-candidate pick sees
    html = ("<html><body>"
            "<p>" + "Plain body paragraph with some words, truly. " * 8
            + "</p></body></html>")
    doc = Document(html)
    node = doc.summary_node(html_partial=True)
    ser = serialize_html(node)
    assert 'id="readabilityBody"' in ser or "Plain body paragraph" in ser


def test_readability_body_plus25_flips_selection():
    # A competing wrapper div whose score sits between body's unweighted
    # and +25-weighted score: without the id rule the div wins; with it
    # the body wins and the article keeps BOTH paragraphs.
    para = "Words and more words, with a comma here. " * 4  # ~168 chars
    html = (
        "<html><body>"
        "<p>" + para + "</p>"
        "<div><p>" + para + "</p></div>"
        "</body></html>"
    )
    _, content = parse_html_text(html)
    # body (grandparent of div's p, parent of the bare p) outranks the
    # div only through the +25 — the proof is both paragraphs surviving
    assert content.count(para.strip()[:30]) >= 2


def test_source_body_id_is_overwritten():
    # <body id="comments"> would score -25 via negativeRe; the library
    # overwrites the id before class_weight ever sees it
    para = "Sentences with commas, yes, definitely here to stay. " * 4
    html = ('<html><body id="comments"><p>' + para + "</p></body></html>")
    node = Document(html).summary_node()
    assert para.strip()[:30] in serialize_html(node)


# ---------------------------------------------------------------------------
# title()

def test_title_normalize_entities():
    html = ("<html><head><title>A — B – C « D » &amp;quot; E</title>"
            "</head><body><p>x</p></body></html>")
    assert Document(html).title() == 'A - B - C " D " " E'


def test_title_whitespace_only_is_empty_not_placeholder():
    # get_title checks len(title.text) == 0 on the RAW text: "   " is
    # non-empty, norm_title collapses it to "" and "" is returned
    html = ("<html><head><title>   </title></head>"
            "<body><p>x</p></body></html>")
    assert Document(html).title() == ""


def test_title_missing_is_placeholder():
    html = "<html><body><p>x</p></body></html>"
    assert Document(html).title() == "[no-title]"


def test_title_direct_text_only():
    # .text stops at the first child element (lxml semantics)
    html = ("<html><head><title>lead<b>bold</b>tail</title></head>"
            "<body><p>x</p></body></html>")
    assert Document(html).title() == "lead"


def test_extract_html_carries_normalized_title():
    html = ("<html><head><title>Em — dash</title></head><body><p>"
            + "Body text with a comma, and length. " * 10
            + "</p></body></html>")
    out = extract_html(html.encode())
    assert out.startswith("Em - dash\n")


# ---------------------------------------------------------------------------
# divToP prefix semantics

def test_div_with_article_descendant_not_converted():
    # "<article" matches the "a" alternative of divToPElementsRe: the
    # div is NOT converted to <p>, so its inner paragraph scores with
    # the div (not a p wrapper) as parent
    html = ("<html><body><div id='x'><article>t</article>text</div>"
            "<p>scored paragraph, long enough to matter here today."
            "</p></body></html>")
    root = parse_html(html)
    d = Document("<html></html>")
    d._transform_misused_divs(root)
    div = find_first(root, "div")
    assert div is not None and div.tag == "div"


def test_div_with_only_span_converted():
    html = "<html><body><div id='x'><span>t</span></div></body></html>"
    root = parse_html(html)
    Document("<html></html>")._transform_misused_divs(root)
    assert find_first(root, "div") is None  # became <p>


def test_prefix_check_equals_regex_on_serialized_children():
    rng = random.Random(11)
    tags = ["span", "em", "article", "aside", "param", "picture", "pre",
            "section", "nav", "b", "abbr", "address", "audio", "ul",
            "ol", "dl", "table", "img", "a", "blockquote", "q", "code"]
    rex = REGEXES["divToPElementsRe"]
    prefixes = ("a", "blockquote", "dl", "div", "img", "ol", "p",
                "table", "ul")
    for _ in range(300):
        inner = "".join(
            f"<{t}>x<y</{t}>" if t not in ("img", "a") else f"<{t}>"
            for t in rng.sample(tags, rng.randint(0, 4)))
        html = f"<html><body><div id='d'>{inner}</div></body></html>"
        div = find_first(parse_html(html), "div")
        ser = "".join(serialize_html(c) for c in div.children)
        want = bool(rex.search(ser))
        got = any(n is not div and n.tag.startswith(prefixes)
                  for n in div.iter())
        assert want == got, (inner, ser)


# ---------------------------------------------------------------------------
# iteration-order semantics

def test_score_order_groups_by_tag():
    # a <td> earlier in document order than a <p>: candidate insertion
    # order must still be p-parent first (ties resolve to it)
    para = "Equal scoring content with a comma, right here padded. "
    html = ("<html><body>"
            "<table><tr><td>" + para + "</td></tr></table>"
            "<div><p>" + para + "</p></div>"
            "</body></html>")
    d = Document(html)
    root = d._take_root()
    cands = d._score_paragraphs(root)
    first = next(iter(cands.values()))
    # first-inserted candidate is the p's parent (the div), not the tr
    assert first["elem"].tag == "div"


def test_hidden_input_type_case_sensitive():
    d = Document("<html></html>")
    para = "short"
    html = ("<html><body><div id='c'>"
            '<input type="HIDDEN"><input type="HIDDEN">'
            "<p>" + para + "</p></div></body></html>")
    root = parse_html(html)
    el = find_first(root, "div")
    # counts: p=1, input=2 (HIDDEN not discounted) -> 2 > 1/3 -> removed
    node = d._sanitize(find_first(root, "body"), {})
    assert find_first(node, "input") is None


# ---------------------------------------------------------------------------
# retry length on the serialized article

def _short_markup_page():
    # article text ~130 chars (< 250) but serialized HTML > 250 bytes:
    # the reference does NOT retry; a text-length check would
    text = "Short but heavily marked up body copy, with a comma. "
    deco = ("<p><span class='lead-in-first-words' title='decorated'>"
            + text + "</span></p>")
    return ("<html><body><div class='sidebar-promo'>junk sidebar junk"
            "</div><div id='content'>"
            + deco + deco + "<p>" + text + "</p>"
            "</div></body></html>")


def test_retry_uses_serialized_length():
    html = _short_markup_page()
    doc = Document(html)
    node = doc.summary_node(html_partial=True)
    ser = clean_attributes(serialize_html(node))
    assert len(ser) >= 250  # serialized passes where text would fail
    text_len = len(re.sub(r"<[^>]+>", "", ser))
    assert text_len < 250
    # ruthless output kept: the unlikely-candidate sidebar stayed out
    assert "junk sidebar" not in ser


def test_retry_still_fires_when_serialized_short():
    # genuinely tiny article: serialized < 250 -> un-ruthless retry
    # brings back the unlikely-candidate block
    html = ("<html><body><div class='sidebar-promo'>"
            + "sidebar words here to pad the page, with commas, more. " * 6
            + "</div><p>tiny.</p></body></html>")
    node = Document(html).summary_node(html_partial=True)
    assert "sidebar words" in serialize_html(node)


# ---------------------------------------------------------------------------
# parse-time Cleaner attribute pass

def test_cleaner_strips_style_and_handlers_and_js_links():
    html = ("<html><body><div style='color:red' onclick='x()' "
            "onmouseover='y()' class='keep'>"
            "<a href='javascript:alert(1)'>l</a>"
            "<a href='JAVASCRIPT%3Aalert(2)'>m</a>"
            "<a href='http://ok.example/x'>n</a>"
            "</div></body></html>")
    root = parse_html(html)
    _clean_doc_attrs(root)
    div = find_first(root, "div")
    assert "style" not in div.attrib and "onclick" not in div.attrib
    assert div.get("class") == "keep"
    hrefs = [a.get("href") for a in root.iter("a")]
    assert hrefs == ["", "", "http://ok.example/x"]
