"""DOM -> plain-text rendering with html-text 0.6.2 semantics.

The reference pins ``html-text==0.6.2`` (/root/reference/pyproject.toml:47)
and renders the readability summary with it
(/root/reference/deepdoc/parser/html_parser.py:47). The bytes of the
extracted text are defined here, so the rules are replicated exactly:

  * each text fragment is whitespace-normalized (``\\s+`` -> single space,
    stripped);
  * a space is inserted between adjacent fragments unless the previous raw
    fragment ends with whitespace, or the new fragment starts with binding
    punctuation ``,:;.!?")``, or the previous fragment ends with ``(``;
  * entering/leaving a block tag emits newlines: NEWLINE_TAGS emit one
    ``\\n``, DOUBLE_NEWLINE_TAGS emit ``\\n\\n``; consecutive newline events
    collapse (never more than one blank line, a double upgrade after a
    single adds only one more ``\\n``);
  * script/style/comments contribute nothing (our DOM drops comments at
    parse time; callers drop script/style);
  * the final string is ``.strip()``-ed.

No code was taken from html-text; the tag classes and punctuation sets are
its published constants.
"""

from __future__ import annotations

import re

from .dom import Node, parse_html, drop_tags

NEWLINE_TAGS = frozenset([
    "article", "aside", "br", "dd", "details", "div", "dt", "fieldset",
    "figcaption", "footer", "form", "header", "hr", "legend", "li", "main",
    "nav", "table", "tr",
])
DOUBLE_NEWLINE_TAGS = frozenset([
    "blockquote", "dl", "figure", "h1", "h2", "h3", "h4", "h5", "h6", "ol",
    "p", "pre", "section", "title", "ul",
])

_whitespace = re.compile(r"\s+")
_has_trailing_whitespace = re.compile(r"\s$").search
_has_punct_after = re.compile(r'^[,:;.!?")]').search
_has_open_bracket_before = re.compile(r"\($").search

_NEWLINE = object()
_DOUBLE_NEWLINE = object()

_SKIP_TAGS = frozenset(["script", "style"])


def _normalize_whitespace(text: str) -> str:
    return _whitespace.sub(" ", text.strip())


def extract_text_from_node(tree: Node, guess_punct_space: bool = True,
                           guess_layout: bool = True) -> str:
    """Render a DOM subtree to text (html-text ``etree_to_text``)."""
    chunks: list[str] = []
    prev = [_DOUBLE_NEWLINE]  # mutable cell: sentinel or raw previous text

    def should_add_space(text: str, prev_val) -> bool:
        if prev_val in (_NEWLINE, _DOUBLE_NEWLINE):
            return False
        if not _has_trailing_whitespace(prev_val):
            if _has_punct_after(text) or _has_open_bracket_before(prev_val):
                return False
        return True

    def add_newlines(tag: str) -> None:
        if not guess_layout:
            return
        p = prev[0]
        if p is _DOUBLE_NEWLINE:
            return
        if tag in DOUBLE_NEWLINE_TAGS:
            prev[0] = _DOUBLE_NEWLINE
            chunks.append("\n" if p is _NEWLINE else "\n\n")
        elif tag in NEWLINE_TAGS:
            prev[0] = _NEWLINE
            if p is not _NEWLINE:
                chunks.append("\n")

    def add_text(text_content) -> None:
        text = _normalize_whitespace(text_content) if text_content else ""
        if not text:
            return
        if guess_punct_space:
            space = " " if should_add_space(text, prev[0]) else ""
        else:
            space = " " if prev[0] not in (_NEWLINE, _DOUBLE_NEWLINE) else " "
        chunks.append(space)
        chunks.append(text)
        prev[0] = text_content

    def traverse(node: Node, handle_tail: bool = True) -> None:
        if node.tag in _SKIP_TAGS:
            if handle_tail:
                add_text(node.tail)
            return
        add_newlines(node.tag)
        add_text(node.text)
        for child in node.children:
            traverse(child)
        add_newlines(node.tag)
        if handle_tail:
            add_text(node.tail)

    traverse(tree, handle_tail=False)
    return "".join(chunks).strip()


def extract_text(html: str) -> str:
    """Standalone html -> text (html_text.extract_text equivalent)."""
    root = parse_html(html)
    drop_tags(root, _SKIP_TAGS)
    return extract_text_from_node(root)
