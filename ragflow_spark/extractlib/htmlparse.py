"""HTML -> (title, main text, sections): the north-rule core path.

Equivalent of RAGFlowHtmlParser
(/root/reference/deepdoc/parser/html_parser.py:31-50):

    encoding = find_codec(binary); txt = binary.decode(encoding, "ignore")
    doc = readability.Document(txt)
    title = doc.title()
    content = html_text.extract_text(doc.summary(html_partial=True))
    sections = f"{title}\\n{content}".split("\\n")

``extracted_text`` (the byte-identity unit per url) is the full
``f"{title}\\n{content}"`` string; sections are its newline split.
"""

from __future__ import annotations

from .codec import decode_blob
from .htmltext import extract_text_from_node
from .readability import Document


def parse_html_text(txt: str) -> tuple[str, str]:
    """(title, content) from an HTML string."""
    doc = Document(txt)
    title = doc.title()
    content = extract_text_from_node(doc.summary_node(html_partial=True))
    return title, content


def extract_html(binary: bytes) -> str:
    """binary -> extracted_text (title + '\\n' + content)."""
    txt = decode_blob(binary)
    title, content = parse_html_text(txt)
    return f"{title}\n{content}"


def html_sections(binary: bytes) -> list[str]:
    """RAGFlowHtmlParser.__call__ equivalent: newline-split section list
    (html_parser.py:48-50). Empty lines are kept here; template chunkers
    filter them (rag/app/naive.py:437-438)."""
    return extract_html(binary).split("\n")
