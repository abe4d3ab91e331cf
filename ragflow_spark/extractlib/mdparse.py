"""Markdown parser: table extraction + heading-glued section split.

Behavioral equivalent of RAGFlowMarkdownParser.extract_tables_and_remainder
(/root/reference/deepdoc/parser/markdown_parser.py:24-77) and the
``Markdown.__call__`` section logic (/root/reference/rag/app/naive.py:
286-312). Tables are returned as raw markdown/HTML text (the reference
renders MD tables to HTML via the ``markdown`` package, which the sandbox
does not ship; SURVEY.md §2.3 records this divergence — the *extraction*
boundaries are identical, only the final table serialization differs).
"""

from __future__ import annotations

import re

from .codec import decode_blob
from .tokens import num_tokens_from_string

# bordered: header row, separator row, 1+ body rows — all pipe-wrapped
_BORDER_TABLE_RE = re.compile(
    r"(?:\n|^)"
    r"(?:\|.*?\|.*?\|.*?\n)"
    r"(?:\|(?:\s*[:-]+[-| :]*\s*)\|.*?\n)"
    r"(?:\|.*?\|.*?\|.*?\n)+"
)

# borderless: pipes without leading |, separator row of dashes/colons
_NOBORDER_TABLE_RE = re.compile(
    r"(?:\n|^)"
    r"(?:\S.*?\|.*?\n)"
    r"(?:(?:\s*[:-]+[-| :]*\s*).*?\n)"
    r"(?:\S.*?\|.*?\n)+"
)

_HTML_TABLE_RE = re.compile(
    r"(?:\n|^)\s*(?:"
    r"(?:<html[^>]*>\s*<body[^>]*>\s*<table[^>]*>.*?</table>\s*</body>\s*"
    r"</html>)"
    r"|(?:<body[^>]*>\s*<table[^>]*>.*?</table>\s*</body>)"
    r"|(?:<table[^>]*>.*?</table>)"
    r")\s*(?=\n|$)",
    re.DOTALL | re.IGNORECASE,
)


def extract_tables_and_remainder(txt: str) -> tuple[str, list[str]]:
    """Pull bordered/borderless MD tables and embedded HTML tables out of
    the text; returns (remainder, tables)."""
    tables: list[str] = []
    remainder = txt
    if "|" in txt:
        tables.extend(_BORDER_TABLE_RE.findall(remainder))
        remainder = _BORDER_TABLE_RE.sub("", remainder)
        tables.extend(_NOBORDER_TABLE_RE.findall(remainder))
        remainder = _NOBORDER_TABLE_RE.sub("", remainder)
    if "<table>" in remainder.lower():
        tables.extend(_HTML_TABLE_RE.findall(remainder))
        remainder = _HTML_TABLE_RE.sub("", remainder)
    return remainder, tables


def markdown_sections(binary: bytes, chunk_token_num: int = 128
                      ) -> tuple[list[tuple[str, str]], list[str]]:
    """binary -> (sections, tables). Line split with two rules
    (naive.py:296-307): oversize lines (>3x chunk budget) halve; a line
    following a ``#`` heading glues onto it with a newline."""
    txt = decode_blob(binary)
    remainder, tables = extract_tables_and_remainder(f"{txt}\n")
    sections: list[tuple[str, str]] = []
    for sec in remainder.split("\n"):
        if num_tokens_from_string(sec) > 3 * chunk_token_num:
            mid = int(len(sec) / 2)
            sections.append((sec[:mid], ""))
            sections.append((sec[mid:], ""))
        elif sec.strip().find("#") == 0:
            sections.append((sec, ""))
        elif sections and sections[-1][0].strip().find("#") == 0:
            prev, _ = sections.pop(-1)
            sections.append((prev + "\n" + sec, ""))
        else:
            sections.append((sec, ""))
    return sections, tables
