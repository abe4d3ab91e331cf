"""Email (.eml) template: MIME walk -> header+plain+html sections.

Behavioral equivalent of the email template's main path
(/root/reference/rag/app/email.py:30-95): headers render as
"Header: value" lines, text/plain payloads append to the text stream,
text/html payloads collect separately, multipart containers recurse;
the text stream goes through RAGFlowTxtParser (default 128-token budget
and delimiter set — note ';' is a delimiter, so header values lose
semicolons), the html stream through RAGFlowHtmlParser, and the merged
section list through naive_merge(128). Attachment indexing
(email.py:96-120) is out of scope (binary side-channel).
"""

from __future__ import annotations

import io
from email import policy
from email.parser import BytesParser

from .htmlparse import parse_html_text
from .merge import naive_merge
from .txtparse import parser_txt


def email_sections(binary: bytes) -> list:
    """eml bytes -> section list (text-parser chunks + html lines)."""
    try:
        msg = BytesParser(policy=policy.default).parse(io.BytesIO(binary))
    except Exception:
        return []
    text_txt: list[str] = [f"{h}: {v}" for h, v in msg.items()]
    html_txt: list[str] = []

    def add(m, content_type: str) -> None:
        try:
            if content_type == "text/plain":
                text_txt.append(m.get_payload(decode=True).decode(
                    m.get_content_charset() or "utf-8", errors="ignore"))
            elif content_type == "text/html":
                html_txt.append(m.get_payload(decode=True).decode(
                    m.get_content_charset() or "utf-8", errors="ignore"))
            elif "multipart" in content_type and m.is_multipart():
                for part in m.iter_parts():
                    add(part, part.get_content_type())
        except Exception:
            pass  # undecodable part: skip, as the reference's try/except

    add(msg, msg.get_content_type())
    html_lines: list[str] = []
    for h in html_txt:
        title, content = parse_html_text(h)
        html_lines.extend(f"{title}\n{content}".split("\n"))
    return parser_txt("\n".join(text_txt)) + [
        (line, "") for line in html_lines if line]


def chunk_email(binary: bytes, chunk_token_num: int = 128,
                delimiter: str = "\n!?。；！？") -> list[str]:
    """email template main chunks (email.py:85-95)."""
    sections = [(t, p) for t, p in email_sections(binary)]
    return [c for c in naive_merge(sections, chunk_token_num, delimiter)
            if c.strip()]
