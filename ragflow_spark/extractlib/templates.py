"""Template chunkers over HTML pages: naive / book / one.

Behavioral equivalents of the reference template ``chunk()`` entry points'
HTML branches (FACTORY at /root/reference/rag/svr/task_executor.py:67-84),
returning plain chunk text lists (the reference's ``section_only`` shape)
plus deterministic content-addressed chunk ids.

Documented divergence: the reference samples sections with the unseeded
global ``random`` for ``is_english`` / ``bullets_category``
(rag/app/book.py:85,130); we use the full population (deterministic).
"""

from __future__ import annotations

from .htmlparse import extract_html, html_sections
from .merge import (
    bullets_category,
    hierarchical_merge,
    is_english,
    make_colon_as_title,
    naive_merge,
    remove_contents_table,
)
from .xxh64 import chunk_id


def chunk_naive_html(binary: bytes, chunk_token_num: int = 128,
                     delimiter: str = "\n!?。；！？") -> list[str]:
    """naive template, HTML branch (rag/app/naive.py:436-440,465-470):
    sections = HtmlParser()(...), drop empties, naive_merge(128)."""
    sections = [(s, "") for s in html_sections(binary) if s]
    return naive_merge(sections, chunk_token_num, delimiter)


def chunk_book_html(binary: bytes, chunk_token_num: int = 256,
                    delimiter: str = "\n。；！？") -> tuple[list[str], str]:
    """book template, HTML branch (rag/app/book.py:106-112,128-140).

    Returns (chunks, merge_mode) where merge_mode is 'hierarchical' when a
    bullet class was detected, else 'naive'.
    """
    sections = [(s, "") for s in html_sections(binary) if s]
    remove_contents_table(sections, eng=is_english([t for t, _ in sections]))
    make_colon_as_title(sections)
    bull = bullets_category([t for t, _ in sections])
    if bull >= 0:
        chunks = ["\n".join(ck)
                  for ck in hierarchical_merge(bull, sections, 5)]
        return chunks, "hierarchical"
    # reference re-splits on '@' position markers (absent for HTML input)
    plain = []
    for s, _ in sections:
        parts = s.split("@")
        plain.append((parts[0], "@" + parts[1]) if len(parts) == 2
                     else (parts[0], ""))
    return naive_merge(plain, chunk_token_num, delimiter), "naive"


def chunk_one_html(binary: bytes) -> list[str]:
    """one template, HTML branch (rag/app/one.py:108-111,128-131):
    the whole document is a single chunk joined by newlines."""
    sections = [s for s in html_sections(binary) if s]
    return ["\n".join(sections)] if sections else []


def chunks_with_ids(chunks: list[str], url: str) -> list[tuple[int, str, str]]:
    """Attach (chunk_seq, chunk_text, chunk_id); id mirrors
    task_executor.py:266 with the url standing in for doc_id."""
    out = []
    for seq, text in enumerate(chunks):
        if not text.strip():
            continue
        out.append((seq, text, chunk_id(text, url)))
    return out
