"""Plain-text parser: delimiter split + greedy token-budget merge.

Equivalent of RAGFlowTxtParser
(/root/reference/deepdoc/parser/txt_parser.py:23-64): the delimiter string
supports backtick-quoted multi-char delimiters; text splits on the escaped
alternation with delimiters *kept out* of chunks; pieces accumulate under
the same overshoot-by-one policy as ``naive_merge``.
"""

from __future__ import annotations

import re

from .codec import decode_blob
from .tokens import num_tokens_from_string


def _delimiter_alternation(delimiter: str) -> str:
    """Expand backtick-quoted multi-char delims + single chars into an
    escaped regex alternation (txt_parser.py:44-53)."""
    dels: list[str] = []
    s = 0
    for m in re.finditer(r"`([^`]+)`", delimiter):
        f, t = m.span()
        dels.append(m.group(1))
        dels.extend(list(delimiter[s:f]))
        s = t
    if s < len(delimiter):
        dels.extend(list(delimiter[s:]))
    return "|".join(re.escape(d) for d in dels if d)


def parser_txt(txt: str, chunk_token_num: int = 128,
               delimiter: str = "\n!?;。；！？") -> list[list[str]]:
    """Split + merge; returns [[chunk_text, ""], ...] like the reference.

    quirk: the reference round-trips the delimiter through
    unicode_escape/latin1 to turn a literal backslash-n from config into a
    newline; our callers pass real control chars already, and the
    round-trip is a no-op for them, so it is skipped.
    """
    if not isinstance(txt, str):
        raise TypeError("txt type should be str!")
    alternation = _delimiter_alternation(delimiter)
    cks = [""]
    tk_nums = [0]

    def add_chunk(piece: str) -> None:
        tnum = num_tokens_from_string(piece)
        if tk_nums[-1] > chunk_token_num:
            cks.append(piece)
            tk_nums.append(tnum)
        else:
            cks[-1] += piece
            tk_nums[-1] += tnum

    for sec in re.split(r"(%s)" % alternation, txt):
        if re.match(f"^{alternation}$", sec):
            continue
        add_chunk(sec)

    return [[c, ""] for c in cks]


def txt_sections(binary: bytes, chunk_token_num: int = 128,
                 delimiter: str = "\n!?;。；！？") -> list[list[str]]:
    return parser_txt(decode_blob(binary), chunk_token_num, delimiter)
