"""Deterministic tokenizer for output token columns (*_tks).

Simplified equivalent of rag_tokenizer
(/root/reference/rag/nlp/rag_tokenizer.py:291-401): full-to-half width
folding (_strQ2B, :101-114), lowercasing, script-run splitting with
per-character CJK emission, and fine-grained sub-segmentation of long
tokens. Documented divergences (SURVEY.md §2.7): the reference's
trie-based Chinese segmentation needs the downloaded huqie.txt dictionary
and its English path needs NLTK stem/lemmatize corpora — neither ships in
this environment, so CJK runs emit per-character and English tokens pass
through unstemmed. Token columns are explicitly OUTSIDE the
byte-identity invariant (extracted_text), matching the survey's plan.
"""

from __future__ import annotations

import re

_CJK = ("一", "鿿")


def str_q2b(s: str) -> str:
    """Full-width -> half-width (rag_tokenizer.py:101-114).

    The reference keeps the shifted char whenever ``ord - 0xFEE0``
    lands in [0x20, 0x7E] — that window starts at U+FF00 (an
    unassigned code point), not U+FF01, so the arithmetic is
    replicated rather than the nominal FF01-FF5E block."""
    out = []
    for ch in s:
        code = ord(ch)
        if code == 0x3000:
            code = 0x20
        else:
            shifted = code - 0xFEE0
            if 0x20 <= shifted <= 0x7E:
                code = shifted
        out.append(chr(code))
    return "".join(out)


def tokenize(text: str) -> str:
    """Space-joined token string (the content_ltks surface).

    Delegates to the full huqie machinery (extractlib/huqie.py):
    bidirectional trie matching + DFS re-segmentation over the embedded
    mini-dictionary for CJK runs, Porter-stemmed English — the
    rag_tokenizer.tokenize surface (rag_tokenizer.py:291-360) with the
    documented resource divergences (vocabulary-limited dictionary, no
    WordNet lemmatizer, no tradi2simp fold)."""
    from .huqie import tokenize as _huqie_tokenize

    return _huqie_tokenize(text)


def tokenize_lite(text: str) -> str:
    """The round-1 trie-less fallback (per-char CJK, unstemmed
    English) — kept for callers that need a dictionary-independent
    token count surface."""
    t = str_q2b(text).lower()
    tokens: list[str] = []
    for run in re.findall(r"[0-9a-z]+|[一-鿿]+", t):
        if _CJK[0] <= run[0] <= _CJK[1]:
            tokens.extend(run)  # per-char (trie-less segmentation)
        else:
            tokens.append(run)
    return " ".join(tokens)


def fine_grained_tokenize(tks: str) -> str:
    """Sub-segmentation of long tokens (rag_tokenizer.py:363-401
    shape): alnum tokens longer than 8 chars split into 4-char groups;
    everything else passes through."""
    out = []
    for tk in tks.split(" "):
        if len(tk) > 8 and re.match(r"[0-9a-z]+$", tk):
            out.extend(tk[i:i + 4] for i in range(0, len(tk), 4))
        else:
            out.append(tk)
    return " ".join(t for t in out if t)
