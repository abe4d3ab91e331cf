"""Citation insertion: rag/nlp/search.py:163-250 insert_citations.

Splits an answer into pieces (code fences kept whole, sentence enders
regrouped onto their piece, fragments under 5 chars skipped), scores
each piece against the retrieved chunks with 0.1/0.9 token/vector
hybrid similarity, and appends ``##<chunk>$$`` markers after every
piece whose best chunk clears a decaying threshold (0.63, then *0.8
down to 0.3), citing each chunk at most once.

Two documented canons where the reference is process-dependent:
- the per-piece citation cap [:4] is applied to a SORTED id list (the
  reference caps ``list(set(...))`` — string-hash iteration order,
  unstable across interpreter processes, which a distributed run
  cannot reproduce)
- the embedding model is an injected ``encode(texts) -> vectors``
  callable (the reference's embd_mdl seam)
"""

from __future__ import annotations

import re

from .huqie import tokenize
from .termweight import TermWeightDealer, hybrid_similarity, rm_www

_SENT_SPLIT = r"([^\|][；。？!！\n]|[a-z][.?;!][ \n])"


def split_pieces(answer: str) -> list[str]:
    """search.py:168-193: fence-aware piece split + boundary-char
    reattachment (the split keeps the 2-char separator as its own list
    entry; its first char belongs to the previous piece)."""
    pieces = re.split(r"(```)", answer)
    if len(pieces) >= 3:
        i = 0
        pieces_: list[str] = []
        while i < len(pieces):
            if pieces[i] == "```":
                st = i
                i += 1
                while i < len(pieces) and pieces[i] != "```":
                    i += 1
                if i < len(pieces):
                    i += 1
                pieces_.append("".join(pieces[st:i]) + "\n")
            else:
                pieces_.extend(re.split(_SENT_SPLIT, pieces[i]))
                i += 1
        pieces = pieces_
    else:
        pieces = re.split(_SENT_SPLIT, answer)
    for i in range(1, len(pieces)):
        if re.match(_SENT_SPLIT, pieces[i]):
            pieces[i - 1] += pieces[i][0]
            pieces[i] = pieces[i][1:]
    return pieces


def insert_citations(answer: str, chunks: list[str],
                     chunk_v: list[list[float]], encode,
                     tkweight: float = 0.1, vtweight: float = 0.9,
                     dealer: TermWeightDealer | None = None
                     ) -> tuple[str, set[str]]:
    assert len(chunks) == len(chunk_v)
    if not chunks:
        return answer, set()
    dealer = dealer or TermWeightDealer()
    pieces = split_pieces(answer)

    idx: list[int] = []
    pieces_: list[str] = []
    for i, t in enumerate(pieces):
        if len(t) < 5:
            continue
        idx.append(i)
        pieces_.append(t)
    if not pieces_:
        return answer, set()

    ans_v = encode(pieces_)
    chunk_v = list(chunk_v)
    for i in range(len(chunk_v)):
        if len(ans_v[0]) != len(chunk_v[i]):
            chunk_v[i] = [0.0] * len(ans_v[0])

    chunks_tks = [tokenize(rm_www(ck)).split() for ck in chunks]
    cites: dict[int, list[str]] = {}
    thr = 0.63
    while thr > 0.3 and not cites and pieces_ and chunks_tks:
        for i, _p in enumerate(pieces_):
            sim, _tk, _vt = hybrid_similarity(
                ans_v[i], chunk_v,
                tokenize(rm_www(pieces_[i])).split(),
                chunks_tks, dealer, tkweight, vtweight)
            mx = max(sim) * 0.99
            if mx < thr:
                continue
            cites[idx[i]] = sorted(
                {str(ii) for ii in range(len(chunk_v))
                 if sim[ii] > mx}, key=int)[:4]
        thr *= 0.8

    res = ""
    seted: set[str] = set()
    for i, p in enumerate(pieces):
        res += p
        if i not in idx or i not in cites:
            continue
        for c in cites[i]:
            if c in seted:
                continue
            res += f" ##{c}$$"
            seted.add(c)
    return res, seted
