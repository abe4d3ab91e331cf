"""FulltextQueryer — the Lucene/ES match-expression assembly
(reference rag/nlp/query.py:27-263).

The semantics this DSL encodes (term boosts, synonym expansion,
phrase proximity, minimum_should_match) are re-expressed relationally
in ``operators/retrieval.py`` and oracle-checked there; this module
closes the remaining surface — the query STRING the reference hands
its doc store — as a pure function over the same tokenizer / Dealer /
synonym machinery.  Engine-bound but fully deterministic:

- English branch (query.py:83-120): weights as ``tk^w`` boosts
  (4-decimal format), tokenized synonyms quoted at ``w/4``, adjacent
  bigram phrases at ``max(w1, w2) * 2``, the all-filtered -> raw-text
  fallback, NO minimum_should_match.
- Chinese branch (:122-205): per Dealer-split term, weight-sorted
  subterms with fine-grained splits (``"sm"`` and ``("sm"~2)^0.5``
  alternates), synonyms as ``(tk OR (syns)^0.2)``, the whole term
  group ``(...)^5 OR (syns)^0.7``, groups joined by OR, the 32-cap
  keyword accumulation with its mid-loop break, and
  minimum_should_match passed through.
- ``paragraph`` (:245-263): top-n content tokens as boosts with
  quoted keywords, min_match = min(3, len/10).

Quirks kept: rmWWW runs twice on both branches; the Chinese branch
formats weights with raw ``str(float)`` (full repr) while the English
branch uses ``%.4f``; bigram phrases use the unstripped token text.
"""
from __future__ import annotations

import re

QUERY_FIELDS = [
    "title_tks^10",
    "title_sm_tks^5",
    "important_kwd^30",
    "important_tks^20",
    "question_tks^20",
    "content_ltks^2",
    "content_sm_ltks",
]

_SPECIAL = re.compile(r"([:\{\}/\[\]\-\*\"\(\)\|\+~\^])")
_PUNCT_SM = re.compile(
    r"[ ,\./;'\[\]\\`~!@#$%\^&\*\(\)=\+_<>\?:\"\{\}\|"
    r"，。；‘’【】、！￥……（）——《》？：“”-]+")


def sub_special_char(line: str) -> str:
    """query.py:42-43."""
    return _SPECIAL.sub(r"\\\1", line).strip()


def is_chinese(line: str) -> bool:
    """query.py:45-55: <=3 space-split tokens, or >=70% non-latin."""
    arr = re.split(r"[ \t]+", line)
    if len(arr) <= 3:
        return True
    e = sum(1 for t in arr if not re.match(r"[a-zA-Z]+$", t))
    return e * 1.0 / len(arr) >= 0.7


def _need_fine_grained(tk: str) -> bool:
    """query.py:121-126."""
    if len(tk) < 3:
        return False
    if re.match(r"[0-9a-z\.\+#_\*-]+$", tk):
        return False
    return True


def preprocess_question(txt: str) -> str:
    """question()'s shared prelude (query.py:76-81): lowercase,
    full-width fold (tradi2simp is identity here), punctuation
    collapse, one rmWWW pass."""
    from .ragtok import str_q2b
    from .termweight import rm_www

    txt = re.sub(r"[ :|\r\n\t,，。？?/`!！&^%()\[\]{}<>]+", " ",
                 str_q2b(txt.lower())).strip()
    return rm_www(txt)


def english_terms(txt: str, tw, sd, tok):
    """The English-branch term pipeline (query.py:84-96) over a
    preprocessed question: SECOND rmWWW pass, huqie tokens, Dealer
    weights (preprocess=False), the DSL cleanup regexes, and the
    synonym keyword extension.  Returns (tks_w, keywords,
    quoted_syns) — the single source for the DSL assembly AND the
    relational match/rerank term sides."""
    from .termweight import rm_www

    txt = rm_www(txt)
    tks = tok.tokenize(txt).split()
    keywords = [t for t in tks if t]
    tks_w = tw.weights(tks, preprocess=False)
    tks_w = [(re.sub(r"[ \\\"'^]", "", tk), w) for tk, w in tks_w]
    tks_w = [(re.sub(r"^[a-z0-9]$", "", tk), w)
             for tk, w in tks_w if tk]
    tks_w = [(re.sub(r"^[\+-]", "", tk), w)
             for tk, w in tks_w if tk]
    tks_w = [(tk.strip(), w) for tk, w in tks_w if tk.strip()]
    syns = []
    for tk, w in tks_w[:256]:
        s_tokens = tok.tokenize(" ".join(sd.lookup(tk))).split()
        keywords.extend(s_tokens)
        quoted = ['"{}"^{:.4f}'.format(s, w / 4.)
                  for s in s_tokens if s.strip()]
        syns.append(" ".join(quoted))
    return tks_w, keywords, syns


def question(txt: str, min_match: float = 0.6, dealer=None, syn=None,
             tokenizer=None):
    """query.py:75-205 — returns (query, extra, keywords) where
    ``extra`` is the parameter dict of the MatchTextExpr (None on the
    English branch, which passes none)."""
    from .huqie import default_tokenizer
    from .synonyms import SynonymDealer
    from .termweight import TermWeightDealer, rm_www

    tw = dealer or TermWeightDealer()
    sd = syn or SynonymDealer()
    tok = tokenizer or default_tokenizer()

    txt = preprocess_question(txt)

    if not is_chinese(txt):
        tks_w, keywords, syns = english_terms(txt, tw, sd, tok)
        q = ["({}^{:.4f}".format(tk, w) + " {})".format(s)
             for (tk, w), s in zip(tks_w, syns)
             if tk and not re.match(r"[.^+\(\)-]", tk)]
        for i in range(1, len(tks_w)):
            left, right = tks_w[i - 1][0].strip(), tks_w[i][0].strip()
            if not left or not right:
                continue
            q.append('"%s %s"^%.4f' % (
                tks_w[i - 1][0], tks_w[i][0],
                max(tks_w[i - 1][1], tks_w[i][1]) * 2))
        if not q:
            q.append(txt)
        return " ".join(q), None, keywords

    txt = rm_www(txt)
    qs, keywords = [], []
    for tt in tw.split(txt)[:256]:
        if not tt:
            continue
        keywords.append(tt)
        twts = tw.weights([tt])
        syns = sd.lookup(tt)
        if syns and len(keywords) < 32:
            keywords.extend(syns)
        tms = []
        for tk, w in sorted(twts, key=lambda x: x[1] * -1):
            sm = (tok.fine_grained_tokenize(tk).split()
                  if _need_fine_grained(tk) else [])
            sm = [_PUNCT_SM.sub("", m) for m in sm]
            sm = [sub_special_char(m) for m in sm if len(m) > 1]
            sm = [m for m in sm if len(m) > 1]

            if len(keywords) < 32:
                keywords.append(re.sub(r"[ \\\"']+", "", tk))
                keywords.extend(sm)

            tk_syns = [sub_special_char(s) for s in sd.lookup(tk)]
            if len(keywords) < 32:
                keywords.extend([s for s in tk_syns if s])
            tk_syns = [tok.fine_grained_tokenize(s)
                       for s in tk_syns if s]
            tk_syns = [f"\"{s}\"" if s.find(" ") > 0 else s
                       for s in tk_syns]

            if len(keywords) >= 32:
                break

            tk = sub_special_char(tk)
            if tk.find(" ") > 0:
                tk = '"%s"' % tk
            if tk_syns:
                tk = f"({tk} OR (%s)^0.2)" % " ".join(tk_syns)
            if sm:
                tk = f'{tk} OR "%s" OR ("%s"~2)^0.5' \
                    % (" ".join(sm), " ".join(sm))
            if tk.strip():
                tms.append((tk, w))

        tms = " ".join([f"({t})^{w}" for t, w in tms])
        if len(twts) > 1:
            tms += ' ("%s"~2)^1.5' % tok.tokenize(tt)
        syns = " OR ".join(
            ['"%s"' % tok.tokenize(sub_special_char(s)) for s in syns])
        if syns and tms:
            tms = f"({tms})^5 OR ({syns})^0.7"
        qs.append(tms)

    if qs:
        query = " OR ".join([f"({t})" for t in qs if t])
        return query, {"minimum_should_match": min_match}, keywords
    return None, None, keywords


def paragraph(content_tks, keywords: list | None = None,
              keywords_topn: int = 30, dealer=None, syn=None,
              tokenizer=None):
    """query.py:245-263 — content-token boosts for the tag/paragraph
    query; returns (query, minimum_should_match).  Quirk kept: a
    STRING input is split into CHARACTERS (the reference iterates the
    string, not .split())."""
    from .huqie import default_tokenizer
    from .synonyms import SynonymDealer
    from .termweight import TermWeightDealer

    tw = dealer or TermWeightDealer()
    sd = syn or SynonymDealer()
    tok = tokenizer or default_tokenizer()

    if isinstance(content_tks, str):
        content_tks = [c.strip() for c in content_tks.strip()
                       if c.strip()]
    tks_w = tw.weights(content_tks, preprocess=False)

    keywords = [f'"{k.strip()}"' for k in (keywords or [])]
    for tk, w in sorted(tks_w, key=lambda x: x[1] * -1)[:keywords_topn]:
        tk_syns = [sub_special_char(s) for s in sd.lookup(tk)]
        tk_syns = [tok.fine_grained_tokenize(s) for s in tk_syns if s]
        tk_syns = [f"\"{s}\"" if s.find(" ") > 0 else s
                   for s in tk_syns]
        tk = sub_special_char(tk)
        if tk.find(" ") > 0:
            tk = '"%s"' % tk
        if tk_syns:
            tk = f"({tk} OR (%s)^0.2)" % " ".join(tk_syns)
        if tk:
            keywords.append(f"{tk}^{w}")

    return " ".join(keywords), min(3, len(keywords) / 10)
