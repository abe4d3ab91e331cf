"""Query-term weighting: the Dealer machinery from
/root/reference/rag/nlp/term_weight.py re-expressed over the huqie
tokenizer.

What ships: pretoken (stopword/pattern gate, :84-113), tokenMerge
(single-char run regrouping, :115-141), split (:149-159), and the
weights pipeline (:161-244) — the two-source idf blend
``0.3*idf(freq) + 0.7*idf(df)`` with ner/postag multipliers and final
normalization, all formulas verbatim.

Resource seams (same pattern as the huqie dictionary): the NER dict
(rag/res/ner.json) and the document-frequency table (rag/res/term.freq)
are downloaded resources — they default empty here, which the
reference's own code paths handle (ner()->1 when the dict misses,
df()->regex/length fallbacks), and can be injected through the
constructor. The stopword set is source-code data in the reference, so
the machinery keeps its gate with a minimal embedded subset.
"""

from __future__ import annotations

import math
import re

from .huqie import default_tokenizer

# minimal embedded subset of the reference's in-source stop set
# (term_weight.py:29-82) — the gate machinery is what is under test;
# the full set drops in through the constructor
STOP_WORDS = {
    "请问", "您", "你", "我", "他", "是", "的", "就", "有", "于", "及",
    "即", "在", "为", "最", "有", "从", "以", "了", "将", "与", "吗",
    "吧", "中", "#", "什么", "怎么", "哪个", "哪些", "啥", "相关",
}

_DROP_PATTERNS = [
    r"是*(什么样的|哪家|一下|那家|请问|啥样|咋样了|什么时候|何时|何地|何人|是否|是不是|多少|哪里|怎么|哪儿|怎么样|如何|哪些|是啥|啥是|啊|吗|呢|吧|咋|什么|有没有|呀|谁|哪位|哪个)是*",
    r"(^| )(what|who|how|which|where|why)('re|'s)? ",
    r"(^| )('s|'re|is|are|were|was|do|does|did|don't|doesn't|didn't|has|have|be|there|you|me|your|my|mine|just|please|may|i|should|would|wouldn't|will|won't|done|go|for|with|so|the|a|an|by|i'm|it's|he's|she's|they|they're|you're|as|by|on|in|at|up|out|down|of|to|or|and|if) ",
]


def rm_www(txt: str) -> str:
    """Interrogative / function-word strip from the query side
    (rag/nlp/query.py:57-73 rmWWW, incl. the all-stripped -> original
    fallback)."""
    patts = [(_DROP_PATTERNS[0], ""), (_DROP_PATTERNS[1], " "),
             (_DROP_PATTERNS[2], " ")]
    otxt = txt
    for r, p in patts:
        txt = re.sub(r, p, txt, flags=re.IGNORECASE)
    if not txt:
        txt = otxt
    return txt


def to_weight_dict(dealer: "TermWeightDealer",
                   tks: list[str]) -> dict[str, float]:
    """query.py:216-222 toDict: normalized Dealer weights accumulated
    per term (duplicate occurrences sum)."""
    d: dict[str, float] = {}
    for t, w in dealer.weights(tks, preprocess=False):
        d[t] = d.get(t, 0.0) + w
    return d


def similarity(qtwt: dict[str, float], dtwt: dict[str, float]) -> float:
    """query.py:228-241: sqrt(3 * s / q / log10(|dtwt| + 512)) with the
    1e-9 floors."""
    s = 1e-9
    for k, v in qtwt.items():
        if k in dtwt:
            s += v * dtwt[k]
    q = 1e-9
    for v in qtwt.values():
        q += v * v
    return math.sqrt(3.0 * (s / q / math.log10(len(dtwt) + 512)))


def token_similarity(dealer: "TermWeightDealer", atks: list[str],
                     btkss: list[list[str]]) -> list[float]:
    """query.py:215-226."""
    qtwt = to_weight_dict(dealer, atks)
    return [similarity(qtwt, to_weight_dict(dealer, btks))
            for btks in btkss]


def hybrid_similarity(avec, bvecs, atks: list[str],
                      btkss: list[list[str]], dealer: "TermWeightDealer",
                      tkweight: float = 0.3, vtweight: float = 0.7):
    """query.py:205-213: cosine fusion with the all-cosines-zero
    fallback to pure token similarity. Returns (sim, tksim, vtsim) as
    lists."""
    import numpy as np

    a = np.asarray(avec, dtype=float)
    b = np.asarray(bvecs, dtype=float)
    an = np.linalg.norm(a)
    bn = np.linalg.norm(b, axis=1)
    denom = an * bn
    sims = np.where(denom > 0, b @ a / np.where(denom > 0, denom, 1.0),
                    0.0)
    tksim = token_similarity(dealer, atks, btkss)
    if float(np.sum(sims)) == 0.0:
        return list(np.array(tksim)), tksim, list(sims)
    fused = sims * vtweight + np.array(tksim) * tkweight
    return list(fused), tksim, list(sims)


class TermWeightDealer:
    """term_weight.py Dealer (module docstring for the seam notes)."""

    def __init__(self, ne: dict[str, str] | None = None,
                 df: dict[str, int] | None = None,
                 stop_words: set[str] | None = None,
                 tokenizer=None):
        self.ne = ne or {}
        self.df = df or {}
        self.sk = set()
        self.stop_words = stop_words or set(STOP_WORDS)
        # production resources drop in through these seams: ne/df are
        # the rag/res tables, tokenizer a HuqieTokenizer loaded with a
        # full-vocabulary dictionary
        self._tok = tokenizer if tokenizer is not None \
            else default_tokenizer()
        self._memo: dict[str, float] = {}

    def pretoken(self, txt: str, num: bool = False,
                 stpwd: bool = True) -> list[str]:
        """:84-113: tokenize, drop stopwords/interrogatives, mask
        pattern hits as '#' then drop them."""
        patt = [r"[~—\t @#%!<>,\.\?\":;'\{\}\[\]_=\(\)\|，。？》•●○↓《；‘’：“”【¥ 】…￥！、·（）×`&\\/「」\\]"]
        res = []
        for t in self._tok.tokenize(txt).split():
            tk = t
            if (stpwd and tk in self.stop_words) or (
                    re.match(r"[0-9]$", tk) and not num):
                continue
            for p in patt:
                if re.match(p, t):
                    tk = "#"
                    break
            if tk != "#" and tk:
                res.append(tk)
        return res

    def token_merge(self, tks: list[str]) -> list[str]:
        """:115-141: regroup runs of single-char / short-alnum terms."""
        def one_term(t: str) -> bool:
            return len(t) == 1 or bool(re.match(r"[0-9a-z]{1,2}$", t))

        res: list[str] = []
        i = 0
        while i < len(tks):
            j = i
            if i == 0 and one_term(tks[i]) and len(tks) > 1 and (
                    len(tks[i + 1]) > 1
                    and not re.match(r"[0-9a-zA-Z]", tks[i + 1])):
                res.append(" ".join(tks[0:2]))
                i = 2
                continue
            while j < len(tks) and tks[j] \
                    and tks[j] not in self.stop_words \
                    and one_term(tks[j]):
                j += 1
            if j - i > 1:
                if j - i < 5:
                    res.append(" ".join(tks[i:j]))
                    i = j
                else:
                    res.append(" ".join(tks[i:i + 2]))
                    i = i + 2
            else:
                if len(tks[i]) > 0:
                    res.append(tks[i])
                i += 1
        return [t for t in res if t]

    def split(self, txt: str) -> list[str]:
        """:149-159: glue adjacent latin terms back together."""
        tks: list[str] = []
        for t in re.sub(r"[ \t]+", " ", txt).split():
            if tks and re.match(r".*[a-zA-Z]$", tks[-1]) \
                    and re.match(r".*[a-zA-Z]$", t) \
                    and self.ne.get(t, "") != "func" \
                    and self.ne.get(tks[-1], "") != "func":
                tks[-1] = tks[-1] + " " + t
            else:
                tks.append(t)
        return tks

    # -- the weight pipeline (:161-244) ----------------------------------

    def _ner_mult(self, t: str) -> float:
        if re.match(r"[0-9,.]{2,}$", t):
            return 2
        if re.match(r"[a-z]{1,2}$", t):
            return 0.01
        if not self.ne or t not in self.ne:
            return 1
        m = {"toxic": 2, "func": 1, "corp": 3, "loca": 3, "sch": 3,
             "stock": 3, "firstnm": 1}
        return m[self.ne[t]]

    def _postag_mult(self, t: str) -> float:
        tag = self._tok.tag(t)
        if tag in ("r", "c", "d"):
            return 0.3
        if tag in ("ns", "nt"):
            return 3
        if tag == "n":
            return 2
        if re.match(r"[0-9-]+", tag):
            return 2
        return 1

    def _freq(self, t: str) -> float:
        if re.match(r"[0-9. -]{2,}$", t):
            return 3
        s = self._tok.freq(t)
        if not s and re.match(r"[a-z. -]+$", t):
            return 300
        if not s:
            s = 0
        if not s and len(t) >= 4:
            parts = [tt for tt in
                     self._tok.fine_grained_tokenize(t).split()
                     if len(tt) > 1]
            if len(parts) > 1:
                s = min(self._freq(tt) for tt in parts) / 6.0
            else:
                s = 0
        return max(s, 10)

    def _df(self, t: str) -> float:
        if re.match(r"[0-9. -]{2,}$", t):
            return 5
        if t in self.df:
            return self.df[t] + 3
        if re.match(r"[a-z. -]+$", t):
            return 300
        if len(t) >= 4:
            parts = [tt for tt in
                     self._tok.fine_grained_tokenize(t).split()
                     if len(tt) > 1]
            if len(parts) > 1:
                return max(3, min(self._df(tt) for tt in parts) / 6.0)
        return 3

    @staticmethod
    def _idf(s: float, n: float) -> float:
        return math.log10(10 + ((n - s + 0.5) / (s + 0.5)))

    def _one(self, t: str) -> float:
        """Unnormalized weight of one term — a pure function of the
        term, memoized (Zipf makes the distinct-term set tiny relative
        to the token stream; this is the tokenization hot path)."""
        w = self._memo.get(t)
        if w is None:
            idf1 = self._idf(self._freq(t), 10000000)
            idf2 = self._idf(self._df(t), 1000000000)
            w = ((0.3 * idf1 + 0.7 * idf2)
                 * self._ner_mult(t) * self._postag_mult(t))
            if len(self._memo) < (1 << 16):
                self._memo[t] = w
        return w

    def weights(self, tks: list[str],
                preprocess: bool = True) -> list[tuple[str, float]]:
        one = self._one
        tw: list[tuple[str, float]] = []
        if not preprocess:
            tw = [(t, one(t)) for t in tks]
        else:
            for tk in tks:
                tt = self.token_merge(self.pretoken(tk, True))
                tw.extend((t, one(t)) for t in tt)
        total = sum(w for _t, w in tw)
        if not total:
            return [(t, 0.0) for t, _w in tw]
        return [(t, w / total) for t, w in tw]
