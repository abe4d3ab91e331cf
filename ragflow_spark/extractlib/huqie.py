"""rag_tokenizer machinery: dictionary trie, bidirectional maximum
matching, DFS re-segmentation, token merge.

Behavioral re-expression of the reference RagTokenizer
(/root/reference/rag/nlp/rag_tokenizer.py): dictionary load with the
log-frequency fold (:38-56), forward/backward maximum matching
(:219-263), the pruned DFS over segmentations with its scoring
``B/len + L + F`` (:116-199), the split-char merge pass (:203-217), the
bidirectional reconciliation in ``tokenize`` (:291-360), and
``fine_grained_tokenize`` (:363-401).

Divergences (SURVEY.md §2.7, all resource-bound, machinery intact):

- the production ``huqie.txt`` dictionary is a downloaded resource; an
  EMBEDDED mini-dictionary (same line format, loaded through the same
  ``load_dict`` fold) makes the machinery rule-correct though
  vocabulary-limited — callers can load a full dictionary through the
  same seam;
- ``datrie.Trie(string.printable)`` keyed by byte-repr strings is an
  implementation detail of the reference; a char-keyed dict trie has
  identical prefix semantics at whole-character boundaries (the only
  boundaries the algorithms query);
- traditional->simplified folding (HanziConv) and WordNet
  lemmatization are corpus-bound; identity / Porter-only here;
- the reference's English branch runs nltk ``word_tokenize`` per
  alnum run; after the ``\\W+`` fold each run is a single alnum token
  (punkt sees no sentence-final punctuation, and the Treebank
  punctuation/quote rules are no-ops without punctuation), so the
  pipeline reduces to whitespace split PLUS the MacIntyre contraction
  table's apostrophe-free entries — ``cannot/gimme/gonna/gotta/
  lemme/wanna`` split in two; the apostrophe-carrying patterns
  (``d'ye``, ``mor'n``, ``'tis``, ``'twas`` and every ``n't``-family
  rule) can never fire because ``\\W+`` has already replaced the
  apostrophe with a space.  Inside a ``\\w+`` run the patterns' ``\\b``
  anchors exist only at the ends, so a whole-token table lookup is
  exactly equivalent (``wanna``'s trailing ``\\s`` always matches:
  the Treebank tokenizer pads the text with a trailing space).
  Replicated via ``_TREEBANK_SPLITS``.
"""

from __future__ import annotations

import math
import re

from .porter import stem as _stem

DENOMINATOR = 1000000

# nltk TreebankWordTokenizer (MacIntyreContractions) splits that can
# still fire on \W+-folded text: the apostrophe-free CONTRACTIONS2
# entries.  Input reaching the English branch is already lowercased,
# so the patterns' (?i) is moot; see module docstring for the
# whole-token-equivalence argument.
_TREEBANK_SPLITS = {
    "cannot": ("can", "not"),
    "gimme": ("gim", "me"),
    "gonna": ("gon", "na"),
    "gotta": ("got", "ta"),
    "lemme": ("lem", "me"),
    "wanna": ("wan", "na"),
}

SPLIT_CHAR = (r"([ ,\.<>/?;:'\[\]\\`!@#$%^&*\(\)\{\}\|_+=《》，。？、；"
              r"‘’：“”【】~！￥%……（）——-]+|[a-zA-Z0-9,\.-]+)")

# embedded mini-dictionary, reference huqie.txt line format:
# "<word> <frequency> <pos-tag>"
EMBEDDED_DICT = """\
中华人民共和国 1000 ns
中华 2000 nz
华人 800 n
人民 5000 n
共和国 1500 n
共和 600 nz
数据 8000 n
数据库 3000 n
分析 6000 vn
管道 1200 n
研究 9000 vn
研究生 2000 n
生命 4000 n
起源 1000 n
文档 3000 n
提取 2500 v
大规模 1800 b
规模 2200 n
模型 5000 n
语言 4500 n
自然 5200 n
自然语言 900 nz
处理 7000 v
"""


class CharTrie:
    """Minimal char-keyed trie: value store + prefix existence."""

    __slots__ = ("_root",)
    _LEAF = "\x00"

    def __init__(self) -> None:
        self._root: dict = {}

    def put(self, key: str, value) -> None:
        node = self._root
        for ch in key:
            node = node.setdefault(ch, {})
        node[self._LEAF] = value

    def get(self, key: str):
        node = self._root
        for ch in key:
            node = node.get(ch)
            if node is None:
                return None
        return node.get(self._LEAF)

    def __contains__(self, key: str) -> bool:
        return self.get(key) is not None

    def has_keys_with_prefix(self, prefix: str) -> bool:
        node = self._root
        for ch in prefix:
            node = node.get(ch)
            if node is None:
                return False
        return True


class HuqieTokenizer:
    """The trie + segmentation machinery (module docstring)."""

    def __init__(self, dict_text: str | None = None):
        self.trie = CharTrie()
        self.rtrie = CharTrie()  # reversed keys (maxBackward_ support)
        self.load_dict(dict_text if dict_text is not None
                       else EMBEDDED_DICT)

    def load_dict(self, text: str) -> None:
        """rag_tokenizer.py:38-56: freq folds to
        int(log(freq/DENOMINATOR) + 0.5); higher freq wins on repeats;
        reversed key marks word-end reachability for backward match."""
        for line in text.splitlines():
            parts = re.split(r"[ \t]+", line.strip())
            if len(parts) < 3:
                continue
            word = parts[0].lower()
            f = int(math.log(float(parts[1]) / DENOMINATOR) + 0.5)
            old = self.trie.get(word)
            if old is None or old[0] < f:
                self.trie.put(word, (f, parts[2]))
            self.rtrie.put(word[::-1], 1)

    # -- lookups ---------------------------------------------------------

    def freq(self, tk: str) -> int:
        v = self.trie.get(tk.lower())
        if v is None:
            return 0
        return int(math.exp(v[0]) * DENOMINATOR + 0.5)

    def tag(self, tk: str) -> str:
        v = self.trie.get(tk.lower())
        return v[1] if v else ""

    # -- scoring (rag_tokenizer.py:181-199) ------------------------------

    def _score(self, tfts):
        B = 30
        F, L, tks = 0, 0, []
        for tk, (f, _tag) in tfts:
            F += f
            L += 0 if len(tk) < 2 else 1
            tks.append(tk)
        L = L / len(tks)
        return tks, B / len(tks) + L + F

    def _sort_tks(self, tkslist):
        res = [self._score(tfts) for tfts in tkslist]
        return sorted(res, key=lambda x: x[1], reverse=True)

    # -- maximum matching (rag_tokenizer.py:219-263) ---------------------

    def _max_forward(self, line: str):
        res = []
        s = 0
        while s < len(line):
            e = s + 1
            t = line[s:e]
            while e < len(line) and self.trie.has_keys_with_prefix(t):
                e += 1
                t = line[s:e]
            while e - 1 > s and t not in self.trie:
                e -= 1
                t = line[s:e]
            v = self.trie.get(t)
            res.append((t, v if v else (0, "")))
            s = e
        return self._score(res)

    def _max_backward(self, line: str):
        res = []
        s = len(line) - 1
        while s >= 0:
            e = s + 1
            t = line[s:e]
            while s > 0 and self.rtrie.has_keys_with_prefix(t[::-1]):
                s -= 1
                t = line[s:e]
            while s + 1 < e and t not in self.trie:
                s += 1
                t = line[s:e]
            v = self.trie.get(t)
            res.append((t, v if v else (0, "")))
            s -= 1
        return self._score(res[::-1])

    # -- DFS over segmentations (rag_tokenizer.py:116-167) ---------------

    def dfs(self, chars: str, s: int, pre_tks: list, tkslist: list) -> int:
        res = s
        if len(tkslist) >= 2048:
            return res
        if s >= len(chars):
            tkslist.append(pre_tks)
            return res

        # pruning: skip a start whose 1-char prefix extends but whose
        # 2-char prefix does not; same when three 1-char tokens precede
        S = s + 1
        if s + 2 <= len(chars):
            t1, t2 = chars[s:s + 1], chars[s:s + 2]
            if self.trie.has_keys_with_prefix(t1) and \
                    not self.trie.has_keys_with_prefix(t2):
                S = s + 2
        if len(pre_tks) > 2 and len(pre_tks[-1][0]) == 1 \
                and len(pre_tks[-2][0]) == 1 \
                and len(pre_tks[-3][0]) == 1:
            t1 = pre_tks[-1][0] + chars[s:s + 1]
            if self.trie.has_keys_with_prefix(t1):
                S = s + 2

        for e in range(S, len(chars) + 1):
            t = chars[s:e]
            if e > s + 1 and not self.trie.has_keys_with_prefix(t):
                break
            if t in self.trie:
                pretks = [tuple(p) for p in pre_tks]
                pretks.append((t, self.trie.get(t)))
                res = max(res, self.dfs(chars, e, pretks, tkslist))

        if res > s:
            return res

        t = chars[s:s + 1]
        v = self.trie.get(t)
        pre_tks.append((t, v if v else (-12, "")))
        return self.dfs(chars, s + 1, pre_tks, tkslist)

    # -- merge pass (rag_tokenizer.py:203-217) ---------------------------

    def _merge(self, tks: str) -> str:
        res = []
        arr = re.sub(r"[ ]+", " ", tks).split()
        s = 0
        while s < len(arr):
            E = s + 1
            for e in range(s + 2, min(len(arr) + 2, s + 6)):
                tk = "".join(arr[s:e])
                if re.search(SPLIT_CHAR, tk) and self.freq(tk):
                    E = e
            res.append("".join(arr[s:E]))
            s = E
        return " ".join(res)

    # -- language split (rag_tokenizer.py:268-289) -----------------------

    @staticmethod
    def _is_chinese(ch: str) -> bool:
        return "一" <= ch <= "龥"

    def _split_by_lang(self, line: str):
        pairs = []
        for a in re.split(SPLIT_CHAR, line):
            if not a:
                continue
            s, e = 0, 1
            zh = self._is_chinese(a[0])
            while e < len(a):
                _zh = self._is_chinese(a[e])
                if _zh == zh:
                    e += 1
                    continue
                pairs.append((a[s:e], zh))
                s, e, zh = e, e + 1, _zh
            if s < len(a):
                pairs.append((a[s:e], zh))
        return pairs

    # -- the full tokenize (rag_tokenizer.py:291-360) --------------------

    def tokenize(self, line: str) -> str:
        from .ragtok import str_q2b

        line = re.sub(r"\W+", " ", line, flags=re.UNICODE)
        line = str_q2b(line).lower()
        # tradi2simp: identity (HanziConv is a downloaded resource)

        res: list[str] = []
        for L, zh in self._split_by_lang(line):
            if not zh:
                # word_tokenize = whitespace split + the apostrophe-
                # free Treebank contraction splits (module docstring);
                # WordNet lemmatize is identity (divergence note above)
                res.extend(_stem(p) for t in L.split()
                           for p in _TREEBANK_SPLITS.get(t, (t,)))
                continue
            if len(L) < 2 or re.match(r"[a-z\.-]+$", L) \
                    or re.match(r"[0-9\.-]+$", L):
                res.append(L)
                continue

            tks, _s = self._max_forward(L)
            tks1, _s1 = self._max_backward(L)

            i, j, _i, _j = 0, 0, 0, 0
            same = 0
            while i + same < len(tks1) and j + same < len(tks) \
                    and tks1[i + same] == tks[j + same]:
                same += 1
            if same > 0:
                res.append(" ".join(tks[j:j + same]))
            _i, _j = i + same, j + same
            j, i = _j + 1, _i + 1

            while i < len(tks1) and j < len(tks):
                tk1, tk = "".join(tks1[_i:i]), "".join(tks[_j:j])
                if tk1 != tk:
                    if len(tk1) > len(tk):
                        j += 1
                    else:
                        i += 1
                    continue
                if tks1[i] != tks[j]:
                    i += 1
                    j += 1
                    continue
                tkslist: list = []
                self.dfs("".join(tks[_j:j]), 0, [], tkslist)
                res.append(" ".join(self._sort_tks(tkslist)[0][0]))
                same = 1
                while i + same < len(tks1) and j + same < len(tks) \
                        and tks1[i + same] == tks[j + same]:
                    same += 1
                res.append(" ".join(tks[j:j + same]))
                _i, _j = i + same, j + same
                j, i = _j + 1, _i + 1

            if _i < len(tks1):
                tkslist = []
                self.dfs("".join(tks[_j:]), 0, [], tkslist)
                res.append(" ".join(self._sort_tks(tkslist)[0][0]))

        return self._merge(" ".join(res))

    # -- fine-grained pass (rag_tokenizer.py:363-401) --------------------

    def fine_grained_tokenize(self, tks: str) -> str:
        arr = tks.split()
        zh_num = len([1 for c in arr if c and self._is_chinese(c[0])])
        if zh_num < len(arr) * 0.2:
            res: list[str] = []
            for tk in arr:
                res.extend(tk.split("/"))
            return " ".join(res)

        res = []
        for tk in arr:
            if len(tk) < 3 or re.match(r"[0-9,\.-]+$", tk):
                res.append(tk)
                continue
            tkslist: list = []
            if len(tk) > 10:
                tkslist.append(tk)
            else:
                self.dfs(tk, 0, [], tkslist)
            if len(tkslist) < 2:
                res.append(tk)
                continue
            stk = self._sort_tks(tkslist)[1][0]
            if len(stk) == len(tk):
                stk = tk
            else:
                if re.match(r"[a-z\.-]+$", tk):
                    for t in stk:
                        if len(t) < 3:
                            stk = tk
                            break
                    else:
                        stk = " ".join(stk)
                else:
                    stk = " ".join(stk)
            res.append(stk)

        return " ".join(
            _stem(t) if re.match(r"[a-zA-Z_-]+$", t) else t
            for t in res)


_DEFAULT: HuqieTokenizer | None = None


def default_tokenizer() -> HuqieTokenizer:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = HuqieTokenizer()
    return _DEFAULT


def tokenize(line: str) -> str:
    return default_tokenizer().tokenize(line)


def fine_grained_tokenize(tks: str) -> str:
    return default_tokenizer().fine_grained_tokenize(tks)
