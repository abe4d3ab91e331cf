"""Porter stemmer, implemented from the published algorithm (M.F.
Porter, "An algorithm for suffix stripping", Program 14(3), 1980) with
the widely-adopted revised step-1c (y->i only after a consonant, never
for two-letter words) that NLTK also uses.

Stands in for the reference's ``PorterStemmer().stem`` in
rag/nlp/rag_tokenizer.py:66 (NLTK ships corpora we cannot; the
algorithm itself is public). The WordNet lemmatizer applied before
stemming there is corpus-bound and is a documented divergence
(SURVEY.md §2.7) — identity on the synthetic vocabulary.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """The m in [C](VC){m}[V]."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (len(word) >= 2 and word[-1] == word[-2]
            and _is_cons(word, len(word) - 1))


def _ends_cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (_is_cons(word, len(word) - 3)
            and not _is_cons(word, len(word) - 2)
            and _is_cons(word, len(word) - 1)
            and word[-1] not in "wxy")


def _replace(word: str, suffix: str, repl: str, m_min: int) -> str | None:
    if not word.endswith(suffix):
        return None
    stem = word[:len(word) - len(suffix)]
    if _measure(stem) > m_min:
        return stem + repl
    return word


_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"),
          ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
          ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
          ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
          ("iviti", "ive"), ("biliti", "ble")]

_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"),
          ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", "")]

_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
          "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous",
          "ive", "ize"]


@lru_cache(maxsize=1 << 16)
def stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        done = None
        for suf in ("ed", "ing"):
            if w.endswith(suf) and _has_vowel(w[:len(w) - len(suf)]):
                done = w = w[:len(w) - len(suf)]
                break
        if done is not None:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w += "e"

    # step 1c: y -> i after a consonant when the stem has a vowel
    # (combines the 1980 vowel condition with the revised
    # consonant-before-y guard: happy->happi, sky->sky, enjoy->enjoy)
    if w.endswith("y") and len(w) > 2 and _is_cons(w, len(w) - 2) \
            and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, repl in _STEP2:
        if w.endswith(suf):
            out = _replace(w, suf, repl, 0)
            if out is not None:
                w = out
            break

    # step 3
    for suf, repl in _STEP3:
        if w.endswith(suf):
            out = _replace(w, suf, repl, 0)
            if out is not None:
                w = out
            break

    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem_ = w[:len(w) - len(suf)]
            if _measure(stem_) > 1:
                w = stem_
            break
    else:
        if w.endswith("ion") and len(w) > 3 \
                and w[-4] in "st" and _measure(w[:-3]) > 1:
            w = w[:-3]

    # step 5a
    if w.endswith("e"):
        stem_ = w[:-1]
        m = _measure(stem_)
        if m > 1 or (m == 1 and not _ends_cvc(stem_)):
            w = stem_

    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w
