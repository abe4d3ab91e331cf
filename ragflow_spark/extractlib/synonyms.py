"""Synonym lookup machinery: rag/nlp/synonym.py Dealer re-expressed.

The reference resolves synonyms from two sources (synonym.py:67-77):
wordnet synsets for bare [a-z]+ terms, and a ``synonym.json`` dictionary
(a downloaded resource, hot-reloaded from redis) for everything else.
Neither wordnet (nltk corpus download) nor synonym.json ships in this
sandbox, so — same pattern as the huqie dictionary and the NER table —
the *machinery* ships with an embedded mini-dictionary and both resource
seams stay injectable through the constructor. The [a-z]+ branch keeps
the reference's self-exclusion (a term is never its own synonym) and the
dictionary branch keeps the lower/whitespace normalization, str->list
promotion, and topn cap.
"""

from __future__ import annotations

import re

# embedded mini-dictionary (keys are huqie tokens, i.e. stemmed for
# English); enough to exercise every machinery path against the driver
# corpus — 'merg'->'join' is the one mapping whose synonym exists in the
# corpus vocabulary, the rest verify zero-hit expansion costs nothing
MINI_SYNONYMS: dict[str, list[str] | str] = {
    "fast": ["quick", "speedy"],
    "merg": ["join"],
    "scan": ["sweep"],
    "vector": "array",           # str form, promoted to [str]
    "数据": ["资料"],
}


class SynonymDealer:
    """synonym.py Dealer minus the redis hot-reload loop (a cache
    refresh concern, not query semantics)."""

    def __init__(self, dictionary: dict | None = None,
                 wordnet_lookup=None):
        self.dictionary = MINI_SYNONYMS if dictionary is None \
            else dictionary
        # seam for a real wordnet: callable tk -> list[str]
        self.wordnet_lookup = wordnet_lookup

    def lookup(self, tk: str, topn: int = 8) -> list[str]:
        if re.match(r"[a-z]+$", tk) and self.wordnet_lookup is not None:
            res = list(set(self.wordnet_lookup(tk)) - {tk})
            return [t for t in res if t]
        res = self.dictionary.get(re.sub(r"[ \t]+", " ", tk.lower()), [])
        if isinstance(res, str):
            res = [res]
        return res[:topn]
