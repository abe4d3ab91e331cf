"""Small text-distance utilities for entity resolution.

``levenshtein`` replaces the reference's ``editdistance.eval``
(graphrag/entity_resolution.py:186) — the standard two-row DP, O(len_a
* len_b) time, O(min_len) space.
"""

from __future__ import annotations


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def is_similar_entity(a: str, b: str) -> bool:
    """graphrag/entity_resolution.py:184-192 is_similarity: a latin
    pair is a candidate when the edit distance is at most half the
    shorter name; ANY pair is a candidate when the names share more
    than one distinct character. The reference hands is_english a
    STRING, making it a per-character >80% latin vote — kept verbatim
    by calling the same function the same way."""
    from .merge import is_english

    if is_english(a) and is_english(b):
        if levenshtein(a, b) <= min(len(a), len(b)) // 2:
            return True
    if len(set(a) & set(b)) > 1:
        return True
    return False
