"""Production-scale dictionary generator for the tokenizer/Dealer seams.

The reference's rag_tokenizer loads a ~500k-entry ``huqie.txt``
(downloaded at runtime — it does not ship in the repo), plus
``ner.json`` (12.5k entities), ``term.freq`` (document frequencies) and
``synonym.json`` (10.5k entries).  Those resources are data, not code:
every machinery path in huqie/termweight/synonyms takes them through a
constructor seam.  This module GENERATES deterministic stand-in tables
at the reference's production scale — same format, same tag sets, same
size class — so the trie build, bidirectional max-match + DFS
reconciliation, and Dealer idf blending are exercised and golden-pinned
at real vocabulary density instead of the embedded mini-dictionary.

Everything derives from one LCG (no ``random``), so the tables are
bit-stable across runs and Python versions; swapping in the real
downloads is a constructor argument, not a code change.
"""

from __future__ import annotations

_M = 1 << 31


def _lcg(seed: int):
    x = seed & (_M - 1)
    while True:
        x = (1103515245 * x + 12345) % _M
        yield x


# huqie.txt POS tag set (the tags rag_tokenizer emits / Dealer gates on)
TAGS = ["n", "v", "a", "d", "nr", "ns", "nt", "vn", "nz", "l", "m", "c"]

_SYLLABLES = ["ta", "ri", "no", "mi", "ka", "shi", "lo", "ven", "dar",
              "sol", "pex", "qu", "zan", "bri", "tor", "ul", "mar",
              "eth", "ny", "gos"]


def _cjk_char(v: int) -> str:
    # common-block codepoints only (U+4E00..U+9FA5)
    return chr(0x4E00 + v % 20902)


def generate_huqie_dict(n_cjk: int = 40000, n_en: int = 10000) -> str:
    """huqie.txt format: ``word<space>freq<space>tag`` per line.

    CJK words are 2-4 chars drawn from the common block with a
    Zipf-ish frequency spread; english words are syllable compounds.
    ~50k entries matches the density class where the DFS
    reconciliation actually has competing segmentations to rank."""
    g = _lcg(0x5EED)
    lines = []
    for _ in range(n_cjk):
        ln = 2 + next(g) % 3
        word = "".join(_cjk_char(next(g)) for _ in range(ln))
        freq = 10 + (next(g) % 1000) ** 2
        tag = TAGS[next(g) % len(TAGS)]
        lines.append(f"{word} {freq} {tag}")
    for _ in range(n_en):
        ln = 2 + next(g) % 3
        word = "".join(_SYLLABLES[next(g) % len(_SYLLABLES)]
                       for _ in range(ln))
        freq = 10 + (next(g) % 1000) ** 2
        tag = TAGS[next(g) % len(TAGS)]
        lines.append(f"{word} {freq} {tag}")
    return "\n".join(lines)


def generate_ner_table(n: int = 12000) -> dict:
    """ner.json stand-in at the reference's entry count, using its tag
    vocabulary (firstnm/stock/toxic plus the Dealer-gated corp/loc/
    sch classes from term_weight.py ner())."""
    g = _lcg(0x4E45)
    tags = ["firstnm", "stock", "toxic", "corp", "loc", "sch"]
    out = {}
    while len(out) < n:
        word = "".join(_cjk_char(next(g)) for _ in range(2 + next(g) % 2))
        out[word] = tags[next(g) % len(tags)]
    return out


def generate_df_table(n: int = 30000) -> dict:
    """term.freq stand-in: document frequencies with a heavy tail."""
    g = _lcg(0xDF01)
    out = {}
    while len(out) < n:
        word = "".join(_cjk_char(next(g)) for _ in range(2 + next(g) % 2))
        out[word] = 1 + (next(g) % 3000) ** 2 // 1000
    return out


def generate_synonyms(n: int = 10000) -> dict:
    """synonym.json stand-in: term -> space-joined alternatives."""
    g = _lcg(0x57A0)
    out = {}
    while len(out) < n:
        word = "".join(_cjk_char(next(g)) for _ in range(2))
        alts = " ".join(
            "".join(_cjk_char(next(g)) for _ in range(2))
            for _ in range(1 + next(g) % 3))
        out[word] = alts
    return out


def dict_words(text: str, k: int, seed: int = 7) -> list:
    """Deterministically sample k entry words from a generated dict
    text (for building golden sentences)."""
    lines = text.splitlines()
    g = _lcg(seed)
    return [lines[next(g) % len(lines)].split()[0] for _ in range(k)]
