"""Section-level merge / classification operators.

Behavioral re-expressions (not ports) of the reference ``rag/nlp`` helpers;
each function cites the reference lines whose observable behavior it
matches. Known reference quirks are replicated deliberately and flagged
with ``# quirk:`` comments, because the byte-identity invariant depends on
them. One documented divergence: where the reference samples sections with
the *unseeded* global ``random`` (``random_choices``,
/root/reference/rag/nlp/__init__.py:196-198, used by rag/app/book.py:85,130),
we evaluate the full population — deterministic, and equivalent in the limit.
"""

from __future__ import annotations

import re
from collections import Counter

from .tokens import num_tokens_from_string

# Bullet pattern groups: CN legal / numeric / CN enumeration / EN headings
# (reference rag/nlp/__init__.py:168-193).
BULLET_PATTERN = [
    [
        r"第[零一二三四五六七八九十百0-9]+(分?编|部分)",
        r"第[零一二三四五六七八九十百0-9]+章",
        r"第[零一二三四五六七八九十百0-9]+节",
        r"第[零一二三四五六七八九十百0-9]+条",
        r"[\(（][零一二三四五六七八九十百]+[\)）]",
    ],
    [
        r"第[0-9]+章",
        r"第[0-9]+节",
        r"[0-9]{,2}[\. 、]",
        r"[0-9]{,2}\.[0-9]{,2}[^a-zA-Z/%~-]",
        r"[0-9]{,2}\.[0-9]{,2}\.[0-9]{,2}",
        r"[0-9]{,2}\.[0-9]{,2}\.[0-9]{,2}\.[0-9]{,2}",
    ],
    [
        r"第[零一二三四五六七八九十百0-9]+章",
        r"第[零一二三四五六七八九十百0-9]+节",
        r"[零一二三四五六七八九十百]+[ 、]",
        r"[\(（][零一二三四五六七八九十百]+[\)）]",
        r"[\(（][0-9]{,2}[\)）]",
    ],
    [
        r"PART (ONE|TWO|THREE|FOUR|FIVE|SIX|SEVEN|EIGHT|NINE|TEN)",
        r"Chapter (I+V?|VI*|XI|IX|X)",
        r"Section [0-9]+",
        r"Article [0-9]+",
    ],
]


def not_bullet(line: str) -> bool:
    """Reference rag/nlp/__init__.py:201-205."""
    return any(
        re.match(p, line) for p in (r"0", r"[0-9]+ +[0-9~个只-]", r"[0-9]+\.{2,}")
    )


def bullets_category(sections: list[str]) -> int:
    """Vote the dominant bullet-pattern group; -1 when nothing matches
    (reference rag/nlp/__init__.py:208-224). A section counts at most once
    per group (inner break), and a later group must strictly beat the
    earlier max to win."""
    hits = [0] * len(BULLET_PATTERN)
    for gi, group in enumerate(BULLET_PATTERN):
        for sec in sections:
            if any(re.match(p, sec) and not not_bullet(sec) for p in group):
                hits[gi] += 1
    best, best_hits = -1, 0
    for gi, h in enumerate(hits):
        if h > best_hits:
            best, best_hits = gi, h
    return best


def is_english(texts: list[str]) -> bool:
    """>80% of lines start with an English-ish char
    (reference rag/nlp/__init__.py:227-236)."""
    if not texts:
        return False
    eng = sum(
        1 for t in texts
        if re.match(r"[ `a-zA-Z.,':;/\"?<>!\(\)-]", t.strip())
    )
    return eng / len(texts) > 0.8


def is_chinese(text: str) -> bool:
    """>20% CJK-unified chars (reference rag/nlp/__init__.py:239-248)."""
    if not text:
        return False
    chinese = sum(1 for ch in text if "一" <= ch <= "鿿")
    return chinese / len(text) > 0.2


def not_title(txt: str) -> bool:
    """Reference rag/nlp/__init__.py:412-417."""
    if re.match(r"第[零一二三四五六七八九十百0-9]+条", txt):
        return False
    if len(txt.split()) > 12 or (txt.find(" ") < 0 and len(txt) >= 32):
        return True
    return bool(re.search(r"[,;，。；！!]", txt))


def make_colon_as_title(sections):
    """Split trailing-colon lead-ins into synthetic title sections, in
    place (reference rag/nlp/__init__.py:368-387). String lists pass
    through untouched; only (text, layout) lists are edited.

    quirk: the reference's length gate reads ``arr[1]``, which re.split
    always fills with the captured 1-2 char *delimiter*, so the gate is
    always true and the insert never fires — the function is a de-facto
    no-op. Replicated faithfully (byte identity depends on it)."""
    if not sections:
        return []
    if isinstance(sections[0], str):
        return sections
    i = 0
    while i < len(sections):
        txt, _layout = sections[i]
        i += 1
        txt = txt.split("@")[0].strip()
        if not txt or txt[-1] not in ":：":
            continue
        reversed_txt = txt[::-1]
        arr = re.split(r"([。？！!?;；]| \.)", reversed_txt)
        # quirk: the lead-in (arr[0], reading backwards) becomes a title
        # only when the *preceding sentence piece* is >=32 chars long
        if len(arr) < 2 or len(arr[1]) < 32:
            continue
        sections.insert(i - 1, (arr[0][::-1], "title"))
        i += 1
    return sections


_TOC_HEADING_RE = r"(contents|目录|目次|table of contents|致谢|acknowledge)$"


def remove_contents_table(sections, eng: bool = False) -> None:
    """Delete a table-of-contents run from a section list, in place
    (reference rag/nlp/__init__.py:336-365)."""

    def get(i: int) -> str:
        s = sections[i]
        return (s if isinstance(s, str) else s[0]).strip()

    i = 0
    while i < len(sections):
        # quirk: the reference passes re.IGNORECASE (==2) as re.sub's
        # *count* argument, so only the first 2 space-chars are removed and
        # the match stays case-sensitive; replicated as count=2
        head = re.sub(r"( | |　)+", "", get(i).split("@@")[0], 2)
        if not re.match(_TOC_HEADING_RE, head):
            i += 1
            continue
        sections.pop(i)
        if i >= len(sections):
            break
        prefix = get(i)[:3] if not eng else " ".join(get(i).split()[:2])
        while not prefix:
            sections.pop(i)
            if i >= len(sections):
                break
            prefix = get(i)[:3] if not eng else " ".join(get(i).split()[:2])
        sections.pop(i)
        if i >= len(sections) or not prefix:
            break
        for j in range(i, min(i + 128, len(sections))):
            if not re.match(prefix, get(j)):
                continue
            for _ in range(i, j):
                sections.pop(i)
            break


def title_frequency(bull: int, sections):
    """Per-section bullet level + the most frequent (pivot) level
    (reference rag/nlp/__init__.py:390-409)."""
    bullets_size = len(BULLET_PATTERN[bull]) if bull >= 0 else 0
    levels = [bullets_size + 1] * len(sections)
    if not sections or bull < 0:
        return bullets_size + 1, levels

    for i, (txt, layout) in enumerate(sections):
        for j, p in enumerate(BULLET_PATTERN[bull]):
            if re.match(p, txt.strip()) and not not_bullet(txt):
                levels[i] = j
                break
        else:
            if re.search(r"(title|head)", layout) and not not_title(
                    txt.split("@")[0]):
                levels[i] = bullets_size
    most_level = bullets_size + 1
    for level, _cnt in sorted(Counter(levels).items(),
                              key=lambda x: -x[1]):
        if level <= bullets_size:
            most_level = level
            break
    return most_level, levels


def hierarchical_merge(bull: int, sections, depth: int):
    """Bucket sections into bullet levels, then for each heading within
    ``depth`` levels, chain the nearest preceding lower-level entries and
    emit the span as one chunk; finally re-merge singleton chunks under a
    218-token budget (reference rag/nlp/__init__.py:420-507)."""
    if not sections or bull < 0:
        return []
    if isinstance(sections[0], str):
        sections = [(s, "") for s in sections]
    sections = [
        (t, o) for t, o in sections
        if t and len(t.split("@")[0].strip()) > 1
        and not re.match(r"[0-9]+$", t.split("@")[0].strip())
    ]
    bullets_size = len(BULLET_PATTERN[bull])
    levels: list[list[int]] = [[] for _ in range(bullets_size + 2)]

    for i, (txt, layout) in enumerate(sections):
        for j, p in enumerate(BULLET_PATTERN[bull]):
            if re.match(p, txt.strip()):
                levels[j].append(i)
                break
        else:
            if re.search(r"(title|head)", layout) and not not_title(txt):
                levels[bullets_size].append(i)
            else:
                levels[bullets_size + 1].append(i)
    texts = [t for t, _ in sections]

    def floor_index(arr: list[int], target: int) -> int:
        """Largest position whose value is < target; -1 if none
        (the reference's binary_search — targets never equal entries)."""
        if not arr:
            return -1
        if target > arr[-1]:
            return len(arr) - 1
        if target < arr[0]:
            return -1
        lo, hi = 0, len(arr)
        while hi - lo > 1:
            mid = (hi + lo) // 2
            if target > arr[mid]:
                lo = mid
            else:
                hi = mid
        return lo

    cks: list[list[int]] = []
    readed = [False] * len(texts)
    rev = levels[::-1]
    for i, arr in enumerate(rev[:depth]):
        for j in arr:
            if readed[j]:
                continue
            readed[j] = True
            cks.append([j])
            # quirk: the second-to-last level skips the chain walk entirely
            if i + 1 == len(rev) - 1:
                continue
            for ii in range(i + 1, len(rev)):
                jj = floor_index(rev[ii], j)
                if jj < 0:
                    continue
                if rev[ii][jj] > cks[-1][-1]:
                    cks[-1].pop(-1)
                cks[-1].append(rev[ii][jj])
            for ii in cks[-1]:
                readed[ii] = True

    if not cks:
        return cks

    chunks = [[texts[j] for j in ck[::-1]] for ck in cks]

    # re-merge: singleton chunks accumulate under a 218-token budget;
    # multi-section chunks always start fresh (budget poisoned to 218)
    res: list[list[str]] = [[]]
    num = [0]
    for ck in chunks:
        if len(ck) == 1:
            n = num_tokens_from_string(re.sub(r"@@[0-9]+.*", "", ck[0]))
            if n + num[-1] < 218:
                res[-1].append(ck[0])
                num[-1] += n
                continue
            res.append(ck)
            num.append(n)
        else:
            res.append(ck)
            num.append(218)
    return res


def naive_merge(sections, chunk_token_num: int = 128,
                delimiter: str = "\n。；！？") -> list[str]:
    """Greedy section accumulator (reference rag/nlp/__init__.py:510-541).

    quirk: a new chunk starts only when the CURRENT chunk already exceeds
    the budget *before* the incoming section is added, so chunks overshoot
    by up to one section. ``delimiter`` is accepted but unused — the
    reference declares it nonlocal and never splits on it. Position tags
    are appended unless already present; sections under 8 tokens lose
    their tag."""
    if not sections:
        return []
    if isinstance(sections[0], str):
        sections = [(s, "") for s in sections]
    cks = [""]
    tk_nums = [0]
    for sec, pos in sections:
        tnum = num_tokens_from_string(sec)
        if not pos or tnum < 8:
            pos = ""
        text = sec
        if tk_nums[-1] > chunk_token_num:
            if text.find(pos) < 0:
                text += pos
            cks.append(text)
            tk_nums.append(tnum)
        else:
            if cks[-1].find(pos) < 0:
                text += pos
            cks[-1] += text
            tk_nums[-1] += tnum
    return cks


def docx_question_level(text: str, style_name: str = "",
                        bull: int = -1) -> tuple[int, str]:
    """Heading level of a docx paragraph (reference
    rag/nlp/__init__.py:544-555): 'Heading N' styles win outright;
    otherwise the bullet-pattern group index + 1, with the two
    reference fallbacks (0 when no bullet family was voted, the
    family's size when nothing matches). Takes (text, style name)
    instead of a python-docx paragraph object — that is what
    docxparse emits."""
    txt = re.sub("　", " ", text).strip()
    # python-docx maps the spec's lowercase 'heading N' w:name to the
    # UI name 'Heading N' the reference matches on; compare folded
    if style_name.lower().startswith("heading"):
        return int(style_name.split(" ")[-1]), txt
    if bull < 0:
        return 0, txt
    for j, title in enumerate(BULLET_PATTERN[bull]):
        if re.match(title, txt):
            return j + 1, txt
    return len(BULLET_PATTERN[bull]), txt


def concat_img(img1, img2):
    """Vertical image stack (reference rag/nlp/__init__.py:556-574) on
    (width, height) metadata: new = (max widths, summed heights). The
    pixel paste is PIL-bound in the reference; here images are the
    multimodal stub-codec surface, so only the geometry is computed —
    the None-propagation rules are kept verbatim."""
    if img1 and not img2:
        return img1
    if not img1 and img2:
        return img2
    if not img1 and not img2:
        return None
    return (max(img1[0], img2[0]), img1[1] + img2[1])


def naive_merge_docx(sections, chunk_token_num: int = 128,
                     delimiter: str = "\n。；！？"):
    """naive_merge + per-chunk image accumulation (reference
    rag/nlp/__init__.py:577-606): same greedy overshoot accumulator,
    each chunk carrying the vertical concat of its sections' images.
    ``sections`` is [(text, (width, height) | None)]; returns
    (chunks, images). The reference passes pos='' for every docx
    section, so the tag branches reduce to plain append."""
    if not sections:
        return [], []
    cks = [""]
    images = [None]
    tk_nums = [0]
    for sec, image in sections:
        tnum = num_tokens_from_string(sec)
        if tk_nums[-1] > chunk_token_num:
            cks.append(sec)
            images.append(image)
            tk_nums.append(tnum)
        else:
            cks[-1] += sec
            images[-1] = concat_img(images[-1], image)
            tk_nums[-1] += tnum
    return cks, images


def rm_space(txt: str) -> str:
    """Space removal around CJK-ish boundaries (rag/utils/__init__.py:
    37-39): spaces survive only between latin/digit/punct neighbors."""
    txt = re.sub(r"([^a-z0-9.,\)>]) +([^ ])", r"\1\2", txt,
                 flags=re.IGNORECASE)
    return re.sub(r"([^ ]) +([^a-z0-9.,\(<])", r"\1\2", txt,
                  flags=re.IGNORECASE)


def extract_between(text: str, start_tag: str, end_tag: str) -> list[str]:
    """rag/nlp/__init__.py:609-611."""
    pattern = re.escape(start_tag) + r"(.*?)" + re.escape(end_tag)
    return re.findall(pattern, text, flags=re.DOTALL)


def tokenize_table_rows(tables, eng: bool,
                        batch_size: int = 10) -> list[str]:
    """Table rows -> chunk content strings (rag/nlp/__init__.py:294-318
    minus the ES doc assembly): an HTML-string table becomes one chunk;
    desc-row lists batch by ``batch_size`` joined with '; ' (en) or
    '； ' (zh)."""
    res: list[str] = []
    for rows in tables:
        if not rows:
            continue
        if isinstance(rows, str):
            res.append(rows)
            continue
        de = "; " if eng else "； "
        for i in range(0, len(rows), batch_size):
            res.append(de.join(rows[i:i + batch_size]))
    return res
