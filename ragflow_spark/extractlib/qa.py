"""QA template primitives: question-bullet detection and Q/A pairing.

Behavioral equivalents of the reference QA helpers
(/root/reference/rag/nlp/__init__.py:74-165) and the qa template's
txt branch (/root/reference/rag/app/qa.py:334-371):

- ``qbullets_category`` keeps the reference quirk that each pattern's
  hit count saturates at 1 (inner ``break``), so the FIRST pattern
  matching any section wins.
- ``index_int`` converts arabic / english word / chinese numeral /
  roman numeral indices; the reference delegates to the w2n, cn2an and
  roman packages (absent here) — the small closed-class converters
  below cover the values the patterns can produce.
- ``qa_pairs_from_txt`` replicates the delimiter vote (tab vs comma)
  and the emit-on-next-question accumulation, including the final
  flush and the answer-continuation join with newline.
"""

from __future__ import annotations

import re

QUESTION_PATTERN = [
    r"第([零一二三四五六七八九十百0-9]+)问",
    r"第([零一二三四五六七八九十百0-9]+)条",
    r"[\(（]([零一二三四五六七八九十百]+)[\)）]",
    r"第([0-9]+)问",
    r"第([0-9]+)条",
    r"([0-9]{1,2})[\. 、]",
    r"([零一二三四五六七八九十百]+)[ 、]",
    r"[\(（]([0-9]{1,2})[\)）]",
    r"QUESTION (ONE|TWO|THREE|FOUR|FIVE|SIX|SEVEN|EIGHT|NINE|TEN)",
    r"QUESTION (I+V?|VI*|XI|IX|X)",
    r"QUESTION ([0-9]+)",
]

_EN_WORDS = {w: i + 1 for i, w in enumerate(
    ["one", "two", "three", "four", "five", "six", "seven", "eight",
     "nine", "ten"])}
_CN_DIGITS = {"零": 0, "一": 1, "二": 2, "三": 3, "四": 4, "五": 5,
              "六": 6, "七": 7, "八": 8, "九": 9}
_ROMAN = {"I": 1, "V": 5, "X": 10}


def _cn_to_int(s: str) -> int:
    """Chinese numerals up to 百-scale (the pattern alphabet)."""
    if not s or any(c not in _CN_DIGITS and c not in ("十", "百")
                    for c in s):
        raise ValueError(s)
    total, num = 0, 0
    for c in s:
        if c == "百":
            total += (num or 1) * 100
            num = 0
        elif c == "十":
            total += (num or 1) * 10
            num = 0
        else:
            num = _CN_DIGITS[c]
    return total + num


def _roman_to_int(s: str) -> int:
    if not s or any(c not in _ROMAN for c in s):
        raise ValueError(s)
    total = 0
    for i, c in enumerate(s):
        v = _ROMAN[c]
        if i + 1 < len(s) and _ROMAN[s[i + 1]] > v:
            total -= v
        else:
            total += v
    return total


def index_int(index_str: str) -> int:
    """Numeric value of a question index; -1 when unconvertible
    (rag/nlp/__init__.py:133-147)."""
    for conv in (int,
                 lambda s: _EN_WORDS[s.strip().lower()],
                 _cn_to_int,
                 _roman_to_int):
        try:
            return conv(index_str)
        except (ValueError, KeyError, TypeError):
            continue
    return -1


def not_bullet(line: str) -> bool:
    from .merge import not_bullet as _nb
    return _nb(line)


def qbullets_category(sections: list[str]) -> tuple[int, str]:
    """First question pattern matching any section (reference quirk:
    per-pattern hits saturate at 1; earliest pattern wins ties)."""
    hits = [0] * len(QUESTION_PATTERN)
    for i, patt in enumerate(QUESTION_PATTERN):
        for sec in sections:
            if re.match(patt, sec) and not not_bullet(sec):
                hits[i] += 1
                break
    maxium, res = 0, -1
    for i, h in enumerate(hits):
        if h <= maxium:
            continue
        res, maxium = i, h
    return res, QUESTION_PATTERN[res]


def rm_prefix(txt: str) -> str:
    """qa.py:262-264."""
    return re.sub(
        r"^(问题|答案|回答|user|assistant|Q|A|Question|Answer|问|答)"
        r"[\t:： ]+", "", txt.strip(), flags=re.IGNORECASE)


def be_adoc_text(q: str, a: str, eng: bool) -> str:
    """qa.py:292-303 content_with_weight surface."""
    qprefix = "Question: " if eng else "问题："
    aprefix = "Answer: " if eng else "回答："
    return "\t".join([qprefix + rm_prefix(q), aprefix + rm_prefix(a)])


def qa_pairs_from_txt(txt: str) -> list[tuple[str, str]]:
    """qa.py:334-371 txt branch: delimiter vote, pair accumulation with
    answer-continuation lines, final flush."""
    lines = txt.split("\n")
    comma = sum(1 for ln in lines if len(ln.split(",")) == 2)
    tab = sum(1 for ln in lines if len(ln.split("\t")) == 2)
    delimiter = "\t" if tab >= comma else ","

    pairs: list[tuple[str, str]] = []
    question, answer = "", ""
    for ln in lines:
        arr = ln.split(delimiter)
        if len(arr) != 2:
            if question:
                answer += "\n" + ln
        else:
            if question and answer:
                pairs.append((question, answer))
            question, answer = arr
    if question:
        pairs.append((question, answer))
    return pairs


def tag_pairs_from_txt(txt: str) -> list[tuple[str, list[str]]]:
    """tag template txt branch (rag/app/tag.py:61-92): delimiter vote,
    then (content, tags) rows. Reference quirks kept: content always
    carries a leading newline (the accumulator prepends '\\n' before
    checking emptiness) and multi-line content accumulates unmatched
    lines; tags split on ',' with '.' -> '_' (tag.py:26-33)."""
    lines = txt.split("\n")
    comma = sum(1 for ln in lines if len(ln.split(",")) == 2)
    tab = sum(1 for ln in lines if len(ln.split("\t")) == 2)
    delimiter = "\t" if tab >= comma else ","

    out: list[tuple[str, list[str]]] = []
    content = ""
    for ln in lines:
        arr = ln.split(delimiter)
        if len(arr) != 2:
            content += "\n" + ln
        else:
            content += "\n" + arr[0]
            tags = [t.strip().replace(".", "_")
                    for t in arr[1].split(",") if t.strip()]
            out.append((content, tags))
            content = ""
    return out


def qa_pairs_from_docx(blob: bytes) -> list[tuple[str, str]]:
    """QA template, DOCX paragraph branch (rag/app/qa.py:201-239):
    Heading paragraphs (docx_question_level without a bullet family —
    only styles count) maintain a question stack; Normal paragraphs
    accumulate the answer with the reference's leading-newline quirk;
    a new question at level L pops the stack to above L and flushes
    the previous (joined-stack question, answer) pair. Images ride the
    concat_img seam (no embedded media in this parser -> None, the
    reference's own no-image path). Tables flow through the table
    pipeline instead (docxparse.compose_table_content)."""
    from .docxparse import parse_docx
    from .merge import concat_img, docx_question_level

    secs, _tbls = parse_docx(blob)
    last_answer, last_image = "", None
    question_stack: list[str] = []
    level_stack: list[int] = []
    out: list[tuple[str, str]] = []
    for text, style in secs:
        question_level, p_text = 0, ""
        if text.strip():
            question_level, p_text = docx_question_level(text, style)
        if not question_level or question_level > 6:
            last_answer = f"{last_answer}\n{p_text}"
            last_image = concat_img(last_image, None)
        else:
            if last_answer or last_image:
                sum_question = "\n".join(question_stack)
                if sum_question:
                    out.append((sum_question, last_answer))
                last_answer, last_image = "", None
            while question_stack and question_level <= level_stack[-1]:
                question_stack.pop()
                level_stack.pop()
            question_stack.append(p_text)
            level_stack.append(question_level)
    if last_answer:
        sum_question = "\n".join(question_stack)
        if sum_question:
            out.append((sum_question, last_answer))
    return out


def manual_sections_from_docx(blob: bytes) -> list[str]:
    """Manual template, DOCX paragraph branch (rag/app/manual.py:
    111-151): the same heading-stack walk as the QA branch, emitting
    one text per flush — f'{stacked question}\\n{answer}' (the answer
    already carries its leading newline, so the join is double)."""
    return [f"{q}\n{a}" for q, a in qa_pairs_from_docx(blob)]
