"""DeepDOC-style geometric box rules over extracted PDF text boxes.

Behavioral re-expressions of the reference's per-document rule chain
(everything here runs *inside* one document, i.e. inside an Arrow batch
in the Spark job — the rules are sequential per doc by design, exactly
like the reference where one task owns a page range):

- fuzzy sorts           /root/reference/deepdoc/vision/recognizer.py:54-72
- layout tagging (stub) /root/reference/deepdoc/vision/layout_recognizer.py:60-157
- vertical merge        /root/reference/deepdoc/parser/pdf_parser.py:421-470
- TOC / dirty filter    pdf_parser.py:581-630
- same-bullet merge     pdf_parser.py:632-654
- position-tag codec    pdf_parser.py:893-908 (_line_tag), :905 format
                        kept verbatim — the tags are part of the span
                        output contract; rag/nlp/__init__.py:321-333
                        (add_positions) parses them back.

Model-inference seams (ONNX layout detector, TSR, xgb concat) are
replaced by deterministic rules per SURVEY.md §2.4: layout type comes
from font height + garbage regexes (the reference's own post-model
keep/drop rules), and the concat decision uses the rule fallback only.
"""

from __future__ import annotations

import re
from functools import cmp_to_key
from statistics import median

from .pdfplain import PAGE_H

GARBAGE_RES = [
    r"^•+$",
    r"^[0-9]{1,2} / ?[0-9]{1,2}$",
    r"^[0-9]{1,2} of [0-9]{1,2}$",
    r"^http://[^ ]{12,}",
    r"^\(cid *: *[0-9]+ *\)$",
]


def sort_y_firstly(arr: list[dict], threshold: float) -> list[dict]:
    """(top fuzzy, x0) comparator sort (recognizer.py:54-63)."""
    def cmp(c1, c2):
        diff = c1["top"] - c2["top"]
        if abs(diff) < threshold:
            diff = c1["x0"] - c2["x0"]
        return diff
    return sorted(arr, key=cmp_to_key(cmp))


def sort_x_firstly(arr: list[dict], threshold: float) -> list[dict]:
    """(x0 fuzzy, top) comparator sort (recognizer.py:65-72)."""
    def cmp(c1, c2):
        diff = c1["x0"] - c2["x0"]
        if abs(diff) < threshold:
            diff = c1["top"] - c2["top"]
        return diff
    return sorted(arr, key=cmp_to_key(cmp))


def tag_layouts(boxes: list[dict]) -> list[dict]:
    """Rule-based stand-in for the layout model: title/text from font
    height, garbage filtered by the reference's own regex gates
    (layout_recognizer.py:103-124). Assigns ``layoutno`` so that each
    title box and each run of body lines under it form distinct layout
    regions (the property downstream merge rules depend on)."""
    out = []
    layoutno = -1
    last_type = None
    for b in boxes:
        txt = b["text"].strip()
        if any(re.search(p, txt) for p in GARBAGE_RES):
            continue
        ltype = "title" if b.get("height", 10) >= 13 else "text"
        if ltype == "title" or last_type != ltype:
            layoutno += 1
        b = dict(b)
        b["layout_type"] = ltype
        b["layoutno"] = f"{ltype}-{layoutno}"
        last_type = ltype
        out.append(b)
    return out


def mean_heights(boxes: list[dict], n_pages: int) -> list[float]:
    """Per-page median box height (pdf_parser.py:1074-1078 semantics)."""
    heights = [[] for _ in range(max(n_pages, 1))]
    for b in boxes:
        pn = b["page_number"] - 1
        if 0 <= pn < len(heights):
            heights[pn].append(b["bottom"] - b["top"])
    return [median(h) if h else 10.0 for h in heights]


def naive_vertical_merge(boxes: list[dict], mh: list[float],
                         is_english: bool = True) -> list[dict]:
    """Merge-down pass (pdf_parser.py:421-470 live semantics: text is
    concatenated with NO separator — the corpus/extractor contract makes
    line text carry its own trailing space)."""
    if not boxes:
        return []
    overall = median([m for m in mh]) if mh else 10.0
    bxs = sort_y_firstly(boxes, overall / 3)
    i = 0
    while i + 1 < len(bxs):
        b, b_ = bxs[i], bxs[i + 1]
        if b["page_number"] < b_["page_number"] and re.match(
                r"[0-9  •一—-]+$", b["text"]):
            bxs.pop(i)
            continue
        if not b["text"].strip():
            bxs.pop(i)
            continue
        concatting_feats = [
            b["text"].strip()[-1] in ",;:'\"，、‘“；：-",
            len(b["text"].strip()) > 1
            and b["text"].strip()[-2] in ",;:'\"，‘“、；：",
            bool(b_["text"].strip())
            and b_["text"].strip()[0] in "。；？！?”）),，、：",
        ]
        feats = [
            b.get("layoutno", 0) != b_.get("layoutno", 0),
            b["text"].strip()[-1] in "。？！?",
            is_english and b["text"].strip()[-1] in ".!?",
            b["page_number"] == b_["page_number"]
            and b_["top"] - b["bottom"] > mh[b["page_number"] - 1] * 1.5,
            b["page_number"] < b_["page_number"]
            and abs(b["x0"] - b_["x0"]) > 4 * 10.0,
        ]
        detach_feats = [b["x1"] < b_["x0"], b["x0"] > b_["x1"]]
        if (any(feats) and not any(concatting_feats)) or any(detach_feats):
            i += 1
            continue
        b["bottom"] = b_["bottom"]
        b["text"] += b_["text"]
        b["x0"] = min(b["x0"], b_["x0"])
        b["x1"] = max(b["x1"], b_["x1"])
        bxs.pop(i + 1)
    return bxs


def filter_forpages(boxes: list[dict]) -> list[dict]:
    """TOC-run removal (pdf_parser.py:581-630, list-in/list-out)."""
    boxes = list(boxes)
    i = 0
    while i < len(boxes):
        if not re.match(
                r"(contents|目录|目次|table of contents|致谢|acknowledge)$",
                re.sub(r"( | |　)+", "",
                       boxes[i]["text"].lower())):
            i += 1
            continue
        eng = re.match(r"[0-9a-zA-Z :'.-]{5,}", boxes[i]["text"].strip())
        boxes.pop(i)
        if i >= len(boxes):
            break
        prefix = (boxes[i]["text"].strip()[:3] if not eng
                  else " ".join(boxes[i]["text"].strip().split()[:2]))
        while not prefix:
            boxes.pop(i)
            if i >= len(boxes):
                break
            prefix = (boxes[i]["text"].strip()[:3] if not eng
                      else " ".join(boxes[i]["text"].strip().split()[:2]))
        boxes.pop(i)
        if i >= len(boxes) or not prefix:
            break
        for j in range(i, min(i + 128, len(boxes))):
            if not re.match(re.escape(prefix), boxes[j]["text"]):
                continue
            for _ in range(i, j):
                boxes.pop(i)
            break
    return boxes


def merge_with_same_bullet(boxes: list[dict]) -> list[dict]:
    """Merge consecutive boxes opening with the same bullet char
    (pdf_parser.py:632-654)."""
    boxes = [dict(b) for b in boxes]
    i = 0
    while i + 1 < len(boxes):
        b, b_ = boxes[i], boxes[i + 1]
        if not b["text"].strip():
            boxes.pop(i)
            continue
        if not b_["text"].strip():
            boxes.pop(i + 1)
            continue
        c0, c1 = b["text"].strip()[0], b_["text"].strip()[0]
        if (c0 != c1 or c0.lower() in set("qwertyuopasdfghjklzxcvbnm")
                or "一" <= c0 <= "鿿" or b["top"] > b_["bottom"]):
            i += 1
            continue
        b_["text"] = b["text"] + "\n" + b_["text"]
        b_["x0"] = min(b["x0"], b_["x0"])
        b_["x1"] = max(b["x1"], b_["x1"])
        b_["top"] = b["top"]
        boxes.pop(i)
    return boxes


def line_tag(bx: dict, page_heights: list[float] | None = None) -> str:
    """Position tag codec (pdf_parser.py:893-908, format verbatim).
    ``top`` in the tag is page-relative; multi-page spans list pages
    joined by '-'."""
    pn = [bx["page_number"]]
    ph = page_heights or []

    def page_h(p: int) -> float:
        return ph[p - 1] if 0 <= p - 1 < len(ph) else PAGE_H

    cum = sum(page_h(p) for p in range(1, pn[0]))
    top = bx["top"] - cum
    bott = bx["bottom"] - cum
    while bott > page_h(pn[-1]):
        bott -= page_h(pn[-1])
        pn.append(pn[-1] + 1)
    return "@@{}\t{:.1f}\t{:.1f}\t{:.1f}\t{:.1f}##".format(
        "-".join(str(p) for p in pn), bx["x0"], bx["x1"], top, bott)


_TAG_RE = re.compile(r"@@[0-9-]+\t[0-9.\t]+##")


def remove_tag(txt: str) -> str:
    """pdf_parser.py:1126-1127."""
    return _TAG_RE.sub("", txt)


def parse_positions(txt: str) -> list[tuple[list[int], float, float,
                                            float, float]]:
    """Parse @@..## tags back into (pages, x0, x1, top, bottom)
    (add_positions input shape, rag/nlp/__init__.py:321-333)."""
    out = []
    for m in re.finditer(r"@@([0-9-]+)\t([0-9.]+)\t([0-9.]+)\t([0-9.]+)"
                         r"\t([0-9.]+)##", txt):
        pages = [int(p) for p in m.group(1).split("-")]
        out.append((pages, float(m.group(2)), float(m.group(3)),
                    float(m.group(4)), float(m.group(5))))
    return out


def pdf_to_sections(blob: bytes) -> list[tuple[str, str]]:
    """Full rule chain: PDF bytes -> [(text_with_tag, layout_type)].

    Mirrors the DeepDOC pipeline shape (pdf_parser.__call__ minus models):
    parse boxes -> layout tagging -> TOC filter -> vertical merge ->
    position-tag append.
    """
    from .pdfplain import parse_pdf_boxes, total_page_number

    boxes = parse_pdf_boxes(blob)
    if not boxes:
        return []
    n_pages = total_page_number(blob)
    boxes = tag_layouts(boxes)
    boxes = filter_forpages(boxes)
    mh = mean_heights(boxes, n_pages)
    boxes = naive_vertical_merge(boxes, mh)
    return [
        (b["text"].rstrip() + line_tag(b), b["layout_type"])
        for b in boxes if b["text"].strip()
    ]
