"""DOCX parsing from scratch (stdlib zipfile + ElementTree).

Behavioral re-expression of RAGFlowDocxParser
(/root/reference/deepdoc/parser/docx_parser.py:26-146): paragraphs come
back as (text, style-name) pairs in document order, tables render
through ``__compose_table_content`` — dominant-cell-type vote, numeric
header-row detection, "header: value" cell lines, and the <=3-column
single-chunk collapse. The reference reads through python-docx; a .docx
is a zip of WordprocessingML parts, so the stdlib covers it: paragraph
text is the concatenation of its w:t runs, the style NAME resolves
through word/styles.xml (styleId -> w:name), and page counting uses the
w:lastRenderedPageBreak markers exactly as docx_parser.py:131-139.

blockType here reuses tablerules.block_type (same pattern table) plus
the reference's tokenizer fallbacks through huqie (Tx/Lx by token
count, Nr by the name-entity tag — docx_parser.py:36-62).
"""

from __future__ import annotations

import io
import re
import zipfile
from collections import Counter
from xml.etree import ElementTree

W_NS = ("http://schemas.openxmlformats.org/wordprocessingml/2006/main")


def _w(tag: str) -> str:
    return f"{{{W_NS}}}{tag}"


def _style_names(zf: zipfile.ZipFile) -> dict[str, str]:
    """word/styles.xml: styleId -> display name ('Heading1' -> 'heading
    1'; python-docx exposes the latter via p.style.name)."""
    try:
        root = ElementTree.fromstring(zf.read("word/styles.xml"))
    except (KeyError, ElementTree.ParseError):
        return {}
    out = {}
    for st in root.iter(_w("style")):
        sid = st.get(_w("styleId"))
        nm = st.find(_w("name"))
        if sid and nm is not None:
            out[sid] = nm.get(_w("val"), sid)
    return out


def _para_text(p) -> str:
    return "".join(t.text or "" for t in p.iter(_w("t")))


def _para_style(p, styles: dict[str, str]) -> str:
    ppr = p.find(_w("pPr"))
    if ppr is not None:
        ps = ppr.find(_w("pStyle"))
        if ps is not None:
            sid = ps.get(_w("val"), "")
            return styles.get(sid, sid)
    return "Normal"


def _block_type(text: str) -> str:
    """docx_parser.py:36-62: the TSR pattern table (via
    tablerules._BLOCK_PATTERNS) + tokenizer fallbacks."""
    from .huqie import default_tokenizer
    from .tablerules import _BLOCK_PATTERNS

    for pattern, label in _BLOCK_PATTERNS:
        if re.search(pattern, text):
            return label
    tk = default_tokenizer()
    tks = [t for t in tk.tokenize(text).split() if len(t) > 1]
    if len(tks) > 3:
        return "Tx" if len(tks) < 12 else "Lx"
    if len(tks) == 1 and tk.tag(tks[0]) == "nr":
        return "Nr"
    return "Ot"


def compose_table_content(rows: list[list[str]]) -> list[str]:
    """docx_parser.py:64-118 (pandas-free re-expression over row
    lists): row 0 is the base header; when numbers dominate, any
    non-numeric row becomes an additional header row; data cells render
    'header: value' joined by ';'; tables of <= 3 columns collapse to
    one newline-joined chunk."""
    if len(rows) < 2:
        return []
    type_counts = Counter(_block_type(str(c))
                          for row in rows[1:] for c in row)
    max_type = max(type_counts.items(), key=lambda x: x[1])[0] \
        if type_counts else ""

    colnm = len(rows[0])
    hdrows = [0]
    if max_type == "Nu":
        for r in range(1, len(rows)):
            tys = Counter(_block_type(str(c)) for c in rows[r])
            ty = max(tys.items(), key=lambda x: x[1])[0]
            if ty != max_type:
                hdrows.append(r)

    lines = []
    for i in range(1, len(rows)):
        if i in hdrows:
            continue
        hr = [r - i for r in hdrows]
        hr = [r for r in hr if r < 0]
        t = len(hr) - 1
        while t > 0:
            if hr[t] - hr[t - 1] > 1:
                hr = hr[t:]
                break
            t -= 1
        headers = []
        for j in range(len(rows[i])):
            seen: list[str] = []
            for h in hr:
                x = str(rows[i + h][j]).strip() \
                    if j < len(rows[i + h]) else ""
                if x in seen:
                    continue
                seen.append(x)
            joined = ",".join(seen)
            if joined:
                joined += ": "
            headers.append(joined)
        cells = []
        for j in range(len(rows[i])):
            if not str(rows[i][j]):
                continue
            cells.append(headers[j] + str(rows[i][j]))
        lines.append(";".join(cells))

    if colnm > 3:
        return lines
    return ["\n".join(lines)]


def parse_docx(blob: bytes, from_page: int = 0,
               to_page: int = 100000000):
    """bytes -> (secs, tbls): (text, style) paragraph pairs within the
    page window + composed table line lists (docx_parser.py:120-146).
    Malformed input degrades to ([], [])."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
        root = ElementTree.fromstring(zf.read("word/document.xml"))
    except (zipfile.BadZipFile, KeyError, ElementTree.ParseError):
        return [], []
    styles = _style_names(zf)
    body = root.find(_w("body"))
    if body is None:
        return [], []

    secs: list[tuple[str, str]] = []
    tbls: list[list[str]] = []
    pn = 0
    for el in body:
        if el.tag == _w("p"):
            if pn > to_page:
                break
            runs: list[str] = []
            text_all = _para_text(el)
            for r in el.iter(_w("r")):
                if pn > to_page:
                    break
                if from_page <= pn < to_page and text_all.strip():
                    runs.append("".join(t.text or ""
                                        for t in r.iter(_w("t"))))
                if r.find(_w("lastRenderedPageBreak")) is not None:
                    pn += 1
            secs.append(("".join(runs), _para_style(el, styles)))
        elif el.tag == _w("tbl"):
            rows = []
            for tr in el.iter(_w("tr")):
                # cell text: paragraphs joined by newline (python-docx
                # cell.text semantics)
                rows.append(["\n".join(_para_text(p)
                                       for p in tc.iter(_w("p")))
                             for tc in tr.findall(_w("tc"))])
            tbls.append(compose_table_content(rows))
    return secs, tbls


def docx_sections(blob: bytes) -> tuple[list[str], list[str]]:
    """Flat surface for the extraction job: non-empty paragraph texts
    and flattened table lines."""
    secs, tbls = parse_docx(blob)
    texts = [t for t, _s in secs if t.strip()]
    lines = [ln for tb in tbls for ln in tb if ln]
    return texts, lines


def tables_html(blob: bytes) -> list[str]:
    """The QA/manual-template table render (rag/app/qa.py:241-259,
    manual.py:152-170): one '<table>' string per docx table, merging a
    run of equal-text cells into a colspan. The reference's scan is
    kept verbatim, including its quirk: the inner loop compares the
    anchor against EVERY later cell and jumps `i` to the last match,
    so a cell between two equal non-adjacent cells is never rendered.
    """
    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
        root = ElementTree.fromstring(zf.read("word/document.xml"))
    except (zipfile.BadZipFile, KeyError, ElementTree.ParseError):
        return []
    body = root.find(_w("body"))
    if body is None:
        return []
    out: list[str] = []
    for el in body:
        if el.tag != _w("tbl"):
            continue
        html = "<table>"
        for tr in el.iter(_w("tr")):
            cells = ["\n".join(_para_text(p) for p in tc.iter(_w("p")))
                     for tc in tr.findall(_w("tc"))]
            html += "<tr>"
            i = 0
            while i < len(cells):
                span = 1
                c = cells[i]
                for j in range(i + 1, len(cells)):
                    if c == cells[j]:
                        span += 1
                        i = j
                i += 1
                html += (f"<td>{c}</td>" if span == 1
                         else f"<td colspan='{span}'>{c}</td>")
            html += "</tr>"
        html += "</table>"
        out.append(html)
    return out


def table_title_context(blob: bytes, doc_name: str) -> list[str]:
    """The naive-template Docx table context (rag/app/naive.py:70-176
    __get_nearest_title): for each table, the nearest preceding
    non-empty Heading (level <= 7), then its parent chain (nearest
    preceding heading with a strictly smaller level, repeated), sorted
    by level and prefixed with the document name, joined ' > '.
    Tables with no preceding heading get ''. ``doc_name`` arrives
    extension-stripped by the caller (naive.py:79-81, with the
    'Untitled Document' fallback kept here)."""
    if not doc_name:
        doc_name = "Untitled Document"
    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
        root = ElementTree.fromstring(zf.read("word/document.xml"))
    except (zipfile.BadZipFile, KeyError, ElementTree.ParseError):
        return []
    body = root.find(_w("body"))
    if body is None:
        return []
    styles = _style_names(zf)

    blocks: list[tuple[str, int, str, str]] = []
    for i, el in enumerate(body):
        if el.tag == _w("p"):
            blocks.append(("p", i, _para_text(el),
                           _para_style(el, styles)))
        elif el.tag == _w("tbl"):
            blocks.append(("t", i, "", ""))

    def heading_level(style: str) -> int | None:
        if not re.search(r"Heading\s*(\d+)", style, re.I):
            return None
        m = re.search(r"(\d+)", style)
        return int(m.group(1)) if m else None

    out: list[str] = []
    for kind, pos, _t, _s in blocks:
        if kind != "t":
            continue
        nearest = None
        for bk, bp, btext, bstyle in reversed(blocks):
            if bp >= pos or bk != "p":
                continue
            level = heading_level(bstyle)
            if level is not None and level <= 7 and btext.strip():
                nearest = (level, btext.strip())
                break
        if nearest is None:
            out.append("")
            continue
        titles = [nearest]
        current = nearest[0]
        while current > 1:
            found = False
            for bk, bp, btext, bstyle in reversed(blocks):
                if bp >= pos or bk != "p":
                    continue
                level = heading_level(bstyle)
                if level is not None and level < current \
                        and btext.strip():
                    titles.append((level, btext.strip()))
                    current = level
                    found = True
                    break
            if not found:
                break
        titles.sort(key=lambda x: x[0])
        out.append(" > ".join([doc_name] + [t[1] for t in titles]))
    return out


def attach_paragraph_images(paras):
    """The naive.Docx paragraph walk that assigns embedded pictures to
    text lines (rag/app/naive.py:180-210): ``paras`` is
    [(text, style_name, pics)] in document order, where ``pics`` are
    the paragraph's embedded images as (width, height) stubs — the
    PIL decode is the multimodal stub seam (get_picture, naive.py:42-64
    keeps only the FIRST pic of a paragraph), the attachment state
    machine is the semantics under test:

    - a Caption-styled text line adopts the previous line's trailing
      image (popped, unless that line is itself a Caption) or the
      pending carry image;
    - a plain text line takes its own first pic, with any pending
      carry image prepended;
    - an empty paragraph's pic appends to the previous line, or
      becomes the carry image when no line exists yet.

    Returns [(cleaned_text, folded_img)] with each line's image list
    folded through the vertical concat (reduce(concat_img),
    naive.py:211)."""
    from functools import reduce

    from .merge import concat_img

    lines: list = []
    last_image = None
    for text, style, pics in paras:
        text = re.sub(r"　", " ", text).strip()
        if text:
            if style == "Caption":
                former_image = None
                if lines and lines[-1][1] and lines[-1][2] != "Caption":
                    former_image = lines[-1][1].pop()
                elif last_image:
                    former_image = last_image
                    last_image = None
                lines.append((text, [former_image], style))
            else:
                current_image = pics[0] if pics else None
                image_list = [current_image]
                if last_image:
                    image_list.insert(0, last_image)
                    last_image = None
                lines.append((text, image_list, style or ""))
        else:
            current_image = pics[0] if pics else None
            if current_image:
                if lines:
                    lines[-1][1].append(current_image)
                else:
                    last_image = current_image
    return [(t, reduce(concat_img, imgs) if imgs else None)
            for t, imgs, _s in lines]
