"""Deterministic minimal PDF writer for the synthetic corpus.

Emits valid single-font, uncompressed-content-stream PDFs (one ``BT /F1
size Tf x y Td (text) Tj ET`` block per rendered line) so the from-scratch
extractor (pdfplain.py) exercises real PDF byte parsing without any PDF
library. Page breaks happen only at paragraph boundaries, which keeps the
extracted text a closed-form function of the input paragraphs (the DuckDB
oracle never needs the layout arithmetic).

Layout constants mirror a single-column paper: US Letter media box,
title 18pt, section headings 14pt, body 10pt with 14pt leading.
"""

from __future__ import annotations

PAGE_W, PAGE_H = 612, 792
MARGIN_X, TOP_Y, BOTTOM_Y = 72, 720, 72
TITLE_SIZE, HEAD_SIZE, BODY_SIZE = 18, 14, 10
BODY_LEAD, HEAD_GAP = 14, 22
WORDS_PER_LINE = 8


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _line(size: int, x: float, y: float, text: str) -> str:
    return f"BT /F1 {size} Tf {x} {y} Td ({_esc(text)}) Tj ET\n"


def _line_chars(size: int, x: float, y: float, text: str) -> str:
    """One show op PER CHARACTER at its own advance (0.5 em steps, the
    same metric the extractor estimates) — the char-soup granularity a
    pdfplumber char dump or OCR char stream has; the __ocr merge must
    reassemble lines."""
    return "".join(_line(size, x + 0.5 * size * i, y, ch)
                   for i, ch in enumerate(text))


def _line_hidden(size: int, x: float, y: float, text: str) -> str:
    """White-on-white DeviceGray text (the hidden-OCR-layer trick the
    reference's _has_color filter drops, pdf_parser.py:197-203): fill
    AND stroke gray set to 1 before the show, restored after."""
    return (f"BT /F1 {size} Tf 1 g 1 G {x} {y} Td ({_esc(text)}) Tj "
            f"0 g 0 G ET\n")


def layout_paper(title: str, sections: list[tuple[str, str]],
                 fragment: bool = False, hidden: bool = False,
                 header_footer: bool = False,
                 char_level: bool = False):
    """(title, [(heading, body)]) -> list of per-page content streams.

    A section = heading line + body lines (WORDS_PER_LINE words each).
    A section that does not fit the remaining page space entirely moves
    to the next page (paragraph-atomic pagination).

    ``fragment``: body lines longer than 4 words emit as TWO abutting
    rects on the same baseline (the common real-PDF case _text_merge
    exists for); extraction output must be byte-identical to the
    unfragmented layout.

    ``hidden``: each section gets an invisible white-on-white line at
    the first body baseline; extraction output must prove it excluded.

    ``header_footer``: every page carries a running head (twice, so the
    repeated-garbage Counter fires even on one-page documents) and a
    per-page folio line in the edge bands, plus ONE copy of the running
    head embedded in the body flow (the Counter must remove it there
    too); extraction output must be byte-identical to the plain layout.
    """
    line = _line_chars if char_level else _line
    pages: list[list[str]] = [[]]
    y = TOP_Y
    pages[0].append(line(TITLE_SIZE, MARGIN_X, y, title))
    y -= HEAD_GAP + TITLE_SIZE
    running_head = f"{title} preprint"

    for si, (heading, body) in enumerate(sections):
        words = body.split(" ")
        lines = [" ".join(words[i:i + WORDS_PER_LINE])
                 for i in range(0, len(words), WORDS_PER_LINE)]
        need = HEAD_SIZE + HEAD_GAP + len(lines) * BODY_LEAD
        if y - need < BOTTOM_Y and pages[-1]:
            pages.append([])
            y = TOP_Y
        pages[-1].append(line(HEAD_SIZE, MARGIN_X, y, heading))
        y -= HEAD_GAP
        if hidden:
            pages[-1].append(_line_hidden(
                BODY_SIZE, MARGIN_X, y,
                f"hidden {heading.lower()} overlay"))
        for li, ln in enumerate(lines):
            # non-final lines carry their word separator: the DeepDOC
            # vertical merge concatenates texts with no separator
            # (pdf_parser.py:466), so the space lives in the line itself
            sep = " " if li < len(lines) - 1 else ""
            lws = ln.split(" ")
            if fragment and len(lws) > 4:
                frag1 = " ".join(lws[:4]) + " "
                frag2 = " ".join(lws[4:]) + sep
                pages[-1].append(_line(BODY_SIZE, MARGIN_X, y, frag1))
                pages[-1].append(_line(
                    BODY_SIZE, MARGIN_X + 0.5 * BODY_SIZE * len(frag1),
                    y, frag2))
            else:
                pages[-1].append(line(BODY_SIZE, MARGIN_X, y, ln + sep))
            y -= BODY_LEAD
        if header_footer and si == 0:
            # one running-head copy leaked into the body flow: only the
            # repeated-garbage Counter can remove it (it is outside the
            # edge bands)
            pages[-1].append(_line(BODY_SIZE, MARGIN_X, y, running_head))
            y -= BODY_LEAD
        y -= HEAD_GAP
    if header_footer:
        for pn, p in enumerate(pages, start=1):
            # running head twice in the top band (top 4 / 18 of 792),
            # folio once in the bottom band (bottom 776 of 792)
            p.insert(0, _line(8, MARGIN_X, 780, running_head))
            p.insert(1, _line(8, MARGIN_X, 766, running_head))
            p.append(_line(8, PAGE_W / 2, 16, f"Page {pn}"))
    return ["".join(p) for p in pages]


def build_pdf(title: str, sections: list[tuple[str, str]],
              fragment: bool = False, hidden: bool = False,
              header_footer: bool = False,
              char_level: bool = False) -> bytes:
    """Assemble a complete PDF document (xref table included)."""
    return _assemble(layout_paper(title, sections, fragment, hidden,
                                  header_footer, char_level))


def build_pdf_scrap(sections: list[tuple[str, str]], did: int) -> bytes:
    """Single-page scrap-filter corpus: one wide bullet line per
    section (``'N. ' + body``, space-padded to >=41 chars so its
    0.5-em width clears the pw/3 usefulness gate) on a fixed 14pt
    grid, followed by two narrow numeric-junk scrap lines (page-folio
    shapes) that ``filterout_scraps`` must drop.  All geometry is
    closed-form: x1 = 72 + 5*len(text), top = 62 + 14*i."""
    lines = []
    y = TOP_Y
    for i, (_head, body) in enumerate(sections):
        text = f"{i + 1}. {body}"
        if len(text) < 41:
            text = text.ljust(41)
        lines.append(_line(BODY_SIZE, MARGIN_X, y, text))
        y -= BODY_LEAD
    for junk in (f"{did % 90 + 1} / {did % 9 + 9}", "- 3 -"):
        lines.append(_line(BODY_SIZE, MARGIN_X, y, junk))
        y -= BODY_LEAD
    return _assemble(["".join(lines)])


def _assemble(streams: list[str]) -> bytes:
    n_pages = len(streams)
    # object numbering: 1 catalog, 2 pages, 3..2+n page objs,
    # 3+n..2+2n content streams, 3+2n font
    font_obj = 3 + 2 * n_pages
    objs: list[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for i in range(n_pages):
        objs.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} "
             f"{PAGE_H}] /Contents {3 + n_pages + i} 0 R /Resources "
             f"<< /Font << /F1 {font_obj} 0 R >> >> >>").encode())
    for s in streams:
        data = s.encode("latin-1")
        objs.append(b"<< /Length " + str(len(data)).encode() +
                    b" >>\nstream\n" + data + b"endstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# two-column paper layout (exercises sort_X_by_page, pdf_parser.py:182-195)
# ---------------------------------------------------------------------------

COL_X = (72, 320)
COL_WORDS_PER_LINE = 5


def layout_paper_two_col(title: str, sections: list[tuple[str, str]]):
    """Two-column layout: title spans the top of page 1; sections flow
    down the left column, then the right, then the next page
    (section-atomic column breaks). Returns per-page content streams
    with lines emitted in row-interleaved stream order — reading order
    must be RECONSTRUCTED by the extractor's column sort, which is the
    point of this corpus family."""
    pages: list[list[tuple[float, float, int, str]]] = [[]]  # (x,y,size,text)
    col, y = 0, TOP_Y
    pages[0].append((float(COL_X[0]), float(TOP_Y), TITLE_SIZE, title))
    col_top = TOP_Y - HEAD_GAP - TITLE_SIZE
    y = col_top

    def advance():
        nonlocal col, y, col_top
        if col == 0:
            col = 1
            y = col_top
        else:
            pages.append([])
            col, col_top, y = 0, TOP_Y, TOP_Y

    for heading, body in sections:
        words = body.split(" ")
        lines = [" ".join(words[i:i + COL_WORDS_PER_LINE])
                 for i in range(0, len(words), COL_WORDS_PER_LINE)]
        need = HEAD_SIZE + HEAD_GAP + len(lines) * BODY_LEAD
        if y - need < BOTTOM_Y and pages[-1]:
            advance()
        x = float(COL_X[col])
        pages[-1].append((x, y, HEAD_SIZE, heading))
        y -= HEAD_GAP
        for li, ln in enumerate(lines):
            # same contract as the single-column generator: non-final
            # lines carry their word separator (the vertical merge
            # concatenates with no separator; the concat chain strips
            # pieces first, so the trailing space is harmless there)
            sep = " " if li < len(lines) - 1 else ""
            pages[-1].append((x, y, BODY_SIZE, ln + sep))
            y -= BODY_LEAD
        y -= HEAD_GAP

    # stream order: row-interleaved across columns (y descending, then x)
    streams = []
    for lines_ in pages:
        ordered = sorted(lines_, key=lambda t: (-t[1], t[0]))
        streams.append("".join(_line(s, x, yy, tx)
                               for x, yy, s, tx in ordered))
    return streams


def build_pdf_two_col(title: str,
                      sections: list[tuple[str, str]]) -> bytes:
    """Two-column variant of build_pdf (same object structure)."""
    streams = layout_paper_two_col(title, sections)
    return _assemble(streams)


# ---------------------------------------------------------------------------
# table-bearing paper layout (exercises _extract_table_figure,
# pdf_parser.py:656-867, and the TSR grid rules in tablerules.py)
# ---------------------------------------------------------------------------

TABLE_COL_X = (72, 250, 428)


def layout_paper_table(title: str, sections: list[tuple[str, str]],
                       headers: list[str], rows: list[list[str]],
                       caption: str, figure_txt: str,
                       figure_caption: str, split: bool = False):
    """Body pages as layout_paper, then a data table (grid of one box
    per cell at TABLE_COL_X), its caption, and a figure block on
    trailing page(s).

    ``split=True`` puts the header + first two data rows at the bottom
    of one page and the remaining rows at the top of the next — the
    cross-page continuation _extract_table_figure must stitch back
    (page gap 1, vertical gap ~164pt < 23x mean height 10)."""
    streams = layout_paper(title, sections)

    def cell_row(page: list[str], y: float, cells: list[str]) -> None:
        for j, c in enumerate(cells):
            page.append(_line(BODY_SIZE, TABLE_COL_X[j], y, c))

    tail: list[str]
    if split and len(rows) > 2:
        part1: list[str] = []
        y = 120.0
        cell_row(part1, y, headers)
        y -= BODY_LEAD
        for r in rows[:2]:
            cell_row(part1, y, r)
            y -= BODY_LEAD
        streams.append("".join(part1))
        tail = []
        y = float(TOP_Y)
        rest = rows[2:]
    else:
        tail = []
        y = float(TOP_Y)
        cell_row(tail, y, headers)
        y -= BODY_LEAD
        rest = rows
    for r in rest:
        cell_row(tail, y, r)
        y -= BODY_LEAD
    last_row_y = y + BODY_LEAD
    cap_y = last_row_y - 24
    tail.append(_line(BODY_SIZE, TABLE_COL_X[0], cap_y, caption))
    fig_y = cap_y - 40
    tail.append(_line(BODY_SIZE, TABLE_COL_X[0], fig_y, figure_txt))
    tail.append(_line(BODY_SIZE, TABLE_COL_X[0], fig_y - 18,
                      figure_caption))
    streams.append("".join(tail))
    return streams


def build_pdf_table(title: str, sections: list[tuple[str, str]],
                    headers: list[str], rows: list[list[str]],
                    caption: str, figure_txt: str, figure_caption: str,
                    split: bool = False) -> bytes:
    """Table-bearing variant of build_pdf (same object structure)."""
    return _assemble(layout_paper_table(
        title, sections, headers, rows, caption, figure_txt,
        figure_caption, split))
