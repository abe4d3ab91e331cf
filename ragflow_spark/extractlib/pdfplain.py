"""From-scratch PDF content-stream text extraction -> positioned boxes.

The deterministic v1 PDF source the survey plans
(SURVEY.md §2.4 ``PlainParser`` row): the reference's PlainParser wraps
pypdf's ``extract_text`` (/root/reference/deepdoc/parser/pdf_parser.py:
1226-1259) and loses positions; this extractor parses the content stream
text operators itself (uncompressed streams, Tf/Td/Tj — the subset the
corpus generator emits and the common denominator of born-digital simple
PDFs) and keeps per-line geometry, so the downstream DeepDOC-style box
rules (pdfrules.py) have real coordinates to work on.

Box model mirrors the reference (`deepdoc/parser/pdf_parser.py:306-311`):
``{x0, x1, top, bottom, page_number, text, layout_type}`` with ``top``
carrying the cumulative page offset (``page_cum_height`` semantics,
pdf_parser.py:1040-1078) so cross-page ordering is one number.

No xref parsing is needed for extraction: objects are discovered by a
linear scan (the file is read once anyway at CC scale), page objects are
ordered by the /Kids array, and /Contents references resolve to stream
objects. Malformed input degrades to zero boxes, never an exception.
"""

from __future__ import annotations

import re

PAGE_H = 792.0

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)+)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*[\d.]+\s+[\d.]+\s+([\d.]+)\s+([\d.]+)\s*\]")
_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
_TF_RE = re.compile(rb"/\w+\s+([\d.]+)\s+Tf")
_TD_RE = re.compile(rb"(-?[\d.]+)\s+(-?[\d.]+)\s+T[dD]")
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")

# sequential content-stream op scan: text ops + DeviceGray color state.
# Parenthesized strings are consumed atomically by the tj alternative, so
# numbers/letters inside string literals can never match as operators.
_OP_RE = re.compile(
    rb"(?P<bt>BT)|(?P<et>ET)|/\w+\s+(?P<tf>[\d.]+)\s+Tf|"
    rb"(?P<tdx>-?[\d.]+)\s+(?P<tdy>-?[\d.]+)\s+T[dD]|"
    rb"\((?P<tj>(?:[^()\\]|\\.)*)\)\s*Tj|"
    rb"(?P<fill>[\d.]+)\s+g\b|(?P<stroke>[\d.]+)\s+G\b")

# invisible-character rule (reference pdf_parser.py:197-203 `_has_color`):
# DeviceGray with stroking AND non-stroking gray == 1 (white-on-white,
# the hidden-OCR-layer trick) and text beginning with one of the
# reference's character class — the anchored-prefix quirk is kept.
_HIDDEN_TEXT_RE = re.compile(r"[a-zT_\[\]\(\)-]+")


def _has_color(fill_gray: float, stroke_gray: float, text: str) -> bool:
    if stroke_gray == 1.0 and fill_gray == 1.0 \
            and _HIDDEN_TEXT_RE.match(text):
        return False
    return True

_UNESC = {b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\",
          b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t"}


def _unescape(raw: bytes) -> str:
    out = re.sub(rb"\\[()\\nrt]", lambda m: _UNESC[m.group(0)], raw)
    return out.decode("latin-1")


def parse_pdf_boxes(blob: bytes) -> list[dict]:
    """PDF bytes -> text boxes with cumulative-Y geometry."""
    if not blob.startswith(b"%PDF-"):
        return []
    objs: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(blob)
    }
    # page order from the /Pages tree (first object with /Kids)
    page_ids: list[int] = []
    for body in objs.values():
        if b"/Type /Pages" in body or b"/Type/Pages" in body:
            m = _KIDS_RE.search(body)
            if m:
                page_ids = [int(r.group(1))
                            for r in _REF_RE.finditer(m.group(1))]
                break
    if not page_ids:  # fallback: document order of /Type /Page objects
        page_ids = [num for num, body in sorted(objs.items())
                    if b"/Type /Page" in body and b"/Pages" not in body]

    boxes: list[dict] = []
    cum_height = 0.0
    for pn, pid in enumerate(page_ids, start=1):
        body = objs.get(pid, b"")
        page_h = PAGE_H
        mb = _MEDIABOX_RE.search(body)
        if mb:
            page_h = float(mb.group(2))
        cm = _CONTENTS_RE.search(body)
        stream = b""
        if cm and cm.group(1) and int(cm.group(1)) in objs:
            sm = _STREAM_RE.search(objs[int(cm.group(1))])
            if sm:
                stream = sm.group(1)
        # sequential op walk: graphics state (DeviceGray fill/stroke)
        # persists across BT blocks within a page stream and resets per
        # page (streams are independent); text position resets at BT
        fill_gray, stroke_gray = 0.0, 0.0  # PDF default: black
        size, x, y = 10.0, 0.0, 0.0
        for op in _OP_RE.finditer(stream):
            if op.group("bt"):
                size, x, y = 10.0, 0.0, 0.0
            elif op.group("tf"):
                size = float(op.group("tf"))
            elif op.group("tdx") is not None:
                x += float(op.group("tdx"))
                y += float(op.group("tdy"))
            elif op.group("fill") is not None:
                fill_gray = float(op.group("fill"))
            elif op.group("stroke") is not None:
                stroke_gray = float(op.group("stroke"))
            elif op.group("tj") is not None:
                text = _unescape(op.group("tj"))
                if not text.strip():
                    continue
                # reference pdf_parser.py:290: chars failing _has_color
                # (white-on-white DeviceGray) never become boxes
                if not _has_color(fill_gray, stroke_gray, text):
                    continue
                top = cum_height + (page_h - y) - size
                boxes.append({
                    "text": text,
                    "x0": x,
                    # Helvetica-ish average advance: 0.5 em per char —
                    # deterministic stand-in (no font metrics shipped)
                    "x1": x + 0.5 * size * len(text),
                    "top": top,
                    "bottom": top + size,
                    "page_number": pn,
                    "height": size,
                })
        cum_height += page_h
    return boxes


def total_page_number(blob: bytes) -> int:
    """Page count (reference: pdf_parser.py:982-992) — partition planning
    input for page-range task splitting."""
    if not blob.startswith(b"%PDF-"):
        return 0
    m = re.search(rb"/Count\s+(\d+)", blob)
    if m:
        return int(m.group(1))
    return len([1 for mm in _OBJ_RE.finditer(blob)
                if b"/Type /Page" in mm.group(2)
                and b"/Pages" not in mm.group(2)])
