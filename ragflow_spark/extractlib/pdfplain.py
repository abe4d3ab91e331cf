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
# String literals (paren and hex) are consumed atomically by the show
# alternatives, so bytes inside them can never match as operators; the
# leftmost-match discipline makes partial numeric runs fall through
# harmlessly (e.g. the 4 operands of an unmodeled `re` op match nothing).
_OP_RE = re.compile(
    rb"(?P<bt>BT)|(?P<et>ET)|/(?P<fname>\w+)\s+(?P<tf>[\d.]+)\s+Tf|"
    rb"(?P<tma>-?[\d.]+)\s+(?P<tmb>-?[\d.]+)\s+(?P<tmc>-?[\d.]+)\s+"
    rb"(?P<tmd>-?[\d.]+)\s+(?P<tme>-?[\d.]+)\s+(?P<tmf>-?[\d.]+)\s+Tm|"
    rb"(?P<tdx>-?[\d.]+)\s+(?P<tdy>-?[\d.]+)\s+T[dD]|"
    rb"\((?P<tj>(?:[^()\\]|\\.)*)\)\s*Tj|"
    rb"<(?P<tjh>[0-9A-Fa-f \r\n]*)>\s*Tj|"
    rb"\[(?P<tja>(?:[^\[\]\\()]|\((?:[^()\\]|\\.)*\))*)\]\s*TJ|"
    rb"\b(?P<qpush>q)\b|\b(?P<qpop>Q)\b|"
    rb"(?P<fillrgb>[\d.]+\s+[\d.]+\s+[\d.]+)\s+rg\b|"
    rb"(?P<strokergb>[\d.]+\s+[\d.]+\s+[\d.]+)\s+RG\b|"
    rb"(?P<fill>[\d.]+)\s+g\b|(?P<stroke>[\d.]+)\s+G\b")

_TJ_ITEM_RE = re.compile(
    rb"<([0-9A-Fa-f \r\n]*)>|\(((?:[^()\\]|\\.)*)\)")

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


def _unescape_bytes(raw: bytes) -> bytes:
    return re.sub(rb"\\[()\\nrt]", lambda m: _UNESC[m.group(0)], raw)


def _stream_data(objs: dict[int, bytes], body: bytes) -> bytes:
    """Raw stream bytes of an object: exact /Length slice when the
    length is direct or an indirect int, else the lazy endstream match;
    FlateDecode inflated via zlib (decompressobj tolerates trailing
    slack). Undecodable streams degrade to b''."""
    sm = re.search(rb"stream\r?\n", body)
    if not sm:
        return b""
    start = sm.end()
    head = body[:sm.start()]
    data = None
    mlen = re.search(rb"/Length\s+(\d+)\s+0\s+R", head)
    if mlen and int(mlen.group(1)) in objs:
        try:
            data = body[start:start + int(objs[int(mlen.group(1))])]
        except ValueError:
            data = None
    if data is None:
        mdir = re.search(rb"/Length\s+(\d+)(?!\s+0\s+R)", head)
        if mdir:
            data = body[start:start + int(mdir.group(1))]
    if data is None:
        end = body.rfind(b"endstream")
        data = body[start:end] if end >= 0 else b""
    if b"/FlateDecode" in head:
        import zlib
        try:
            return zlib.decompressobj().decompress(data)
        except zlib.error:
            return b""
    return data


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CODESPACE_RE = re.compile(
    rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", re.S)


def _parse_tounicode(data: bytes) -> tuple[dict[int, str], int]:
    """/ToUnicode CMap -> (code -> text map, code byte width). Handles
    bfchar pairs and bfrange (base-increment and array forms); dst hex
    decodes as UTF-16BE (possibly multi-char ligature targets)."""
    def u(hexs: bytes) -> str:
        try:
            return bytes.fromhex(hexs.decode()).decode(
                "utf-16-be", "ignore")
        except ValueError:
            return ""

    cmap: dict[int, str] = {}
    nbytes = 1
    cs = _CODESPACE_RE.search(data)
    if cs:
        nbytes = max(1, len(cs.group(1)) // 2)
    for seg in _BFCHAR_RE.findall(data):
        for src, dst in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", seg):
            cmap[int(src, 16)] = u(dst)
    for seg in _BFRANGE_RE.findall(data):
        for m in re.finditer(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
                rb"(\[(?:\s*<[0-9A-Fa-f]+>)+\s*\]|<[0-9A-Fa-f]+>)", seg):
            lo, hi = int(m.group(1), 16), int(m.group(2), 16)
            dst = m.group(3)
            if dst.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", dst)
                for i, d in enumerate(dsts[:hi - lo + 1]):
                    cmap[lo + i] = u(d)
            else:
                base = int(re.match(rb"<([0-9A-Fa-f]+)>",
                                    dst).group(1), 16)
                for c in range(lo, min(hi, lo + 65535) + 1):
                    cmap[c] = chr(base + (c - lo))
    return cmap, nbytes


def _page_fonts(objs: dict[int, bytes],
                bodies: list[bytes]) -> dict[bytes, tuple]:
    """Resolve the /Font resource dict reachable from a page (or its
    Pages ancestor): font name -> (cmap, code width) for fonts carrying
    a /ToUnicode CMap; fonts without one fall back to latin-1 decoding
    (None entry)."""
    fonts: dict[bytes, tuple] = {}
    for body in bodies:
        m = re.search(rb"/Resources\s+(\d+)\s+0\s+R", body)
        scope = objs.get(int(m.group(1)), b"") if m else body
        fm = re.search(rb"/Font\s*(?:<<(.*?)>>|(\d+)\s+0\s+R)", scope,
                       re.S)
        if not fm:
            continue
        font_dict = fm.group(1) if fm.group(1) is not None else \
            objs.get(int(fm.group(2)), b"")
        for name, ref in re.findall(rb"/(\w+)\s+(\d+)\s+0\s+R",
                                    font_dict):
            fobj = objs.get(int(ref), b"")
            tu = re.search(rb"/ToUnicode\s+(\d+)\s+0\s+R", fobj)
            if tu and int(tu.group(1)) in objs:
                fonts[name] = _parse_tounicode(
                    _stream_data(objs, objs[int(tu.group(1))]))
            else:
                fonts.setdefault(name, None)
        if fonts:
            break
    return fonts


def _decode_show(raw: bytes, font) -> str:
    """Show-string bytes -> text through the current font's CMap
    (grouped by the CMap's code width); latin-1 when the font has no
    /ToUnicode (the simple-font path)."""
    if not font:
        return raw.decode("latin-1")
    cmap, nbytes = font
    out = []
    for i in range(0, len(raw) - nbytes + 1, nbytes):
        out.append(cmap.get(int.from_bytes(raw[i:i + nbytes], "big"),
                            ""))
    return "".join(out)


def parse_pdf_boxes(blob: bytes, keep_spaces: bool = False) -> list[dict]:
    """PDF bytes -> text boxes with cumulative-Y geometry.

    ``keep_spaces`` keeps whitespace-only show strings as boxes — the
    char-level path needs them (the __ocr merge's space-insertion rule
    consumes them); the line-level path drops them as before."""
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

    pages_body = next((b for b in objs.values()
                       if b"/Type /Pages" in b or b"/Type/Pages" in b),
                      b"")
    boxes: list[dict] = []
    cum_height = 0.0
    for pn, pid in enumerate(page_ids, start=1):
        body = objs.get(pid, b"")
        page_h = PAGE_H
        mb = _MEDIABOX_RE.search(body) or _MEDIABOX_RE.search(pages_body)
        if mb:
            page_h = float(mb.group(2))
        # /Contents: single ref or array of refs (streams concatenate)
        content_ids: list[int] = []
        ca = re.search(rb"/Contents\s*\[((?:\s*\d+\s+0\s+R)+)\s*\]",
                       body)
        if ca:
            content_ids = [int(r.group(1))
                           for r in _REF_RE.finditer(ca.group(1))]
        else:
            cm = _CONTENTS_RE.search(body)
            if cm:
                content_ids = [int(cm.group(1))]
        stream = b"\n".join(_stream_data(objs, objs[cid])
                            for cid in content_ids if cid in objs)
        fonts = _page_fonts(objs, [body, pages_body])

        # sequential op walk: graphics state (DeviceGray fill/stroke +
        # current font) persists across BT blocks within a page stream
        # (q/Q save/restore) and resets per page (streams are
        # independent); text position resets at BT
        fill_gray, stroke_gray = 0.0, 0.0  # PDF default: black
        size, x, y = 10.0, 0.0, 0.0
        font = None
        gs_stack: list[tuple[float, float]] = []

        def emit(text: str) -> None:
            if not text or (not text.strip() and not keep_spaces):
                return
            # reference pdf_parser.py:290: chars failing _has_color
            # (white-on-white DeviceGray) never become boxes
            if not _has_color(fill_gray, stroke_gray, text):
                return
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

        for op in _OP_RE.finditer(stream):
            if op.group("bt"):
                size, x, y = 10.0, 0.0, 0.0
            elif op.group("tf"):
                size = float(op.group("tf"))
                font = fonts.get(op.group("fname"))
            elif op.group("tma") is not None:
                x = float(op.group("tme"))
                y = float(op.group("tmf"))
            elif op.group("tdx") is not None:
                x += float(op.group("tdx"))
                y += float(op.group("tdy"))
            elif op.group("qpush") is not None:
                gs_stack.append((fill_gray, stroke_gray))
            elif op.group("qpop") is not None:
                if gs_stack:
                    fill_gray, stroke_gray = gs_stack.pop()
            elif op.group("fillrgb") is not None:
                parts = [float(v) for v in op.group("fillrgb").split()]
                fill_gray = 1.0 if all(v == 1.0 for v in parts) else 0.0
            elif op.group("strokergb") is not None:
                parts = [float(v) for v in op.group("strokergb").split()]
                stroke_gray = 1.0 if all(v == 1.0 for v in parts) \
                    else 0.0
            elif op.group("fill") is not None:
                fill_gray = float(op.group("fill"))
            elif op.group("stroke") is not None:
                stroke_gray = float(op.group("stroke"))
            elif op.group("tj") is not None:
                emit(_decode_show(_unescape_bytes(op.group("tj")),
                                  font))
            elif op.group("tjh") is not None:
                hexs = re.sub(rb"\s", b"", op.group("tjh"))
                if len(hexs) % 2:
                    hexs += b"0"
                try:
                    emit(_decode_show(bytes.fromhex(hexs.decode()),
                                      font))
                except ValueError:
                    pass
            elif op.group("tja") is not None:
                parts_txt: list[str] = []
                for hm, pm in _TJ_ITEM_RE.findall(op.group("tja")):
                    if pm:
                        parts_txt.append(_decode_show(
                            _unescape_bytes(pm), font))
                    elif hm:
                        hx = re.sub(rb"\s", b"", hm)
                        if len(hx) % 2:
                            hx += b"0"
                        try:
                            parts_txt.append(_decode_show(
                                bytes.fromhex(hx.decode()), font))
                        except ValueError:
                            pass
                emit("".join(parts_txt))
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
