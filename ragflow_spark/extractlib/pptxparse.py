"""PPTX parsing from scratch (stdlib zipfile + ElementTree).

Behavioral re-expression of RAGFlowPptParser
(/root/reference/deepdoc/parser/ppt_parser.py:22-81): per slide, shapes
sort by (top // 10, left); a text frame renders its non-empty
paragraphs with the bullet prefix quirk ("  " * level + "." + text when
the paragraph carries buChar/buAutoNum/buBlip); a table renders rows
1..n as "header0: cell" fields joined "; " (the reference's
``if tb.cell(i, j)`` guard is vacuously true — python-pptx cell objects
are always truthy — so every column renders; quirk kept); groups
recurse over their sorted children. One text blob per slide comes back,
exactly what the presentation template chunks on
(rag/app/presentation.py:96-128: one chunk per slide).

The legacy binary .ppt container (OLE, the reference reads it through
aspose) is out of scope — ``sniff_office`` does not claim it.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree

P_NS = "http://schemas.openxmlformats.org/presentationml/2006/main"
A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
R_NS = ("http://schemas.openxmlformats.org/officeDocument/2006/"
        "relationships")
PKG_R_NS = ("http://schemas.openxmlformats.org/package/2006/"
            "relationships")


def _p(tag: str) -> str:
    return f"{{{P_NS}}}{tag}"


def _a(tag: str) -> str:
    return f"{{{A_NS}}}{tag}"


def _shape_pos(el) -> tuple[int, int]:
    off = el.find(f".//{_a('off')}")
    if off is None:
        return 0, 0
    try:
        return int(off.get("y", "0")), int(off.get("x", "0"))
    except ValueError:
        return 0, 0


def _para_text(p_el) -> str:
    return "".join(t.text or "" for t in p_el.iter(_a("t")))


def _bulleted_text(p_el) -> str:
    """ppt_parser.py:26-31: bullet prefix '  '*level + '.' + text."""
    txt = _para_text(p_el)
    ppr = p_el.find(_a("pPr"))
    if ppr is not None and (
            ppr.find(_a("buChar")) is not None
            or ppr.find(_a("buAutoNum")) is not None
            or ppr.find(_a("buBlip")) is not None):
        level = int(ppr.get("lvl", "0") or "0")
        return f"{'  ' * level}.{txt}"
    return txt


def _cell_text(tc_el) -> str:
    # python-pptx cell.text: paragraphs joined by newline
    return "\n".join(_para_text(p) for p in tc_el.iter(_a("p")))


def _extract_shape(el) -> str | None:
    """ppt_parser.py:33-56 __extract."""
    if el.tag == _p("graphicFrame"):
        tbl = el.find(f".//{_a('tbl')}")
        if tbl is None:
            return None
        rows = [[_cell_text(tc) for tc in tr.findall(_a("tc"))]
                for tr in tbl.findall(_a("tr"))]
        if len(rows) < 2:
            return ""
        lines = []
        for i in range(1, len(rows)):
            fields = [f"{rows[0][j]}: {rows[i][j]}"
                      for j in range(len(rows[0]))
                      if j < len(rows[i])]
            lines.append("; ".join(fields))
        return "\n".join(lines)

    if el.tag == _p("sp"):
        tx = el.find(f".//{_p('txBody')}")
        if tx is None:
            return None
        texts = [_bulleted_text(p) for p in tx.findall(_a("p"))
                 if _para_text(p).strip()]
        return "\n".join(texts)

    if el.tag == _p("grpSp"):
        kids = [k for k in el
                if k.tag in (_p("sp"), _p("graphicFrame"), _p("grpSp"))]
        kids.sort(key=lambda k: (_shape_pos(k)[0] // 10,
                                 _shape_pos(k)[1]))
        texts = []
        for k in kids:
            t = _extract_shape(k)
            if t:
                texts.append(t)
        return "\n".join(texts)
    return None


def parse_pptx(blob: bytes, from_page: int = 0,
               to_page: int = 100000) -> list[str]:
    """bytes -> one text blob per slide within the page window
    (ppt_parser.py:58-81). Malformed input degrades to []."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
        pres = ElementTree.fromstring(zf.read("ppt/presentation.xml"))
    except (zipfile.BadZipFile, KeyError, ElementTree.ParseError):
        return []
    rels: dict[str, str] = {}
    try:
        rr = ElementTree.fromstring(
            zf.read("ppt/_rels/presentation.xml.rels"))
        for rel in rr.iter(f"{{{PKG_R_NS}}}Relationship"):
            tgt = rel.get("Target", "")
            if tgt.startswith("/"):
                tgt = tgt[1:]
            elif not tgt.startswith("ppt/"):
                tgt = "ppt/" + tgt
            rels[rel.get("Id", "")] = tgt
    except (KeyError, ElementTree.ParseError):
        return []

    slide_paths = []
    for sld in pres.iter(_p("sldId")):
        rid = sld.get(f"{{{R_NS}}}id", "")
        if rid in rels:
            slide_paths.append(rels[rid])

    txts: list[str] = []
    for i, path in enumerate(slide_paths):
        if i < from_page:
            continue
        if i >= to_page:
            break
        try:
            root = ElementTree.fromstring(zf.read(path))
        except (KeyError, ElementTree.ParseError):
            continue
        tree = root.find(f".//{_p('spTree')}")
        if tree is None:
            txts.append("")
            continue
        shapes = [el for el in tree
                  if el.tag in (_p("sp"), _p("graphicFrame"),
                                _p("grpSp"))]
        shapes.sort(key=lambda el: (_shape_pos(el)[0] // 10,
                                    _shape_pos(el)[1]))
        texts = []
        for el in shapes:
            t = _extract_shape(el)
            if t:
                texts.append(t)
        txts.append("\n".join(texts))
    return txts
