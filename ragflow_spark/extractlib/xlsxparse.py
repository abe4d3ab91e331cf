"""XLSX parsing from scratch (stdlib zipfile + ElementTree).

Behavioral re-expression of RAGFlowExcelParser
(/root/reference/deepdoc/parser/excel_parser.py:24-140): per sheet, row
0 is the header; data rows render "header：value; ..." with the sheet
name appended as " ——{name}" when it isn't a default Sheet*; the
``html()`` renderer emits <table><caption>…, header <th> row, and
chunk_rows-sized <td> blocks. The reference reads through openpyxl; a
.xlsx is a zip of SpreadsheetML parts — shared strings, inline strings,
and numeric cells cover the value model (numbers parse int-first so
str() matches openpyxl's int cells).

CSV fallback (excel_parser.py:36-44): non-zip bytes parse as CSV with
row 0 as header, same renderers.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

S_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
R_NS = ("http://schemas.openxmlformats.org/officeDocument/2006/"
        "relationships")
PKG_R_NS = ("http://schemas.openxmlformats.org/package/2006/"
            "relationships")


def _s(tag: str) -> str:
    return f"{{{S_NS}}}{tag}"


def _cell_value(c, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(_s("is"))
        if is_el is None:
            return None
        return "".join(tt.text or "" for tt in is_el.iter(_s("t")))
    v = c.find(_s("v"))
    if v is None or v.text is None:
        return None
    raw = v.text
    if t == "s":
        try:
            return shared[int(raw)]
        except (ValueError, IndexError):
            return None
    if t == "str":
        return raw
    if t == "b":
        return raw == "1"
    if re.match(r"^-?[0-9]+$", raw):
        return int(raw)
    try:
        return float(raw)
    except ValueError:
        return raw


def _col_index(ref: str) -> int:
    """'BC12' -> 0-based column index 54."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _sheet_rows(root, shared: list[str]) -> list[list]:
    rows: list[list] = []
    width = 0
    raw_rows = []
    for row in root.iter(_s("row")):
        cells: dict[int, object] = {}
        next_idx = 0
        for c in row.findall(_s("c")):
            ref = c.get("r")
            idx = _col_index(ref) if ref else next_idx
            if idx < 0:
                idx = next_idx
            cells[idx] = _cell_value(c, shared)
            next_idx = idx + 1
        raw_rows.append(cells)
        if cells:
            width = max(width, max(cells) + 1)
    for cells in raw_rows:
        rows.append([cells.get(i) for i in range(width)])
    return rows


def load_sheets(blob: bytes) -> list[tuple[str, list[list]]]:
    """bytes -> [(sheet_name, rectangular rows)] in workbook order;
    non-zip input falls back to CSV (sheet name 'Data', matching the
    reference's dataframe_to_workbook shape). Malformed -> []."""
    if not blob.startswith(b"PK\x03\x04"):
        return _load_csv(blob)
    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
        wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    except (zipfile.BadZipFile, KeyError, ElementTree.ParseError):
        return []
    shared: list[str] = []
    try:
        ss = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
        shared = ["".join(t.text or "" for t in si.iter(_s("t")))
                  for si in ss.iter(_s("si"))]
    except (KeyError, ElementTree.ParseError):
        pass
    # rId -> part path
    rels: dict[str, str] = {}
    try:
        rr = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rr.iter(f"{{{PKG_R_NS}}}Relationship"):
            tgt = rel.get("Target", "")
            if tgt.startswith("/"):
                tgt = tgt[1:]
            elif not tgt.startswith("xl/"):
                tgt = "xl/" + tgt
            rels[rel.get("Id", "")] = tgt
    except (KeyError, ElementTree.ParseError):
        pass

    out = []
    for sheet in wb.iter(_s("sheet")):
        name = sheet.get("name", "Sheet")
        rid = sheet.get(f"{{{R_NS}}}id", "")
        path = rels.get(rid)
        if not path:
            continue
        try:
            root = ElementTree.fromstring(zf.read(path))
        except (KeyError, ElementTree.ParseError):
            continue
        out.append((name, _sheet_rows(root, shared)))
    return out


def _load_csv(blob: bytes) -> list[tuple[str, list[list]]]:
    """CSV fallback (excel_parser.py:36-43 + _dataframe_to_workbook):
    the reference routes non-zip bytes through pandas.read_csv into a
    'Data'-named workbook, so simple numeric cells arrive TYPED — a
    '0' cell is int 0 and falls to the falsy-skip in the row renderer.
    Plain int/float literals are coerced here for that parity; richer
    pandas inference (dates, NA tokens) is out of scope."""
    import csv
    import re as _re

    from .codec import find_codec

    def coerce(c: str):
        if _re.fullmatch(r"[-+]?[0-9]+", c):
            return int(c)
        if _re.fullmatch(r"[-+]?[0-9]*\.[0-9]+", c):
            return float(c)
        return c

    try:
        txt = blob.decode(find_codec(blob), errors="ignore")
        rows = [[coerce(c) for c in r]
                for r in csv.reader(io.StringIO(txt))]
    except Exception:
        return []
    if not rows:
        return []
    return [("Data", rows)]


def xlsx_rows(blob: bytes) -> list[str]:
    """excel_parser.py:107-129 __call__: 'header：value; ...' per data
    row, ' ——{sheet}' suffix for non-default sheet names."""
    res = []
    for name, rows in load_sheets(blob):
        if not rows:
            continue
        ti = rows[0]
        for r in rows[1:]:
            fields = []
            for i, c in enumerate(r):
                if not c:
                    continue
                # quirk kept: a None header cell renders "None"
                # (reference does str(ti[i].value), :117)
                t = str(ti[i]) if i < len(ti) else ""
                t += ("：" if t else "") + str(c)
                fields.append(t)
            line = "; ".join(fields)
            if name.lower().find("sheet") < 0:
                line += " ——" + name
            res.append(line)
    return res


def xlsx_html(blob: bytes, chunk_rows: int = 256) -> list[str]:
    """excel_parser.py:78-105 html renderer (header repeated per
    chunk_rows block; None cells -> empty <td>)."""
    chunks = []
    for name, rows in load_sheets(blob):
        if not rows:
            continue
        hdr = "<tr>" + "".join(f"<th>{c}</th>" for c in rows[0]) + "</tr>"
        n_chunks = (len(rows) - 1) // chunk_rows + 1
        for k in range(n_chunks):
            tb = f"<table><caption>{name}</caption>" + hdr
            for r in rows[1 + k * chunk_rows:1 + (k + 1) * chunk_rows]:
                tb += "<tr>"
                for c in r:
                    tb += "<td></td>" if c is None else f"<td>{c}</td>"
                tb += "</tr>"
            tb += "</table>\n"
            chunks.append(tb)
    return chunks


def xlsx_row_number(blob: bytes) -> int:
    """excel_parser.py:132-140."""
    return sum(len(rows) for _n, rows in load_sheets(blob))
