"""Deterministic minimal DOCX/XLSX writers for the synthetic corpus.

Emits valid OOXML zips with the stdlib only — fixed zip timestamps and
STORED entries keep the bytes a pure function of the content, the same
contract as pdfgen.py. The parts are the minimum the from-scratch
parsers (docxparse.py / xlsxparse.py) and any standards-compliant
reader need: content types, package rels, document + styles (docx),
workbook + rels + inline-string sheets (xlsx).
"""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

_ZIP_TS = (1980, 1, 1, 0, 0, 0)


def _zip_parts(parts: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, data in parts.items():
            zi = zipfile.ZipInfo(name, date_time=_ZIP_TS)
            zf.writestr(zi, data)
    return buf.getvalue()


# -- docx -------------------------------------------------------------------

_DOCX_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/><Override PartName="/word/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.styles+xml"/></Types>"""

_DOCX_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/></Relationships>"""

_DOCX_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:styles xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:style w:type="paragraph" w:styleId="Normal"><w:name w:val="Normal"/></w:style><w:style w:type="paragraph" w:styleId="Heading1"><w:name w:val="heading 1"/></w:style><w:style w:type="paragraph" w:styleId="Heading2"><w:name w:val="heading 2"/></w:style><w:style w:type="paragraph" w:styleId="Heading3"><w:name w:val="heading 3"/></w:style><w:style w:type="paragraph" w:styleId="Heading4"><w:name w:val="heading 4"/></w:style></w:styles>"""

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _p(text: str, style: str | None = None) -> str:
    ppr = f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
    return (f"<w:p>{ppr}<w:r><w:t xml:space=\"preserve\">"
            f"{escape(text)}</w:t></w:r></w:p>")


def _tbl(rows: list[list[str]]) -> str:
    trs = []
    for row in rows:
        tcs = "".join(
            f"<w:tc>{_p(str(c))}</w:tc>" for c in row)
        trs.append(f"<w:tr>{tcs}</w:tr>")
    return "<w:tbl>" + "".join(trs) + "</w:tbl>"


def build_docx(paragraphs: list[tuple[str, str | None]],
               tables: list[list[list[str]]] | None = None) -> bytes:
    """[(text, styleId|None)] + optional tables (list of row-lists) ->
    .docx bytes. Tables are appended after the paragraphs in body
    order."""
    body = "".join(_p(t, s) for t, s in paragraphs)
    for rows in tables or []:
        body += _tbl(rows)
    doc = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
           f'<w:document xmlns:w="{_W}"><w:body>{body}'
           f"</w:body></w:document>")
    return _zip_parts({
        "[Content_Types].xml": _DOCX_CT,
        "_rels/.rels": _DOCX_RELS,
        "word/styles.xml": _DOCX_STYLES,
        "word/document.xml": doc,
    })


# -- xlsx -------------------------------------------------------------------

_XLSX_CT_HEAD = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>"""

_XLSX_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""

_S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def _col_ref(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _sheet_xml(rows: list[list]) -> str:
    xml_rows = []
    for ri, row in enumerate(rows, start=1):
        cells = []
        for ci, v in enumerate(row):
            if v is None:
                continue
            ref = f"{_col_ref(ci)}{ri}"
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t '
                    f'xml:space="preserve">{escape(str(v))}</t></is></c>')
        xml_rows.append(f'<row r="{ri}">' + "".join(cells) + "</row>")
    return (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            f'<worksheet xmlns="{_S}"><sheetData>'
            + "".join(xml_rows) + "</sheetData></worksheet>")


def build_xlsx(sheets: list[tuple[str, list[list]]]) -> bytes:
    """[(name, rows)] -> .xlsx bytes (inline strings, numeric cells)."""
    ct = [_XLSX_CT_HEAD]
    wb_sheets = []
    wb_rels = []
    parts: dict[str, str] = {}
    for i, (name, rows) in enumerate(sheets, start=1):
        path = f"xl/worksheets/sheet{i}.xml"
        ct.append(
            f'<Override PartName="/{path}" ContentType="application/'
            f'vnd.openxmlformats-officedocument.spreadsheetml.'
            f'worksheet+xml"/>')
        wb_sheets.append(
            f'<sheet name="{escape(name)}" sheetId="{i}" '
            f'r:id="rId{i}"/>')
        wb_rels.append(
            f'<Relationship Id="rId{i}" Type="{_R}/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>')
        parts[path] = _sheet_xml(rows)
    ct.append("</Types>")
    parts["[Content_Types].xml"] = "".join(ct)
    parts["_rels/.rels"] = _XLSX_RELS
    parts["xl/workbook.xml"] = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        f'<workbook xmlns="{_S}" xmlns:r="{_R}"><sheets>'
        + "".join(wb_sheets) + "</sheets></workbook>")
    parts["xl/_rels/workbook.xml.rels"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">' + "".join(wb_rels)
        + "</Relationships>")
    return _zip_parts(parts)


# -- pptx -------------------------------------------------------------------

_P = "http://schemas.openxmlformats.org/presentationml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"

_PPTX_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/></Relationships>"""


def _pptx_text_shape(top: int, left: int,
                     paras: list[tuple[str, bool, int]]) -> str:
    ps = []
    for text, bulleted, level in paras:
        ppr = (f'<a:pPr lvl="{level}"><a:buChar char="•"/></a:pPr>'
               if bulleted else "")
        ps.append(f"<a:p>{ppr}<a:r><a:t>{escape(text)}</a:t></a:r></a:p>")
    return (f'<p:sp><p:spPr><a:xfrm><a:off x="{left}" y="{top}"/>'
            f"</a:xfrm></p:spPr><p:txBody>" + "".join(ps)
            + "</p:txBody></p:sp>")


def _pptx_table_shape(top: int, left: int,
                      rows: list[list[str]]) -> str:
    trs = []
    for row in rows:
        tcs = "".join(
            f"<a:tc><a:txBody><a:p><a:r><a:t>{escape(str(c))}</a:t>"
            f"</a:r></a:p></a:txBody></a:tc>" for c in row)
        trs.append(f"<a:tr>{tcs}</a:tr>")
    return (f'<p:graphicFrame><p:xfrm><a:off x="{left}" y="{top}"/>'
            f"</p:xfrm><a:graphic><a:graphicData><a:tbl>"
            + "".join(trs)
            + "</a:tbl></a:graphicData></a:graphic></p:graphicFrame>")


def build_pptx(slides: list[list[dict]]) -> bytes:
    """slides -> .pptx bytes. Each slide is a list of shape specs:
    {"kind": "text", "top", "left", "paras": [(text, bulleted, level)]}
    or {"kind": "table", "top", "left", "rows": [[...]]}."""
    parts: dict[str, str] = {}
    ct = ["""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>"""]
    sld_ids = []
    rels = []
    for i, shapes in enumerate(slides, start=1):
        path = f"ppt/slides/slide{i}.xml"
        body = []
        for sh in shapes:
            if sh["kind"] == "table":
                body.append(_pptx_table_shape(sh["top"], sh["left"],
                                              sh["rows"]))
            else:
                body.append(_pptx_text_shape(sh["top"], sh["left"],
                                             sh["paras"]))
        parts[path] = (
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            f'<p:sld xmlns:p="{_P}" xmlns:a="{_A}"><p:cSld><p:spTree>'
            + "".join(body) + "</p:spTree></p:cSld></p:sld>")
        ct.append(
            f'<Override PartName="/{path}" ContentType="application/'
            f'vnd.openxmlformats-officedocument.presentationml.'
            f'slide+xml"/>')
        sld_ids.append(f'<p:sldId id="{255 + i}" r:id="rId{i}"/>')
        rels.append(
            f'<Relationship Id="rId{i}" Type="{_R}/slide" '
            f'Target="slides/slide{i}.xml"/>')
    ct.append("</Types>")
    parts["[Content_Types].xml"] = "".join(ct)
    parts["_rels/.rels"] = _PPTX_RELS
    parts["ppt/presentation.xml"] = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        f'<p:presentation xmlns:p="{_P}" xmlns:r="{_R}"><p:sldIdLst>'
        + "".join(sld_ids) + "</p:sldIdLst></p:presentation>")
    parts["ppt/_rels/presentation.xml.rels"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">' + "".join(rels)
        + "</Relationships>")
    return _zip_parts(parts)


def sniff_office(blob: bytes) -> str | None:
    """'docx' / 'xlsx' / 'pptx' for OOXML zips, 'doc' / 'ppt' for the
    legacy CFB containers, None otherwise (content sniffing, same role
    as the magic-byte PDF dispatch — the reference dispatches on the
    filename extension instead, rag/app/naive.py:335-464)."""
    if blob.startswith(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"):
        from ragflow_spark.extractlib.cfb import CfbError, read_cfb
        try:
            streams = read_cfb(blob)
        except CfbError:
            return None
        if "WordDocument" in streams:
            return "doc"
        if "PowerPoint Document" in streams:
            return "ppt"
        return None
    if not blob.startswith(b"PK\x03\x04"):
        return None
    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
        names = set(zf.namelist())
    except zipfile.BadZipFile:
        return None
    if "word/document.xml" in names:
        return "docx"
    if "xl/workbook.xml" in names:
        return "xlsx"
    if "ppt/presentation.xml" in names:
        return "pptx"
    return None
