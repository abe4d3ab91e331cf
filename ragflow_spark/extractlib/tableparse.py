"""Table template: delimited text -> typed columns -> row-wise docs.

Behavioral equivalent of the table template's text/CSV branch
(/root/reference/rag/app/table.py:82-128, 160-240): header line +
delimiter-split rows (width-mismatched rows dropped), a per-column type
vote (int / float / bool / datetime / text with the reference's regex
quirks, e.g. ints admit a trailing ``.0+`` and ``%%`` is stripped
before matching), value conversion to the winning type, ES-style field
suffixes, and "col:value; col:value" row strings.

Divergences (documented): the reference converts column names to pinyin
(Pinyin package) and parses dates with dateutil — ASCII headers pass
through unchanged here, and the datetime parser accepts the ISO forms
``YYYY-MM-DD[ HH:MM[:SS]]`` and ``YYYY/MM/DD`` (deterministic subset).
"""

from __future__ import annotations

import re
from datetime import datetime

FIELD_SUFFIX = {"text": "_tks", "int": "_long", "keyword": "_kwd",
                "float": "_flt", "datetime": "_dt", "bool": "_kwd"}

_DT_FORMATS = ["%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M", "%Y-%m-%d",
               "%Y/%m/%d %H:%M:%S", "%Y/%m/%d"]


def trans_datetime(s: str):
    s = s.strip()
    for fmt in _DT_FORMATS:
        try:
            return datetime.strptime(s, fmt).strftime("%Y-%m-%d %H:%M:%S")
        except ValueError:
            continue
    return None


def trans_bool(s: str):
    if re.match(r"(true|yes|是|\*|✓|✔|☑|✅|√)$", str(s).strip(),
                flags=re.IGNORECASE):
        return "yes"
    if re.match(r"(false|no|否|⍻|×)$", str(s).strip(),
                flags=re.IGNORECASE):
        return "no"
    return None


def column_data_type(arr: list):
    """Vote the column type and convert values (table.py:97-128; the
    trans failure -> None behavior kept)."""
    arr = list(arr)
    counts = {"int": 0, "float": 0, "text": 0, "datetime": 0, "bool": 0}
    for a in arr:
        if a is None:
            continue
        s = str(a).replace("%%", "")
        if re.match(r"[+-]?[0-9]{,19}(\.0+)?$", s):
            counts["int"] += 1
        elif re.match(r"[+-]?[0-9.]{,19}$", s):
            counts["float"] += 1
        elif re.match(r"(true|yes|是|\*|✓|✔|☑|✅|√|false|no|否|⍻|×)$",
                      str(a), flags=re.IGNORECASE):
            counts["bool"] += 1
        elif trans_datetime(str(a)):
            counts["datetime"] += 1
        else:
            counts["text"] += 1
    ty = sorted(counts.items(), key=lambda x: -x[1])[0][0]
    trans = {"int": int, "float": float, "datetime": trans_datetime,
             "bool": trans_bool, "text": str}[ty]
    out = []
    for a in arr:
        if a is None:
            out.append(None)
            continue
        try:
            v = trans(str(a))
        except Exception:
            v = None
        out.append(v)
    return out, ty


def parse_table_txt(txt: str, delimiter: str = "\t"):
    """Header + rows from delimited text (table.py:155-171): rows whose
    width mismatches the header are dropped."""
    lines = [ln for ln in txt.split("\n") if ln.strip()]
    if not lines:
        return [], []
    headers = lines[0].split(delimiter)
    rows = [r for ln in lines[1:]
            if len(r := ln.split(delimiter)) == len(headers)]
    return headers, rows


def table_row_docs(headers: list[str], rows: list[list]):
    """Columns typed+converted, each row rendered to (row_txt, fields)
    (table.py:199-235): row_txt = 'col:value; ...'; fields keyed by
    header + type suffix. 'id'-like columns dropped."""
    drop = {i for i, h in enumerate(headers)
            if h in ("id", "_id", "index", "idx")}
    keep = [i for i in range(len(headers)) if i not in drop]
    cols = {i: [r[i] for r in rows] for i in keep}
    tys = {}
    for i in keep:
        cols[i], tys[i] = column_data_type(cols[i])
    docs = []
    for ri in range(len(rows)):
        row_txt, fields = [], {}
        for i in keep:
            v = cols[i][ri]
            if v is None or not str(v):
                continue
            fields[headers[i] + FIELD_SUFFIX[tys[i]]] = v
            row_txt.append("{}:{}".format(headers[i], v))
        if row_txt:
            docs.append(("; ".join(row_txt), fields))
    return docs


def chunk_table_txt(binary: bytes, delimiter: str = "\t") -> list[str]:
    """table template, text branch: bytes -> row_txt chunk strings."""
    from .codec import decode_blob

    headers, rows = parse_table_txt(decode_blob(binary), delimiter)
    if not headers or not rows:
        return []
    return [txt for txt, _ in table_row_docs(headers, rows)]
