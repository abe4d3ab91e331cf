"""Table-structure rules: cell grid assembly -> HTML / description rows.

Behavioral equivalent of the model-independent parts of
TableStructureRecognizer (/root/reference/deepdoc/vision/
table_structure_recognizer.py): cell-type classification (:104-133),
caption detection (:94-102), row/column grouping with singleton
relocation and header-row voting (:135-351), span resolution (:503-587),
and the two renderers (:353-501). The ONNX row/column detector is a
model seam — these rules consume its *outputs* (R/C/H/SP tags on boxes),
so synthetic tagged grids exercise them fully (SURVEY.md §5.2).

Divergence note: ``blockType``'s Tx/Lx/Nr fallback uses
``rag_tokenizer.tokenize`` + a name-tag trie in the reference; here a
deterministic \\W+ split stands in and the Nr (person-name) branch is
never taken (the trie is a downloaded resource, SURVEY.md §2.7).

Box dict contract (same as the reference): text, x0, x1, top, bottom,
page_number, layout_type; optional R/C (row/col ids), H (header flag),
SP + H_left/H_right/H_top/H_bott (spanning cell evidence), R_top/R_btm,
C_left/C_right (aligned row/col geometry).
"""

from __future__ import annotations

import re
from collections import Counter

from .pdfrules import sort_x_firstly, sort_y_firstly

_BLOCK_PATTERNS = [
    ("^(20|19)[0-9]{2}[年/-][0-9]{1,2}[月/-][0-9]{1,2}日*$", "Dt"),
    (r"^(20|19)[0-9]{2}年$", "Dt"),
    (r"^(20|19)[0-9]{2}[年-][0-9]{1,2}月*$", "Dt"),
    ("^[0-9]{1,2}[月-][0-9]{1,2}日*$", "Dt"),
    (r"^第*[一二三四1-4]季度$", "Dt"),
    (r"^(20|19)[0-9]{2}年*[一二三四1-4]季度$", "Dt"),
    (r"^(20|19)[0-9]{2}[ABCDE]$", "Dt"),
    ("^[0-9.,+%/ -]+$", "Nu"),
    (r"^[0-9A-Z/\._~-]+$", "Ca"),
    (r"^[A-Z]*[a-z' -]+$", "En"),
    (r"^[0-9.,+-]+[0-9A-Za-z/$￥%<>（）()' -]+$", "NE"),
    (r"^.{1}$", "Sg"),
]


def block_type(box: dict) -> str:
    """Cell text class: date/number/code/english/mixed/single/short/long
    (tsr:104-133)."""
    txt = box["text"].strip()
    for pattern, label in _BLOCK_PATTERNS:
        if re.search(pattern, txt):
            return label
    tokens = [t for t in re.split(r"\W+", txt) if len(t) > 1]
    if len(tokens) > 3:
        return "Tx" if len(tokens) < 12 else "Lx"
    return "Ot"


def is_caption(box: dict) -> bool:
    """tsr:94-102."""
    if re.match(r"[图表]+[ 0-9:：]{2,}", box["text"].strip()):
        return True
    return box.get("layout_type", "").find("caption") >= 0


def sort_r_firstly(arr: list[dict], thr: float = 0) -> list[dict]:
    """Y-first sort then stable bubble by row id (recognizer.py:93-111)."""
    arr = sort_y_firstly(arr, thr)
    for i in range(len(arr) - 1):
        for j in range(i, -1, -1):
            if "R" not in arr[j] or "R" not in arr[j + 1]:
                continue
            if arr[j + 1]["R"] < arr[j]["R"] or (
                    arr[j + 1]["R"] == arr[j]["R"]
                    and arr[j + 1]["top"] < arr[j]["top"]):
                arr[j], arr[j + 1] = arr[j + 1], arr[j]
    return arr


def sort_c_firstly(arr: list[dict], thr: float = 0) -> list[dict]:
    """X-first sort then stable bubble by column id
    (recognizer.py:74-91)."""
    arr = sort_x_firstly(arr, thr)
    for i in range(len(arr) - 1):
        for j in range(i, -1, -1):
            if "C" not in arr[j] or "C" not in arr[j + 1]:
                continue
            if arr[j + 1]["C"] < arr[j]["C"] or (
                    arr[j + 1]["C"] == arr[j]["C"]
                    and arr[j + 1]["top"] < arr[j]["top"]):
                arr[j], arr[j + 1] = arr[j + 1], arr[j]
    return arr


def _group_rows(boxes: list[dict]) -> list[list[dict]]:
    """Row grouping by R tag / bottom proximity (tsr:158-176)."""
    boxes[0]["rn"] = 0
    rows = [[boxes[0]]]
    btm = boxes[0]["bottom"]
    for b in boxes[1:]:
        b["rn"] = len(rows) - 1
        last = rows[-1]
        if last[-1].get("R", "") != b.get("R", "") or (
                b["top"] >= btm - 3
                and last[-1].get("R", "-1") != b.get("R", "-2")):
            btm = b["bottom"]
            b["rn"] += 1
            rows.append([b])
            continue
        btm = (btm + b["bottom"]) / 2.0
        rows[-1].append(b)
    return rows


def _group_cols(boxes: list[dict]) -> list[list[dict]]:
    """Column grouping by C tag / x1 proximity (tsr:184-200)."""
    boxes[0]["cn"] = 0
    cols = [[boxes[0]]]
    right = boxes[0]["x1"]
    for b in boxes[1:]:
        b["cn"] = len(cols) - 1
        last = cols[-1]
        if (int(b.get("C", "1")) - int(last[-1].get("C", "1")) == 1
                and b["page_number"] == last[-1]["page_number"]) or (
                b["x0"] >= right
                and last[-1].get("C", "-1") != b.get("C", "-2")):
            right = b["x1"]
            b["cn"] += 1
            cols.append([b])
            continue
        right = (right + b["x1"]) / 2.0
        cols[-1].append(b)
    return cols


def _relocate_singleton_cols(tbl, cols):
    """A column with exactly one populated cell whose row has an empty
    neighbor merges into the geometrically nearest side (tsr:203-259)."""
    j = 0
    while j < len(tbl[0]):
        filled, ii = 0, 0
        for i in range(len(tbl)):
            if tbl[i][j]:
                filled += 1
                ii = i
            if filled > 1:
                break
        if filled > 1:
            j += 1
            continue
        left_ok = (j > 0 and tbl[ii][j - 1]
                   and tbl[ii][j - 1][0].get("text")) or j == 0
        right_ok = (j + 1 < len(tbl[ii]) and tbl[ii][j + 1]
                    and tbl[ii][j + 1][0].get("text")) or \
            j + 1 >= len(tbl[ii])
        if left_ok and right_ok:
            j += 1
            continue
        bx = tbl[ii][j][0]
        left = right = 100000.0
        if j > 0 and not left_ok:
            for i in range(len(tbl)):
                if tbl[i][j - 1]:
                    left = min(left, min(bx["x0"] - a["x1"]
                                         for a in tbl[i][j - 1]))
        if j + 1 < len(tbl[0]) and not right_ok:
            for i in range(len(tbl)):
                if tbl[i][j + 1]:
                    right = min(right, min(a["x0"] - bx["x1"]
                                           for a in tbl[i][j + 1]))
        target = j - 1 if left < right else j + 1
        for jj in range(j if left < right else j + 1, len(tbl[0])):
            for i in range(len(tbl)):
                for a in tbl[i][jj]:
                    a["cn"] -= 1
        if tbl[ii][target]:
            tbl[ii][target].extend(tbl[ii][j])
        else:
            tbl[ii][target] = tbl[ii][j]
        for i in range(len(tbl)):
            tbl[i].pop(j)
        cols.pop(j)


def _relocate_singleton_rows(tbl, rows):
    """Transpose of the column relocation (tsr:263-313)."""
    i = 0
    while i < len(tbl):
        filled, jj = 0, 0
        for j in range(len(tbl[i])):
            if tbl[i][j]:
                filled += 1
                jj = j
            if filled > 1:
                break
        if filled > 1:
            i += 1
            continue
        up_ok = (i > 0 and tbl[i - 1][jj]
                 and tbl[i - 1][jj][0].get("text")) or i == 0
        down_ok = (i + 1 < len(tbl) and tbl[i + 1][jj]
                   and tbl[i + 1][jj][0].get("text")) or i + 1 >= len(tbl)
        if up_ok and down_ok:
            i += 1
            continue
        bx = tbl[i][jj][0]
        up = down = 100000.0
        if i > 0 and not up_ok:
            for j in range(len(tbl[i - 1])):
                if tbl[i - 1][j]:
                    up = min(up, min(bx["top"] - a["bottom"]
                                     for a in tbl[i - 1][j]))
        if i + 1 < len(tbl) and not down_ok:
            for j in range(len(tbl[i + 1])):
                if tbl[i + 1][j]:
                    down = min(down, min(a["top"] - bx["bottom"]
                                         for a in tbl[i + 1][j]))
        target = i - 1 if up < down else i + 1
        for ii in range(i if up < down else i + 1, len(tbl)):
            for j in range(len(tbl[ii])):
                for a in tbl[ii][j]:
                    a["rn"] -= 1
        if tbl[target][jj]:
            tbl[target][jj].extend(tbl[i][jj])
        else:
            tbl[target][jj] = tbl[i][jj]
        tbl.pop(i)
        rows.pop(i)


def _header_rows(tbl, max_type: str) -> set[int]:
    """Rows where >50% of populated cells carry H or break the dominant
    numeric type (tsr:316-329)."""
    hdset: set[int] = set()
    for i in range(len(tbl)):
        cnt, h = 0, 0
        for arr in tbl[i]:
            if not arr:
                continue
            cnt += 1
            if max_type == "Nu" and arr[0]["btype"] == "Nu":
                continue
            if any(a.get("H") for a in arr) or (
                    max_type == "Nu" and arr[0]["btype"] != "Nu"):
                h += 1
        if cnt and h / cnt > 0.5:
            hdset.add(i)
    return hdset


def _cal_spans(boxes, rows, cols, tbl, html: bool):
    """Span resolution from spanning-cell midpoint overlap + dedup
    (tsr:503-587)."""
    def mean(vals):
        vals = list(vals)
        return sum(vals) / len(vals)

    clft = [mean(c.get("C_left", c["x0"]) for c in cln) for cln in cols]
    crgt = [mean(c.get("C_right", c["x1"]) for c in cln) for cln in cols]
    rtop = [mean(c.get("R_top", c["top"]) for c in row) for row in rows]
    rbtm = [mean(c.get("R_btm", c["bottom"]) for c in row) for row in rows]
    for b in boxes:
        if "SP" not in b:
            continue
        b["colspan"] = [b["cn"]]
        b["rowspan"] = [b["rn"]]
        for j in range(len(clft)):
            if j == b["cn"]:
                continue
            if clft[j] + (crgt[j] - clft[j]) / 2 < b["H_left"]:
                continue
            if crgt[j] - (crgt[j] - clft[j]) / 2 > b["H_right"]:
                continue
            b["colspan"].append(j)
        for j in range(len(rtop)):
            if j == b["rn"]:
                continue
            if rtop[j] + (rbtm[j] - rtop[j]) / 2 < b["H_top"]:
                continue
            if rbtm[j] - (rbtm[j] - rtop[j]) / 2 > b["H_bott"]:
                continue
            b["rowspan"].append(j)

    def join(arr):
        return "".join(t["text"] for t in arr) if arr else ""

    for i in range(len(tbl)):
        for j, arr in enumerate(tbl[i]):
            if not arr:
                continue
            if all("rowspan" not in a and "colspan" not in a for a in arr):
                continue
            rowspan, colspan = [], []
            for a in arr:
                if isinstance(a.get("rowspan", 0), list):
                    rowspan.extend(a["rowspan"])
                if isinstance(a.get("colspan", 0), list):
                    colspan.extend(a["colspan"])
            rowspan, colspan = set(rowspan), set(colspan)
            if len(rowspan) < 2 and len(colspan) < 2:
                for a in arr:
                    a.pop("rowspan", None)
                    a.pop("colspan", None)
                continue
            rowspan, colspan = sorted(rowspan), sorted(colspan)
            rowspan = list(range(rowspan[0], rowspan[-1] + 1))
            colspan = list(range(colspan[0], colspan[-1] + 1))
            arr = []
            for r in rowspan:
                for c in colspan:
                    if tbl[r][c] and join(tbl[r][c]) != join(arr):
                        arr.extend(tbl[r][c])
                    tbl[r][c] = None if html else arr
            for a in arr:
                if len(rowspan) > 1:
                    a["rowspan"] = len(rowspan)
                else:
                    a.pop("rowspan", None)
                if len(colspan) > 1:
                    a["colspan"] = len(colspan)
                else:
                    a.pop("colspan", None)
            tbl[rowspan[0]][colspan[0]] = arr
    return tbl


def _render_html(cap, hdset, tbl) -> str:
    """tsr:353-390 (including the header-set text quirk at :381-384)."""
    html = "<table>"
    if cap:
        html += f"<caption>{cap}</caption>"
    for i in range(len(tbl)):
        row = "<tr>"
        txts = []
        for arr in tbl[i]:
            if arr is None:
                continue
            if not arr:
                row += "<td></td>" if i not in hdset else "<th></th>"
                continue
            h = min(min(c["bottom"] - c["top"] for c in arr) / 2, 10)
            txt = " ".join(c["text"] for c in sort_y_firstly(arr, h))
            txts.append(txt)
            sp = ""
            if arr[0].get("colspan"):
                sp = "colspan={}".format(arr[0]["colspan"])
            if arr[0].get("rowspan"):
                sp += " rowspan={}".format(arr[0]["rowspan"])
            tag = "th" if i in hdset else "td"
            row += f"<{tag} {sp} >" + txt + f"</{tag}>"
        if i in hdset:
            # quirk: cell *texts* join the row-index set, making repeated
            # header rows collapse
            if all(t in hdset for t in txts):
                continue
            for t in txts:
                hdset.add(t)
        row = row + "</tr>" if row != "<tr>" else ""
        html += "\n" + row
    return html + "\n</table>"


def _render_desc(cap, hdr_rowno, tbl, is_english: bool) -> list[str]:
    """tsr:392-501: header propagation, hierarchical concat (de/' for '),
    'header：value; ...' row strings."""
    clmno, rowno = len(tbl[0]), len(tbl)
    headers: dict[int, list[str]] = {}
    lst_hdr: list[str] = []
    de = " for " if is_english else "的"
    for r in sorted(hdr_rowno):
        headers[r] = ["" for _ in range(clmno)]
        for i in range(clmno):
            if tbl[r][i]:
                headers[r][i] = " ".join(a["text"].strip()
                                         for a in tbl[r][i])
        if all(not t for t in headers[r]):
            del headers[r]
            hdr_rowno.remove(r)
            continue
        for j in range(clmno):
            if headers[r][j]:
                continue
            if j >= len(lst_hdr):
                break
            headers[r][j] = lst_hdr[j]
        lst_hdr = headers[r]
    for i in range(rowno):
        if i not in hdr_rowno:
            continue
        for j in range(i + 1, rowno):
            if j not in hdr_rowno:
                break
            for k in range(clmno):
                if not headers[j - 1][k]:
                    continue
                if headers[j][k].find(headers[j - 1][k]) >= 0:
                    continue
                if len(headers[j][k]) > len(headers[j - 1][k]):
                    headers[j][k] += (de if headers[j][k] else "") + \
                        headers[j - 1][k]
                else:
                    headers[j][k] = headers[j - 1][k] + \
                        (de if headers[j - 1][k] else "") + headers[j][k]

    row_txt: list[str] = []
    for i in range(rowno):
        if i in hdr_rowno:
            continue
        rtxt: list[str] = []
        r = 0
        if headers:
            candidates = [(i - rr, rr) for rr in headers if rr < i]
            if candidates:
                _, r = min(candidates, key=lambda x: x[0])
        if r not in headers and clmno <= 2:
            for j in range(clmno):
                if tbl[i][j]:
                    txt = "".join(a["text"].strip() for a in tbl[i][j])
                    if txt:
                        rtxt.append(txt)
            if rtxt:
                joined = "：".join(rtxt)
                if row_txt and len(row_txt[-1]) + len(joined) < 64:
                    row_txt[-1] += "\n" + joined
                else:
                    row_txt.append(joined)
            continue
        for j in range(clmno):
            if not tbl[i][j]:
                continue
            txt = "".join(a["text"].strip() for a in tbl[i][j])
            if not txt:
                continue
            ctt = headers[r][j] if r in headers else ""
            if ctt:
                ctt += "："
            ctt += txt
            rtxt.append(ctt)
        if rtxt:
            row_txt.append("; ".join(rtxt))
    if cap:
        from_ = " in " if is_english else "来自"
        row_txt = [t + f"\t——{from_}“{cap}”" for t in row_txt]
    return row_txt


def construct_table(boxes: list[dict], is_english: bool = False,
                    html: bool = False):
    """Full grid assembly (tsr:135-351): caption pull-out, row/col
    grouping, singleton relocation (rows>=4 / cols>=4 gates), header
    voting, spans, then HTML or desc-row rendering."""
    cap = ""
    i = 0
    while i < len(boxes):
        if is_caption(boxes[i]):
            cap += boxes[i]["text"]
            boxes.pop(i)
            continue
        i += 1
    if not boxes:
        return []
    for b in boxes:
        b["btype"] = block_type(b)
    type_counts = Counter(b["btype"] for b in boxes).items()
    max_type = max(type_counts, key=lambda x: x[1])[0] if type_counts \
        else ""

    # quirk: the reference reads R_bott here but R_btm in the span calc
    # (tsr:154 vs :509) — both field spellings kept
    rowh = [b["R_bott"] - b["R_top"] for b in boxes if "R" in b
            and "R_bott" in b and "R_top" in b]
    rowh = min(rowh) if rowh else 0
    boxes = sort_r_firstly(boxes, rowh / 2)
    rows = _group_rows(boxes)

    colwm = [b["C_right"] - b["C_left"] for b in boxes if "C" in b
             and "C_right" in b and "C_left" in b]
    colwm = min(colwm) if colwm else 0
    crosspage = len({b["page_number"] for b in boxes}) > 1
    boxes = (sort_x_firstly(boxes, colwm / 2) if crosspage
             else sort_c_firstly(boxes, colwm / 2))
    cols = _group_cols(boxes)

    tbl = [[[] for _ in range(len(cols))] for _ in range(len(rows))]
    for b in boxes:
        tbl[b["rn"]][b["cn"]].append(b)

    if len(rows) >= 4:
        _relocate_singleton_cols(tbl, cols)
    if len(cols) >= 4:
        _relocate_singleton_rows(tbl, rows)

    hdset = _header_rows(tbl, max_type)
    if html:
        return _render_html(cap, hdset,
                            _cal_spans(boxes, rows, cols, tbl, True))
    return _render_desc(cap, hdset,
                        _cal_spans(boxes, rows, cols, tbl, False),
                        is_english)
