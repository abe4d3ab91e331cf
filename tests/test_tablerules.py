"""Table-structure rules over synthetic tagged box grids (SURVEY §5.2.1)."""

from ragflow_spark.extractlib.tablerules import (block_type, construct_table,
                                                 is_caption, sort_c_firstly,
                                                 sort_r_firstly)


def _cell(text, r, c, *, H=None, page=1, w=60, h=14, R=None, C=None):
    x0 = 72 + c * 100
    top = 100 + r * 20
    box = {"text": text, "x0": x0, "x1": x0 + w, "top": top,
           "bottom": top + h, "page_number": page, "layout_type": "table"}
    if H:
        box["H"] = 1
    if R is not None:
        box["R"] = R
    if C is not None:
        box["C"] = C
    return box


def _grid(header, rows):
    boxes = [_cell(t, 0, j, H=True, R=0, C=j)
             for j, t in enumerate(header)]
    for i, row in enumerate(rows, start=1):
        boxes.extend(_cell(t, i, j, R=i, C=j)
                     for j, t in enumerate(row))
    return boxes


def test_block_type_classes():
    bt = lambda s: block_type({"text": s})
    assert bt("2023年1月2日") == "Dt"
    assert bt("1,234.5") == "Nu"
    assert bt("AB-12_X") == "Ca"
    assert bt("hello world") == "En"
    assert bt("12abc") == "NE"
    assert bt("中") == "Sg"  # 'x' hits the En pattern first, as upstream
    assert bt("The Quick Brown Fox Jumps High") == "Tx"
    assert bt("W1 " * 13) == "Lx"


def test_is_caption():
    assert is_caption({"text": "表 1: 结果", "layout_type": "table"})
    assert is_caption({"text": "anything", "layout_type": "figure caption"})
    assert not is_caption({"text": "data", "layout_type": "table"})


def test_desc_table_header_value_rows():
    boxes = _grid(["name", "score"],
                  [["alpha", "1.5"], ["beta", "2.5"]])
    out = construct_table(boxes, is_english=True)
    assert out == ["name：alpha; score：1.5", "name：beta; score：2.5"]


def test_html_table_render():
    boxes = _grid(["name", "score"], [["alpha", "1.5"]])
    html = construct_table(boxes, is_english=True, html=True)
    assert html.startswith("<table>")
    # double space inside the tag mirrors the reference's format string
    # (tsr:374-378 f"<th {sp} >" with empty sp)
    assert "<th  >name</th>" in html and "<td  >alpha</td>" in html
    assert html.count("<tr>") == 2


def test_caption_pull_out():
    boxes = _grid(["k", "v"], [["a", "1"]])
    boxes.append({"text": "表 12: demo", "x0": 0, "x1": 10, "top": 0,
                  "bottom": 10, "page_number": 1, "layout_type": "table"})
    out = construct_table(boxes, is_english=True)
    assert out and out[0].endswith("\t—— in “表 12: demo”")


def test_numeric_header_vote_without_H_tags():
    # numeric-dominant table: the non-Nu row is voted header even with
    # no explicit H tags
    boxes = [_cell(t, 0, j) for j, t in enumerate(["year", "price"])]
    for i, row in enumerate([["2001", "1.5"], ["2002", "2.5"],
                             ["2003", "3.5"]], start=1):
        boxes.extend(_cell(t, i, j) for j, t in enumerate(row))
    out = construct_table(boxes, is_english=True)
    assert all("year：" in r and "price：" in r for r in out)


def test_sort_r_c_stable():
    a = _cell("a", 0, 0, R=1)
    b = _cell("b", 0, 1, R=0)
    assert [x["text"] for x in sort_r_firstly([a, b], 50)] == ["b", "a"]
    c = _cell("c", 0, 0, C=1)
    d = _cell("d", 1, 0, C=0)
    assert [x["text"] for x in sort_c_firstly([c, d], 50)] == ["d", "c"]


def test_two_column_table_colon_join():
    # clmno <= 2 with no header -> values joined by '：'
    boxes = [_cell(t, i, j)
             for i, row in enumerate([["k1", "v1"], ["k2", "v2"]])
             for j, t in enumerate(row)]
    out = construct_table(boxes, is_english=False)
    assert out == ["k1：v1\nk2：v2"]


def test_empty_and_caption_only():
    assert construct_table([]) == []
    only_cap = [{"text": "表 1:", "x0": 0, "x1": 1, "top": 0, "bottom": 1,
                 "page_number": 1, "layout_type": "caption"}]
    assert construct_table(only_cap) == []
