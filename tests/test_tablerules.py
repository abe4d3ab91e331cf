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


def test_singleton_column_relocates_left():
    # tsr:203-263: a column with exactly ONE filled cell (needs >=4
    # rows) whose same-row left neighbor is empty relocates into the
    # nearer side — here left (right is the table edge)
    boxes = [_cell("h1", 0, 0, H=True, R=0, C=0),
             _cell("h2", 0, 1, H=True, R=0, C=1),
             _cell("a", 1, 0, R=1, C=0), _cell("b", 1, 1, R=1, C=1),
             _cell("c", 2, 0, R=2, C=0), _cell("x", 2, 2, R=2, C=2),
             _cell("d", 3, 0, R=3, C=0), _cell("e", 3, 1, R=3, C=1)]
    out = construct_table(boxes, is_english=True)
    assert out == ["h1：a; h2：b", "h1：c; h2：x", "h1：d; h2：e"]


def test_singleton_row_relocates_up():
    # tsr:266-313 transpose: a row with exactly ONE filled cell (needs
    # >=4 cols) whose up neighbor cell is empty relocates upward
    boxes = [_cell(f"h{j + 1}", 0, j, H=True, R=0, C=j)
             for j in range(4)]
    boxes += [_cell("a", 1, 0, R=1, C=0), _cell("b", 1, 1, R=1, C=1),
              _cell("c", 1, 2, R=1, C=2)]
    boxes += [_cell("solo", 2, 3, R=2, C=3)]
    out = construct_table(boxes, is_english=True)
    assert out == ["h1：a; h2：b; h3：c; h4：solo"]


def test_singleton_column_extends_textless_target():
    # target cell occupied by a text-less box: the singleton EXTENDS
    # the cell (tsr's extend branch) instead of replacing it
    boxes = [_cell("h1", 0, 0, H=True, R=0, C=0),
             _cell("h2", 0, 1, H=True, R=0, C=1),
             _cell("a", 1, 0, R=1, C=0), _cell("b", 1, 1, R=1, C=1),
             _cell("c", 2, 0, R=2, C=0), _cell("", 2, 1, R=2, C=1),
             _cell("x", 2, 2, R=2, C=2),
             _cell("d", 3, 0, R=3, C=0), _cell("e", 3, 1, R=3, C=1)]
    out = construct_table(boxes, is_english=True)
    assert out == ["h1：a; h2：b", "h1：c; h2：x", "h1：d; h2：e"]


def _span_grid():
    # an "SP" box is a TSR spanning-cell component: H_* give the
    # model's span hull; here it hulls columns 0-1 of the header row
    sp = _cell("wide", 0, 0, H=True, R=0, C=0)
    sp.update({"SP": 1, "H_left": 72.0, "H_right": 232.0,
               "H_top": float(sp["top"]), "H_bott": float(sp["bottom"])})
    return [sp, _cell("h3", 0, 2, H=True, R=0, C=2),
            _cell("a", 1, 0, R=1, C=0), _cell("b", 1, 1, R=1, C=1),
            _cell("c", 1, 2, R=1, C=2),
            _cell("d", 2, 0, R=2, C=0), _cell("e", 2, 1, R=2, C=1),
            _cell("f", 2, 2, R=2, C=2)]


def test_span_header_html_colspan():
    # tsr:504-583 __cal_spans: the SP hull pulls column 1 into the
    # header's colspan; html emits colspan=2 and drops the eaten cell
    html = construct_table(_span_grid(), is_english=True, html=True)
    assert "<th colspan=2 >wide</th><th  >h3</th>" in html
    assert html.count("<th") == 2


def test_span_header_desc_shares_header():
    # desc mode (html=False) writes the span arr into every covered
    # cell, so both columns inherit the "wide" header
    out = construct_table(_span_grid(), is_english=True)
    assert out == ["wide：a; wide：b; h3：c", "wide：d; wide：e; h3：f"]


def _cellx(text, r, c, *, H=None, h=14, R=None, C=None, x=None, y=None,
           **kw):
    x0 = x if x is not None else 72 + c * 100
    top = y if y is not None else 100 + r * 20
    box = {"text": text, "x0": x0, "x1": x0 + 60, "top": top,
           "bottom": top + h, "page_number": 1, "layout_type": "table"}
    if H:
        box["H"] = 1
    if R is not None:
        box["R"] = R
    if C is not None:
        box["C"] = C
    box.update(kw)
    return box


def test_singleton_column_relocates_right():
    # singleton X sits nearer column 2 (explicit x), both neighbors in
    # its row are empty -> the right-distance measurement wins
    boxes = [_cellx("h1", 0, 0, H=True, R=0, C=0),
             _cellx("h3", 0, 2, H=True, R=0, C=2),
             _cellx("a", 1, 0, R=1, C=0), _cellx("c", 1, 2, R=1, C=2),
             _cellx("d", 2, 0, R=2, C=0),
             _cellx("X", 2, 1, R=2, C=1, x=72 + 195),
             _cellx("g", 3, 0, R=3, C=0), _cellx("i", 3, 2, R=3, C=2)]
    out = construct_table(boxes, is_english=True)
    assert out == ["h1：a; h3：c", "h1：d; h3：X", "h1：g; h3：i"]


def test_singleton_column_flanked_by_text_stays():
    boxes = [_cellx("h1", 0, 0, H=True, R=0, C=0),
             _cellx("h3", 0, 2, H=True, R=0, C=2),
             _cellx("a", 1, 0, R=1, C=0), _cellx("X", 1, 1, R=1, C=1),
             _cellx("c", 1, 2, R=1, C=2),
             _cellx("d", 2, 0, R=2, C=0), _cellx("f", 2, 2, R=2, C=2),
             _cellx("g", 3, 0, R=3, C=0), _cellx("i", 3, 2, R=3, C=2)]
    out = construct_table(boxes, is_english=True)
    assert out == ["h1：a; X; h3：c", "h1：d; h3：f", "h1：g; h3：i"]


def test_singleton_row_flanked_by_text_stays():
    boxes = [_cellx(f"h{j}", 0, j, H=True, R=0, C=j) for j in range(4)]
    boxes += [_cellx(t, 1, j, R=1, C=j)
              for j, t in enumerate(["a", "b", "c", "d"])]
    boxes += [_cellx("solo", 2, 1, R=2, C=1)]
    boxes += [_cellx(t, 3, j, R=3, C=j)
              for j, t in enumerate(["e", "f", "g", "h"])]
    out = construct_table(boxes, is_english=True)
    assert out == ["h0：a; h1：b; h2：c; h3：d", "h1：solo",
                   "h0：e; h1：f; h2：g; h3：h"]


def test_singleton_row_relocates_down():
    boxes = [_cellx(f"h{j}", 0, j, H=True, R=0, C=j) for j in range(4)]
    boxes += [_cellx(t, 1, j, R=1, C=j)
              for j, t in enumerate(["a", "b", "c", "d"]) if j != 1]
    boxes += [_cellx("solo", 2, 1, R=2, C=1, y=100 + 2 * 20 + 12)]
    boxes += [_cellx(t, 3, j, R=3, C=j)
              for j, t in enumerate(["e", "f", "g", "h"]) if j != 1]
    out = construct_table(boxes, is_english=True)
    assert out == ["h0：a; h2：c; h3：d",
                   "h0：e; h1：solo; h2：g; h3：h"]


def test_singleton_row_extends_textless_up_target():
    boxes = [_cellx(f"h{j}", 0, j, H=True, R=0, C=j) for j in range(4)]
    boxes += [_cellx(t, 1, j, R=1, C=j)
              for j, t in enumerate(["a", "", "c", "d"])]
    boxes += [_cellx("solo", 2, 1, R=2, C=1)]
    out = construct_table(boxes, is_english=True)
    assert out == ["h0：a; h1：solo; h2：c; h3：d"]


def test_vertical_rowspan_renders_and_prunes_columns_left_of_hull():
    span = _cellx("span", 1, 1, R=1, C=1, SP=1,
                  H_left=72 + 100 - 5, H_right=72 + 100 + 65,
                  H_top=100 + 20 - 5, H_bott=100 + 2 * 20 + 14 + 5)
    boxes = [_cellx("h0", 0, 0, H=True, R=0, C=0),
             _cellx("h1", 0, 1, H=True, R=0, C=1),
             _cellx("v1", 1, 0, R=1, C=0), span,
             _cellx("v2", 2, 0, R=2, C=0)]
    html = construct_table(boxes, html=True)
    assert "<td  rowspan=2 >span</td>" in html
    assert "colspan" not in html
    assert html.count("<tr>") == 3


def test_html_empty_cells_and_repeated_header_collapse():
    boxes = [_cellx("h0", 0, 0, H=True, R=0, C=0),
             _cellx("x", 1, 0, R=1, C=0), _cellx("y", 1, 1, R=1, C=1),
             _cellx("z", 2, 1, R=2, C=1)]
    html = construct_table(boxes, html=True)
    assert "<th></th>" in html and "<td></td>" in html
    # an identical second header row collapses (the hdset text quirk)
    boxes2 = [_cellx("ha", 0, 0, H=True, R=0, C=0),
              _cellx("hb", 0, 1, H=True, R=0, C=1),
              _cellx("ha", 1, 0, H=True, R=1, C=0),
              _cellx("hb", 1, 1, H=True, R=1, C=1),
              _cellx("x", 2, 0, R=2, C=0), _cellx("y", 2, 1, R=2, C=1)]
    html2 = construct_table(boxes2, html=True)
    assert html2.count("ha") == 1


def test_desc_multi_header_concat_and_backfill():
    # second header row longer than the first appends " for <prev>"
    boxes = [_cellx("Sales", 0, 0, H=True, R=0, C=0),
             _cellx("Year", 0, 1, H=True, R=0, C=1),
             _cellx("NorthRegionTotal", 1, 0, H=True, R=1, C=0),
             _cellx("10", 2, 0, R=2, C=0),
             _cellx("2024", 2, 1, R=2, C=1),
             _cellx("20", 3, 0, R=3, C=0)]
    out = construct_table(boxes, is_english=True)
    assert out == ["NorthRegionTotal for Sales：10; Year：2024",
                   "NorthRegionTotal for Sales：20"]


def test_desc_header_edge_arms():
    # shorter second header prepends "<prev> for"; a fully empty header
    # row is deleted; textless value cells are skipped
    boxes = [_cellx("Top", 0, 0, H=True, R=0, C=0),
             _cellx("Up", 1, 0, H=True, R=1, C=0),
             _cellx("Right", 1, 1, H=True, R=1, C=1),
             _cellx("", 2, 0, H=True, R=2, C=0),
             _cellx("", 2, 1, H=True, R=2, C=1),
             _cellx("1", 3, 0, R=3, C=0), _cellx("", 3, 1, R=3, C=1)]
    out = construct_table(boxes, is_english=True)
    assert out == ["Top for Up：1"]
