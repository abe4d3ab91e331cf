"""Recognizer geometry primitives + column-aware page sort (§2.5)."""

from ragflow_spark.extractlib.pdfrules import (find_horizontally_tightest_fit,
                                               find_overlapped,
                                               find_overlapped_with_threshold,
                                               layouts_cleanup,
                                               overlapped_area, sort_x_by_page)


def _b(x0, x1, top, bottom, **kw):
    return {"x0": x0, "x1": x1, "top": top, "bottom": bottom, **kw}


def test_overlapped_area_ratio_and_raw():
    a = _b(0, 10, 0, 10)
    b = _b(5, 15, 5, 15)
    assert overlapped_area(a, b) == 0.25            # 25 / 100
    assert overlapped_area(a, b, ratio=False) == 25
    assert overlapped_area(a, _b(20, 30, 0, 10)) == 0
    assert overlapped_area(a, _b(0, 10, 20, 30)) == 0


def test_layouts_cleanup_prefers_score():
    boxes = []
    l1 = _b(0, 10, 0, 10, type="text", score=0.9)
    l2 = _b(0, 10, 0, 10, type="text", score=0.5)
    out = layouts_cleanup(boxes, [l1, l2])
    assert out == [l1]


def test_layouts_cleanup_keeps_disjoint():
    l1 = _b(0, 10, 0, 10, type="text", score=0.9)
    l2 = _b(100, 110, 0, 10, type="text", score=0.5)
    assert layouts_cleanup([], [l1, l2]) == [l1, l2]


def test_layouts_cleanup_falls_back_to_covered_text():
    l1 = _b(0, 10, 0, 10, type="text")
    l2 = _b(0, 10, 0, 10, type="text")
    boxes = [_b(0, 5, 0, 5)]
    out = layouts_cleanup(boxes, [l1, l2])
    assert len(out) == 1


def test_find_overlapped_binary_search():
    rows = [_b(0, 100, i * 20, i * 20 + 15) for i in range(50)]
    probe = _b(10, 50, 205, 212)  # overlaps row 10 (top 200..215)
    assert find_overlapped(probe, rows) == 10
    assert find_overlapped(probe, rows, naive=True) == 10
    assert find_overlapped(probe, []) is None


def test_find_overlapped_with_threshold():
    boxes = [_b(0, 10, 0, 10), _b(0, 100, 0, 100)]
    probe = _b(0, 10, 0, 10)
    # full overlap with box 0; threshold met
    assert find_overlapped_with_threshold(probe, boxes) == 0
    assert find_overlapped_with_threshold(probe, []) is None


def test_find_horizontally_tightest_fit_layout_gate():
    probe = _b(10, 20, 0, 5, layoutno="a")
    boxes = [_b(11, 21, 50, 55, layoutno="a"),
             _b(10, 20, 50, 55, layoutno="b")]
    assert find_horizontally_tightest_fit(probe, boxes) == 0  # same layout
    assert find_horizontally_tightest_fit(probe, []) is None


def test_sort_x_by_page_two_columns():
    # 2-column page: left col x0=72, right col x0=320; reading order must
    # be full left column then right column, top-down within each
    left = [_b(72, 200, t, t + 10, page_number=1, text=f"L{t}")
            for t in (0, 20, 40)]
    right = [_b(320, 450, t, t + 10, page_number=1, text=f"R{t}")
             for t in (0, 20, 40)]
    shuffled = [right[1], left[2], right[0], left[0], right[2], left[1]]
    out = sort_x_by_page(shuffled, threshold=10)
    assert [b["text"] for b in out] == ["L0", "L20", "L40",
                                       "R0", "R20", "R40"]
