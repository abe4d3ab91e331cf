"""cv2.fillPoly fixed-point rasterizer (extractlib.cvfill) — Bresenham
boundary walk, scanline span rule, the diamond closed form the
ocr_fill_scores oracle relies on, and the box_score_fast wiring."""

import numpy as np

from ragflow_spark.extractlib import dbpost as D
from ragflow_spark.extractlib.cvfill import (fill_poly, line_pixels)


def test_line_pixels_basic_shapes():
    assert line_pixels(0, 0, 4, 0) == [(0, 0), (1, 0), (2, 0), (3, 0),
                                       (4, 0)]
    assert line_pixels(2, 1, 2, 4) == [(2, 1), (2, 2), (2, 3), (2, 4)]
    # right-to-left input is swapped to run left to right
    assert line_pixels(4, 0, 0, 0)[0] == (0, 0)
    # exact diagonal
    assert line_pixels(0, 0, 3, 3) == [(0, 0), (1, 1), (2, 2), (3, 3)]
    assert line_pixels(0, 3, 3, 0) == [(0, 3), (1, 2), (2, 1), (3, 0)]
    # shallow 2:1 with the strict err<0 tie rule
    assert line_pixels(0, 0, 2, 1) == [(0, 0), (1, 0), (2, 1)]


def test_fill_poly_rect_is_inclusive():
    m = fill_poly((8, 10), [(2, 1), (7, 1), (7, 5), (2, 5)])
    exp = np.zeros((8, 10), np.uint8)
    exp[1:6, 2:8] = 1
    assert (m == exp).all()


def test_fill_poly_diamond_closed_form():
    """Unit-slope diamonds rasterize to exactly |dx|+|dy| <= r — the
    closed form the ocr_fill_scores oracle recomputes (edge slopes are
    exact +-1 in fixed point and the boundary diagonals coincide with
    the scanline span ends)."""
    for r in range(1, 7):
        for cx, cy in ((r + 1, r + 1), (r + 3, r + 2), (9, 8)):
            h, w = cy + r + 3, cx + r + 3
            m = fill_poly((h, w), [(cx, cy - r), (cx + r, cy),
                                   (cx, cy + r), (cx - r, cy)])
            ys, xs = np.mgrid[0:h, 0:w]
            exp = (np.abs(xs - cx) + np.abs(ys - cy) <= r) \
                .astype(np.uint8)
            assert (m == exp).all(), (r, cx, cy)
            assert m.sum() == 2 * r * r + 2 * r + 1


def test_fill_poly_triangle_and_degenerates():
    m = fill_poly((7, 9), [(1, 1), (7, 1), (4, 5)])
    # the horizontal base row is boundary-drawn in full
    assert (m[1, 1:8] == 1).all()
    assert m[5, 4] == 1                       # apex from the boundary
    assert m[0].sum() == 0 and m[6].sum() == 0
    # single point / segment: boundary only
    assert fill_poly((3, 3), [(1, 1), (1, 1), (1, 1)]).sum() == 1
    seg = fill_poly((3, 5), [(1, 1), (3, 1)])
    assert (seg[1, 1:4] == 1).all() and seg.sum() == 3


def test_fill_poly_bottom_row_is_boundary_only():
    """The scanline sweep drops an edge at its bottom vertex row; that
    row's pixels come from the Bresenham boundary — for a rect the two
    agree, visible on a triangle apex (single pixel, not a span)."""
    m = fill_poly((8, 9), [(1, 1), (7, 1), (4, 6)])
    assert m[6].sum() == 1 and m[6, 4] == 1


def test_box_score_fast_rotated_diamond():
    """The dyadic map keeps float32 sums exact, so the score equals
    the closed-form diamond sum / count."""
    w, h, cx, cy, r = 24, 20, 10, 9, 4
    xs = np.arange(w)[None, :]
    ys = np.arange(h)[:, None]
    pred = (((xs + 3 * ys) % 8) / 16.0).astype(np.float32)
    quad = np.array([[cx, cy - r], [cx + r, cy], [cx, cy + r],
                     [cx - r, cy]], dtype=np.float64)
    got = D.box_score_fast(pred, quad)
    sel = (np.abs(xs - cx) + np.abs(ys - cy)) <= r
    want = float(pred[sel].sum()) / int(sel.sum())
    assert abs(got - want) < 1e-7
    cnt = 2 * r * r + 2 * r + 1
    assert int(sel.sum()) == cnt


def test_ring_self_intersection_guard():
    # simple rings — convex AND concave — are not flagged (the
    # reference keeps a single-ring unclip result, concave included)
    assert not D._ring_self_intersects(
        np.array([[0, 0], [4, 0], [4, 3], [0, 3]]))
    crescent = np.array([[0, 0], [10, 0], [10, 8], [0, 8],
                         [0, 6], [7, 6], [7, 2], [0, 2]])
    assert not D._ring_self_intersects(crescent)
    # a bowtie properly crosses
    assert D._ring_self_intersects(np.array([[0, 0], [4, 3], [4, 0],
                                             [0, 3]]))
    # a pentagram turns the SAME way at every vertex (the case the
    # old convexity proxy missed) but self-intersects
    import math
    star = np.array([[round(50 + 40 * math.cos(math.radians(90 + i
                     * 144))), round(50 + 40 * math.sin(math.radians(
                         90 + i * 144)))] for i in range(5)])
    assert D._ring_self_intersects(star)


def test_fill_poly_negative_vertices_interior():
    """Edges whose top vertex lies above the image still activate in
    the scanline sweep (cv2 behavior): a diamond with its apex at
    y=-3 fills its in-image interior, not just boundary pixels —
    for a unit-slope diamond that interior is |dx|+|dy| <= r
    intersected with the image."""
    r, cx, cy = 6, 6, 3
    m = fill_poly((8, 12), [(cx, cy - r), (cx + r, cy),
                            (cx, cy + r), (cx - r, cy)])
    exp = np.zeros((8, 12), np.uint8)
    for y in range(8):
        for x in range(12):
            if abs(x - cx) + abs(y - cy) <= r:
                exp[y, x] = 1
    assert (m == exp).all()
    # fully-above polygon stays a no-op
    assert fill_poly((8, 12), [(2, -9), (6, -5), (2, -1)]).sum() == 0


def test_bowtie_fires_active_edge_exchange():
    # a self-intersecting quad makes the scanline's active edges cross
    # mid-sweep, firing the bubble re-sort exchange (drawing.cpp's
    # CollectPolyEdges consumers handle it; both lobes fill, the
    # crossing pinch stays hollow)
    import numpy as np

    from ragflow_spark.extractlib.cvfill import fill_poly

    m = fill_poly((12, 12), [(1, 1), (10, 10), (10, 1), (1, 10)])
    assert int(m.sum()) == 60
    # symmetric hourglass: mirror-symmetric in both axes of the box
    win = m[1:11, 1:11]
    assert (win == win[::-1, :]).all() and (win == win[:, ::-1]).all()
    assert win[4, 4] == 1 and win[0, 4] == 0
