"""dbpost: the from-scratch DBPostProcess bitmap walk
(/root/reference/deepdoc/vision/postprocess.py:69-261) — border
following, min-area rect, fill scoring, Clipper round-join offset,
and both bitmap paths."""

import math

import numpy as np
import pytest

from ragflow_spark.extractlib import dbpost as D


def _rect_border(x0, y0, x1, y1):
    return {(x, y) for x in range(x0, x1 + 1)
            for y in range(y0, y1 + 1)
            if x in (x0, x1) or y in (y0, y1)}


@pytest.mark.parametrize("x0,y0,w,h", [(4, 5, 10, 7), (2, 2, 3, 3),
                                       (1, 1, 30, 4), (7, 3, 5, 20)])
def test_trace_borders_rect_pixel_set(x0, y0, w, h):
    bm = np.zeros((40, 50), np.uint8)
    bm[y0:y0 + h, x0:x0 + w] = 1
    borders = D.trace_borders(bm)
    assert len(borders) == 1
    assert {tuple(p) for p in borders[0]} == \
        _rect_border(x0, y0, x0 + w - 1, y0 + h - 1)


def test_trace_borders_hole_and_multi():
    bm = np.zeros((30, 30), np.uint8)
    bm[3:12, 3:15] = 1
    bm[6:9, 6:11] = 0          # a hole -> its own border
    bm[20:25, 5:9] = 1         # second component
    borders = D.trace_borders(bm)
    assert len(borders) == 3
    sets = [{tuple(p) for p in b} for b in borders]
    # the hole border consists of foreground pixels ringing the hole;
    # the 8-connected walk cuts the diagonal-only corners, exactly as
    # cv2's hole contours do
    hole_ring = {(x, y) for x in range(5, 12) for y in range(5, 10)
                 if x in (5, 11) or y in (5, 9)} \
        - {(5, 5), (5, 9), (11, 5), (11, 9)}
    assert any(s == hole_ring for s in sets)


def test_trace_borders_degenerate():
    bm = np.zeros((10, 12), np.uint8)
    bm[2, 2] = 1               # isolated pixel
    bm[5, 1:8] = 1             # 1px horizontal line
    bm[1:9, 10] = 1            # 1px vertical line
    sets = [{tuple(p) for p in b} for b in D.trace_borders(bm)]
    assert {(2, 2)} in sets
    assert {(x, 5) for x in range(1, 8)} in sets
    assert {(10, y) for y in range(1, 9)} in sets


def test_min_area_rect_axis_exact():
    pts = np.array(sorted(_rect_border(4, 5, 13, 11)))
    corners, (w, h) = D.min_area_rect(pts)
    assert sorted(map(tuple, corners.tolist())) == \
        [(4.0, 5.0), (4.0, 11.0), (13.0, 5.0), (13.0, 11.0)]
    assert sorted([w, h]) == [6.0, 9.0]


def test_min_area_rect_vs_angle_sweep():
    rng = np.random.RandomState(7)
    for _ in range(25):
        pts = rng.randint(0, 60, size=(rng.randint(4, 16), 2))
        _, (w, h) = D.min_area_rect(pts)
        best = min(
            (pts @ np.array([math.cos(a), math.sin(a)])).ptp()
            * (pts @ np.array([-math.sin(a), math.cos(a)])).ptp()
            for a in np.linspace(0, math.pi / 2, 10001))
        assert w * h <= best + 1e-6
        assert w * h >= best - max(1e-6, 0.002 * best)


def test_get_mini_boxes_corner_shuffle():
    box, sside = D.get_mini_boxes(
        np.array(sorted(_rect_border(4, 5, 13, 11))))
    assert box == [[4.0, 5.0], [13.0, 5.0], [13.0, 11.0], [4.0, 11.0]]
    assert sside == 6.0


def test_fill_poly_rect_inclusive_and_score_exact():
    from ragflow_spark.extractlib.cvfill import fill_poly
    mask = fill_poly((10, 14), np.array(
        [[2, 3], [9, 3], [9, 7], [2, 7]]))
    exp = np.zeros((10, 14), np.uint8)
    exp[3:8, 2:10] = 1
    assert (mask == exp).all()
    pred = np.zeros((20, 20), np.float32)
    pred[3:8, 2:10] = 77 / 128
    s = D.box_score_fast(pred, np.array([[2, 3], [9, 3], [9, 7],
                                         [2, 7]]))
    assert s == 77 / 128          # dyadic values sum exactly


def test_box_score_partial_coverage():
    # pred fills only part of the scored box: exact pixel ratio
    pred = np.zeros((20, 20), np.float32)
    pred[3:8, 2:6] = 0.5          # 5 rows x 4 cols inside an 8x5 box
    s = D.box_score_fast(pred, np.array([[2, 3], [9, 3], [9, 7],
                                         [2, 7]]))
    assert s == 0.5 * (5 * 4) / (5 * 8)


def test_clipper_round_half_away():
    assert D._clipper_round(3.5) == 4
    assert D._clipper_round(2.4) == 2
    assert D._clipper_round(-0.5) == -1
    assert D._clipper_round(-4.23) == -4
    assert D._clipper_round(-1.5) == -2


def test_unclip_rect_extremes():
    box = np.array([[4, 5], [13, 5], [13, 11], [4, 11]])
    area, length = D.poly_area_length(box)
    assert area == 54.0 and length == 30.0
    d = area * 1.5 / length
    out = D.unclip(box, 1.5)
    assert out[:, 0].min() == D._clipper_round(4 - d)
    assert out[:, 0].max() == D._clipper_round(13 + d)
    assert out[:, 1].min() == D._clipper_round(5 - d)
    assert out[:, 1].max() == D._clipper_round(11 + d)
    # every arc point stays within the offset disk of its corner
    for x, y in out:
        assert -0.71 <= min(abs(x - 4), abs(x - 13)) - d <= 0.71 or \
            4 - d <= x <= 13 + d


def test_unclip_orientation_insensitive():
    cw = np.array([[4, 5], [4, 11], [13, 11], [13, 5]])
    ccw = np.array([[4, 5], [13, 5], [13, 11], [4, 11]])
    a = {tuple(p) for p in D.unclip(cw, 1.5)}
    b = {tuple(p) for p in D.unclip(ccw, 1.5)}
    assert a == b


def test_offset_concave_keeps_pivot():
    L = np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]])
    out = D.offset_round(L, 2.0).tolist()
    assert [4, 4] in out          # the concave-vertex square fallback
    assert min(p[0] for p in out) == -2
    assert max(p[0] for p in out) == 12


def test_approx_poly_dp_rect_corners():
    bm = np.zeros((40, 40), np.uint8)
    bm[5:25, 8:30] = 1
    c = D.trace_borders(bm)[0]
    ap = D.approx_poly_dp(c, 0.002 * D.arc_length(c))
    assert sorted(map(tuple, ap.tolist())) == \
        [(8.0, 5.0), (8.0, 24.0), (29.0, 5.0), (29.0, 24.0)]


def test_boxes_from_bitmap_closed_form():
    pred = np.zeros((20, 30), np.float32)
    pred[5:12, 4:14] = 77 / 128
    boxes, scores = D.db_postprocess(pred, src_h=20, src_w=60)
    d = 54.0 * 1.5 / 30.0        # 2.7
    assert scores == [77 / 128]
    assert boxes[0].tolist() == [
        [2 * round(4 - d + 0.5 - 0.5), 2],   # Round(1.3)=1 -> 2
        [32, 2], [32, 14], [2, 14]]


def test_boxes_from_bitmap_gates():
    pred = np.zeros((30, 40), np.float32)
    pred[2:9, 2:5] = 0.9          # 3px wide: sside 2 < 3 -> dropped
    pred[12:19, 2:12] = 0.4       # score 0.4 < 0.5 -> dropped
    pred[22:28, 2:12] = 0.75      # kept
    boxes, scores = D.db_postprocess(pred, src_h=30, src_w=40)
    assert len(boxes) == 1 and scores == [0.75]
    # post-unclip short-side gate: tiny unclip keeps sside at 5 < 5+?
    b2, _ = D.boxes_from_bitmap(
        (pred > 0.3).astype(np.uint8) * 0
        + np.pad(np.ones((4, 4), np.uint8), ((2, 24), (2, 34))),
        np.pad(np.ones((4, 4), np.uint8), ((2, 24), (2, 34))),
        40, 30, unclip_ratio=0.1)
    assert b2 == []               # sside2 3 < min_size+2


def test_polygons_from_bitmap_rect():
    pred = np.zeros((40, 40), np.float32)
    pred[5:25, 8:30] = 100 / 128
    polys, scores = D.polygons_from_bitmap(
        pred, (pred > 0.3).astype(np.uint8), 40, 40)
    assert scores == [100 / 128]
    xs = [p[0] for p in polys[0]]
    ys = [p[1] for p in polys[0]]
    d = (21.0 * 19.0 * 1.5) / (2 * (21.0 + 19.0))
    assert min(xs) == max(0, D._clipper_round(8 - d))
    assert max(xs) == min(40, D._clipper_round(29 + d))
    assert min(ys) == max(0, D._clipper_round(5 - d))
    assert max(ys) == min(40, D._clipper_round(24 + d))


def _trace_borders_naive(bitmap):
    """The pre-optimization full raster scan (every pixel visited in
    Python) — the prefiltered production scan must be trace-identical
    to this on any bitmap."""
    h, w = bitmap.shape
    f = np.zeros((h + 2, w + 2), dtype=np.int32)
    f[1:-1, 1:-1] = (bitmap > 0).astype(np.int32)
    nbd = 1
    borders = []
    for i in range(1, h + 1):
        for j in range(1, w + 1):
            if f[i, j] == 0:
                continue
            if f[i, j] == 1 and f[i, j - 1] == 0:
                start_nbr = (i, j - 1)
            elif f[i, j] >= 1 and f[i, j + 1] == 0:
                start_nbr = (i, j + 1)
            else:
                continue
            nbd += 1
            pts = D._follow(f, (i, j), start_nbr, nbd)
            borders.append(np.array([(x - 1, y - 1) for y, x in pts],
                                    dtype=np.int64))
    return borders


def test_trace_borders_prefilter_equivalence_random():
    """Candidate prefiltering must reproduce the naive scan exactly —
    border count, order, and every pixel — on dense random bitmaps
    (checkerboards and speckle are the prefilter's worst case: nearly
    every nonzero pixel is a candidate)."""
    rng = np.random.RandomState(42)
    cases = [rng.randint(0, 2, (rng.randint(1, 24), rng.randint(1, 24)))
             for _ in range(40)]
    cases.append(np.indices((9, 9)).sum(axis=0) % 2)   # checkerboard
    cases.append(np.ones((7, 5), dtype=int))           # solid block
    cases.append(np.zeros((4, 6), dtype=int))          # empty
    for bm in cases:
        got = D.trace_borders(bm.astype(np.uint8))
        want = _trace_borders_naive(bm.astype(np.uint8))
        assert len(got) == len(want)
        for g, w_ in zip(got, want):
            assert np.array_equal(g, w_)


def test_min_area_rect_degenerate_hulls():
    # cv minAreaRect on 1 point: the point 4x, size (0, 0); on 2
    # points: [a, b, b, a] with size (|ab|, 0)
    import numpy as np

    from ragflow_spark.extractlib.dbpost import min_area_rect

    pts, size = min_area_rect(np.array([[3.0, 4.0]]))
    assert (pts == [[3, 4]] * 4).all() and size == (0.0, 0.0)
    pts, size = min_area_rect(np.array([[0.0, 0.0], [3.0, 4.0]]))
    assert (pts == [[0, 0], [3, 4], [3, 4], [0, 0]]).all()
    assert size == (5.0, 0.0)


def test_box_score_zero_on_empty_pred():
    import numpy as np

    from ragflow_spark.extractlib.dbpost import box_score_fast

    pred = np.zeros((10, 10), dtype=np.float32)
    box = np.array([[2, 2], [5, 2], [5, 5], [2, 5]], dtype=np.float64)
    assert box_score_fast(pred, box) == 0.0


def test_ring_self_intersection_detector():
    import numpy as np

    from ragflow_spark.extractlib.dbpost import _ring_self_intersects

    penta = np.array([[0, 0], [4, 4], [4, 0], [0, 4], [2, -2]],
                     dtype=np.int64)
    square = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.int64)
    assert _ring_self_intersects(penta)
    assert not _ring_self_intersects(square)


def test_mini_boxes_orientation_swaps():
    import ragflow_spark.extractlib.dbpost as D
    # rotated rects whose sorted corners exercise both index-swap arms
    D.get_mini_boxes(np.array([[0, 0], [10, 4], [8, 12], [-2, 8]],
                              float))
    D.get_mini_boxes(np.array([[0, 0], [4, -10], [12, -8], [8, 2]],
                              float))


def test_box_score_outside_window_is_zero():
    import ragflow_spark.extractlib.dbpost as D
    s = D.box_score_fast(np.zeros((5, 5), np.float32),
                         np.array([[10, 10], [12, 10], [12, 12],
                                   [10, 12]], float))
    assert s == 0.0


def test_offset_round_parameter_arms():
    import ragflow_spark.extractlib.dbpost as D
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    # closed-duplicate input ring; degenerate input; zero delta
    closed = np.vstack([sq, sq[:1]])
    assert len(D.offset_round(closed, 2.0)) >= 4
    assert D.offset_round(np.array([[0, 0], [5, 5]], float),
                          2.0).shape == (2, 2)
    assert np.array_equal(D.offset_round(sq[:3], 0.0),
                          sq[:3].astype(np.int64))
    # non-positive arc tolerance falls back to the Clipper default;
    # negative delta flips the join sweep
    D.offset_round(sq[:3], 2.0, arc_tolerance=0)
    D.offset_round(sq, -1.0)
    # a near-collinear corner emits a single join point
    D.offset_round(np.array([[0, 0], [10, 0.001], [20, 0], [10, 5]],
                            float), 1.0)


def test_dp_degenerate_inputs():
    import ragflow_spark.extractlib.dbpost as D
    assert D._dp_open([(0, 0), (1, 1)], 0.5) == [(0, 0), (1, 1)]
    # zero-length chord measures point distance to the anchor
    assert D._dp_open([(0, 0), (3, 1), (0, 0)], 0.5) == \
        [(0, 0), (3, 1), (0, 0)]
    assert D.approx_poly_dp(np.array([[0, 0], [5, 5]], float),
                            0.5).shape[0] == 2


def test_ring_collinear_overlap_detected():
    import ragflow_spark.extractlib.dbpost as D
    ring = np.array([[0, 0], [10, 0], [10, 5], [6, 0], [3, 0], [3, 5]],
                    np.int64)
    assert D._ring_self_intersects(ring)


def test_polygons_bitmap_guard_arms():
    import ragflow_spark.extractlib.dbpost as D
    pred = np.zeros((40, 40), np.float32)
    bmp = np.zeros((40, 40), np.uint8)
    bmp[5, 5] = 1                    # isolated pixel: < 4 approx points
    bmp[10:12, 10:12] = 1            # zero pred under it: score gate
    bmp[20:28, 5:35] = 1
    pred[20:28, 5:35] = 0.9
    boxes, scores = D.polygons_from_bitmap(pred, bmp, 40, 40)
    assert len(boxes) == 1 and scores[0] > 0.8


def test_polygons_bitmap_thin_blob_short_side_gate():
    import ragflow_spark.extractlib.dbpost as D
    pred = np.zeros((40, 40), np.float32)
    bmp = np.zeros((40, 40), np.uint8)
    bmp[20:22, 5:35] = 1
    pred[20:22, 5:35] = 0.9
    boxes, _ = D.polygons_from_bitmap(pred, bmp, 40, 40)
    assert boxes == []


def test_polygons_bitmap_concave_pinch_raises_loudly():
    # the stated seam: a deeply concave contour whose offset ring
    # self-intersects at a large unclip delta must raise, not emit a
    # ring the reference's pyclipper union would have repaired
    import ragflow_spark.extractlib.dbpost as D
    pred = np.zeros((60, 60), np.float32)
    bmp = np.zeros((60, 60), np.uint8)
    bmp[10:50, 10:16] = 1
    bmp[10:16, 10:50] = 1
    bmp[44:50, 10:50] = 1
    pred[bmp == 1] = 0.9
    with pytest.raises(NotImplementedError, match="self-intersects"):
        D.polygons_from_bitmap(pred, bmp, 60, 60, unclip_ratio=8.0)
