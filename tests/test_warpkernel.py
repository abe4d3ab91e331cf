"""cv2.warpPerspective fixed-point kernel (extractlib.warpkernel) —
table construction invariants, coordinate quantization, the
saturation/correction quirks, homography closed form, and warp
behaviour on every quad regime the ocr_crops oracle covers."""

import numpy as np
import pytest

from ragflow_spark.extractlib import warpkernel as WK


# ---------------------------------------------------------------------------
# weight tables


def test_linear_tab_tiles_sum_to_scale():
    t = WK.fixed_tab_2d("linear")
    assert t.shape == (32, 32, 2, 2)
    assert (t.sum(axis=(2, 3)) == 32768).all()


def test_cubic_tab_tiles_sum_to_scale():
    t = WK.fixed_tab_2d("cubic")
    assert t.shape == (32, 32, 4, 4)
    assert (t.sum(axis=(2, 3)) == 32768).all()
    # shorts: the quantizer saturates at 32767
    assert t.max() == 32767 and t.min() > -32768


def test_zero_phase_saturation_quirk():
    """Phase (0,0) holds a unit weight: quantized to 32767 by short
    saturation, corrected with +1 on the first central-2x2 element —
    NOT a clean one-hot tile (imgwarp.cpp initInterTab2D)."""
    lin = WK.fixed_tab_2d("linear")[0, 0]
    assert lin.tolist() == [[32767, 0], [0, 1]]
    cub = WK.fixed_tab_2d("cubic")[0, 0]
    assert cub[1, 1] == 32767 and cub[2, 2] == 1
    assert cub.sum() == 32768


def test_cubic_weights_match_catmull_rom():
    # exact dyadic evaluation at phase 16 (x = 0.5): classic A=-0.75
    # coefficients (-0.09375, 0.59375, 0.59375, -0.09375)
    w = WK.interp_weights_1d("cubic", 16)
    assert w == [-0.09375, 0.59375, 0.59375, -0.09375]
    w8 = WK.interp_weights_1d("cubic", 8)
    assert w8 == [-0.10546875, 0.87890625, 0.26171875, -0.03515625]
    assert sum(w8) == 1.0                      # exact dyadics
    w0 = WK.interp_weights_1d("cubic", 0)
    assert w0 == [0.0, 1.0, 0.0, 0.0]


# ---------------------------------------------------------------------------
# homography closed form


def test_square_to_quad_maps_corners():
    pts = [(4, 4), (16, 4), (19, 14), (4, 12)]     # true perspective
    a, b, c, d, e, f, g, h = WK.square_to_quad(pts)
    for (u, v), (x, y) in zip([(0, 0), (1, 0), (1, 1), (0, 1)], pts):
        w = g * u + h * v + 1.0
        assert (a * u + b * v + c) / w == pytest.approx(x, abs=1e-9)
        assert (d * u + e * v + f) / w == pytest.approx(y, abs=1e-9)


def test_quad_to_rect_inverse_parallelogram_is_affine():
    pts = [(6, 5), (18, 7), (20, 19), (8, 17)]
    m = WK.quad_to_rect_inverse(pts, 12, 12)
    assert m[6] == 0.0 and m[7] == 0.0 and m[8] == 1.0


# ---------------------------------------------------------------------------
# warp


def _page(w=64, h=48):
    return ((np.arange(w)[None, :, None] + 17 * np.arange(3)) % 48
            + 0 * np.arange(h)[:, None, None]).astype(np.uint8)


def test_integer_translate_exact_both_methods():
    img = ((np.arange(40)[None, :, None] + 3 * np.arange(30)[:, None,
           None] + np.arange(3)) % 250).astype(np.uint8)
    pts = [(5, 3), (15, 3), (15, 9), (5, 9)]
    minv = WK.quad_to_rect_inverse(pts, 10, 6)
    for m in ("linear", "cubic"):
        out = WK.warp_perspective_u8(img, minv, 10, 6, m)
        assert (out == img[3:9, 5:15]).all(), m


def test_cubic_warp_tracks_float_homography():
    """On an x-ramp the fixed-point cubic warp stays within one level
    of the exact float interpolation for every quad regime."""
    img = (np.arange(64, dtype=np.uint8)[None, :]
           * np.ones((48, 1), dtype=np.uint8))
    quads = [[(0, 0), (8, 0), (8, 30), (0, 30)],        # corner rect
             [(6, 5), (18, 7), (20, 19), (8, 17)],      # parallelogram
             [(4, 4), (16, 4), (19, 14), (4, 12)]]      # perspective
    for pts in quads:
        a, b, c, d, e, f, g, h = WK.square_to_quad(pts)
        cw = int(max(np.hypot(pts[1][0] - pts[0][0],
                              pts[1][1] - pts[0][1]),
                     np.hypot(pts[2][0] - pts[3][0],
                              pts[2][1] - pts[3][1])))
        ch = int(max(np.hypot(pts[3][0] - pts[0][0],
                              pts[3][1] - pts[0][1]),
                     np.hypot(pts[2][0] - pts[1][0],
                              pts[2][1] - pts[1][1])))
        minv = WK.quad_to_rect_inverse(pts, cw, ch)
        out = WK.warp_perspective_u8(img, minv, cw, ch, "cubic")
        u = np.arange(cw)[None, :] / cw
        v = np.arange(ch)[:, None] / ch
        sx = (a * u + b * v + c) / (g * u + h * v + 1.0)
        err = np.abs(out.astype(float) - np.clip(sx, 0, 63))
        assert err.max() <= 1.0, pts


def test_border_replicate_clamps():
    """A quad at the page corner sends cubic taps to x=-1/y=-1; the
    replicate border clamps them, so the (0,0) output equals the
    corner pixel for an integer-phase warp."""
    img = ((np.arange(30)[None, :] + 7) % 200 * np.ones(
        (20, 1))).astype(np.uint8)
    pts = [(0, 0), (9, 0), (9, 6), (0, 6)]
    minv = WK.quad_to_rect_inverse(pts, 9, 6)
    out = WK.warp_perspective_u8(img, minv, 9, 6, "cubic")
    assert out[0, 0] == img[0, 0]
    assert (out == img[:6, :9]).all()


def test_warp_coords_fixed_phases():
    """A half-pixel-scale parallelogram produces non-zero phases; the
    fixed-point coordinate is cvRound(32 * exact source coord)."""
    pts = [(2, 2), (9, 2), (9, 8), (2, 8)]     # 7 wide -> cw 7: exact
    minv = WK.quad_to_rect_inverse(pts, 7, 6)
    sx, sy, ax, ay = WK.warp_coords_fixed(minv, 7, 6)
    assert (ax == 0).all() and (ay == 0).all()
    assert sx[0, 0] == 2 and sy[0, 0] == 2
    # now a 3->2 horizontal squeeze: src x = 2 + 1.5*dst
    pts2 = [(2, 2), (5, 2), (5, 8), (2, 8)]
    minv2 = WK.quad_to_rect_inverse(pts2, 2, 6)
    sx2, _, ax2, _ = WK.warp_coords_fixed(minv2, 2, 6)
    assert sx2[0, 1] == 3 and ax2[0, 1] == 16   # x=3.5 -> phase 16


def test_warp_requires_uint8():
    with pytest.raises(ValueError):
        WK.warp_perspective_u8(np.zeros((4, 4)), (1, 0, 0, 0, 1, 0,
                                                  0, 0, 1), 2, 2)


# ---------------------------------------------------------------------------
# cv's own matrix chain (LU solve + 3x3 cofactor invert) and its
# relation to the closed-form square-to-quad map


def test_lu_solve_exact_systems():
    """Partial-pivoting LU agrees with numpy's solver to float
    roundoff and solves a permuted identity exactly."""
    rng = np.random.RandomState(3)
    for _ in range(50):
        a = rng.uniform(-10, 10, (8, 8))
        b = rng.uniform(-10, 10, 8)
        x = WK.lu_solve(a, b)
        assert np.allclose(x, np.linalg.solve(a, b), rtol=1e-9)
    p = np.eye(5)[[3, 0, 4, 1, 2]]
    assert (WK.lu_solve(p, np.arange(5.0))
            == np.array([1.0, 3.0, 4.0, 0.0, 2.0])).all()
    assert WK.lu_solve(np.zeros((3, 3)), np.ones(3)) is None


def test_get_perspective_transform_maps_corners():
    """M maps each src corner onto its pts_std corner (the defining
    constraint of getPerspectiveTransform)."""
    pts = np.array([[10, 10], [110, 12], [112, 52], [8, 50]],
                   np.float32)
    std = np.array([[0, 0], [100, 0], [100, 40], [0, 40]], np.float64)
    m = WK.get_perspective_transform(pts, std)
    for p, q in zip(pts, std):
        v = m @ np.array([p[0], p[1], 1.0])
        assert np.allclose(v[:2] / v[2], q, atol=1e-9)
    inv = WK.invert3x3(m)
    assert np.allclose(m @ inv, np.eye(3), atol=1e-12)


def test_cv_chain_vs_closed_form_parity_rate():
    """The two algebraically-equal double chains (cv LU+invert vs
    Heckbert closed form) produce identical INTER_BITS fixed-point
    grids on >99% of det-style quads — but NOT on all of them, which
    is why warp_crop owns cv's exact op order."""
    rng = np.random.RandomState(7)
    total = flips = 0
    while total < 400:
        cx, cy = rng.uniform(20, 800, 2)
        w, h = rng.uniform(8, 300), rng.uniform(6, 80)
        ang = rng.uniform(-0.6, 0.6)
        ca, sa = np.cos(ang), np.sin(ang)
        base = np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                         [w / 2, h / 2], [-w / 2, h / 2]])
        rot = base @ np.array([[ca, sa], [-sa, ca]])
        pts = np.round(rot + [cx, cy]
                       + rng.uniform(-3, 3, (4, 2))).astype(np.float32)
        cw = int(max(np.linalg.norm(pts[0] - pts[1]),
                     np.linalg.norm(pts[2] - pts[3])))
        ch = int(max(np.linalg.norm(pts[0] - pts[3]),
                     np.linalg.norm(pts[1] - pts[2])))
        if cw < 2 or ch < 2:
            continue
        try:
            m2 = WK.quad_to_rect_inverse_cv(pts, cw, ch)
        except ValueError:              # degenerate after rounding
            continue
        total += 1
        m1 = WK.quad_to_rect_inverse(pts.astype(np.float64), cw, ch)
        g1 = WK.warp_coords_fixed(m1, cw, ch)
        g2 = WK.warp_coords_fixed(m2, cw, ch)
        if any((x != y).any() for x, y in zip(g1, g2)):
            flips += 1
    assert flips < total * 0.05         # near-total agreement...
    assert flips >= 1                   # ...but the ulp seam is real


def test_cv_chain_flipping_quad_pinned():
    """A concrete integer-corner quad where the last-ulp difference
    between the chains flips fixed-point coordinates — the quad found
    by the round-5 probe, pinned so the seam stays demonstrable."""
    pts = np.array([[672, 193], [705, 181], [705, 193], [680, 203]],
                   np.float32)
    cw, ch = 35, 12
    g1 = WK.warp_coords_fixed(
        WK.quad_to_rect_inverse(pts.astype(np.float64), cw, ch),
        cw, ch)
    g2 = WK.warp_coords_fixed(
        WK.quad_to_rect_inverse_cv(pts, cw, ch), cw, ch)
    ndiff = sum(int((x != y).sum()) for x, y in zip(g1, g2))
    assert ndiff > 0


def test_interp_weights_rejects_unknown_method():
    with pytest.raises(ValueError, match="bogus"):
        WK.interp_weights_1d("bogus", 3)


def test_perspective_degenerate_inputs_raise():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    with pytest.raises(ValueError, match="degenerate quad"):
        WK.get_perspective_transform(sq, np.zeros((4, 2)))
    with pytest.raises(ValueError, match="singular matrix"):
        WK.invert3x3(np.zeros((3, 3)))
