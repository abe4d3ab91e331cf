"""cv2.warpPerspective's fixed-point remap kernel for 8-bit images,
implemented from scratch against the public OpenCV sources
(imgproc/src/imgwarp.cpp: ``warpPerspective`` block loop,
``initInterTab2D``/``initInterTab1D``/``interpolateCubic``,
``remapBilinear``/``remapBicubic`` with ``FixedPtCast``).  This is the
resample behind the reference's text-line crops —
/root/reference/deepdoc/vision/ocr.py:561-594 ``get_rotate_crop_image``
calls ``cv2.warpPerspective(img, M, (w, h),
borderMode=cv2.BORDER_REPLICATE, flags=cv2.INTER_CUBIC)`` — and was the
largest remaining pixel seam after round 4's ``fixedpoint_resize_u8``.

The kernel, exactly as OpenCV executes it for 8U + BORDER_REPLICATE:

* per destination pixel, in double: ``W = m6*x + m7*y + m8``; ``W = 32/W``
  when non-zero else 0; ``fX = (m0*x + m1*y + m2) * W`` clamped to int32
  range and quantized with cvRound (round half to even) — INTER_BITS=5,
  so the integer part ``X >> 5`` picks the source tap and ``X & 31``
  indexes a 32x32 table of interpolation weights;
* the weight tables (``initInterTab2D``): 1-D weights at the 32 dyadic
  phases (bilinear ``[1-x, x]``; Catmull-Rom-style bicubic with A=-0.75,
  evaluated in float32 — exact here, every term is a small dyadic), outer
  products taken in float32, scaled by 2^15 and quantized with
  saturate_cast<short> (cvRound + clamp), then a correction pass forces
  each tile's sum to exactly 2^15 by adjusting the first running
  min/max element of the CENTRAL 2x2 (scan order (k,k),(k,k+1),(k+1,k),
  (k+1,k+1), strict comparisons — i.e. the first global minimizer /
  maximizer in scan order).  Quirk kept: phase (0,0) quantizes its unit
  weight to 32767 (short saturation), so the correction adds +1 to a
  central element — an exact integer hit does NOT reproduce the source
  pixel bit-for-bit in general (it does for 8-bit data, where the
  off-diagonal +1 cannot carry across the >>15).  For the bilinear
  table the central-2x2 scan reads past the 2x2 tile exactly like the
  C code does (into the next, still-zero tile); with strict
  comparisons those zero probes never move the indices, so the +1
  lands on the tile's own (1,1) slot;
* gather: bicubic taps span ``(sy-1..sy+2) x (sx-1..sx+2)`` (bilinear
  ``sy..sy+1 x sx..sx+1``), BORDER_REPLICATE clamps tap coordinates
  into the image;
* accumulate ``sum(tap * weight)`` in integers and cast with
  ``FixedPtCast``: ``(sum + 2^14) >> 15`` saturated to uint8.

Matrix chain (seam closed): OpenCV builds M with an 8x8 LU solve
(``getPerspectiveTransform`` -> hal LU with partial pivoting) and
inverts it with the 3x3 cofactor branch of ``cv::invert``; this module
transcribes that exact double chain (``lu_solve`` /
``get_perspective_transform`` / ``invert3x3`` /
``quad_to_rect_inverse_cv``) and ``warp_crop`` uses it.  The
closed-form square-to-quad mapping (Heckbert, "Fundamentals of Texture
Mapping and Image Warping", 1989 — public) is kept as
``quad_to_rect_inverse`` for the property-test cross-check: the two
algebraically-equal chains disagree by an ulp often enough that ~0.5%
of det-style quads flip a fixed-point phase on a half-subpixel
boundary, which is why the cv op order is the one owned.  The DuckDB
twins transcribe THIS module's expression tree (the LU relationally —
pivot CASE folds, per-step CTEs, ordered back-substitution), so the
oracle checks the owned computation end to end.
"""

from __future__ import annotations

import numpy as np

INTER_BITS = 5
INTER_TAB_SIZE = 1 << INTER_BITS            # 32
INTER_REMAP_COEF_BITS = 15
INTER_REMAP_COEF_SCALE = 1 << INTER_REMAP_COEF_BITS   # 32768

_KSIZE = {"linear": 2, "cubic": 4}
_TAB_CACHE: dict[str, np.ndarray] = {}


def interp_weights_1d(method: str, phase: int) -> list[float]:
    """initInterTab1D at one of the 32 dyadic phases.  Evaluated in
    double; every intermediate is a dyadic rational small enough to be
    exact in float32 as well, so this equals OpenCV's float chain
    bit-for-bit."""
    x = phase / float(INTER_TAB_SIZE)
    if method == "linear":
        return [1.0 - x, x]
    if method != "cubic":
        raise ValueError(method)
    a = -0.75                                # interpolateCubic's A
    c0 = ((a * (x + 1) - 5 * a) * (x + 1) + 8 * a) * (x + 1) - 4 * a
    c1 = ((a + 2) * x - (a + 3)) * x * x + 1
    c2 = ((a + 2) * (1 - x) - (a + 3)) * (1 - x) * (1 - x) + 1
    c3 = 1.0 - c0 - c1 - c2
    return [c0, c1, c2, c3]


def fixed_tab_2d(method: str) -> np.ndarray:
    """The quantized 2-D weight table (initInterTab2D, fixpt=true):
    int64 array of shape (32, 32, ksize, ksize) whose every tile sums
    to exactly 2^15 after the correction pass."""
    if method in _TAB_CACHE:
        return _TAB_CACHE[method]
    ksize = _KSIZE[method]
    tab1d = [interp_weights_1d(method, i) for i in range(INTER_TAB_SIZE)]
    # flat buffer in C memory order: the bilinear correction scan reads
    # past its own 2x2 tile exactly like the C code (next tile, zero)
    flat = np.zeros(INTER_TAB_SIZE * INTER_TAB_SIZE * ksize * ksize,
                    dtype=np.int64)
    for i in range(INTER_TAB_SIZE):          # y phase
        wy = tab1d[i]
        for j in range(INTER_TAB_SIZE):      # x phase
            wx = tab1d[j]
            base = (i * INTER_TAB_SIZE + j) * ksize * ksize
            isum = 0
            for k1 in range(ksize):
                for k2 in range(ksize):
                    # cv: float v = vy * vx; saturate_cast<short>(v*2^15)
                    v = float(np.float32(wy[k1] * wx[k2]))
                    q = int(np.rint(v * INTER_REMAP_COEF_SCALE))
                    q = max(-32768, min(32767, q))
                    flat[base + k1 * ksize + k2] = q
                    isum += q
            if isum != INTER_REMAP_COEF_SCALE:
                diff = isum - INTER_REMAP_COEF_SCALE
                ks2 = ksize // 2
                mk1 = mk2 = Mk1 = Mk2 = ks2
                for k1 in range(ks2, ks2 + 2):
                    for k2 in range(ks2, ks2 + 2):
                        q = flat[base + k1 * ksize + k2]
                        if q < flat[base + mk1 * ksize + mk2]:
                            mk1, mk2 = k1, k2
                        elif q > flat[base + Mk1 * ksize + Mk2]:
                            Mk1, Mk2 = k1, k2
                if diff < 0:
                    flat[base + Mk1 * ksize + Mk2] -= diff
                else:
                    flat[base + mk1 * ksize + mk2] -= diff
    tab = flat.reshape(INTER_TAB_SIZE, INTER_TAB_SIZE, ksize, ksize)
    _TAB_CACHE[method] = tab
    return tab


def square_to_quad(points) -> tuple[float, ...]:
    """The closed-form unit-square -> quad projective map (Heckbert
    1989): coefficients (a, b, c, d, e, f, g, h) with
    ``src_x = (a*u + b*v + c) / (g*u + h*v + 1)`` for (u, v) in the
    unit square mapping to quad corners (0,0)->p0, (1,0)->p1,
    (1,1)->p2, (0,1)->p3.  Plain scalar doubles in a pinned op order —
    the DuckDB twins transcribe this exact expression tree."""
    (x0, y0), (x1, y1), (x2, y2), (x3, y3) = \
        [(float(p[0]), float(p[1])) for p in points]
    dx1 = x1 - x2
    dx2 = x3 - x2
    dy1 = y1 - y2
    dy2 = y3 - y2
    sx = x0 - x1 + x2 - x3
    sy = y0 - y1 + y2 - y3
    den = dx1 * dy2 - dy1 * dx2
    g = (sx * dy2 - sy * dx2) / den
    h = (dx1 * sy - dy1 * sx) / den
    a = x1 - x0 + g * x1
    b = x3 - x0 + h * x3
    c = x0
    d = y1 - y0 + g * y1
    e = y3 - y0 + h * y3
    f = y0
    return a, b, c, d, e, f, g, h


def quad_to_rect_inverse(points, cw: int, ch: int) -> tuple[float, ...]:
    """The 9 entries of the INVERSE map (dst rect pixel -> src point)
    for get_rotate_crop_image's correspondence quad -> (cw, ch) rect:
    the square-to-quad map composed with x/cw, y/ch."""
    a, b, c, d, e, f, g, h = square_to_quad(points)
    return (a / cw, b / ch, c,
            d / cw, e / ch, f,
            g / cw, h / ch, 1.0)


# ---------------------------------------------------------------------------
# cv's own matrix chain: getPerspectiveTransform's 8x8 LU solve + the
# 3x3 cofactor invert inside warpPerspective, transcribed op for op.
# This IS the production chain (`warp_crop` uses
# ``quad_to_rect_inverse_cv``; the ocr_crops DuckDB twin transcribes
# the same LU — pivoting as sequential CASE folds, one CTE per
# elimination step, ordered back-substitution) — closing the former
# "last ulp" matrix seam: measured against the closed-form
# square-to-quad chain, ~0.5% of det-style quads flip at least one
# INTER_BITS fixed-point coordinate between the two double chains
# (tests/test_warpkernel.py pins both the agreement rate and a
# concrete flipping quad), so reference parity requires cv's exact
# op order, not just any algebraically-equal homography.


def lu_solve(a: np.ndarray, b: np.ndarray) -> np.ndarray | None:
    """hal LU64f (core/src/matrix_decomp.cpp ``LUImpl``): Gaussian
    elimination with partial pivoting by max |pivot|, the
    ``alpha = A[j][i] * (-1/A[i][i])`` update, and back substitution
    via ``s * (1/A[i][i])`` — reciprocal-multiply, NOT division, which
    is the ulp-relevant transcription detail.  Returns the solution or
    None when a pivot falls below eps (singular).  The eps multiplier
    is the one constant here not pinned against the C source (hal
    passes a small multiple of DBL_EPSILON); it only gates the
    singularity bail-out, so every non-degenerate quad solves
    identically under either choice."""
    a = np.array(a, dtype=np.float64)
    b = np.array(b, dtype=np.float64)
    m = a.shape[0]
    eps = np.finfo(np.float64).eps * 10.0
    for i in range(m):
        k = i + int(np.argmax(np.abs(a[i:, i])))
        if abs(a[k, i]) < eps:
            return None
        if k != i:
            a[[i, k], i:] = a[[k, i], i:]
            b[[i, k]] = b[[k, i]]
        d = -1.0 / a[i, i]
        for j in range(i + 1, m):
            alpha = a[j, i] * d
            a[j, i + 1:] += alpha * a[i, i + 1:]
            b[j] += alpha * b[i]
    for i in range(m - 1, -1, -1):
        s = b[i]
        for k in range(i + 1, m):
            s -= a[i, k] * b[k]
        b[i] = s * (1.0 / a[i, i])
    return b


def get_perspective_transform(src, dst) -> np.ndarray:
    """cv2.getPerspectiveTransform (imgproc/src/imgwarp.cpp): both
    point sets pass through Point2f (float32) exactly as the
    reference's float32 ``points`` / ``pts_std`` arrays do, the 8x8
    double system is assembled in cv's element order, and solved with
    hal LU.  Returns the 3x3 forward map M (M[2][2] = 1).

    Divergence on DEGENERATE quads only (unreachable from the det
    quad path, whose min-size gate guarantees positive area): cv
    ignores solve()'s failure flag and returns whatever partial
    elimination left in M; this raises instead — loud beats
    emulating garbage."""
    src = np.asarray(src, dtype=np.float32).astype(np.float64)
    dst = np.asarray(dst, dtype=np.float32).astype(np.float64)
    a = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros(8, dtype=np.float64)
    for i in range(4):
        a[i, 0] = a[i + 4, 3] = src[i, 0]
        a[i, 1] = a[i + 4, 4] = src[i, 1]
        a[i, 2] = a[i + 4, 5] = 1.0
        a[i, 6] = -src[i, 0] * dst[i, 0]
        a[i, 7] = -src[i, 1] * dst[i, 0]
        a[i + 4, 6] = -src[i, 0] * dst[i, 1]
        a[i + 4, 7] = -src[i, 1] * dst[i, 1]
        b[i] = dst[i, 0]
        b[i + 4] = dst[i, 1]
    x = lu_solve(a, b)
    if x is None:
        raise ValueError("degenerate quad")
    return np.append(x, 1.0).reshape(3, 3)


def invert3x3(m: np.ndarray) -> np.ndarray:
    """cv::invert's DECOMP_LU n==3 branch (core/src/lapack.cpp): the
    explicit cofactor formulas with ``d = 1/det`` computed once and
    each adjugate entry multiplied by it — nine independent
    ``(ab - cd) * d`` products in double."""
    m = np.asarray(m, dtype=np.float64)
    det = (m[0, 0] * (m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1])
           - m[0, 1] * (m[1, 0] * m[2, 2] - m[1, 2] * m[2, 0])
           + m[0, 2] * (m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0]))
    if det == 0.0:
        raise ValueError("singular matrix")
    d = 1.0 / det
    t = np.empty((3, 3), dtype=np.float64)
    t[0, 0] = (m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1]) * d
    t[0, 1] = (m[0, 2] * m[2, 1] - m[0, 1] * m[2, 2]) * d
    t[0, 2] = (m[0, 1] * m[1, 2] - m[0, 2] * m[1, 1]) * d
    t[1, 0] = (m[1, 2] * m[2, 0] - m[1, 0] * m[2, 2]) * d
    t[1, 1] = (m[0, 0] * m[2, 2] - m[0, 2] * m[2, 0]) * d
    t[1, 2] = (m[0, 2] * m[1, 0] - m[0, 0] * m[1, 2]) * d
    t[2, 0] = (m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0]) * d
    t[2, 1] = (m[0, 1] * m[2, 0] - m[0, 0] * m[2, 1]) * d
    t[2, 2] = (m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]) * d
    return t


def quad_to_rect_inverse_cv(points, cw: int, ch: int) -> tuple[float, ...]:
    """The inverse map exactly as the reference's call chain builds
    it: ``M = cv2.getPerspectiveTransform(points, pts_std)`` with
    ``pts_std = [[0,0],[cw,0],[cw,ch],[0,ch]]`` (ocr.py
    get_rotate_crop_image), then warpPerspective's ``invert(matM)``.
    The production chain of ``warp_crop`` and the ocr_crops twin;
    ``quad_to_rect_inverse`` (closed form) remains as the
    property-test cross-check."""
    pts_std = np.array([[0.0, 0.0], [cw, 0.0], [cw, ch], [0.0, ch]],
                       dtype=np.float32)
    m = get_perspective_transform(points, pts_std)
    return tuple(invert3x3(m).ravel())


def warp_coords_fixed(minv, cw: int, ch: int):
    """The warpPerspective block-loop coordinate math, vectorized: for
    every dst pixel the int32 fixed-point source coordinate pair
    (X, Y) at INTER_BITS precision.  Returns (sx, sy, ax, ay) int64
    arrays of shape (ch, cw): tap base (saturate_cast<short>(X >> 5))
    and phase (X & 31)."""
    m0, m1, m2, m3, m4, m5, m6, m7, m8 = [float(v) for v in minv]
    x = np.arange(cw, dtype=np.float64)[None, :]
    y = np.arange(ch, dtype=np.float64)[:, None]
    w = m6 * x + m7 * y + m8
    w = np.where(w != 0.0, float(INTER_TAB_SIZE) / w, 0.0)
    fx = np.minimum(np.maximum((m0 * x + m1 * y + m2) * w,
                               -2147483648.0), 2147483647.0)
    fy = np.minimum(np.maximum((m3 * x + m4 * y + m5) * w,
                               -2147483648.0), 2147483647.0)
    bx = np.rint(fx).astype(np.int64)        # saturate_cast<int>: cvRound
    by = np.rint(fy).astype(np.int64)
    sx = np.clip(bx >> INTER_BITS, -32768, 32767)
    sy = np.clip(by >> INTER_BITS, -32768, 32767)
    ax = bx & (INTER_TAB_SIZE - 1)
    ay = by & (INTER_TAB_SIZE - 1)
    return sx, sy, ax, ay


def warp_perspective_u8(img: np.ndarray, minv, cw: int, ch: int,
                        method: str = "cubic") -> np.ndarray:
    """cv2.warpPerspective for a uint8 image with BORDER_REPLICATE and
    the given inverse map — remapBilinear / remapBicubic over the
    fixed-point tables, FixedPtCast output."""
    if img.dtype != np.uint8:
        raise ValueError("fixed-point warp is the 8U kernel")
    ksize = _KSIZE[method]
    off = ksize // 2 - 1                     # 0 linear, 1 cubic
    h, w = img.shape[:2]
    squeeze = img.ndim == 2
    im = img.astype(np.int64)
    if squeeze:
        im = im[..., None]
    sx, sy, ax, ay = warp_coords_fixed(minv, cw, ch)
    wt = fixed_tab_2d(method)[ay, ax]        # (ch, cw, ksize, ksize)
    acc = np.zeros((ch, cw, im.shape[2]), dtype=np.int64)
    for k1 in range(ksize):
        ry = np.clip(sy - off + k1, 0, h - 1)
        for k2 in range(ksize):
            rx = np.clip(sx - off + k2, 0, w - 1)
            acc += im[ry, rx] * wt[:, :, k1, k2][..., None]
    out = (acc + (1 << (INTER_REMAP_COEF_BITS - 1))) \
        >> INTER_REMAP_COEF_BITS
    out = np.clip(out, 0, 255).astype(np.uint8)
    return out[..., 0] if squeeze else out
