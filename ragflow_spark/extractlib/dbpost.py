"""DB (Differentiable Binarization) detection post-processing, from
scratch.

The reference's DBPostProcess
(/root/reference/deepdoc/vision/postprocess.py:41-261) turns the det
model's probability map into text quads through four library calls this
module re-implements from their published algorithms:

  * ``cv2.findContours(RETR_LIST, CHAIN_APPROX_SIMPLE)`` — Suzuki-Abe
    border following (Suzuki & Abe 1985, the algorithm OpenCV cites);
    ``trace_borders`` yields every outer AND hole border's pixel set.
    We do not replicate OpenCV's contour *ordering* or the SIMPLE
    vertex compression: every downstream consumer of the quad path
    (min-area rect, perimeter, fill) is invariant to both, and the
    only order-sensitive behavior in the reference is the
    ``max_candidates`` cut at 1000 contours, far above any real page.
  * ``cv2.minAreaRect`` + ``cv2.boxPoints`` — convex hull (Andrew
    monotone chain) + rotating calipers; exact for the axis-aligned
    boxes the synthetic pipeline emits, standard float geometry
    otherwise.  The reference's corner shuffle (postprocess.py:170-191)
    is insensitive to the raw corner order: it sorts by x and resolves
    each x-pair by y, so ties reproduce regardless of starting corner.
  * ``cv2.fillPoly`` + ``cv2.mean`` — the exact fixed-point
    rasterizer (``extractlib.cvfill``, transcribed from drawing.cpp's
    CollectPolyEdges / FillEdgeCollection / LINE_8 Bresenham): the
    boundary pixels ARE drawn, interiors fill ``[ceil(xl), floor(xr)]``
    per scanline, the bottom vertex row comes only from the boundary
    walk — rotated-quad corner rules included (round 4's scanline
    approximation seam, now owned).
  * ``pyclipper.PyclipperOffset(JT_ROUND, ET_CLOSEDPOLYGON)`` — a
    transcription of Clipper 6.4.2's round-join polygon offset
    (Johnson's published ClipperOffset::DoOffset / OffsetPoint /
    DoRound): the arc-tolerance step formula, the per-vertex arc
    sweep, and the half-away-from-zero coordinate rounding.  The
    final union pass Clipper runs over its own output is a no-op for
    the single convex ring the quad path feeds it and is skipped.
    Poly-mode inputs whose offset ring self-intersects (deeply
    concave pockets pinching at the delta) would need that union —
    ``polygons_from_bitmap`` detects the case exactly (integer
    segment-intersection test) and raises, a stated loud seam;
    simple concave rings are kept like the reference keeps its
    single-ring results.  Reachability: the deployed deepdoc OCR
    pipeline hard-pins ``box_type: "quad"``
    (deepdoc/vision/ocr.py:420-421), so the poly path — and with it
    the union seam — is dead code in the reference's own pipeline;
    it exists here only for ``DBPostProcess`` API parity.

Scores stay bit-exact when the probability map holds dyadic values
(the synthetic maps use k/128), because every partial sum is then a
small integer multiple of 1/128 — exactly representable — so the mask
mean reproduces across engines with no rounding pin.
"""

from __future__ import annotations

import math

import numpy as np

# reference det config (deepdoc/vision/ocr.py:420-421)
DET_THRESH = 0.3
DET_BOX_THRESH = 0.5
DET_UNCLIP_RATIO = 1.5
MAX_CANDIDATES = 1000
MIN_SIZE = 3

# Clipper 6.4.2 defaults (pyclipper.PyclipperOffset())
_DEF_ARC_TOLERANCE = 0.25


# ---------------------------------------------------------------------------
# border following (cv2.findContours RETR_LIST twin)

# Moore neighborhood, clockwise starting east, in (dy, dx)
_NBRS = ((0, 1), (1, 1), (1, 0), (1, -1),
         (0, -1), (-1, -1), (-1, 0), (-1, 1))
_NBR_IDX = {d: k for k, d in enumerate(_NBRS)}


def trace_borders(bitmap: np.ndarray) -> list[np.ndarray]:
    """All outer and hole borders of a {0,1} map, one (N, 2) int array
    of (x, y) pixel coordinates per border — the RETR_LIST contour
    sets of Suzuki-Abe border following.

    The marking scheme is the published one: a raster scan finds an
    outer-border start at a 1-pixel whose west neighbor is 0 and a
    hole-border start at a >=1-pixel whose east neighbor is 0; each
    border is walked once through the 8-neighborhood and pixels are
    marked with the border id (negated when the east neighbor is
    background) so later scan rows skip already-traced borders.
    """
    h, w = bitmap.shape
    # pad so border pixels have a full neighborhood; f carries marks
    f = np.zeros((h + 2, w + 2), dtype=np.int32)
    f[1:-1, 1:-1] = (bitmap > 0).astype(np.int32)
    nbd = 1
    borders: list[np.ndarray] = []
    # Marks replace 1 with ±nbd but never touch 0, so zero-ness is a
    # scan invariant: a pixel can fire a start condition only if it is
    # nonzero AND its west or east neighbor is zero.  Precomputing
    # that candidate set (np.nonzero is row-major = raster order)
    # replaces the full h*w Python scan with a walk over boundary
    # pixels only — identical trace order and marks by construction.
    inner = f[1:-1, 1:-1] != 0
    edge = (f[1:-1, :-2] == 0) | (f[1:-1, 2:] == 0)
    cis, cjs = np.nonzero(inner & edge)
    for i, j in zip((cis + 1).tolist(), (cjs + 1).tolist()):
        v = f[i, j]
        if v == 1 and f[i, j - 1] == 0:
            start_nbr = (i, j - 1)              # outer border
        elif v >= 1 and f[i, j + 1] == 0:
            start_nbr = (i, j + 1)              # hole border
        else:
            continue
        nbd += 1
        pts = _follow(f, (i, j), start_nbr, nbd)
        borders.append(
            np.array([(x - 1, y - 1) for y, x in pts],
                     dtype=np.int64))
    return borders


def _follow(f: np.ndarray, p0: tuple[int, int],
            n0: tuple[int, int], nbd: int) -> list[tuple[int, int]]:
    """Walk one border from ``p0`` whose examination started at
    neighbor ``n0``; returns the border pixels in trace order."""
    # step 3.1: clockwise from n0, find the first nonzero neighbor
    base = _NBR_IDX[(n0[0] - p0[0], n0[1] - p0[1])]
    first = None
    for k in range(1, 9):
        d = _NBRS[(base + k) % 8]
        if f[p0[0] + d[0], p0[1] + d[1]] != 0:
            first = (p0[0] + d[0], p0[1] + d[1])
            break
    if first is None:                           # isolated pixel
        f[p0] = -nbd
        return [p0]
    pts = [p0]
    p2, p3 = first, p0                          # (prev, current)
    while True:
        # step 3.3: counterclockwise from the element after p2
        base = _NBR_IDX[(p2[0] - p3[0], p2[1] - p3[1])]
        p4 = None
        east_bg = False
        for k in range(1, 9):
            d = _NBRS[(base - k) % 8]
            ny, nx = p3[0] + d[0], p3[1] + d[1]
            if d == (0, 1) and f[ny, nx] == 0:
                east_bg = True                  # examined a 0 east
            if f[ny, nx] != 0:
                p4 = (ny, nx)
                break
        # step 3.4: mark
        if east_bg:
            f[p3] = -nbd
        elif f[p3] == 1:
            f[p3] = nbd
        # step 3.5: closure — back at the start in the start direction
        if p4 == p0 and p3 == first:
            break
        pts.append(p4)
        p2, p3 = p3, p4
        if len(pts) > f.size:                   # safety, unreachable
            break
    # the loop appends p0 again as it closes; drop the duplicate
    if len(pts) > 1 and pts[-1] == p0:
        pts.pop()
    return pts


# ---------------------------------------------------------------------------
# min-area rectangle (cv2.minAreaRect + boxPoints twin)

def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns hull vertices counterclockwise
    (math orientation) with collinear points dropped."""
    pts = sorted({(float(x), float(y)) for x, y in points})
    if len(pts) <= 2:
        return np.array(pts, dtype=np.float64)

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                if (ax - ox) * (p[1] - oy) - (ay - oy) * (p[0] - ox) \
                        <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(reversed(pts))
    return np.array(lower[:-1] + upper[:-1], dtype=np.float64)


def min_area_rect(points: np.ndarray) \
        -> tuple[np.ndarray, tuple[float, float]]:
    """Rotating calipers over the hull; returns (4 corner points
    float64, (w, h)).  Corner order is unspecified (the reference's
    ``get_mini_boxes`` shuffle is order-insensitive, see module doc).
    """
    hull = convex_hull(points)
    n = len(hull)
    if n == 1:
        p = hull[0]
        return np.array([p, p, p, p]), (0.0, 0.0)
    if n == 2:
        a, b = hull
        return np.array([a, b, b, a]), \
            (float(np.hypot(*(b - a))), 0.0)
    best = None
    for i in range(n):
        ex, ey = hull[(i + 1) % n] - hull[i]
        ln = math.hypot(ex, ey)
        ux, uy = ex / ln, ey / ln               # edge direction
        vx, vy = -uy, ux                        # normal
        pu = hull @ np.array([ux, uy])
        pv = hull @ np.array([vx, vy])
        w = pu.max() - pu.min()
        h = pv.max() - pv.min()
        if best is None or w * h < best[0]:
            best = (w * h, pu.min(), pu.max(), pv.min(), pv.max(),
                    ux, uy, vx, vy)
    _, u0, u1, v0, v1, ux, uy, vx, vy = best
    corners = np.array([
        [u0 * ux + v0 * vx, u0 * uy + v0 * vy],
        [u1 * ux + v0 * vx, u1 * uy + v0 * vy],
        [u1 * ux + v1 * vx, u1 * uy + v1 * vy],
        [u0 * ux + v1 * vx, u0 * uy + v1 * vy]], dtype=np.float64)
    return corners, (float(u1 - u0), float(v1 - v0))


def get_mini_boxes(points: np.ndarray) \
        -> tuple[list[list[float]], float]:
    """The reference's corner shuffle (postprocess.py:170-191): sort
    the min-area-rect corners by x, pick top/bottom within each x
    pair, return [tl, tr, br, bl] and the short side."""
    corners, (w, h) = min_area_rect(points)
    pts = sorted(corners.tolist(), key=lambda p: p[0])
    if pts[1][1] > pts[0][1]:
        i1, i4 = 0, 1
    else:
        i1, i4 = 1, 0
    if pts[3][1] > pts[2][1]:
        i2, i3 = 2, 3
    else:
        i2, i3 = 3, 2
    box = [pts[i1], pts[i2], pts[i3], pts[i4]]
    return box, min(w, h)


# ---------------------------------------------------------------------------
# polygon fill + score (cv2.fillPoly / cv2.mean twin)

def box_mask_window(pred: np.ndarray, box: np.ndarray) \
        -> tuple[np.ndarray, np.ndarray]:
    """box_score_fast's bbox-normalized fill (postprocess.py:194-208):
    clip-floored/ceiled bounding window plus cv2.fillPoly's exact
    fixed-point rasterization (extractlib.cvfill — Bresenham boundary
    + scanline interior) of the corners after the reference's
    ``astype("int32")`` truncation.  Returns (mask, pred window)."""
    from ragflow_spark.extractlib.cvfill import fill_poly

    h, w = pred.shape[:2]
    box = np.asarray(box, dtype=np.float64).copy()
    xmin = int(np.clip(math.floor(box[:, 0].min()), 0, w - 1))
    xmax = int(np.clip(math.ceil(box[:, 0].max()), 0, w - 1))
    ymin = int(np.clip(math.floor(box[:, 1].min()), 0, h - 1))
    ymax = int(np.clip(math.ceil(box[:, 1].max()), 0, h - 1))
    box[:, 0] -= xmin
    box[:, 1] -= ymin
    mask = fill_poly((ymax - ymin + 1, xmax - xmin + 1),
                     np.trunc(box).astype(np.int64))
    return mask, pred[ymin:ymax + 1, xmin:xmax + 1]


def box_score_fast(pred: np.ndarray, box: np.ndarray) -> float:
    """Mean probability inside the filled box over its bounding
    window (postprocess.py:194-210) — cv2.mean(window, mask)[0]."""
    mask, window = box_mask_window(pred, box)
    sel = mask > 0
    if not sel.any():
        return 0.0
    return float(window[sel].mean())


# ---------------------------------------------------------------------------
# Clipper round-join offset (pyclipper JT_ROUND / ET_CLOSEDPOLYGON twin)

def _clipper_round(v: float) -> int:
    """Clipper's Round: half away from zero via C truncation."""
    return int(v - 0.5) if v < 0 else int(v + 0.5)


def offset_round(path: np.ndarray, delta: float,
                 arc_tolerance: float = _DEF_ARC_TOLERANCE) \
        -> np.ndarray:
    """Closed-polygon offset with round joins — ClipperOffset 6.4.2's
    DoOffset/OffsetPoint/DoRound for one ring: arc step count
    pi/acos(1 - tol/|delta|) capped at |delta|*pi, per-vertex arc
    sweep by repeated rotation, coordinates rounded half away from
    zero.  The input ring is normalized to positive (counterclockwise
    math) orientation first, as FixOrientations does, so positive
    delta expands."""
    pts = [(float(x), float(y)) for x, y in np.asarray(path)]
    # drop consecutive duplicates (Clipper's AddPath does)
    ring: list[tuple[float, float]] = []
    for p in pts:
        if not ring or p != ring[-1]:
            ring.append(p)
    if len(ring) > 1 and ring[0] == ring[-1]:
        ring.pop()
    n = len(ring)
    if n < 3:
        return np.asarray(ring, dtype=np.int64).reshape(-1, 2)
    area2 = sum(ring[i][0] * ring[(i + 1) % n][1]
                - ring[(i + 1) % n][0] * ring[i][1] for i in range(n))
    if area2 < 0:
        ring.reverse()
    if delta == 0:
        return np.array([[_clipper_round(x), _clipper_round(y)]
                         for x, y in ring], dtype=np.int64)

    ad = abs(delta)
    if arc_tolerance <= 0:
        tol = _DEF_ARC_TOLERANCE
    elif arc_tolerance > ad * 0.25:
        tol = ad * 0.25
    else:
        tol = arc_tolerance
    steps = math.pi / math.acos(1 - tol / ad)
    steps = min(steps, ad * math.pi)
    m_sin = math.sin(2 * math.pi / steps)
    m_cos = math.cos(2 * math.pi / steps)
    steps_per_rad = steps / (2 * math.pi)
    if delta < 0:
        m_sin = -m_sin

    normals = []
    for j in range(n):
        dx = ring[(j + 1) % n][0] - ring[j][0]
        dy = ring[(j + 1) % n][1] - ring[j][1]
        ln = math.hypot(dx, dy)
        normals.append((dy / ln, -dx / ln))

    out: list[tuple[int, int]] = []

    def emit(px: float, py: float, nx: float, ny: float) -> None:
        out.append((_clipper_round(px + nx * delta),
                    _clipper_round(py + ny * delta)))

    k = n - 1
    for j in range(n):
        px, py = ring[j]
        nk, nj = normals[k], normals[j]
        sin_a = nk[0] * nj[1] - nj[0] * nk[1]
        cos_a = nk[0] * nj[0] + nk[1] * nj[1]
        if abs(sin_a * delta) < 1.0:
            if cos_a > 0:                       # near-collinear: one pt
                emit(px, py, nk[0], nk[1])
                k = j
                continue
        else:
            sin_a = max(-1.0, min(1.0, sin_a))
        if sin_a * delta < 0:                   # concave vertex
            emit(px, py, nk[0], nk[1])
            out.append((_clipper_round(px), _clipper_round(py)))
            emit(px, py, nj[0], nj[1])
        else:                                   # DoRound
            a = math.atan2(sin_a, cos_a)
            st = max(int(_clipper_round(steps_per_rad * abs(a))), 1)
            x, y = nk
            for _ in range(st):
                emit(px, py, x, y)
                x, y = x * m_cos - m_sin * y, x * m_sin + y * m_cos
            emit(px, py, nj[0], nj[1])
        k = j
    return np.asarray(out, dtype=np.int64)


def poly_area_length(box: np.ndarray) -> tuple[float, float]:
    """Shoelace area (absolute) and perimeter — the shapely
    ``Polygon(box).area`` / ``.length`` pair (postprocess.py:163-164).
    """
    pts = np.asarray(box, dtype=np.float64).reshape(-1, 2)
    n = len(pts)
    area2 = 0.0
    length = 0.0
    for i in range(n):
        ax, ay = pts[i]
        bx, by = pts[(i + 1) % n]
        area2 += ax * by - bx * ay
        length += math.hypot(bx - ax, by - ay)
    return abs(area2) / 2.0, length


def unclip(box: np.ndarray,
           unclip_ratio: float = DET_UNCLIP_RATIO) -> np.ndarray:
    """distance = area * ratio / perimeter, then the round-join offset
    (postprocess.py:162-168)."""
    area, length = poly_area_length(box)
    distance = area * unclip_ratio / length
    return offset_round(np.asarray(box), distance)


# ---------------------------------------------------------------------------
# Douglas-Peucker (cv2.approxPolyDP twin for the poly path)

def arc_length(pts: np.ndarray, closed: bool = True) -> float:
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    seg = np.diff(np.vstack([pts, pts[:1]]) if closed else pts,
                  axis=0)
    return float(np.hypot(seg[:, 0], seg[:, 1]).sum())


def _dp_open(pts: list[tuple[float, float]], eps: float) \
        -> list[tuple[float, float]]:
    if len(pts) < 3:
        return list(pts)
    ax, ay = pts[0]
    bx, by = pts[-1]
    ln = math.hypot(bx - ax, by - ay)
    best, bi = -1.0, -1
    for i in range(1, len(pts) - 1):
        px, py = pts[i]
        if ln == 0:
            d = math.hypot(px - ax, py - ay)
        else:
            d = abs((bx - ax) * (ay - py) - (ax - px) * (by - ay)) / ln
        if d > best:
            best, bi = d, i
    if best <= eps:
        return [pts[0], pts[-1]]
    left = _dp_open(pts[:bi + 1], eps)
    right = _dp_open(pts[bi:], eps)
    return left[:-1] + right


def approx_poly_dp(pts: np.ndarray, eps: float) -> np.ndarray:
    """Closed-curve Douglas-Peucker: anchor at the two mutually
    farthest points (the classic closed split cv2 uses), simplify
    both halves.  Exact on convex outlines with distinct corners; a
    stated seam on pathological curves."""
    pts = [tuple(map(float, p)) for p in np.asarray(pts).reshape(-1, 2)]
    if len(pts) < 3:
        return np.asarray(pts, dtype=np.float64)
    i0 = 0
    d0 = -1.0
    for i, p in enumerate(pts):
        d = (p[0] - pts[0][0]) ** 2 + (p[1] - pts[0][1]) ** 2
        if d > d0:
            d0, i0 = d, i
    i1, d1 = 0, -1.0
    for i, p in enumerate(pts):
        d = (p[0] - pts[i0][0]) ** 2 + (p[1] - pts[i0][1]) ** 2
        if d > d1:
            d1, i1 = d, i
    lo, hi = min(i0, i1), max(i0, i1)
    half_a = _dp_open(pts[lo:hi + 1], eps)
    half_b = _dp_open(pts[hi:] + pts[:lo + 1], eps)
    return np.asarray(half_a[:-1] + half_b[:-1], dtype=np.float64)


# ---------------------------------------------------------------------------
# the two bitmap walks + the batch entry

def boxes_from_bitmap(pred: np.ndarray, bitmap: np.ndarray,
                      dest_width: int, dest_height: int,
                      box_thresh: float = DET_BOX_THRESH,
                      unclip_ratio: float = DET_UNCLIP_RATIO,
                      max_candidates: int = MAX_CANDIDATES,
                      min_size: int = MIN_SIZE) \
        -> tuple[list[np.ndarray], list[float]]:
    """The quad path (postprocess.py:115-167): per border, mini box ->
    short-side gate -> fast score gate -> unclip -> second mini box ->
    short-side gate -> scale to dest with numpy (banker's) rounding
    and clip."""
    height, width = bitmap.shape
    boxes: list[np.ndarray] = []
    scores: list[float] = []
    for contour in trace_borders(bitmap)[:max_candidates]:
        points, sside = get_mini_boxes(contour)
        if sside < min_size:
            continue
        points = np.array(points)
        score = box_score_fast(pred, points.reshape(-1, 2))
        if box_thresh > score:
            continue
        box = unclip(points, unclip_ratio)
        box, sside = get_mini_boxes(box)
        if sside < min_size + 2:
            continue
        box = np.array(box)
        box[:, 0] = np.clip(
            np.round(box[:, 0] / width * dest_width), 0, dest_width)
        box[:, 1] = np.clip(
            np.round(box[:, 1] / height * dest_height), 0, dest_height)
        boxes.append(box.astype("int32"))
        scores.append(score)
    return boxes, scores


def _ring_self_intersects(ring: np.ndarray) -> bool:
    """True when any two non-adjacent edges of the closed ring
    properly cross or overlap (exact integer orientation tests on the
    integer coordinates offset_round emits).  Convexity is the wrong
    proxy here: a simple concave ring never self-intersects (and the
    reference KEEPS it), while a pentagram-style self-intersecting
    ring turns the same way at every vertex."""
    pts = [(int(p[0]), int(p[1]))
           for p in np.asarray(ring).reshape(-1, 2)]
    n = len(pts)

    def orient(a, b, c):
        v = ((b[0] - a[0]) * (c[1] - a[1])
             - (b[1] - a[1]) * (c[0] - a[0]))
        return (v > 0) - (v < 0)

    def on_seg(a, b, c):
        return (min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
                and min(a[1], b[1]) <= c[1] <= max(a[1], b[1]))

    for i in range(n):
        a, b = pts[i], pts[(i + 1) % n]
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue                       # shared-endpoint pairs
            c, d = pts[j], pts[(j + 1) % n]
            o1, o2 = orient(a, b, c), orient(a, b, d)
            o3, o4 = orient(c, d, a), orient(c, d, b)
            if o1 != o2 and o3 != o4:
                return True
            if (o1 == 0 and on_seg(a, b, c)) \
                    or (o2 == 0 and on_seg(a, b, d)) \
                    or (o3 == 0 and on_seg(c, d, a)) \
                    or (o4 == 0 and on_seg(c, d, b)):
                return True
    return False


def polygons_from_bitmap(pred: np.ndarray, bitmap: np.ndarray,
                         dest_width: int, dest_height: int,
                         box_thresh: float = DET_BOX_THRESH,
                         unclip_ratio: float = DET_UNCLIP_RATIO,
                         max_candidates: int = MAX_CANDIDATES,
                         min_size: int = MIN_SIZE) \
        -> tuple[list[list[list[float]]], list[float]]:
    """The poly path (postprocess.py:69-113): approxPolyDP at 0.2% of
    the perimeter, score on the approximation, unclip, short-side
    gate on the expanded ring's mini box, scale."""
    height, width = bitmap.shape
    boxes: list[list[list[float]]] = []
    scores: list[float] = []
    for contour in trace_borders(bitmap)[:max_candidates]:
        eps = 0.002 * arc_length(contour, closed=True)
        approx = approx_poly_dp(contour, eps)
        points = approx.reshape(-1, 2)
        if points.shape[0] < 4:
            continue
        score = box_score_fast(pred, points)
        if box_thresh > score:
            continue
        box = unclip(points, unclip_ratio).reshape(-1, 2)
        if len(box) < 1:
            continue
        # the reference drops a contour when pyclipper's unclip
        # returns more than one ring (postprocess.py:101 ``if
        # len(box) > 1: continue``).  offset_round transcribes the
        # raw round-join offset but NOT Clipper's closing union, so
        # when the offset ring self-intersects (deeply concave input
        # whose pockets pinch at this delta) the reference's cleaned
        # ring(s) cannot be reproduced here — raise rather than emit
        # a ring the reference would have repaired or discarded.
        # Simple (including concave) offset rings are kept, exactly
        # like the reference's single-ring case.
        if _ring_self_intersects(box):
            raise NotImplementedError(
                "offset ring self-intersects: pyclipper's union step "
                "is not transcribed (stated seam; the quad path is "
                "unaffected)")
        _, sside = get_mini_boxes(box.reshape(-1, 2))
        if sside < min_size + 2:
            continue
        box = np.array(box, dtype=np.float64)
        box[:, 0] = np.clip(
            np.round(box[:, 0] / width * dest_width), 0, dest_width)
        box[:, 1] = np.clip(
            np.round(box[:, 1] / height * dest_height), 0, dest_height)
        boxes.append(box.tolist())
        scores.append(score)
    return boxes, scores


def db_postprocess(pred: np.ndarray, src_h: int, src_w: int,
                   thresh: float = DET_THRESH,
                   box_thresh: float = DET_BOX_THRESH,
                   unclip_ratio: float = DET_UNCLIP_RATIO) \
        -> tuple[list[np.ndarray], list[float]]:
    """One page of DBPostProcess.__call__'s quad branch
    (postprocess.py:233-261, use_dilation False as the det config
    pins): binarize at ``thresh`` and walk the quad path toward the
    source frame."""
    segmentation = (pred > thresh).astype(np.uint8)
    return boxes_from_bitmap(pred, segmentation, src_w, src_h,
                             box_thresh=box_thresh,
                             unclip_ratio=unclip_ratio)
