"""cv2.fillPoly's fixed-point polygon rasterizer for integer-vertex
polygons, transcribed from the public OpenCV sources
(imgproc/src/drawing.cpp: ``CollectPolyEdges`` / ``FillEdgeCollection``
/ ``CmpEdges`` and the LINE_8 ``LineIterator`` Bresenham).  This is the
mask builder behind DBPostProcess.box_score_fast
(/root/reference/deepdoc/vision/postprocess.py:194-210
``cv2.fillPoly(mask, box.reshape(1, -1, 2).astype("int32"), 1)``),
whose rotated-quad corner rules were round 4's stated approximation
seam (dbpost.fill_poly_mask).

What fillPoly actually does for LINE_8 / shift=0 (drawing.cpp):

* every polygon edge is drawn with the 8-connected Bresenham line
  (``Line`` -> ``LineIterator(..., connectivity=8, leftToRight=true)``)
  at rounded endpoint coordinates — the boundary pixels are part of
  the fill;
* every non-horizontal edge enters an edge table at XY_SHIFT=16 fixed
  point with slope ``dx = (x1 - x0) / (y1 - y0)`` in TRUNCATING int64
  division, anchored at its top vertex;
* edges sort by (y0, x, dx); a scanline sweep keeps an active edge
  list, pairs edges off left-to-right, fills the span
  ``[(xl + 0xFFFF) >> 16, xr >> 16]`` inclusively (ceil of the left
  boundary, floor of the right), advances both paired edges by dx,
  drops an edge when the scanline reaches its bottom vertex (the
  bottom row of an edge is NOT filled by the sweep — only by the
  boundary Bresenham), and re-sorts the list with the same bubble
  pass the C code uses;
* rows run from the true y_min (possibly negative — edges whose top
  vertex is above the image still activate and advance their x) to
  min(y_max, height) EXCLUSIVE; rows outside the image skip the
  write only.

Divergence kept deliberately small and documented: cv clips each
boundary line with ``clipLine`` before rasterizing (which can move an
endpoint along the line with integer rounding); this module instead
drops out-of-bounds pixels at write time.  The two differ only in the
BOUNDARY pixels of edges crossing the mask border (interior spans
match) — relevant because box_score_fast's bbox shift clips at 0, so
a minAreaRect corner with a negative coordinate stays negative.
"""

from __future__ import annotations

import numpy as np

XY_SHIFT = 16
XY_ONE = 1 << XY_SHIFT


def _div_trunc(a: int, b: int) -> int:
    """C int64 division: truncate toward zero."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def line_pixels(x0: int, y0: int, x1: int, y1: int) -> list:
    """LineIterator(img, p0, p1, connectivity=8, leftToRight=true):
    the 8-connected Bresenham pixel walk cv::Line performs for
    LINE_8, endpoint-swapped so iteration runs left to right, minor
    axis stepping when the doubled error goes negative (strict)."""
    if x0 > x1:                       # leftToRight endpoint swap
        x0, x1, y0, y1 = x1, x0, y1, y0
    dx = x1 - x0
    dy = y1 - y0
    sy = -1 if dy < 0 else 1
    dy = abs(dy)
    steep = dy > dx
    if steep:
        dx, dy = dy, dx
    err = dx - (dy + dy)
    plus_delta = dx + dx
    minus_delta = -(dy + dy)
    x, y = x0, y0
    pts = []
    for _ in range(dx + 1):
        pts.append((x, y))
        if err < 0:                   # minor step
            if steep:
                x += 1
            else:
                y += sy
            err += minus_delta + plus_delta
        else:
            err += minus_delta
        if steep:                     # major step
            y += sy
        else:
            x += 1
    return pts


class _Edge:
    __slots__ = ("y0", "y1", "x", "dx", "next")

    def __init__(self, y0=0, y1=0, x=0, dx=0):
        self.y0, self.y1, self.x, self.dx = y0, y1, x, dx
        self.next = None


def collect_poly_edges(pts, mask: np.ndarray) -> list:
    """CollectPolyEdges for shift=0 / LINE_8: draws every boundary
    edge with the Bresenham walk into ``mask`` and returns the
    non-horizontal edge records at XY_SHIFT fixed point."""
    h, w = mask.shape
    edges = []
    px, py = int(pts[-1][0]) << XY_SHIFT, int(pts[-1][1])
    for qx0, qy0 in pts:
        qx, qy = int(qx0) << XY_SHIFT, int(qy0)
        for lx, ly in line_pixels((px + (XY_ONE >> 1)) >> XY_SHIFT, py,
                                  (qx + (XY_ONE >> 1)) >> XY_SHIFT, qy):
            if 0 <= ly < h and 0 <= lx < w:
                mask[ly, lx] = 1
        if py != qy:
            dx = _div_trunc(qx - px, qy - py)
            if py < qy:
                edges.append(_Edge(py, qy, px, dx))
            else:
                edges.append(_Edge(qy, py, qx, dx))
        px, py = qx, qy
    return edges


def fill_edge_collection(edges: list, mask: np.ndarray) -> None:
    """FillEdgeCollection: sorted active-edge-list scanline sweep with
    cv's exact span rounding, per-pair x advance, and bubble re-sort."""
    total = len(edges)
    h, w = mask.shape
    if total < 2:
        return
    y_min = min(e.y0 for e in edges)
    y_max = max(e.y1 for e in edges)
    x_min = min(min(e.x, e.x + (e.y1 - e.y0) * e.dx) for e in edges)
    x_max = max(max(e.x, e.x + (e.y1 - e.y0) * e.dx) for e in edges)
    if y_max < 0 or y_min >= h or x_max < 0 or x_min >= (w << XY_SHIFT):
        return

    edges = sorted(edges, key=lambda e: (e.y0, e.x, e.dx))  # CmpEdges
    sentinel = _Edge(y0=2 ** 62)
    edges.append(sentinel)
    tmp = _Edge()
    tmp.next = None
    i = 0
    e = edges[i]
    y_stop = min(y_max, h)

    # the sweep starts at the TRUE y_min, even when negative: edges
    # whose top vertex is above the image must still enter the active
    # list and advance their x per row (cv2 fills polygons with
    # negative vertices correctly — only the write is clipped)
    for y in range(y_min, y_stop):
        draw = False
        prelast = tmp
        last = tmp.next
        while last is not None or e.y0 == y:
            if last is not None and last.y1 == y:
                # exclude edge when y reaches its lower point: the
                # bottom vertex row is never span-filled
                prelast.next = last.next
                last = last.next
                continue
            keep_prelast = prelast
            if last is not None and (e.y0 > y or last.x < e.x):
                prelast = last
                last = last.next
            elif i < total:
                # y reached a new edge's upper point: insert
                prelast.next = e
                e.next = last
                prelast = e
                i += 1
                e = edges[i]
            else:
                break
            if draw:
                # pair complete: fill [ceil(xl), floor(xr)] inclusive
                if keep_prelast.x > prelast.x:
                    x1 = (prelast.x + XY_ONE - 1) >> XY_SHIFT
                    x2 = keep_prelast.x >> XY_SHIFT
                else:
                    x1 = (keep_prelast.x + XY_ONE - 1) >> XY_SHIFT
                    x2 = prelast.x >> XY_SHIFT
                if x1 < w and x2 >= 0 and y >= 0:
                    x1 = max(x1, 0)
                    x2 = min(x2, w - 1)
                    mask[y, x1:x2 + 1] = 1
                keep_prelast.x += keep_prelast.dx
                prelast.x += prelast.dx
            draw = not draw

        # bubble re-sort of the active list by x (verbatim)
        keep_prelast = None
        while True:
            prelast = tmp
            last = tmp.next
            last_exchange = None
            while last is not keep_prelast and last is not None \
                    and last.next is not None:
                te = last.next
                if last.x > te.x:
                    prelast.next = te
                    last.next = te.next
                    te.next = last
                    prelast = te
                    last_exchange = prelast
                else:
                    prelast = last
                    last = last.next
            if last_exchange is None:
                break
            keep_prelast = last_exchange
            if keep_prelast is tmp.next or keep_prelast is tmp:
                break


def fill_poly(shape: tuple[int, int], pts) -> np.ndarray:
    """cv2.fillPoly(zeros(shape, uint8), [pts], 1) for one integer
    polygon: Bresenham boundary + scanline interior."""
    mask = np.zeros(shape, dtype=np.uint8)
    pts = [(int(p[0]), int(p[1]))
           for p in np.asarray(pts).reshape(-1, 2)]
    edges = collect_poly_edges(pts, mask)
    fill_edge_collection(edges, mask)
    return mask
