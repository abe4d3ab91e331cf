"""Deterministic OCR pre/post-processing machinery — the rule layer of
the reference's vision stack, re-implemented from scratch over numpy.

The reference's OCR path (/root/reference/deepdoc/vision/ocr.py,
operators.py, postprocess.py) interleaves deterministic geometry /
arithmetic with two model seams.  Everything deterministic is here:

- detection preprocessing: ``DetResizeForTest`` size arithmetic
  (operators.py:294-400 — limit_side_len ratios, round-to-/32 with
  Python banker's rounding, the <64 image padding),
  ``NormalizeImage`` (operators.py:105-130), ``ToCHWImage``
  (operators.py:132-146).
- detection postprocessing: ``order_points_clockwise`` /
  ``clip_det_res`` / ``filter_tag_det_res`` (ocr.py:460-487) and the
  reading-order ``sorted_boxes`` bubble pass (ocr.py:600-617).
- recognition preprocessing: the width-ratio batching fold of
  ``TextRecognizer.__call__`` (ocr.py:351-377) and
  ``resize_norm_img`` (ocr.py:141-165).
- recognition postprocessing: ``CTCLabelDecode`` /
  ``BaseRecLabelDecode.decode`` (postprocess.py:262-370) with every
  quirk kept (consecutive-duplicate collapse BEFORE the blank filter,
  the empty-selection ``conf=[0]`` fallback, the 'blank'-prepended
  charset, ``use_space_char``).
- crop geometry: the target size / rot90 rule of
  ``get_rotate_crop_image`` (ocr.py:561-594) and the exact
  perspective-matrix solve behind ``cv2.getPerspectiveTransform``.
- ``nms`` (operators.py:702-725) with the reference's +1 area
  convention.

The model seams — ONNX det/rec inference — stay seams, exactly like
the layout / TSR recognizers (SURVEY §2.5); ``DBPostProcess``'s
bitmap walk is implemented in ``dbpost``.  ``cv2.resize``'s
fixed-point INTER_LINEAR kernel for 8-bit images is implemented from
the public OpenCV source in ``fixedpoint_resize_u8`` (used by the
det/rec paths, which feed cv2.resize uint8 frames);
``cv2.warpPerspective``'s fixed-point remap kernel (INTER_BITS
coordinates, quantized 32x32 weight tables, both INTER_LINEAR and the
INTER_CUBIC mode the crop path uses) is implemented in
``extractlib.warpkernel`` and wired into ``warp_crop``;
``cv2.resize``'s INTER_CUBIC fixed-point kernel
(``fixedpoint_resize_cubic_u8``) drives ``layout_preprocess``
(LinearResize interp=2).  No pixel kernel remains a stand-in, and the
matrix chain is cv's own (getPerspectiveTransform's LU solve + the
3x3 cofactor invert, transcribed in ``warpkernel`` — the former
last-ulp seam, closed).  ``bilinear_resize``, the float
half-pixel-center form, stays as the property-test reference.

Determinism adaptation (documented): ``rec_batch_order`` pins the
width-ratio argsort tie order to the original index (numpy's default
introsort is unstable on ties); the reference inherits whatever
``np.argsort`` does.
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# detection preprocessing (operators.py)


def det_image_padding(im: np.ndarray, value: int = 0) -> np.ndarray:
    """operators.py:332-336: images with h+w < 64 are zero-padded up to
    at least 32x32 before the resize arithmetic."""
    h, w, c = im.shape
    im_pad = np.zeros((max(32, h), max(32, w), c), np.uint8) + value
    im_pad[:h, :w, :] = im
    return im_pad


def _round_half_even(x: float) -> int:
    """Python round() — banker's rounding, which the reference's
    ``int(round(resize_h / 32) * 32)`` inherits (h%32 == 16 rounds to
    the EVEN multiple of 32)."""
    return int(round(x))


def det_resize_shape(h: int, w: int, limit_side_len: int = 960,
                     limit_type: str = "max") -> tuple[int, int]:
    """resize_image_type0's target size (operators.py:352-397): clamp
    the limiting side to ``limit_side_len``, then snap both sides to
    multiples of 32 (floor 32) with banker's rounding."""
    if limit_type == "max":
        if max(h, w) > limit_side_len:
            ratio = float(limit_side_len) / (h if h > w else w)
        else:
            ratio = 1.0
    elif limit_type == "min":
        if min(h, w) < limit_side_len:
            ratio = float(limit_side_len) / (h if h < w else w)
        else:
            ratio = 1.0
    elif limit_type == "resize_long":
        ratio = float(limit_side_len) / max(h, w)
    else:
        raise ValueError("not support limit type, image ")
    resize_h = int(h * ratio)
    resize_w = int(w * ratio)
    resize_h = max(_round_half_even(resize_h / 32) * 32, 32)
    resize_w = max(_round_half_even(resize_w / 32) * 32, 32)
    return resize_h, resize_w


def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Half-pixel-center bilinear resample (the float form of
    cv2.resize INTER_LINEAR; the fixed-point kernel is the documented
    pixel seam).  Border handling is edge clamp, as cv2 does."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    im = img.astype(np.float64)
    v00 = im[y0][:, x0]
    v01 = im[y0][:, x1]
    v10 = im[y1][:, x0]
    v11 = im[y1][:, x1]
    if im.ndim == 3:
        fy = fy[..., None]
        fx = fx[..., None]
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


# cv2.resize INTER_LINEAR fixed-point constants (imgproc/src/resize.cpp)
INTER_RESIZE_COEF_BITS = 11
INTER_RESIZE_COEF_SCALE = 1 << INTER_RESIZE_COEF_BITS      # 2048


def _resize_coeffs_fixed(src: int, dst: int, zero_edges: bool):
    """One axis of cv2.resize INTER_LINEAR's fixed-point tap setup
    (resize.cpp invoker): ``f = (float)((d+0.5)*scale - 0.5)`` —
    double inner product cast to float32 — ``s = cvFloor(f)``,
    ``f -= s``, coefficients ``(1.f-f, f)`` scaled by 2048 and
    quantized with cvRound (round half to even).  The x axis zeroes
    ``f`` at both edges (the xmin/xmax regions read a single tap at
    full weight); the y axis keeps raw ``f`` and clips row indices at
    gather time instead — cv2's two edge conventions differ and the
    distinction is observable (the two ``>>16`` truncations of the
    vertical pass make split-coefficient taps on one clamped row
    differ by 1 from a single full-weight tap).

    Returns (ofs, a0, a1) int64 arrays of length ``dst``."""
    scale = src / dst                            # double, as in C++
    d = np.arange(dst, dtype=np.float64)
    f = ((d + 0.5) * scale - 0.5).astype(np.float32)
    s = np.floor(f).astype(np.int64)
    f = (f - s.astype(np.float32)).astype(np.float32)
    if zero_edges:
        left = s < 0
        s[left] = 0
        f[left] = np.float32(0.0)
        tail = s >= src - 1
        s[tail] = src - 1
        f[tail] = np.float32(0.0)
    # (1.f - f) is the chain's one true float32 rounding; the *2048
    # that follows is a power-of-two scale, exact in float32
    c0 = (np.float32(1.0) - f) * np.float32(INTER_RESIZE_COEF_SCALE)
    c1 = f * np.float32(INTER_RESIZE_COEF_SCALE)
    return s, np.rint(c0).astype(np.int64), np.rint(c1).astype(np.int64)


def fixedpoint_resize_u8(img: np.ndarray, out_h: int,
                         out_w: int) -> np.ndarray:
    """cv2.resize(img, (out_w, out_h)) for uint8 images — the default
    INTER_LINEAR fixed-point kernel, transcribed from the public
    OpenCV imgproc/src/resize.cpp (HResizeLinear / the uchar
    VResizeLinear specialization / the 8U invoker), including the
    cv::resize quirk that an exact 2x2 downscale silently switches to
    the INTER_AREA fast path (``(a+b+c+d+2)>>2``).

    Horizontal pass: ``H = S[sx]*a0 + S[sx+1]*a1`` in int32-range
    integers; vertical pass is the uchar specialization
    ``((b0*(H0>>4))>>16) + ((b1*(H1>>4))>>16) + 2) >> 2``."""
    h, w = img.shape[:2]
    squeeze = img.ndim == 2
    im = img.astype(np.int64)
    if squeeze:
        im = im[..., None]
    if w == 2 * out_w and h == 2 * out_h:
        s = (im[0::2, 0::2] + im[0::2, 1::2]
             + im[1::2, 0::2] + im[1::2, 1::2])
        out = ((s + 2) >> 2).astype(np.uint8)
        return out[..., 0] if squeeze else out
    xs, xa0, xa1 = _resize_coeffs_fixed(w, out_w, zero_edges=True)
    ys, yb0, yb1 = _resize_coeffs_fixed(h, out_h, zero_edges=False)
    x1 = np.minimum(xs + 1, w - 1)
    H = (im[:, xs, :] * xa0[None, :, None]
         + im[:, x1, :] * xa1[None, :, None])
    r0 = np.clip(ys, 0, h - 1)
    r1 = np.clip(ys + 1, 0, h - 1)
    out = (((yb0[:, None, None] * (H[r0] >> 4)) >> 16)
           + ((yb1[:, None, None] * (H[r1] >> 4)) >> 16))
    out = ((out + 2) >> 2).astype(np.uint8)
    return out[..., 0] if squeeze else out


def _interp_cubic_f32(f: np.ndarray) -> tuple[np.ndarray, ...]:
    """resize.cpp interpolateCubic (A=-0.75) in float32, one rounding
    per op exactly like the C float chain — the phases here are
    arbitrary float32 fractions (unlike the warp tables' dyadic
    phases), so the float32 emulation is load-bearing."""
    a = np.float32(-0.75)
    f = f.astype(np.float32)
    one = np.float32(1.0)
    t = f + one
    c0 = ((a * t - np.float32(5.0) * a) * t + np.float32(8.0) * a) \
        * t - np.float32(4.0) * a
    c1 = ((a + np.float32(2.0)) * f - (a + np.float32(3.0))) * f * f \
        + one
    u = one - f
    c2 = ((a + np.float32(2.0)) * u - (a + np.float32(3.0))) * u * u \
        + one
    c3 = one - c0 - c1 - c2
    return c0, c1, c2, c3


def _resize_cubic_coeffs(src: int, dst: int):
    """One axis of cv2.resize INTER_CUBIC's fixed-point setup
    (resize.cpp invoker): ``f = (float)((d+0.5)*scale - 0.5)``,
    ``s = cvFloor(f)``, ``f -= s`` — and UNLIKE the linear path, the
    edge pinning ``f = 0, s = 0`` is skipped for INTER_CUBIC
    (``interpolation != INTER_CUBIC`` guards both edge branches), so a
    negative or past-the-end tap base survives and the gather clamps
    instead.  Coefficients are interpolateCubic in float32, scaled by
    2048 and quantized with saturate_cast<short> (cvRound + clamp).

    Returns (s, [a0..a3]) int64 arrays of length ``dst``."""
    scale = src / dst                            # double, as in C++
    d = np.arange(dst, dtype=np.float64)
    f = ((d + 0.5) * scale - 0.5).astype(np.float32)
    s = np.floor(f).astype(np.int64)
    f = (f - s.astype(np.float32)).astype(np.float32)
    coeffs = []
    for c in _interp_cubic_f32(f):
        q = np.rint(np.float64(c * np.float32(INTER_RESIZE_COEF_SCALE))
                    ).astype(np.int64)
        coeffs.append(np.clip(q, -32768, 32767))
    return s, coeffs


def fixedpoint_resize_cubic_u8(img: np.ndarray, out_h: int,
                               out_w: int) -> np.ndarray:
    """cv2.resize(img, (out_w, out_h), interpolation=INTER_CUBIC) for
    uint8 images — the generic fixed-point path of the public OpenCV
    imgproc/src/resize.cpp (HResizeCubic / VResizeCubic with
    ``FixedPtCast<int, uchar, 2*INTER_RESIZE_COEF_BITS>``): horizontal
    4-tap sums of short coefficients in int32-range integers,
    replicate-clamped taps at both borders (the cubic invoker does NOT
    pin edge phases — see _resize_cubic_coeffs), vertical combine and
    ``(v + 2^21) >> 22`` saturation.  This is the layout Recognizer's
    resample (LinearResize interp=2, recognizer.py:288)."""
    h, w = img.shape[:2]
    squeeze = img.ndim == 2
    im = img.astype(np.int64)
    if squeeze:
        im = im[..., None]
    xs, xa = _resize_cubic_coeffs(w, out_w)
    ys, yb = _resize_cubic_coeffs(h, out_h)
    hh = np.zeros((h, out_w, im.shape[2]), dtype=np.int64)
    for j in range(4):
        cols = np.clip(xs - 1 + j, 0, w - 1)
        hh += im[:, cols, :] * xa[j][None, :, None]
    out = np.zeros((out_h, out_w, im.shape[2]), dtype=np.int64)
    for k in range(4):
        rows = np.clip(ys - 1 + k, 0, h - 1)
        out += hh[rows] * yb[k][:, None, None]
    out = (out + (1 << (2 * INTER_RESIZE_COEF_BITS - 1))) \
        >> (2 * INTER_RESIZE_COEF_BITS)
    out = np.clip(out, 0, 255).astype(np.uint8)
    return out[..., 0] if squeeze else out


def det_resize(img: np.ndarray, limit_side_len: int = 960,
               limit_type: str = "max") -> tuple[np.ndarray, np.ndarray]:
    """DetResizeForTest.__call__ for the resize_type==0 path the
    reference's TextDetector config selects (operators.py:314-329,
    ocr.py:400-407): pad tiny images, compute the /32-snapped target,
    resample with cv2's fixed-point INTER_LINEAR kernel, and return
    (img, [src_h, src_w, ratio_h, ratio_w])."""
    src_h, src_w = img.shape[:2]
    if src_h + src_w < 64:
        img = det_image_padding(img)
    h, w = img.shape[:2]
    resize_h, resize_w = det_resize_shape(h, w, limit_side_len,
                                          limit_type)
    out = fixedpoint_resize_u8(img, resize_h, resize_w)
    ratio_h = resize_h / float(h)
    ratio_w = resize_w / float(w)
    return out, np.array([src_h, src_w, ratio_h, ratio_w])


DET_MEAN = (0.485, 0.456, 0.406)
DET_STD = (0.229, 0.224, 0.225)


def normalize_image(img: np.ndarray, scale: float = 1.0 / 255.0,
                    mean=DET_MEAN, std=DET_STD) -> np.ndarray:
    """NormalizeImage order='hwc' (operators.py:105-130):
    (img * scale - mean) / std, float32 like the reference."""
    mean = np.array(mean, dtype="float32").reshape(1, 1, 3)
    std = np.array(std, dtype="float32").reshape(1, 1, 3)
    return (img.astype("float32") * np.float32(scale) - mean) / std


def to_chw(img: np.ndarray) -> np.ndarray:
    """ToCHWImage (operators.py:132-146)."""
    return img.transpose((2, 0, 1))


def det_preprocess(img: np.ndarray, limit_side_len: int = 960,
                   limit_type: str = "max") -> tuple[np.ndarray,
                                                     np.ndarray]:
    """The TextDetector preprocess chain (ocr.py:400-423,487):
    DetResizeForTest -> NormalizeImage -> ToCHWImage -> KeepKeys
    ['image', 'shape']."""
    img, shape = det_resize(img, limit_side_len, limit_type)
    return to_chw(normalize_image(img)), shape


# ---------------------------------------------------------------------------
# detection postprocessing (ocr.py TextDetector)


def order_points_clockwise(pts: np.ndarray) -> np.ndarray:
    """ocr.py:460-469: TL by min coordinate sum, BR by max sum, TR/BL
    of the remaining two by x-y difference."""
    rect = np.zeros((4, 2), dtype="float32")
    s = pts.sum(axis=1)
    rect[0] = pts[np.argmin(s)]
    rect[2] = pts[np.argmax(s)]
    tmp = np.delete(pts, (np.argmin(s), np.argmax(s)), axis=0)
    diff = np.diff(np.array(tmp), axis=1)
    rect[1] = tmp[np.argmin(diff)]
    rect[3] = tmp[np.argmax(diff)]
    return rect


def clip_det_res(points: np.ndarray, img_height: int,
                 img_width: int) -> np.ndarray:
    """ocr.py:471-475: int-truncate and clamp each corner into the
    image."""
    for pno in range(points.shape[0]):
        points[pno, 0] = int(min(max(points[pno, 0], 0), img_width - 1))
        points[pno, 1] = int(min(max(points[pno, 1], 0), img_height - 1))
    return points


def filter_tag_det_res(dt_boxes, image_shape) -> np.ndarray:
    """ocr.py:477-491: orient clockwise, clip, drop boxes whose
    int-truncated edge norms are <= 3 on either side."""
    img_height, img_width = image_shape[0:2]
    dt_boxes_new = []
    for box in dt_boxes:
        if isinstance(box, list):
            box = np.array(box)
        box = order_points_clockwise(box)
        box = clip_det_res(box, img_height, img_width)
        rect_width = int(np.linalg.norm(box[0] - box[1]))
        rect_height = int(np.linalg.norm(box[0] - box[3]))
        if rect_width <= 3 or rect_height <= 3:
            continue
        dt_boxes_new.append(box)
    return np.array(dt_boxes_new)


def sorted_boxes(dt_boxes) -> list:
    """OCR.sorted_boxes (ocr.py:600-617): sort by (y0, x0), then one
    insertion-style backward bubble that swaps adjacent boxes whose
    first-corner y differ by <10 when the later box starts further
    left — and STOPS at the first non-swap (``break`` kept)."""
    num_boxes = len(dt_boxes)
    _boxes = list(sorted(dt_boxes, key=lambda x: (x[0][1], x[0][0])))
    for i in range(num_boxes - 1):
        for j in range(i, -1, -1):
            if abs(_boxes[j + 1][0][1] - _boxes[j][0][1]) < 10 and \
                    (_boxes[j + 1][0][0] < _boxes[j][0][0]):
                tmp = _boxes[j]
                _boxes[j] = _boxes[j + 1]
                _boxes[j + 1] = tmp
            else:
                break
    return _boxes


# ---------------------------------------------------------------------------
# crop geometry (ocr.py get_rotate_crop_image)


def crop_geometry(points: np.ndarray) -> tuple[int, int, bool]:
    """The deterministic frame of get_rotate_crop_image
    (ocr.py:561-594): target crop width/height from the opposing edge
    norms, and whether the crop is rotated 90° after warping
    (height/width >= 1.5).  Returns (crop_w, crop_h, rotated)."""
    assert len(points) == 4, "shape of points must be 4*2"
    img_crop_width = int(
        max(np.linalg.norm(points[0] - points[1]),
            np.linalg.norm(points[2] - points[3])))
    img_crop_height = int(
        max(np.linalg.norm(points[0] - points[3]),
            np.linalg.norm(points[1] - points[2])))
    rotated = (img_crop_height * 1.0 / img_crop_width >= 1.5
               if img_crop_width else False)
    return img_crop_width, img_crop_height, rotated


def perspective_matrix(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """The 3x3 homography cv2.getPerspectiveTransform solves
    (ocr.py:581): 8 linear equations mapping 4 source corners to 4
    target corners, h33 pinned to 1.  Exact linear algebra, no cv2."""
    a = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros(8, dtype=np.float64)
    for i in range(4):
        sx, sy = float(src[i][0]), float(src[i][1])
        dx, dy = float(dst[i][0]), float(dst[i][1])
        a[2 * i] = [sx, sy, 1, 0, 0, 0, -dx * sx, -dx * sy]
        a[2 * i + 1] = [0, 0, 0, sx, sy, 1, -dy * sx, -dy * sy]
        b[2 * i] = dx
        b[2 * i + 1] = dy
    h = np.linalg.solve(a, b)
    return np.append(h, 1.0).reshape(3, 3)


def warp_crop(img: np.ndarray, points: np.ndarray,
              method: str = "cubic") -> np.ndarray:
    """get_rotate_crop_image's resample (ocr.py:561-594):
    ``cv2.warpPerspective(img, M, (w, h),
    borderMode=cv2.BORDER_REPLICATE, flags=cv2.INTER_CUBIC)`` as the
    fixed-point remap kernel of ``extractlib.warpkernel`` (INTER_BITS=5
    coordinates, 32x32 quantized weight tables, FixedPtCast output),
    then the exact rot90 branch.  The inverse map is cv's own chain —
    getPerspectiveTransform's LU solve and warpPerspective's 3x3
    cofactor invert, transcribed in ``warpkernel`` — so the whole
    crop, matrix included, is the reference's computation (the former
    last-ulp matrix seam, closed)."""
    from ragflow_spark.extractlib import warpkernel as WK

    crop_w, crop_h, rotated = crop_geometry(points)
    minv = WK.quad_to_rect_inverse_cv(
        np.asarray(points, dtype=np.float64), crop_w, crop_h)
    out = WK.warp_perspective_u8(np.ascontiguousarray(img), minv,
                                 crop_w, crop_h, method)
    if rotated:
        out = np.rot90(out)
    return out


# ---------------------------------------------------------------------------
# recognition preprocessing (ocr.py TextRecognizer)

REC_IMAGE_SHAPE = (3, 48, 320)
REC_BATCH_NUM = 16


def rec_batch_order(widths, heights) -> np.ndarray:
    """The aspect-ratio argsort of TextRecognizer.__call__
    (ocr.py:354-358).  Tie order pinned to the original index (stable
    sort) — numpy's default argsort is unstable on ties (documented
    determinization)."""
    ratios = np.array([w / float(h) for w, h in zip(widths, heights)])
    return np.argsort(ratios, kind="stable")


def rec_batch_ratios(widths, heights,
                     batch_num: int = REC_BATCH_NUM,
                     rec_shape=REC_IMAGE_SHAPE) -> list:
    """Per-crop (batch_no, max_wh_ratio) after the sort: each batch of
    ``batch_num`` crops shares the max aspect ratio, floored by the
    model shape's 320/48 (ocr.py:363-373).  Returns a list aligned
    with the INPUT order."""
    imgc, imgh, imgw = rec_shape
    order = rec_batch_order(widths, heights)
    out = [None] * len(order)
    for beg in range(0, len(order), batch_num):
        end = min(len(order), beg + batch_num)
        max_wh_ratio = imgw / imgh
        for ino in range(beg, end):
            i = order[ino]
            max_wh_ratio = max(max_wh_ratio,
                               widths[i] * 1.0 / heights[i])
        for ino in range(beg, end):
            out[order[ino]] = (beg // batch_num, max_wh_ratio)
    return out


def rec_resized_w(h: int, w: int, max_wh_ratio: float,
                  rec_shape=REC_IMAGE_SHAPE,
                  model_w: int | None = None) -> tuple[int, int]:
    """resize_norm_img's width arithmetic (ocr.py:141-155): the padded
    canvas is ``int(imgH * max_wh_ratio)`` (or the model's fixed width
    when the ONNX input pins one), the content ``ceil(imgH * w/h)``
    capped at the canvas.  Returns (resized_w, canvas_w)."""
    imgc, imgh, imgw = rec_shape
    imgw = int(imgh * max_wh_ratio)
    if model_w is not None and model_w > 0:
        imgw = model_w
    ratio = w / float(h)
    if math.ceil(imgh * ratio) > imgw:
        resized_w = imgw
    else:
        resized_w = int(math.ceil(imgh * ratio))
    return resized_w, imgw


def rec_resize_norm(img: np.ndarray, max_wh_ratio: float,
                    rec_shape=REC_IMAGE_SHAPE,
                    model_w: int | None = None) -> np.ndarray:
    """resize_norm_img (ocr.py:141-165): resample to (imgH, resized_w),
    scale /255, center at 0 (-0.5, /0.5), CHW, zero-pad the canvas
    right of the content."""
    imgc, imgh, _ = rec_shape
    h, w = img.shape[:2]
    resized_w, imgw = rec_resized_w(h, w, max_wh_ratio, rec_shape,
                                    model_w)
    resized = fixedpoint_resize_u8(img, imgh, resized_w) \
        .astype("float32")
    resized = resized.transpose((2, 0, 1)) / 255
    resized -= 0.5
    resized /= 0.5
    padding = np.zeros((imgc, imgh, imgw), dtype=np.float32)
    padding[:, :, 0:resized_w] = resized
    return padding


# ---------------------------------------------------------------------------
# recognition postprocessing (postprocess.py CTCLabelDecode)


def ctc_charset(characters: list[str],
                use_space_char: bool = True) -> list[str]:
    """BaseRecLabelDecode's dictionary (postprocess.py:266-289): the
    character lines, optionally a trailing space, then CTCLabelDecode
    prepends 'blank' at index 0 (postprocess.py:368-370)."""
    chars = list(characters)
    if use_space_char:
        chars.append(" ")
    return ["blank"] + chars


def ctc_decode(preds: np.ndarray, charset: list[str]) -> list:
    """CTCLabelDecode.__call__ + decode (postprocess.py:311-363) for a
    (batch, T, C) score tensor: per-step argmax/max, collapse
    consecutive duplicates FIRST, then drop blanks (index 0), join the
    surviving characters, mean confidence with the empty-selection
    ``[0]`` fallback."""
    preds_idx = preds.argmax(axis=2)
    preds_prob = preds.max(axis=2)
    result = []
    for bi in range(len(preds_idx)):
        selection = np.ones(len(preds_idx[bi]), dtype=bool)
        selection[1:] = preds_idx[bi][1:] != preds_idx[bi][:-1]
        selection &= preds_idx[bi] != 0
        chars = [charset[i] for i in preds_idx[bi][selection]]
        conf = preds_prob[bi][selection]
        if len(conf) == 0:
            conf = [0]
        result.append(("".join(chars), float(np.mean(conf))))
    return result


DROP_SCORE = 0.5


def drop_low_score(texts_scores, drop_score: float = DROP_SCORE) -> list:
    """recognize_batch's gate (ocr.py:651-661): scores below
    ``drop_score`` blank the text, rows are kept."""
    return [t if s >= drop_score else ""
            for t, s in texts_scores]


# ---------------------------------------------------------------------------
# layout-model preprocessing (recognizer.py:283-298)


def layout_scale(h: int, w: int,
                 target_size=(800, 608),
                 keep_ratio: bool = False) -> tuple[float, float]:
    """LinearResize.generate_scale (operators.py:237-261) under the
    layout Recognizer's config ({'target_size': [800, 608],
    'keep_ratio': False}): per-axis scale factors."""
    if keep_ratio:
        im_min, im_max = min(h, w), max(h, w)
        t_min, t_max = min(target_size), max(target_size)
        scale = float(t_min) / float(im_min)
        if np.round(scale * im_max) > t_max:
            scale = float(t_max) / float(im_max)
        return scale, scale
    resize_h, resize_w = target_size
    return resize_h / float(h), resize_w / float(w)


def layout_preprocess(img: np.ndarray,
                      target_size=(800, 608),
                      stride: int = 32) -> tuple[np.ndarray, dict]:
    """Recognizer.preprocess (recognizer.py:283-298): LinearResize
    (keep_ratio False) -> standardize -> Permute -> PadStride(32).

    Quirk, documented: the reference's op config names
    ``'StandardizeImage'`` but operators.py defines ``StandardizeImag``
    (operators.py:68), so ``getattr(operators, op_type)`` raises
    AttributeError if this path executes — the chain here is the
    evident intent (StandardizeImag with the config's mean/std).
    The resample is cv2.resize INTER_CUBIC's fixed-point kernel
    (``fixedpoint_resize_cubic_u8`` — the LinearResize config pins
    interp=2, recognizer.py:288)."""
    h, w = img.shape[:2]
    sy, sx = layout_scale(h, w, target_size)
    out_h = int(round(h * sy))
    out_w = int(round(w * sx))
    im = fixedpoint_resize_cubic_u8(np.asarray(img, dtype=np.uint8),
                                    out_h, out_w)
    # StandardizeImag is_scale=True mean_std (operators.py:68-103)
    im = im.astype(np.float32, copy=False)
    im *= np.float32(1.0 / 255.0)
    im -= np.array(DET_MEAN)[np.newaxis, np.newaxis, :]
    im /= np.array(DET_STD)[np.newaxis, np.newaxis, :]
    im = im.transpose((2, 0, 1)).copy()        # Permute
    info = {"im_shape": np.array([out_h, out_w], dtype="float32"),
            "scale_factor": np.array([sy, sx], dtype="float32")}
    if stride <= 0:
        return im, info
    pad_h = int(np.ceil(float(out_h) / stride) * stride)
    pad_w = int(np.ceil(float(out_w) / stride) * stride)
    padded = np.zeros((im.shape[0], pad_h, pad_w), dtype=np.float32)
    padded[:, :out_h, :out_w] = im
    return padded, info


# ---------------------------------------------------------------------------
# nms (operators.py:702-725)


def nms(bboxes: np.ndarray, scores: np.ndarray,
        iou_thresh: float) -> list[int]:
    """Greedy score-descending suppression with the reference's +1
    pixel area convention."""
    x1, y1 = bboxes[:, 0], bboxes[:, 1]
    x2, y2 = bboxes[:, 2], bboxes[:, 3]
    areas = (y2 - y1) * (x2 - x1)
    indices = []
    index = scores.argsort()[::-1]
    while index.size > 0:
        i = index[0]
        indices.append(int(i))
        x11 = np.maximum(x1[i], x1[index[1:]])
        y11 = np.maximum(y1[i], y1[index[1:]])
        x22 = np.minimum(x2[i], x2[index[1:]])
        y22 = np.minimum(y2[i], y2[index[1:]])
        w = np.maximum(0, x22 - x11 + 1)
        h = np.maximum(0, y22 - y11 + 1)
        overlaps = w * h
        ious = overlaps / (areas[i] + areas[index[1:]] - overlaps)
        idx = np.where(ious <= iou_thresh)[0]
        index = index[idx + 1]
    return indices
