"""Unit tests for the deterministic OCR machinery
(extractlib/visionops.py) — each pinned against an in-test
transcription of the reference body or a hand-computed golden
(/root/reference/deepdoc/vision/{ocr,operators,postprocess}.py)."""

import math

import numpy as np
import pytest

from ragflow_spark.extractlib import visionops as V


# ---------------------------------------------------------------------------
# detection resize arithmetic


def _ref_type0_shape(h, w, limit_side_len, limit_type):
    """Transcription of resize_image_type0's size arithmetic
    (operators.py:352-397)."""
    if limit_type == 'max':
        if max(h, w) > limit_side_len:
            ratio = float(limit_side_len) / h if h > w \
                else float(limit_side_len) / w
        else:
            ratio = 1.
    elif limit_type == 'min':
        if min(h, w) < limit_side_len:
            ratio = float(limit_side_len) / h if h < w \
                else float(limit_side_len) / w
        else:
            ratio = 1.
    else:
        ratio = float(limit_side_len) / max(h, w)
    resize_h = int(h * ratio)
    resize_w = int(w * ratio)
    resize_h = max(int(round(resize_h / 32) * 32), 32)
    resize_w = max(int(round(resize_w / 32) * 32), 32)
    return resize_h, resize_w


def test_det_resize_shape_matches_reference_sweep():
    for h in list(range(33, 200, 7)) + [48, 80, 112, 960, 1500]:
        for w in [40, 64, 80, 96, 191, 961, 2000]:
            for lt in ("max", "min", "resize_long"):
                assert V.det_resize_shape(h, w, 960, lt) == \
                    _ref_type0_shape(h, w, 960, lt), (h, w, lt)


def test_det_resize_shape_bankers_rounding():
    # 80/32 = 2.5 -> even 2 -> 64 (away-from-zero would give 96)
    assert V.det_resize_shape(80, 64)[0] == 64
    # 112/32 = 3.5 -> even 4 -> 128
    assert V.det_resize_shape(112, 64)[0] == 128


def test_det_image_padding():
    im = np.ones((10, 20, 3), np.uint8) * 7
    out = V.det_image_padding(im)
    assert out.shape == (32, 32, 3)
    assert (out[:10, :20] == 7).all() and out[10:, :, :].sum() == 0
    # the padding path triggers inside det_resize when h+w < 64
    resized, shape = V.det_resize(im)
    assert (int(shape[0]), int(shape[1])) == (10, 20)
    assert resized.shape[:2] == (32, 32)


# ---------------------------------------------------------------------------
# bilinear resample


def test_bilinear_identity():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (9, 13, 3)).astype(np.uint8)
    out = V.bilinear_resize(img, 9, 13)
    assert np.allclose(out, img, atol=1e-12)


def test_bilinear_linear_ramp_exact():
    # linear-in-x data: resampling reproduces the ramp with edge clamp
    img = (np.arange(20, dtype=np.float64)[None, :, None]
           * np.ones((5, 1, 3)))
    out = V.bilinear_resize(img, 5, 40)
    for xp in range(40):
        sx = (xp + 0.5) * 20 / 40 - 0.5
        want = min(max(sx, 0.0), 19.0)
        assert abs(out[2, xp, 1] - want) < 1e-9


def test_bilinear_hand_2x2_to_4x4():
    img = np.array([[0.0, 10.0], [20.0, 30.0]])
    out = V.bilinear_resize(img, 4, 4)
    # center-aligned sampling: corners clamp to the corner pixels
    assert out[0, 0] == 0.0 and out[3, 3] == 30.0
    # interior point (1,1): sx = sy = 0.25 -> 0.25*10 + 0.25*20 + ...
    want = (0.75 * 0.75 * 0 + 0.75 * 0.25 * 10
            + 0.25 * 0.75 * 20 + 0.25 * 0.25 * 30)
    assert abs(out[1, 1] - want) < 1e-12


def test_normalize_and_chw_golden():
    img = np.full((2, 2, 3), 128, np.uint8)
    norm = V.normalize_image(img)
    # (128/255 - mean)/std per channel, float32
    for c, (m, s) in enumerate(zip(V.DET_MEAN, V.DET_STD)):
        want = (np.float32(128) * np.float32(1.0 / 255.0)
                - np.float32(m)) / np.float32(s)
        assert abs(float(norm[0, 0, c]) - float(want)) < 1e-6
    chw = V.to_chw(norm)
    assert chw.shape == (3, 2, 2)


# ---------------------------------------------------------------------------
# cv2 fixed-point INTER_LINEAR kernel (resize.cpp transcription)


def test_fixedpoint_resize_identity():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (9, 13, 3)).astype(np.uint8)
    assert np.array_equal(V.fixedpoint_resize_u8(img, 9, 13), img)


def test_fixedpoint_resize_hand_downscale():
    # ramp 0..9, 10 -> 4 columns: per-column taps hand-quantized
    # (fx in {0.75, 0.25} -> coefficients (512,1536)/(1536,512)),
    # vertical pass degenerate (fy=0)
    img = (np.arange(10, dtype=np.uint8).reshape(1, 10, 1)
           * np.ones((2, 1, 1), np.uint8))
    out = V.fixedpoint_resize_u8(img, 2, 4)
    assert out[0, :, 0].tolist() == [1, 3, 6, 8]


def test_fixedpoint_resize_vertical_split_taps():
    # 2 -> 4 rows: dy=0 has sy=-1, fy=0.75 — cv2 does NOT zero the y
    # edge; both taps clamp to row 0 with split coefficients
    # (512, 1536), whose separate >>16 truncations reproduce row 0
    # only because 10*2048 is shift-exact; dy=1 blends rows 0 and 1
    # with (1536, 512) -> 70
    img = (np.array([[10], [250]], np.uint8)[:, :, None]
           * np.ones((1, 3, 1), np.uint8))
    out = V.fixedpoint_resize_u8(img, 4, 3)
    assert out[:, 0, 0].tolist() == [10, 70, 190, 250]


def test_fixedpoint_resize_2x_area_quirk():
    # cv::resize silently switches INTER_LINEAR to the INTER_AREA
    # fast path on an exact 2x2 downscale: (a+b+c+d+2)>>2
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (8, 12, 3)).astype(np.uint8)
    out = V.fixedpoint_resize_u8(img, 4, 6)
    a = img.astype(np.int64)
    want = ((a[0::2, 0::2] + a[0::2, 1::2]
             + a[1::2, 0::2] + a[1::2, 1::2] + 2) >> 2)
    assert np.array_equal(out, want.astype(np.uint8))


def test_fixedpoint_resize_x_edge_single_tap():
    # upscale: dx=0 has sx<0 -> cv2 zeroes the x tap (full weight on
    # column 0), so the left edge reproduces column 0 exactly
    img = (np.array([[7, 200, 40]], np.uint8)[:, :, None]
           * np.ones((3, 1, 1), np.uint8))
    out = V.fixedpoint_resize_u8(img, 3, 9)
    assert out[0, 0, 0] == 7 and out[0, 8, 0] == 40


def test_fixedpoint_resize_coeff_rounding_half_even():
    # cvRound rounds half to even: both 1.5 and 2.5 quantize to 2
    s, a0, a1 = V._resize_coeffs_fixed(4096, 4096, zero_edges=True)
    assert (a0 + a1 == 2048).all()
    assert np.rint(np.float32(1.5)) == 2.0
    assert np.rint(np.float32(2.5)) == 2.0


def test_fixedpoint_resize_degenerate_sizes():
    # single-column source: both taps clamp to column 0 at full
    # weight; single-pixel output averages nothing out of range
    img = (np.array([[5], [9]], np.uint8)[:, :, None]
           * np.ones((1, 1, 3), np.uint8))
    out = V.fixedpoint_resize_u8(img, 4, 3)
    assert out.shape == (4, 3, 3)
    assert (out[0] == 5).all() and (out[3] == 9).all()
    one = V.fixedpoint_resize_u8(img, 1, 1)
    assert one.shape == (1, 1, 3)
    # grayscale (2-D) round-trips without a channel axis
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert V.fixedpoint_resize_u8(g, 3, 4).shape == (3, 4)


def test_fixedpoint_resize_within_one_of_float_form():
    # the fixed-point kernel is the float bilinear quantized to 11-bit
    # taps: on smooth data every pixel lands within 1 grey level
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
    fp = V.fixedpoint_resize_u8(img, 37, 61).astype(np.float64)
    fl = V.bilinear_resize(img, 37, 61)
    assert float(np.abs(fp - fl).max()) <= 1.0


# ---------------------------------------------------------------------------
# detection postprocessing


def test_order_points_clockwise_scrambled():
    quad = np.array([[10.0, 2.0], [1.0, 2.0], [1.0, 8.0], [10.0, 8.0]])
    out = V.order_points_clockwise(quad)
    assert out.tolist() == [[1.0, 2.0], [10.0, 2.0], [10.0, 8.0],
                            [1.0, 8.0]]


def test_filter_tag_det_res_clip_and_drop():
    big = np.array([[5.0, 5.0], [500.0, 5.0], [500.0, 40.0],
                    [5.0, 40.0]], dtype="float32")
    tiny = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 2.0], [0.0, 2.0]],
                    dtype="float32")
    kept = V.filter_tag_det_res([big, tiny], (48, 64))
    assert len(kept) == 1
    assert kept[0][1].tolist() == [63.0, 5.0]   # clipped to width-1


def _ref_sorted_boxes(dt_boxes):
    """Transcription of OCR.sorted_boxes (ocr.py:600-617)."""
    num_boxes = len(dt_boxes)
    sb = sorted(dt_boxes, key=lambda x: (x[0][1], x[0][0]))
    _boxes = list(sb)
    for i in range(num_boxes - 1):
        for j in range(i, -1, -1):
            if abs(_boxes[j + 1][0][1] - _boxes[j][0][1]) < 10 and \
                    (_boxes[j + 1][0][0] < _boxes[j][0][0]):
                _boxes[j], _boxes[j + 1] = _boxes[j + 1], _boxes[j]
            else:
                break
    return _boxes


def test_sorted_boxes_matches_reference_random():
    rng = np.random.RandomState(17)
    for _ in range(25):
        n = rng.randint(1, 12)
        boxes = [np.array([[rng.randint(0, 80), rng.randint(0, 60)],
                           [0, 0], [0, 0], [0, 0]], dtype=float)
                 for _ in range(n)]
        got = [b[0].tolist() for b in V.sorted_boxes(boxes)]
        want = [b[0].tolist() for b in _ref_sorted_boxes(boxes)]
        assert got == want


def test_crop_geometry_and_rotation():
    sq = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 20.0], [0.0, 20.0]])
    w, h, rot = V.crop_geometry(sq)
    assert (w, h) == (10, 20) and rot          # 20/10 >= 1.5
    wide = np.array([[0.0, 0.0], [30.0, 0.0], [30.0, 20.0],
                     [0.0, 20.0]])
    assert V.crop_geometry(wide)[2] is False


def test_perspective_matrix_maps_corners():
    src = np.array([[2.0, 3.0], [12.0, 4.0], [13.0, 14.0], [1.0, 12.0]])
    dst = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    m = V.perspective_matrix(src, dst)
    for s, d in zip(src, dst):
        v = m @ np.array([s[0], s[1], 1.0])
        assert abs(v[0] / v[2] - d[0]) < 1e-9
        assert abs(v[1] / v[2] - d[1]) < 1e-9


def test_warp_crop_axis_aligned_is_slice():
    img = ((np.arange(40)[None, :, None]
            + 5 * np.arange(30)[:, None, None]
            + 7 * np.arange(3)[None, None, :]) % 251).astype(np.uint8)
    pts = np.array([[5.0, 3.0], [15.0, 3.0], [15.0, 9.0], [5.0, 9.0]])
    out = V.warp_crop(img, pts)
    assert out.shape[:2] == (6, 10)
    # integer-phase warp on 8-bit data reproduces the slice exactly
    # (the saturated (0,0) weight tile's off-diagonal +1 cannot carry
    # across the >>15 for uint8 ranges — warpkernel module doc)
    assert (out == img[3:9, 5:15]).all()


def test_warp_crop_rotates_tall():
    img = np.ones((40, 40, 3), dtype=np.uint8)
    pts = np.array([[5.0, 3.0], [9.0, 3.0], [9.0, 23.0], [5.0, 23.0]])
    out = V.warp_crop(img, pts)
    assert out.shape[:2] == (4, 20)            # rot90 of (20, 4)
    assert (out == 1).all()


# ---------------------------------------------------------------------------
# recognition preprocessing


def test_rec_batch_ratios_reference_fold():
    widths = [100, 30, 300, 50] + [60] * 20
    heights = [20, 20, 20, 20] + [20] * 20
    out = V.rec_batch_ratios(widths, heights, batch_num=16)
    # sorted ratios: 1.5, 2.5, 3.0x20, 5.0, 15.0 -> batch 0 = first 16
    # (max ratio max(320/48, 3.0)=6.6667), batch 1 = rest (max 15.0)
    assert out[1][0] == 0 and abs(out[1][1] - 320 / 48) < 1e-12
    assert out[2] == (1, 15.0)                  # w=300 lands in batch 1
    assert out[0][0] in (0, 1)
    n_b0 = sum(1 for b, _ in out if b == 0)
    assert n_b0 == 16


def test_rec_batch_order_stable_on_ties():
    order = V.rec_batch_order([40, 20, 40], [20, 10, 20])
    assert order.tolist() == [0, 1, 2]          # all ratio 2.0: by index


def test_rec_resized_w_cap_and_ceil():
    # content ceil(48 * w/h) below the canvas
    assert V.rec_resized_w(16, 24, 320 / 48) == (72, 320)
    # capped at the canvas
    assert V.rec_resized_w(10, 200, 320 / 48) == (320, 320)
    # model-pinned width wins
    assert V.rec_resized_w(16, 24, 10.0, model_w=480) == (72, 480)


def test_rec_resize_norm_padding_and_range():
    img = np.full((16, 24, 3), 255, np.uint8)
    out = V.rec_resize_norm(img, 320 / 48)
    assert out.shape == (3, 48, 320)
    assert abs(float(out[0, 0, 0]) - 1.0) < 1e-6   # 255 -> +1
    assert float(np.abs(out[:, :, 72:]).max()) == 0.0  # zero padding


# ---------------------------------------------------------------------------
# CTC decode


def test_ctc_charset_layout():
    cs = V.ctc_charset(list("ab"), use_space_char=True)
    assert cs == ["blank", "a", "b", " "]


def test_ctc_decode_collapse_then_blank():
    cs = V.ctc_charset(list("ab"), use_space_char=False)
    # indices: a a blank a b b -> collapse consecutive dups FIRST
    # (a blank a b), THEN drop blanks -> "aab"
    preds = np.zeros((1, 6, 3))
    for t, idx in enumerate([1, 1, 0, 1, 2, 2]):
        preds[0, t, idx] = 0.9 - 0.1 * t
    [(text, conf)] = V.ctc_decode(preds, cs)
    assert text == "aab"
    # selected steps are t=0 (a), t=3 (a), t=4 (b)
    assert abs(conf - np.mean([0.9, 0.6, 0.5])) < 1e-12


def test_ctc_decode_empty_selection_conf_zero():
    preds = np.zeros((1, 4, 3))
    preds[0, :, 0] = 1.0                        # all blank
    [(text, conf)] = V.ctc_decode(preds, V.ctc_charset(list("ab")))
    assert text == "" and conf == 0.0


def test_ctc_decode_leading_blank_then_repeat():
    cs = V.ctc_charset(list("ab"), use_space_char=False)
    # blank a | a  a -> dedup keeps t0,t1,(not t2),(not t3) ... blank
    # dropped -> "a"
    preds = np.zeros((1, 4, 3))
    for t, idx in enumerate([0, 1, 1, 1]):
        preds[0, t, idx] = 1.0
    [(text, conf)] = V.ctc_decode(preds, cs)
    assert text == "a" and conf == 1.0


def test_drop_low_score():
    assert V.drop_low_score([("hi", 0.9), ("lo", 0.4)]) == ["hi", ""]


# ---------------------------------------------------------------------------
# nms


def _ref_nms(bboxes, scores, iou_thresh):
    """Transcription of operators.py:702-725."""
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


def test_nms_matches_reference_random():
    rng = np.random.RandomState(5)
    for _ in range(20):
        n = rng.randint(1, 15)
        xy = rng.randint(0, 100, (n, 2)).astype(float)
        wh = rng.randint(5, 60, (n, 2)).astype(float)
        boxes = np.hstack([xy, xy + wh])
        scores = rng.rand(n)
        assert V.nms(boxes, scores, 0.4) == _ref_nms(boxes, scores, 0.4)


# ---------------------------------------------------------------------------
# layout-model preprocessing


def test_layout_scale_modes():
    # keep_ratio False (the live layout config): per-axis to 800x608
    sy, sx = V.layout_scale(400, 304)
    assert (sy, sx) == (2.0, 2.0)
    # keep_ratio True: min-side fit (608/100), capped by the max side
    # overflowing -> t_max/im_max = 800/1000
    sy, sx = V.layout_scale(100, 1000, (800, 608), keep_ratio=True)
    assert sy == sx == 800.0 / 1000


def test_cubic_resize_identity_and_constant():
    img = ((np.arange(30)[None, :, None]
            + 5 * np.arange(20)[:, None, None]
            + np.arange(3)) % 251).astype(np.uint8)
    assert (V.fixedpoint_resize_cubic_u8(img, 20, 30) == img).all()
    c = np.full((17, 23, 3), 137, np.uint8)
    for oh, ow in ((34, 46), (8, 11), (50, 9)):
        assert (V.fixedpoint_resize_cubic_u8(c, oh, ow) == 137).all()


def test_cubic_resize_tracks_ramp():
    """INTER_CUBIC reproduces a linear ramp within one level both
    directions (negative lobes cancel on linear data)."""
    img = (np.arange(100, dtype=np.uint8)[None, :]
           * np.ones((40, 1), np.uint8))
    out = V.fixedpoint_resize_cubic_u8(img, 40, 50)
    xs = (np.arange(50) + 0.5) * 2 - 0.5
    assert np.abs(out[20].astype(float)
                  - np.clip(xs, 0, 99)).max() <= 1
    up = V.fixedpoint_resize_cubic_u8(img[:, :25], 40, 100)
    xs2 = (np.arange(100) + 0.5) * 0.25 - 0.5
    assert np.abs(up[20].astype(float)
                  - np.clip(xs2, 0, 24)).max() <= 1


def test_cubic_resize_no_edge_pinning():
    """The cubic invoker does NOT pin edge phases (resize.cpp guards
    the fx=0/sx=0 branch with interpolation != INTER_CUBIC): on an
    upscale the first destination column's tap base is -1 with a
    fractional phase, and the clamped taps still produce the corner
    value on constant data."""
    s, coeffs = V._resize_cubic_coeffs(10, 40)   # scale 0.25
    assert s[0] == -1                            # f0 = -0.375 floor
    assert coeffs[1][0] != 2048                  # phase NOT zeroed
    assert sum(int(c[0]) for c in coeffs) in (2047, 2048, 2049)


def test_layout_preprocess_shape_and_pad():
    img = np.full((100, 76, 3), 255, np.uint8)
    out, info = V.layout_preprocess(img)
    # resized to exactly (800, 608): both multiples of 32, no pad room
    assert out.shape == (3, 800, 608)
    assert info["im_shape"].tolist() == [800.0, 608.0]
    # standardized white pixel, channel 0
    want = (np.float32(255) * np.float32(1 / 255.0)
            - np.float32(V.DET_MEAN[0])) / np.float32(V.DET_STD[0])
    assert abs(float(out[0, 0, 0]) - float(want)) < 1e-5


def test_layout_preprocess_pads_to_stride():
    img = np.zeros((50, 30, 3), np.uint8)
    out, info = V.layout_preprocess(img, target_size=(50, 30))
    # identity resize (50, 30) -> padded up to (64, 32)
    assert out.shape == (3, 64, 32)
    assert float(np.abs(out[:, 50:, :]).max()) == 0.0


def test_det_resize_rejects_unknown_limit_type():
    with pytest.raises(ValueError, match="not support limit type"):
        V.det_resize_shape(40, 60, limit_type="bogus")


def test_det_preprocess_convenience_matches_parts():
    img = (np.arange(40 * 60 * 3) % 251).astype(np.uint8).reshape(
        40, 60, 3)
    out, shape = V.det_preprocess(img)
    assert out.shape == (3, 32, 64)
    assert list(shape) == [40.0, 60.0, 0.8, pytest.approx(64 / 60)]


def test_filter_tag_det_res_accepts_list_boxes():
    out = V.filter_tag_det_res([[[0, 0], [30, 0], [30, 10], [0, 10]]],
                             (40, 60, 3))
    assert out.shape == (1, 4, 2)


def test_layout_preprocess_zero_stride_passthrough():
    img = (np.arange(40 * 60 * 3) % 251).astype(np.uint8).reshape(
        40, 60, 3)
    im2, info = V.layout_preprocess(img, stride=0)
    assert im2.shape[0] == 3
