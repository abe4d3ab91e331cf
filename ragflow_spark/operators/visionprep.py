"""OCR pre/post-processing as distributed operators — the Spark face
of ``extractlib.visionops`` (the deterministic rule layer of
/root/reference/deepdoc/vision/{ocr,operators,postprocess}.py; the
ONNX det/rec inference and DBPostProcess bitmap tracing are the model
seams, exactly like the layout/TSR recognizers).

Scale shape: every operator is map-only over the page/crop rows —
pixels are synthesized (stub codec) or decoded INSIDE the Arrow batch
and never cross an exchange; outputs are small typed rows.  The one
shuffle is the per-page ``applyInPandas`` group where the reference's
logic is sequential per page: recognition batching (ocr.py:351-377
forms batches from ONE page's crops), the sorted_boxes bubble, the
CTC step fold — grouping by page is also what keeps those folds
deterministic under any partitioning.

Synthetic inputs mirror the multimodal stub convention
(operators/multimodal.py): page sizes, crop boxes, and model scores
are closed-form functions of doc_id so the DuckDB twins can recompute
every output value; the pipeline itself treats them as opaque inputs,
and production swaps the decoders/models behind the same signatures.
The oracles pin elementwise bilinear samples (bit-exact double
expression trees on both sides) plus all size/ratio/order arithmetic;
full-tensor float32 parity is pinned by pytest goldens
(tests/test_visionops.py) where aggregation order cannot drift.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ragflow_spark.extractlib import visionops as V


def build_ocr_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic page-image metadata from documents: width
    64+doc_id%128, height 48+doc_id%96 (hits the h%32==16 banker's
    rounding edge), pixels pixel(y,x,c) = (doc_id*29 + 17c) % 48 + x —
    linear in x and constant in y, so bilinear resampling has a closed
    form the oracle can recompute."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    # the test parquet is one file -> one input split; det_prep is
    # map-only (no shuffle to fan it out), so spread the pages across
    # the executors here (same precedent as corpus.gen.build_pages)
    docs = docs.repartition(spark.sparkContext.defaultParallelism,
                            "doc_id")
    return docs.select(
        "doc_id",
        (F.lit(64) + F.col("doc_id") % 128).cast("int").alias("width"),
        (F.lit(48) + F.col("doc_id") % 96).cast("int").alias("height"))


def _stub_page(seed: int, width: int, height: int) -> np.ndarray:
    base = np.array([(seed * 29 + 17 * c) % 48 for c in range(3)],
                    dtype=np.uint8)
    x = np.arange(width, dtype=np.uint8)[None, :, None]
    return (base[None, None, :] + x) * np.ones((height, 1, 1),
                                               dtype=np.uint8)


def det_prep(pages: DataFrame, limit_side_len: int = 960,
             limit_type: str = "max") -> DataFrame:
    """TextDetector preprocessing per page (ocr.py:400-423,487 chain):
    DetResizeForTest size arithmetic + resample, then NormalizeImage /
    ToCHWImage.  Emits the shape record [src_h, src_w, ratio_h,
    ratio_w], three resampled-pixel probes (row 0; left / middle /
    right columns on channels 0/1/2), and the middle probe pushed
    through the normalization formula in double."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "src_h", "src_w",
                                   "resize_h", "resize_w", "ratio_h",
                                   "ratio_w", "px_left", "px_mid",
                                   "px_right", "norm_mid")}
            for did, w, h in zip(pdf["doc_id"], pdf["width"],
                                 pdf["height"]):
                img = _stub_page(int(did), int(w), int(h))
                resized, shape = V.det_resize(img, limit_side_len,
                                              limit_type)
                rh, rw = resized.shape[:2]
                px_l = float(resized[0, 0, 0])
                px_m = float(resized[0, rw // 2, 1])
                px_r = float(resized[0, rw - 1, 2])
                out["doc_id"].append(int(did))
                out["src_h"].append(int(shape[0]))
                out["src_w"].append(int(shape[1]))
                out["resize_h"].append(rh)
                out["resize_w"].append(rw)
                # float columns are NOT rounded: the twin transcribes
                # the identical IEEE-double expression tree, so raw
                # bits match and the checker's own rounding is applied
                # to equal values (Python banker's round here vs
                # DuckDB's half-away would instead mismatch on dyadic
                # ties)
                out["ratio_h"].append(float(shape[2]))
                out["ratio_w"].append(float(shape[3]))
                out["px_left"].append(px_l)
                out["px_mid"].append(px_m)
                out["px_right"].append(px_r)
                # NormalizeImage's channel-1 formula in double
                # (float32 tensor parity is golden-pinned in pytest)
                out["norm_mid"].append(
                    (px_m * (1.0 / 255.0) - 0.456) / 0.224)
            yield pd.DataFrame(out)

    return pages.mapInPandas(
        gen, schema=("doc_id long, src_h int, src_w int, resize_h int, "
                     "resize_w int, ratio_h double, ratio_w double, "
                     "px_left double, px_mid double, px_right double, "
                     "norm_mid double"))


def build_det_boxes(pages: DataFrame) -> DataFrame:
    """Synthetic DB-seam output: per page, 3 bands x 2 boxes of
    axis-aligned clockwise quads.  Band b sits at y = 5 + 20b with its
    two boxes 5px apart vertically (inside sorted_boxes' 10px band;
    bands >= 10px apart so the bubble never crosses bands); x and
    sizes are closed-form, widths 2-43 exercise the <=3 filter and
    x+bw / y+bh overrun small pages to exercise clipping."""
    bands = pages.select(
        "doc_id", "width", "height",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("b"))
    two = bands.select(
        "doc_id", "width", "height", "b",
        F.explode(F.sequence(F.lit(0), F.lit(1))).alias("i"))
    did, b, i = F.col("doc_id"), F.col("b"), F.col("i")
    x0 = (5 + ((did * (5 + i * 2) + b * (3 + i * 4)) % 40)) \
        .cast("double")
    y0 = (5 + b * 20 + i * 5).cast("double")
    bw = (2 + ((did + b * 7 + i * 13) % 42)).cast("double")
    bh = (6 + ((did * 2 + b * 5 + i * 3) % 30)).cast("double")
    return two.select(
        "doc_id", (b * 2 + i).cast("int").alias("box_j"),
        x0.alias("x0"), y0.alias("y0"), bw.alias("bw"),
        bh.alias("bh"), "width", "height")


def ocr_boxes(pages: DataFrame) -> DataFrame:
    """Detection postprocessing + reading order + crop geometry:
    filter_tag_det_res (orient, clip, drop <=3px sides, ocr.py:477-491)
    -> sorted_boxes (ocr.py:600-617) -> get_rotate_crop_image's target
    frame (ocr.py:561-594).  One applyInPandas group per page — the
    bubble pass is sequential within a page by construction."""
    boxes = build_det_boxes(pages)

    def per_page(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("box_j")
        w = int(pdf["width"].iloc[0])
        h = int(pdf["height"].iloc[0])
        quads = []
        for x0, y0, bw, bh in zip(pdf["x0"], pdf["y0"], pdf["bw"],
                                  pdf["bh"]):
            quads.append(np.array(
                [[x0, y0], [x0 + bw, y0], [x0 + bw, y0 + bh],
                 [x0, y0 + bh]], dtype="float32"))
        kept = V.filter_tag_det_res(quads, (h, w))
        ordered = V.sorted_boxes(kept)
        rows = {"doc_id": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int32"),
                "x0": pd.Series([], dtype="float64"),
                "y0": pd.Series([], dtype="float64"),
                "x2": pd.Series([], dtype="float64"),
                "y2": pd.Series([], dtype="float64"),
                "crop_w": pd.Series([], dtype="int32"),
                "crop_h": pd.Series([], dtype="int32"),
                "rotated": pd.Series([], dtype="bool")}
        if not len(ordered):
            return pd.DataFrame(rows)
        recs = []
        for r, box in enumerate(ordered):
            cw, ch, rot = V.crop_geometry(box)
            recs.append((int(pdf["doc_id"].iloc[0]), r + 1,
                         float(box[0][0]), float(box[0][1]),
                         float(box[2][0]), float(box[2][1]),
                         cw, ch, bool(rot)))
        return pd.DataFrame(recs, columns=list(rows))

    return boxes.groupBy("doc_id").applyInPandas(
        per_page,
        schema=("doc_id long, rank int, x0 double, y0 double, "
                "x2 double, y2 double, crop_w int, crop_h int, "
                "rotated boolean"))


def build_rec_crops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic text-line crops: 3 + doc_id%20 per page (so some
    pages span multiple 16-crop recognition batches), sizes closed-form
    in (doc_id, crop j); widths capped at 207 so the stub gradient
    stays inside uint8."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    crops = docs.select(
        "doc_id",
        F.explode(F.sequence(
            F.lit(0), (F.col("doc_id") % 20 + 2).cast("int")))
        .alias("j"))
    did, j = F.col("doc_id"), F.col("j")
    return crops.select(
        "doc_id", j.cast("int").alias("j"),
        (16 + ((did + j * 7) % 32)).cast("int").alias("crop_h"),
        (24 + ((did * 3 + j * 11) % 184)).cast("int").alias("crop_w"))


def rec_prep(crops: DataFrame) -> DataFrame:
    """TextRecognizer batching + resize_norm_img width arithmetic per
    page (ocr.py:141-165,351-377): stable aspect-ratio sort, 16-crop
    batches sharing max_wh_ratio (floored by 320/48), content width
    ceil(48*w/h) capped at the int(48*ratio) canvas.  Emits per crop
    the batch assignment, widths, two resampled-pixel probes on the
    (48, resized_w) grid, and the left probe through the /255 -0.5
    /0.5 normalization in double."""
    def per_page(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("j").reset_index(drop=True)
        widths = [int(x) for x in pdf["crop_w"]]
        heights = [int(x) for x in pdf["crop_h"]]
        ratios = V.rec_batch_ratios(widths, heights)
        rows = []
        did = int(pdf["doc_id"].iloc[0])
        for i, (bno, mratio) in enumerate(ratios):
            img = _stub_page(did + int(pdf["j"][i]) * 101,
                             widths[i], heights[i])
            resized_w, canvas_w = V.rec_resized_w(
                heights[i], widths[i], mratio)
            resized = V.fixedpoint_resize_u8(img, 48, resized_w)
            px_l = float(resized[0, 0, 0])
            px_r = float(resized[0, resized_w - 1, 2])
            # raw doubles (no rounding): twin-side expression trees
            # are bit-identical, see det_prep
            rows.append((did, int(pdf["j"][i]), int(bno),
                         float(mratio), resized_w, canvas_w,
                         px_l, px_r, (px_l / 255 - 0.5) / 0.5))
        return pd.DataFrame(rows, columns=[
            "doc_id", "j", "batch_no", "max_wh_ratio", "resized_w",
            "canvas_w", "px_left", "px_right", "norm_left"])

    return crops.groupBy("doc_id").applyInPandas(
        per_page,
        schema=("doc_id long, j int, batch_no int, max_wh_ratio double, "
                "resized_w int, canvas_w int, px_left double, "
                "px_right double, norm_left double"))


CTC_CHARS = list("abcde")


def build_rec_preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic recognition-head output (the ONNX seam): per doc a
    (T, 7)-step score matrix, T = 6 + doc_id%6, score(t, c) =
    ((doc_id*7 + t*3 + c*5) % 11) / 10; docs with doc_id%13 == 0 emit
    pure-blank frames (the empty-selection path)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    steps = docs.select(
        "doc_id",
        F.explode(F.sequence(
            F.lit(0), (F.col("doc_id") % 6 + 5).cast("int")))
        .alias("t"))
    did, t = F.col("doc_id"), F.col("t")
    scores = F.array(*[
        F.when(did % 13 == 0,
               F.lit(1.0) if c == 0 else F.lit(0.0))
        .otherwise(((did * 7 + t * 3 + F.lit(c) * 5) % 11)
                   .cast("double") / 10.0)
        for c in range(7)])
    return steps.select("doc_id", t.cast("int").alias("t"),
                        scores.alias("scores"))


def ctc_texts(preds: DataFrame,
              drop_score: float = V.DROP_SCORE) -> DataFrame:
    """CTCLabelDecode + the drop_score gate (postprocess.py:311-363,
    ocr.py:651-661) over per-doc step rows.  One applyInPandas group
    per doc — the duplicate collapse is sequential in t."""
    charset = V.ctc_charset(CTC_CHARS, use_space_char=True)

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        mat = np.array([list(s) for s in pdf["scores"]],
                       dtype=np.float64)[None, :, :]
        (text, conf), = V.ctc_decode(mat, charset)
        kept, = V.drop_low_score([(text, conf)], drop_score)
        return pd.DataFrame({
            "doc_id": [int(pdf["doc_id"].iloc[0])],
            "text": [text], "conf": [round(conf, 6)],
            "kept_text": [kept]})

    return preds.groupBy("doc_id").applyInPandas(
        per_doc,
        schema="doc_id long, text string, conf double, kept_text string")


def build_nms_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic proposal boxes for nms: per doc two overlapping pairs
    plus one isolated singleton, scores distinct by construction."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    boxes = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("j"))
    did, j = F.col("doc_id"), F.col("j")
    pair = (j / 2).cast("int")            # 0,0,1,1,2
    off = (j % 2).cast("int")             # overlap shift inside a pair
    x1 = (pair * 200 + off * 4 + (did % 7)).cast("double")
    y1 = (pair * 200 + off * 3).cast("double")
    return boxes.select(
        "doc_id", j.cast("int").alias("j"),
        x1.alias("x1"), y1.alias("y1"),
        (x1 + 40).alias("x2"), (y1 + 30).alias("y2"),
        (((did * (j + 3)) % 97).cast("double")
         + j.cast("double") / 100.0).alias("score"))


def nms_keep(boxes: DataFrame, iou_thresh: float = 0.3) -> DataFrame:
    """operators.py:702-725 greedy suppression per doc (the layout
    Recognizer's proposal filter), one group per doc."""
    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("j").reset_index(drop=True)
        bb = pdf[["x1", "y1", "x2", "y2"]].to_numpy(dtype=np.float64)
        sc = pdf["score"].to_numpy(dtype=np.float64)
        keep = V.nms(bb, sc, iou_thresh)
        return pd.DataFrame({
            "doc_id": [int(pdf["doc_id"].iloc[0])] * len(keep),
            "j": [int(pdf["j"][i]) for i in keep],
            "keep_rank": list(range(1, len(keep) + 1))})

    return boxes.groupBy("doc_id").applyInPandas(
        per_doc, schema="doc_id long, j int, keep_rank int")


def build_crop_quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic crop quads over the build_ocr_pages stub pages, three
    per page, all with exact-integer corners (the det pipeline emits
    int32 corners) chosen so the closed-form homography twin covers
    every warp regime:

    * j=0 axis-aligned rect — integer translate (every fixed-point
      phase is 0, the saturated (0,0) table tile), at the page corner
      when doc_id%3==0 so the BORDER_REPLICATE tap clamp fires, tall
      enough at some sizes to flip the rot90 ratio;
    * j=1 parallelogram (affine warp, g=h=0) — dense fractional
      phases through the quantized cubic tables;
    * j=2 true perspective quad (one corner pushed out, g,h != 0) —
      the per-pixel 32/W division path.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    docs = docs.repartition(spark.sparkContext.defaultParallelism,
                            "doc_id")
    return docs.select(
        "doc_id",
        (F.lit(64) + F.col("doc_id") % 128).cast("int").alias("width"),
        (F.lit(48) + F.col("doc_id") % 96).cast("int").alias("height"),
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("j"))


def _crop_quad(d: int, j: int) -> np.ndarray:
    """The integer corner quad for (doc_id, j) — mirrored verbatim by
    the ocr_crops DuckDB twin."""
    if j == 0:
        x0 = 0 if d % 3 == 0 else 2 + d % 5
        y0 = 0 if d % 3 == 0 else 3 + d % 7
        bw = 8 + d % 12
        bh = 6 + d % 25
        return np.array([[x0, y0], [x0 + bw, y0],
                         [x0 + bw, y0 + bh], [x0, y0 + bh]],
                        dtype=np.float64)
    if j == 1:
        px, py = 6 + d % 7, 5 + d % 5
        wdx, wdy = 9 + d % 9, 1 + d % 3
        hdx, hdy = 1 + d % 2, 7 + d % 6
        return np.array([[px, py], [px + wdx, py + wdy],
                         [px + wdx + hdx, py + wdy + hdy],
                         [px + hdx, py + hdy]], dtype=np.float64)
    px, py = 4 + d % 6, 4 + d % 4
    bw, bh = 10 + d % 10, 8 + d % 8
    ex, ey = 1 + d % 3, 1 + d % 2
    return np.array([[px, py], [px + bw, py],
                     [px + bw + ex, py + bh + ey], [px, py + bh]],
                    dtype=np.float64)


def ocr_crops(quads: DataFrame) -> DataFrame:
    """get_rotate_crop_image (ocr.py:561-594) as the OWNED fixed-point
    warp: crop frame geometry (target size from opposing edge norms,
    the rot90 ratio), cv's own matrix chain (getPerspectiveTransform's
    8x8 LU solve + warpPerspective's 3x3 cofactor invert), and
    cv2.warpPerspective's INTER_CUBIC remap kernel
    (extractlib.warpkernel) over the stub gradient pages.  Emits one
    row per (page, quad, probe): probe p samples the UNROTATED warp at
    dst (0,0) / (ch//2, cw//2) / (ch-1, cw-1) on channel p — the
    DuckDB twin recomputes each probe through the entire double +
    fixed-point expression tree (coordinates, quantized weight tiles
    with the saturation correction, replicate-clamped taps,
    FixedPtCast).  Map-only: pixels are synthesized inside the Arrow
    batch and never cross an exchange."""
    from ragflow_spark.extractlib import warpkernel as WK

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "j", "probe", "cw", "ch", "rotated", "val"]
        for pdf in it:
            recs = []
            for did, w, h, j in zip(pdf["doc_id"], pdf["width"],
                                    pdf["height"], pdf["j"]):
                did, w, h, j = int(did), int(w), int(h), int(j)
                img = _stub_page(did, w, h)
                pts = _crop_quad(did, j)
                cw, ch, rot = V.crop_geometry(pts)
                minv = WK.quad_to_rect_inverse_cv(pts, cw, ch)
                out = WK.warp_perspective_u8(img, minv, cw, ch,
                                             "cubic")
                probes = ((0, 0), (ch // 2, cw // 2),
                          (ch - 1, cw - 1))
                for p, (py, px) in enumerate(probes):
                    recs.append((did, j, p, cw, ch, bool(rot),
                                 int(out[py, px, p])))
            yield pd.DataFrame(recs, columns=cols)

    return quads.mapInPandas(
        batches,
        schema=("doc_id long, j int, probe int, cw int, ch int, "
                "rotated boolean, val long"))


def layout_prep(pages: DataFrame,
                target_size=(96, 64)) -> DataFrame:
    """The layout Recognizer's LinearResize resample
    (recognizer.py:283-298, operators.py:197-235 with the pinned
    config interp=2 / keep_ratio=False): per-axis scale factors,
    cvRound output size, and cv2.resize INTER_CUBIC's fixed-point
    kernel (visionops.fixedpoint_resize_cubic_u8) over the stub
    gradient pages.  Emits three resized-pixel probes per page
    (corner / middle / far corner on channels 0/1/2) — the twin
    recomputes each through the whole float32 coefficient chain and
    integer tap sums.  The standardize/pad tail of layout_preprocess
    is float tensor work pinned by pytest.  Map-only."""
    th, tw = target_size

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "probe", "out_h", "out_w", "val"]
        for pdf in it:
            recs = []
            for did, w, h in zip(pdf["doc_id"], pdf["width"],
                                 pdf["height"]):
                did, w, h = int(did), int(w), int(h)
                img = _stub_page(did, w, h)
                sy, sx = V.layout_scale(h, w, (th, tw))
                oh = int(round(h * sy))
                ow = int(round(w * sx))
                out = V.fixedpoint_resize_cubic_u8(img, oh, ow)
                probes = ((0, 0), (oh // 2, ow // 2),
                          (oh - 1, ow - 1))
                for p, (py, px) in enumerate(probes):
                    recs.append((did, p, oh, ow,
                                 int(out[py, px, p])))
            yield pd.DataFrame(recs, columns=cols)

    return pages.mapInPandas(
        gen, schema="doc_id long, probe int, out_h int, out_w int, "
                    "val long")


def build_fill_quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic ROTATED quads for the fillPoly rasterizer: two
    45-degree diamonds per page (integer vertices (cx±r, cy),
    (cx, cy±r) — the min-area rect of diagonal text), interior by
    construction, over a per-pixel dyadic probability map
    pred(x, y) = ((x + 3y) % 8) / 16."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    docs = docs.repartition(spark.sparkContext.defaultParallelism,
                            "doc_id")
    d = F.col("doc_id")
    two = docs.select(
        "doc_id",
        (F.lit(40) + d % 40).cast("int").alias("width"),
        (F.lit(32) + d % 24).cast("int").alias("height"),
        F.explode(F.array(F.lit(0), F.lit(1))).alias("j"))
    j = F.col("j")
    return two.select(
        "doc_id", "j", "width", "height",
        (2 + (d + j * 5) % 5).cast("int").alias("r"),
        (8 + (d * 3 + j * 11) % (F.col("width") - 16)).cast("int")
        .alias("cx"),
        (8 + (d * 5 + j * 3) % (F.col("height") - 16)).cast("int")
        .alias("cy"))


def ocr_fill_scores(quads: DataFrame) -> DataFrame:
    """box_score_fast over ROTATED quads (postprocess.py:194-210 with
    cv2.fillPoly's fixed-point corner rules, owned in
    extractlib.cvfill): per diamond the rasterized mask pixel count
    and the 16-scaled probability sum — both exact integers (the
    dyadic map keeps every float32 partial sum exact), so the oracle
    recomputes them from the closed-form diamond pixel set
    |x-cx| + |y-cy| <= r that the rasterizer provably produces for
    unit-slope quads (boundary Bresenham diagonals coincide with the
    scanline span ends; pytest pins this shape).  Map-only."""
    from ragflow_spark.extractlib import dbpost as DB

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "j", "r", "cx", "cy", "cnt", "ssum16"]
        for pdf in it:
            recs = []
            for did, w, h, j, r, cx, cy in zip(
                    pdf["doc_id"], pdf["width"], pdf["height"],
                    pdf["j"], pdf["r"], pdf["cx"], pdf["cy"]):
                w, h, r, cx, cy = (int(w), int(h), int(r), int(cx),
                                   int(cy))
                xs = np.arange(w)[None, :]
                ys = np.arange(h)[:, None]
                pred = (((xs + 3 * ys) % 8) / 16.0).astype(np.float32)
                quad = np.array([[cx, cy - r], [cx + r, cy],
                                 [cx, cy + r], [cx - r, cy]],
                                dtype=np.float64)
                mask, window = DB.box_mask_window(pred, quad)
                sel = mask > 0
                cnt = int(sel.sum())
                ssum16 = int(round(float(window[sel].sum()) * 16))
                recs.append((int(did), int(j), r, cx, cy, cnt,
                             ssum16))
            yield pd.DataFrame(recs, columns=cols)

    return quads.mapInPandas(
        batches,
        schema=("doc_id long, j int, r int, cx int, cy int, "
                "cnt long, ssum16 long"))


def build_det_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic det probability-map metadata: page W = 80+doc_id%80,
    H = 60+doc_id%48; three axis-aligned text regions per page in
    separate horizontal thirds (>=6 rows apart, >=2px from every
    edge), each with a dyadic constant probability p = m/128 so the
    bitmap-walk scores are bit-exact across engines (dbpost module
    doc).  Region r: x0 = 3+(doc_id*5+r*11)%20, y0 = (H//3)*r+2,
    rw = 2+(doc_id+r*13)%30 (rw<=3 exercises the min-side gate),
    rh = 4+(doc_id*3+r*7)%12, m = 45+((doc_id*7+r*31)%77) (m<64
    exercises the score gate)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    # map-only chain: fan the single-split parquet across executors
    docs = docs.repartition(spark.sparkContext.defaultParallelism,
                            "doc_id")
    return docs.select(
        "doc_id",
        (F.lit(80) + F.col("doc_id") % 80).cast("int").alias("width"),
        (F.lit(60) + F.col("doc_id") % 48).cast("int").alias("height"))


def _det_map(doc_id: int, w: int, h: int) -> np.ndarray:
    pred = np.zeros((h, w), dtype=np.float32)
    band = h // 3
    for r in range(3):
        x0 = 3 + (doc_id * 5 + r * 11) % 20
        y0 = band * r + 2
        rw = 2 + (doc_id + r * 13) % 30
        rh = 4 + (doc_id * 3 + r * 7) % 12
        p = (45 + ((doc_id * 7 + r * 31) % 77)) / 128.0
        pred[y0:y0 + rh, x0:x0 + rw] = p
    return pred


def ocr_quads(pages: DataFrame) -> DataFrame:
    """DBPostProcess quad extraction over the det maps — the full
    bitmap walk (binarize, Suzuki-Abe border following, min-area
    rect, fast score, Clipper round-join unclip, second rect, scale
    to the source frame) from extractlib.dbpost; reference
    deepdoc/vision/postprocess.py:115-167,233-261 with the det config
    of ocr.py:420-421.  Map-only over pages: the probability map is
    synthesized inside the Arrow batch (stub model seam — production
    swaps the ONNX det head behind the same signature) and never
    crosses an exchange; output rows are 8 int corners + a score.

    The source frame is (2*width, height): the x-ratio-2 path
    exercises the scale arithmetic with exact doubles, and offset
    boxes overrunning the map exercise both clip sides."""
    from ragflow_spark.extractlib import dbpost as DB

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "x0", "y0", "x1", "y1", "x2", "y2",
                "x3", "y3", "score"]
        for pdf in it:
            recs = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["width"],
                                    pdf["height"]):
                pred = _det_map(int(doc_id), int(w), int(h))
                boxes, scores = DB.db_postprocess(
                    pred, src_h=int(h), src_w=2 * int(w))
                for b, s in zip(boxes, scores):
                    recs.append((int(doc_id),
                                 int(b[0][0]), int(b[0][1]),
                                 int(b[1][0]), int(b[1][1]),
                                 int(b[2][0]), int(b[2][1]),
                                 int(b[3][0]), int(b[3][1]),
                                 float(s)))
            if recs:
                yield pd.DataFrame(recs, columns=cols)
            else:
                yield pd.DataFrame(
                    {c: pd.Series([], dtype="float64" if c == "score"
                                  else "int64") for c in cols})

    return pages.mapInPandas(
        batches,
        schema=("doc_id long, x0 long, y0 long, x1 long, y1 long, "
                "x2 long, y2 long, x3 long, y3 long, score double"))
