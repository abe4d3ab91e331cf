"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, UDF
signatures, partition-invariant determinism — while the codec layer is a
deterministic stub: the sandbox ships no image/audio libraries, so
``decode_image`` synthesizes pixels from a seeded hash of the payload
(clearly marked; swap in PIL/libav behind the same seam in production).
The reference's analog is the ``picture``/``audio`` chunk templates,
which push bytes through OCR/ASR models (/root/reference/rag/app/
picture.py, audio.py) — model seams there, codec seams here.

Design for 100 TB: media payloads never leave the executor (all
operators are mapInPandas over the binary column; outputs are small
typed rows), frame sampling explodes *inside* the UDF so no shuffle
carries pixel data, and the Arrow batch row cap (session.py) bounds
per-batch memory for multi-MB payloads.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = ("url string, media_type string, payload binary, "
                "width int, height int, duration_ms int, codec string")

FEATURE_SCHEMA = ("url string, width int, height int, "
                  "mean_luma double, edge_density double")

FRAME_SCHEMA = ("url string, frame_idx int, ts_ms int, frame binary")


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB CODEC standing in for PIL.Image.open: a payload-seeded
    horizontal gradient, pixel(y, x, c) = (seed + 17c) % 48 + x (closed
    form, so the DuckDB oracle can recompute the downstream features —
    the pipeline itself treats the output as opaque pixels). Returns
    HxWx3 uint8; the seam is the function signature — production swaps
    the body, nothing else."""
    seed = (payload[0] | (payload[1] << 8)) if len(payload) >= 2 else 0
    base = np.array([(seed + 17 * c) % 48 for c in range(3)],
                    dtype=np.uint8)
    x = np.arange(width, dtype=np.uint8)[None, :, None]
    return (base[None, None, :] + x) * np.ones(
        (height, 1, 1), dtype=np.uint8)


def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media rows derived from documents:
    doc_id%3 selects image/audio/video; payload byte i is
    (doc_id*31 + i*7) % 256 — opaque to the pipeline (as real codec
    output would be) but closed-form for the DuckDB oracle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars")
    # one parquet file -> one input split, and every consumer here is
    # map-only (no shuffle to fan it out): spread the media rows
    # across executors at the source (build_pages precedent)
    docs = docs.repartition(spark.sparkContext.defaultParallelism,
                            "doc_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("url", "media_type", "payload",
                                    "width", "height", "duration_ms",
                                    "codec")}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                kind = ("image", "audio", "video")[int(doc_id) % 3]
                n = 64 + int(n_chars) % 64
                payload = ((int(doc_id) * 31
                            + np.arange(n, dtype=np.int64) * 7) % 256
                           ).astype(np.uint8).tobytes()
                rows["url"].append(
                    f"https://host{int(doc_id) % 50}.example.com/"
                    f"{kind}/{int(doc_id)}")
                rows["media_type"].append(kind)
                rows["payload"].append(payload)
                rows["width"].append(64 + int(doc_id) % 128
                                     if kind == "image" else 0)
                rows["height"].append(48 + int(doc_id) % 96
                                      if kind == "image" else 0)
                rows["duration_ms"].append(
                    0 if kind == "image" else 1000 + int(doc_id) % 9000)
                rows["codec"].append(
                    {"image": "fake-rgb", "audio": "fake-pcm",
                     "video": "fake-h26x"}[kind])
            yield pd.DataFrame(rows)

    return docs.mapInPandas(gen, schema=MEDIA_SCHEMA)


def image_features(media: DataFrame) -> DataFrame:
    """Per-image features via the stub decoder: mean luma + a simple
    gradient edge density. Only image rows are scanned (filter pushes
    into the parquet/Iceberg scan on media_type)."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("url", "width", "height", "mean_luma",
                                   "edge_density")}
            for url, payload, w, h in zip(pdf["url"], pdf["payload"],
                                          pdf["width"], pdf["height"]):
                img = decode_image(bytes(payload), int(w), int(h))
                luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                        + 0.114 * img[..., 2])
                gx = np.abs(np.diff(luma, axis=1)).mean()
                out["url"].append(url)
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["mean_luma"].append(round(float(luma.mean()), 6))
                out["edge_density"].append(round(float(gx), 6))
            yield pd.DataFrame(out)

    return (media.where(F.col("media_type") == "image")
            .select("url", "payload", "width", "height")
            .mapInPandas(gen, schema=FEATURE_SCHEMA))


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Sample frames from video rows at a fixed cadence. The explode
    happens inside the UDF (one input row -> duration/every_ms output
    rows) so frame bytes never shuffle."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("url", "frame_idx", "ts_ms", "frame")}
            for url, payload, dur in zip(pdf["url"], pdf["payload"],
                                         pdf["duration_ms"]):
                payload = bytes(payload)
                for idx, ts in enumerate(range(0, int(dur), every_ms)):
                    # STUB: a real decoder seeks; the fake slices the
                    # payload deterministically per timestamp
                    off = (ts * 7) % max(len(payload) - 16, 1)
                    out["url"].append(url)
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(ts)
                    out["frame"].append(payload[off:off + 16])
            yield pd.DataFrame(out)

    return (media.where(F.col("media_type") == "video")
            .select("url", "payload", "duration_ms")
            .mapInPandas(gen, schema=FRAME_SCHEMA))


def audio_features(media: DataFrame) -> DataFrame:
    """STUB feature extractor for audio rows: interprets the fake-pcm
    payload as int8 samples (deterministic; a real build decodes)."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"url": [], "duration_ms": [], "rms": [],
                   "zero_crossings": []}
            for url, payload, dur in zip(pdf["url"], pdf["payload"],
                                         pdf["duration_ms"]):
                samples = np.frombuffer(bytes(payload), dtype=np.int8
                                        ).astype(np.float64)
                out["url"].append(url)
                out["duration_ms"].append(int(dur))
                out["rms"].append(round(float(
                    np.sqrt((samples ** 2).mean())), 6))
                out["zero_crossings"].append(
                    int((np.diff(np.sign(samples)) != 0).sum()))
            yield pd.DataFrame(out)

    return (media.where(F.col("media_type") == "audio")
            .select("url", "payload", "duration_ms")
            .mapInPandas(gen, schema=("url string, duration_ms int, "
                                      "rms double, zero_crossings int")))
