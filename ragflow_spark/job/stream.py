"""Incremental extraction via Structured Streaming.

The north rule's production job is pure batch (SURVEY §2.9), but a
crawl lands continuously — this wrapper runs the *same* mapInPandas
extraction incrementally over a directory of page files:

    readStream(parquet, input_hint schema)
      -> mapInPandas(extract)            # identical code path to batch
      -> writeStream(parquet, append) with checkpointLocation

``Trigger.AvailableNow`` drains everything present then stops, which is
the batch-equivalent execution mode (and what the test asserts against
the batch output byte-for-byte); dropping the trigger gives continuous
micro-batches with exactly-once file-sink semantics — the streaming
analog of the wave checkpoints in run_extract.py (source offsets + sink
commit log replace the lineage table).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ragflow_spark.corpus.gen import PAGES_SCHEMA
from ragflow_spark.job.extract import extract_pages


def stream_extract(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str,
                   available_now: bool = True) -> StreamingQuery:
    """Start (and with available_now=True, run to completion) the
    incremental extraction over parquet files in ``input_dir``."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    extracted = extract_pages(pages)
    writer = (
        extracted.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup(spark: SparkSession, input_dir: str, output_dir: str,
                 checkpoint_dir: str,
                 available_now: bool = True) -> StreamingQuery:
    """Streaming exact dedup: keep the first-seen copy of each document
    body across ALL micro-batches.

    ``dropDuplicates`` on a streaming DataFrame is stateful — the seen
    set persists in the state store under ``checkpointLocation``, so a
    document that arrived in an earlier micro-batch (or an earlier run
    of the same checkpoint) is dropped, not re-emitted. The state key
    is the 8-byte ``xxhash64(html)`` content fingerprint, never the
    payload — the same scale posture as batch ``exact_dup_groups``
    (state size = one long per distinct document). Without a watermark
    the state is unbounded, which is the correct semantic for global
    crawl dedup (the batch job's compaction runs bound it in
    production; a ``warc_ts`` watermark column is the documented knob
    when retention is acceptable)."""
    from pyspark.sql import functions as F

    from ragflow_spark.corpus.gen import PAGES_SCHEMA

    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    deduped = (
        pages.withColumn("content_key", F.xxhash64(F.col("html")))
        .dropDuplicates(["content_key"])
        .drop("content_key")
    )
    writer = (
        deduped.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
