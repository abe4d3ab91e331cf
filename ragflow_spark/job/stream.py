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
