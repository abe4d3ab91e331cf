"""spark-submit entry point: resumable batch extraction over a pages table.

Usage (cluster):

    python tools/make_pyfiles.py          # -> dist/pipeline.zip
    spark-submit --py-files dist/pipeline.zip \\
        ragflow_spark/job/run_extract.py \\
        --input  /data/pages              # parquet/iceberg dir, input_hint schema
        --output /data/out                # writes extracted/ chunks/ _checkpoint/
        --template naive --buckets 64 --waves 8

Execution shape per wave (SURVEY.md §4.2):

    Scan(pages) --filter bucket IN wave--> [salted Repartition]
      -> MapInPandas(extract) -> write extracted/ (partitioned by bucket,
                                 dynamic partition overwrite = idempotent)
      -> MapInPandas(chunk)   -> write chunks/   (same)
      -> read-back agg        -> append lineage rows (commit point)

Resume: completed (digest, bucket) pairs are loaded from the lineage
table and filtered out of the scan — no recompute, byte-identical final
tables (tests/test_checkpoint_resume.py proves both).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ragflow_spark.job import checkpoint as ck
from ragflow_spark.job.extract import chunk_pages, extract_pages
from ragflow_spark.job.salting import salted_repartition


def _wave_groups(buckets: list[int], waves: int) -> list[list[int]]:
    waves = max(1, min(waves, len(buckets)))
    return [buckets[i::waves] for i in range(waves)]


def _write_partitioned(df: DataFrame, path: str) -> None:
    (df.write.mode("overwrite")
       .option("partitionOverwriteMode", "dynamic")
       .partitionBy("bucket")
       .parquet(path))


def run_job(spark: SparkSession, input_path: str, output_dir: str,
            template: str = "naive", n_buckets: int = 64, waves: int = 8,
            resume: bool = True, salt_buckets: int = 8,
            repartition: int | None = None, run_id: str | None = None,
            fail_after_wave: int | None = None,
            index: bool = False, kb_id: str = "kb",
            input_format: str = "parquet",
            index_clock: float | None = None) -> dict:
    """Run the extraction job; returns a summary dict.

    ``fail_after_wave`` injects a crash after the k-th wave commits
    (test hook for the resume guarantee).
    """
    run_id = run_id or f"run-{int(time.time() * 1000):x}"
    # one job-level index timestamp (injectable): a per-wave wall
    # clock would re-stamp replayed buckets on resume, leaving one
    # output dir mixing create_time values across waves/retries
    if index_clock is None:
        index_clock = time.time()
    index_create_time = time.strftime("%Y-%m-%d %H:%M:%S",
                                      time.localtime(index_clock))
    digest = ck.config_digest(template, {"n_buckets": n_buckets})
    ckpt_path = f"{output_dir}/_checkpoint"
    extracted_path = f"{output_dir}/extracted"
    chunks_path = f"{output_dir}/chunks"

    done = ck.load_done_buckets(spark, ckpt_path, digest) if resume else set()
    todo = [b for b in range(n_buckets) if b not in done]
    summary = {"run_id": run_id, "digest": digest,
               "buckets_done_prior": len(done), "buckets_run": len(todo),
               "waves": 0, "n_docs": 0, "n_chunks": 0}
    if not todo:
        return summary

    # input_format="iceberg" reads a catalog table name instead of a
    # parquet dir — same scan contract (url/html column pruning and
    # bucket pruning push down through either source); the sandbox has
    # no Iceberg runtime, so tests exercise the parquet path and the
    # cluster flips the flag
    pages = spark.read.format(input_format).load(input_path)
    pages = pages.withColumn("bucket", ck.bucket_col("url", n_buckets))

    for wave_idx, wave in enumerate(_wave_groups(todo, waves)):
        t0 = time.perf_counter()
        sub = pages.where(F.col("bucket").isin(wave))
        if repartition:
            sub = salted_repartition(sub, num_partitions=repartition,
                                     salt_buckets=salt_buckets)
        # bucket is re-derived from url on the output side (cheaper than
        # threading a passthrough column through the Arrow UDF)
        extracted = extract_pages(sub).withColumn(
            "bucket", ck.bucket_col("url", n_buckets))
        _write_partitioned(extracted, extracted_path)
        chunks = chunk_pages(sub, template).withColumn(
            "bucket", ck.bucket_col("url", n_buckets))
        _write_partitioned(chunks, chunks_path)
        if index:
            # search-store rows (build_chunks field assembly,
            # rag/svr/task_executor.py:256-293) from the committed
            # chunk files; embedding is a model seam the cluster job
            # adds via indexing.embed_chunks(encode=<pandas UDF>)
            from ragflow_spark.operators.indexing import index_rows
            crows = spark.read.parquet(chunks_path).where(
                F.col("bucket").isin(wave))
            idx = index_rows(
                crows.select(
                    F.col("url").alias("doc_id"),
                    F.col("chunk_text").alias("content_with_weight"),
                    F.lit(None).cast("binary").alias("image"),
                    "chunk_seq", "bucket"),
                kb_id,
                create_time=index_create_time,
                create_timestamp=index_clock)
            _write_partitioned(idx, f"{output_dir}/index")
        wall_ms = int((time.perf_counter() - t0) * 1000)

        # metrics from the committed files (exact, no extra lineage cache)
        edf = spark.read.parquet(extracted_path).where(
            F.col("bucket").isin(wave))
        cdf = spark.read.parquet(chunks_path).where(
            F.col("bucket").isin(wave))
        emet = {r["bucket"]: r for r in
                edf.groupBy("bucket").agg(
                    F.count("*").alias("n_docs"),
                    F.sum(F.octet_length("extracted_text"))
                    .alias("n_bytes")).collect()}
        cmet = {r["bucket"]: r["n_chunks"] for r in
                cdf.groupBy("bucket").agg(
                    F.count("*").alias("n_chunks")).collect()}
        rows = []
        for b in wave:
            em = emet.get(b)
            rows.append({
                "run_id": run_id, "digest": digest, "bucket": b,
                "n_docs": em["n_docs"] if em else 0,
                "n_chunks": int(cmet.get(b, 0)),
                "n_bytes": em["n_bytes"] if em else 0,
                "wall_ms": wall_ms, "wave": wave_idx, "status": "ok",
            })
        ck.append_lineage(spark, ckpt_path, rows)
        summary["waves"] += 1
        summary["n_docs"] += sum(r["n_docs"] for r in rows)
        summary["n_chunks"] += sum(r["n_chunks"] for r in rows)

        if fail_after_wave is not None and wave_idx >= fail_after_wave:
            raise RuntimeError(
                f"injected failure after wave {wave_idx} ({run_id})")
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--template", default="naive",
                    choices=["naive", "book", "one", "paper", "laws"])
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--waves", type=int, default=8)
    ap.add_argument("--salt-buckets", type=int, default=8)
    ap.add_argument("--repartition", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--index", action="store_true",
                    help="also write search-store rows to index/")
    ap.add_argument("--kb-id", default="kb")
    ap.add_argument("--input-format", default="parquet",
                    choices=["parquet", "iceberg"],
                    help="iceberg: --input is a catalog table name")
    args = ap.parse_args()

    from ragflow_spark.job.session import get_spark
    spark = get_spark(app="deepdoc-extract")
    summary = run_job(
        spark, args.input, args.output, template=args.template,
        n_buckets=args.buckets, waves=args.waves,
        resume=not args.no_resume, salt_buckets=args.salt_buckets,
        repartition=args.repartition, index=args.index,
        kb_id=args.kb_id, input_format=args.input_format,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
