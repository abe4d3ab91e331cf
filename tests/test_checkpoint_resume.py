"""Resume guarantee (north rule): kill mid-job, restart, no recompute of
completed buckets, byte-identical final tables (SURVEY.md §5.2 item 4)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
N_BUCKETS = 16
WAVES = 4


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    from ragflow_spark.corpus.gen import build_pages

    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    build_pages(spark, SF).write.parquet(path)
    return path


def _collect_extracted(spark, out_dir):
    return sorted(
        (r.url, r.extracted_text)
        for r in spark.read.parquet(f"{out_dir}/extracted")
        .select("url", "extracted_text").collect()
    )


def test_config_digest_stability():
    from ragflow_spark.job.checkpoint import config_digest

    assert config_digest("naive", {"a": 1, "b": 2}) == \
        config_digest("naive", {"b": 2, "a": 1})
    assert config_digest("naive") != config_digest("book")


def test_crash_resume_no_recompute_byte_identical(spark, pages_path,
                                                  tmp_path):
    from ragflow_spark.job.run_extract import run_job

    out_crash = str(tmp_path / "out_crash")
    out_clean = str(tmp_path / "out_clean")

    # reference run: single shot, no failure
    run_job(spark, pages_path, out_clean, n_buckets=N_BUCKETS, waves=WAVES)

    # crashing run: waves 0 and 1 commit, then the job dies
    with pytest.raises(RuntimeError, match="injected failure"):
        run_job(spark, pages_path, out_crash, n_buckets=N_BUCKETS,
                waves=WAVES, run_id="run1", fail_after_wave=1)

    lineage1 = spark.read.parquet(f"{out_crash}/_checkpoint")
    done1 = {r.bucket for r in lineage1.select("bucket").collect()}
    assert 0 < len(done1) < N_BUCKETS

    # restart: only the remaining buckets run
    summary = run_job(spark, pages_path, out_crash, n_buckets=N_BUCKETS,
                      waves=WAVES, run_id="run2")
    assert summary["buckets_done_prior"] == len(done1)
    assert summary["buckets_run"] == N_BUCKETS - len(done1)

    lineage = spark.read.parquet(f"{out_crash}/_checkpoint")
    # no bucket recomputed: exactly one lineage row per bucket
    per_bucket = dict(
        lineage.groupBy("bucket").count().collect()
    )
    assert set(per_bucket) == set(range(N_BUCKETS))
    assert all(c == 1 for c in per_bucket.values())
    # run1's buckets were NOT re-extracted by run2
    run2_buckets = {r.bucket for r in
                    lineage.where(F.col("run_id") == "run2").collect()}
    assert run2_buckets.isdisjoint(done1)

    # final tables byte-identical to the clean single-shot run
    assert _collect_extracted(spark, out_crash) == \
        _collect_extracted(spark, out_clean)
    n_chunks_crash = spark.read.parquet(f"{out_crash}/chunks").count()
    n_chunks_clean = spark.read.parquet(f"{out_clean}/chunks").count()
    assert n_chunks_crash == n_chunks_clean


def test_rerun_after_completion_is_noop(spark, pages_path, tmp_path):
    from ragflow_spark.job.run_extract import run_job

    out = str(tmp_path / "out")
    run_job(spark, pages_path, out, n_buckets=N_BUCKETS, waves=WAVES)
    summary = run_job(spark, pages_path, out, n_buckets=N_BUCKETS,
                      waves=WAVES)
    assert summary["buckets_run"] == 0
    assert summary["waves"] == 0


def test_digest_change_recomputes(spark, pages_path, tmp_path):
    from ragflow_spark.job.run_extract import run_job

    out = str(tmp_path / "out")
    run_job(spark, pages_path, out, template="naive",
            n_buckets=N_BUCKETS, waves=2)
    summary = run_job(spark, pages_path, out, template="book",
                      n_buckets=N_BUCKETS, waves=2)
    # different template -> different digest -> full recompute
    assert summary["buckets_run"] == N_BUCKETS


def test_lineage_metrics_cover_all_docs(spark, pages_path, tmp_path):
    from ragflow_spark.job.checkpoint import lineage_summary
    from ragflow_spark.job.run_extract import run_job

    out = str(tmp_path / "out")
    run_job(spark, pages_path, out, n_buckets=N_BUCKETS, waves=WAVES,
            repartition=8)
    n_pages = spark.read.parquet(pages_path).count()
    summ = lineage_summary(spark, f"{out}/_checkpoint").collect()
    assert len(summ) == 1 and summ[0].status == "ok"
    assert summ[0].n_docs == n_pages
    assert summ[0].n_bytes > 0 and summ[0].n_chunks > 0


def test_index_stage_rows(spark, pages_path, tmp_path):
    """--index writes search-store rows whose ids are the reference
    xxh64(content + doc_id) over the committed chunk files."""
    from ragflow_spark.extractlib.xxh64 import xxh64_hexdigest
    from ragflow_spark.job.run_extract import run_job

    out = str(tmp_path / "out_idx")
    run_job(spark, pages_path, out,
            n_buckets=4, waves=2, index=True, kb_id="kb9")
    idx = spark.read.parquet(f"{out}/index")
    rows = idx.collect()
    assert rows
    chunks = {(r["url"], r["chunk_seq"]): r["chunk_text"]
              for r in spark.read.parquet(f"{out}/chunks").collect()}
    assert len(rows) == len(chunks)
    for r in rows[:20]:
        text = chunks[(r["doc_id"], r["chunk_seq"])]
        assert r["content_with_weight"] == text
        assert r["id"] == xxh64_hexdigest(
            (text + r["doc_id"]).encode("utf-8"))
        assert r["kb_id"] == "kb9" and r["img_id"] == ""
