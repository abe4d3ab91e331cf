"""Structured Streaming wrapper: incremental == batch, resume from
checkpoint picks up only new files."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    from ragflow_spark.corpus.gen import build_pages

    d = tmp_path_factory.mktemp("stream_in")
    build_pages(spark, SF).write.parquet(str(d / "batch1"))
    return d


def _collect(spark, path):
    return sorted((r.url, r.extracted_text) for r in
                  spark.read.parquet(path)
                  .select("url", "extracted_text").collect())


def test_stream_matches_batch(spark, pages_dir, tmp_path):
    from ragflow_spark.job.extract import extract_pages
    from ragflow_spark.job.stream import stream_extract

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_extract(spark, str(pages_dir / "batch1"), out, ckpt)
    q.awaitTermination(300)

    batch = sorted(
        (r.url, r.extracted_text) for r in
        extract_pages(spark.read.parquet(str(pages_dir / "batch1")))
        .select("url", "extracted_text").collect())
    assert _collect(spark, out) == batch


def test_stream_resume_processes_only_new_files(spark, tmp_path):
    from ragflow_spark.corpus.gen import build_pages
    from ragflow_spark.job.stream import stream_extract

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = build_pages(spark, SF).cache()
    half1 = pages.where("url like '%/doc/1%'")
    half2 = pages.where("url not like '%/doc/1%'")

    half1.write.parquet(str(src / "f1"))
    q = stream_extract(spark, f"{src}/*", out, ckpt)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out).count()
    assert n1 == half1.count()

    half2.write.parquet(str(src / "f2"))
    q = stream_extract(spark, f"{src}/*", out, ckpt)
    q.awaitTermination(300)
    total = spark.read.parquet(out).count()
    assert total == pages.count()
