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


def test_stream_dedup_state_survives_micro_batches(spark, tmp_path):
    """Duplicates landing in LATER micro-batches are dropped by the
    persistent state store, and a restarted query on the same
    checkpoint remembers everything already seen."""
    import pandas as pd

    from ragflow_spark.job.stream import stream_dedup

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            {"url": [u for u, _b in rows],
             "warc_ts": pd.Timestamp("2026-01-01"),
             "html": [b for _u, b in rows],
             "text": "", "lang": "en"})
        spark.createDataFrame(pdf).write.parquet(str(src / name))

    write_batch("b1", [("u1", b"<p>alpha</p>"), ("u2", b"<p>beta</p>")])
    write_batch("b2", [("u3", b"<p>alpha</p>"),   # dup of u1's body
                       ("u4", b"<p>gamma</p>")])
    q = stream_dedup(spark, str(src / "*"), out, ckpt)
    q.awaitTermination(300)
    got = {r["url"]: bytes(r["html"])
           for r in spark.read.parquet(out).collect()}
    bodies = sorted(got.values())
    assert bodies == [b"<p>alpha</p>", b"<p>beta</p>", b"<p>gamma</p>"]

    # restart on the same checkpoint: an old body in a new file stays
    # dropped, a new body flows through
    write_batch("b3", [("u5", b"<p>beta</p>"), ("u6", b"<p>delta</p>")])
    q2 = stream_dedup(spark, str(src / "*"), out, ckpt)
    q2.awaitTermination(300)
    got2 = sorted(bytes(r["html"])
                  for r in spark.read.parquet(out).collect())
    assert got2 == [b"<p>alpha</p>", b"<p>beta</p>", b"<p>delta</p>",
                    b"<p>gamma</p>"]
