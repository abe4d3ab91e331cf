"""Bucketed tables: the extracted ⋈ chunks join runs with no Exchange."""

import io
from contextlib import redirect_stdout

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    from ragflow_spark.corpus.gen import build_pages
    from ragflow_spark.job.bucketing import colocated_join, write_bucketed
    from ragflow_spark.job.extract import chunk_pages, extract_pages

    pages = build_pages(spark, SF).cache()
    write_bucketed(extract_pages(pages), "t_extracted", n_buckets=4)
    write_bucketed(chunk_pages(pages, "naive").drop("page_nums"),
                   "t_chunks", n_buckets=4)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "t_extracted", "t_chunks")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it actually computes
        n = joined.count()
        assert n == spark.table("t_chunks").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_extracted")
        spark.sql("DROP TABLE IF EXISTS t_chunks")
