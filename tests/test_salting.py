"""Salted repartition: deterministic, and actually defeats host skew."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _partition_sizes(df):
    return [r["cnt"] for r in
            df.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("cnt")).collect()]


def test_salting_spreads_hot_host(spark):
    from ragflow_spark.corpus.gen import build_pages
    from ragflow_spark.job.salting import salted_repartition, url_host

    pages = build_pages(spark, SF).cache()
    pages.count()
    n_parts = 8

    # plain host partitioning: host0 (~20% of rows) lands on ONE partition
    by_host = pages.repartition(n_parts, url_host())
    # salted: host0 fans out over salt_buckets partitions
    salted = salted_repartition(pages, num_partitions=n_parts,
                                salt_buckets=8)

    host0 = pages.where(url_host() == "host0.example.com")
    host0_parts_plain = (
        by_host.where(url_host() == "host0.example.com")
        .select(F.spark_partition_id().alias("p")).distinct().count())
    host0_parts_salted = (
        salted.where(url_host() == "host0.example.com")
        .select(F.spark_partition_id().alias("p")).distinct().count())
    assert host0.count() > 0
    assert host0_parts_plain == 1
    assert host0_parts_salted > 1

    # max/mean partition-size ratio improves under salting
    plain_sizes = _partition_sizes(by_host)
    salted_sizes = _partition_sizes(salted)
    skew = lambda s: max(s) / (sum(s) / len(s))
    assert skew(salted_sizes) < skew(plain_sizes)


def test_salting_deterministic_across_runs(spark):
    from ragflow_spark.corpus.gen import build_pages
    from ragflow_spark.job.salting import salted_repartition

    pages = build_pages(spark, SF).cache()
    a = salted_repartition(pages, num_partitions=8)
    b = salted_repartition(pages, num_partitions=8)
    pa = {r.url: r.p for r in a.select(
        "url", F.spark_partition_id().alias("p")).collect()}
    pb = {r.url: r.p for r in b.select(
        "url", F.spark_partition_id().alias("p")).collect()}
    assert pa == pb
