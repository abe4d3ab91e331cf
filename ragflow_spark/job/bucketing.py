"""Bucketed output tables: shuffle-free downstream joins.

At 100 TB the expensive join is extracted ⋈ chunks (or either ⋈ a
later enrichment pass) on ``url``. Writing both sides bucketed on the
join key means Spark records the bucketing in the table metadata and a
later sort-merge join needs NO Exchange on either side — the shuffle
was paid once at write time and amortizes over every downstream join.
(Iceberg's ``bucket(N, url)`` partition transform is the same contract
on a real deployment; the managed-table form keeps the sandbox
dependency-free.)

``tests/test_bucketing.py`` asserts the no-Exchange property on the
actual physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, n_buckets: int = 16,
                   key: str = "url") -> None:
    """Persist as a managed table bucketed (and sorted) by the join key."""
    (df.write.mode("overwrite")
       .bucketBy(n_buckets, key)
       .sortBy(key)
       .format("parquet")
       .saveAsTable(table))


def colocated_join(spark: SparkSession, left_table: str,
                   right_table: str, key: str = "url") -> DataFrame:
    """Join two tables bucketed on the same key — plan contains no
    Exchange when bucket counts match."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)
