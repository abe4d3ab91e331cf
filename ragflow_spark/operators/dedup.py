"""Deduplication operators for web-corpus curation.

Exact dedup is a hash group-by (map-side partial aggregation, one shuffle
on the hash key — the canonical scalable shape). Near-dup families
(MinHash-LSH, SimHash) follow in ``similarity.py`` / later rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_dup_groups(docs: DataFrame, col: str = "text") -> DataFrame:
    """Group identical texts: (text_hash, n_dups, keeper_doc_id).

    Shuffles on xxhash64(text) rather than the full text value, so the
    exchange carries 8-byte keys, not multi-KB documents — at 100 TB the
    difference is the job. Collision probability at 10^12 rows is ~3e-8
    (birthday bound), acceptable for dedup; use sha2 for exactness."""
    return (
        docs.groupBy(F.xxhash64(F.col(col)).alias("text_hash"))
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


def dedup_exact(docs: DataFrame, col: str = "text") -> DataFrame:
    """Keep one row per distinct text (the min doc_id): standard
    keeper-join formulation; broadcastable when the dup set is small."""
    keepers = (
        docs.groupBy(col).agg(F.min("doc_id").alias("doc_id"))
    )
    return docs.join(keepers, ["doc_id", col], "left_semi")
