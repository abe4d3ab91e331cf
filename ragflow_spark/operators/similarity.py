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


def train_centroids(embeddings: DataFrame, n_centroids: int = 8,
                    sample_cap: int = 4096, iters: int = 10):
    """Deterministic spherical k-means over a bounded sample — the
    standard IVF coarse-quantizer training step. The sample is the
    first ``sample_cap`` vectors by vec_id (TakeOrderedAndProject: no
    full shuffle, bounded driver memory — centroid training is the ONE
    deliberately driver-side step of the index build; assignment and
    search stay distributed). No RNG anywhere: init is the first C
    sample vectors, iteration count is fixed, ties break by centroid
    index — the index is reproducible run to run."""
    import numpy as np

    rows = (_as_double(embeddings).select("vec_id", "v")
            .orderBy("vec_id").limit(sample_cap).collect())
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = X[:n_centroids].copy()
    for _ in range(iters):
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True),
                           1e-12)
        assign = (X @ C.T).argmax(axis=1)
        for j in range(n_centroids):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True),
                          1e-12)


def _assign_clusters(df: DataFrame, cents, in_col: str,
                     id_col: str) -> DataFrame:
    """(id, v) -> (id, v, cluster) via numpy argmax over the broadcast
    centroid matrix (Arrow batches; centroids ride the UDF closure)."""
    import numpy as np
    import pandas as pd

    C = cents

    def gen(it):
        for pdf in it:
            if not len(pdf):
                yield pdf.assign(cluster=pd.Series(dtype="int32"))
                continue
            X = np.array(list(pdf[in_col]), dtype=np.float64)
            Xn = X / np.maximum(
                np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            pdf = pdf.copy()
            pdf["cluster"] = (Xn @ C.T).argmax(axis=1).astype("int32")
            yield pdf

    schema = f"{id_col} long, {in_col} array<double>, cluster int"
    return df.select(id_col, in_col).mapInPandas(gen, schema=schema)


def ann_topk_ivf(embeddings: DataFrame, n_queries: int = 10, k: int = 5,
                 n_centroids: int = 8,
                 n_probe: int | None = None) -> DataFrame:
    """IVF cosine top-k: the 100-TB tier of ``ann_topk``.

    Index: every vector is assigned to its nearest spherical-k-means
    centroid (the inverted file; at scale this is the partitioning /
    clustering key of the index table, so a probe reads only its
    clusters' files). Search: each query ranks the centroids and scans
    only its ``n_probe`` nearest clusters — the cluster join carries a
    broadcast (qid, cluster) probe list, the per-pair scoring and
    pre-shuffle local top-k are identical to the brute-force operator.

    ``n_probe=None`` probes every cluster: exact search through the IVF
    machinery, byte-identical to ``ann_topk`` (that is the driver
    oracle); smaller ``n_probe`` trades recall for a 1/C scan fraction
    (recall bound exercised in pytest)."""
    import numpy as np

    if n_probe is None:
        n_probe = n_centroids
    cents = train_centroids(embeddings, n_centroids)

    base = _assign_clusters(_as_double(embeddings), cents, "v",
                            "vec_id").withColumn(
        "nrm", F.expr(_NORM.format(a="v")))
    q = _as_double(embeddings).select(
        F.col("vec_id").alias("qid"), "v").where(
        F.col("qid") < n_queries)

    # per query: its n_probe nearest centroids (small: Q rows in, Q x
    # n_probe rows out — computed driver-side on the collected query
    # set, which ann_topk broadcasts anyway)
    qrows = q.collect()
    Q = np.array([r["v"] for r in qrows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-(Qn @ cents.T), axis=1)[:, :n_probe]
    spark = embeddings.sparkSession
    probes = spark.createDataFrame(
        [(int(r["qid"]), [int(c) for c in order[i]], r["v"])
         for i, r in enumerate(qrows)],
        schema="qid long, clusters array<int>, qv array<double>",
    ).select("qid", "qv", F.explode("clusters").alias("cluster")) \
     .withColumn("qn", F.expr(_NORM.format(a="qv")))

    dot = F.expr(_DOT.format(a="qv", b="v"))
    scored = (
        base.join(F.broadcast(probes), "cluster")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id",
                (dot / (F.col("qn") * F.col("nrm"))).alias("score"))
    )

    def local_topk(it):
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
