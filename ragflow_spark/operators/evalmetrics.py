"""Retrieval-quality evaluation: the metric layer of the reference's
benchmark harness (rag/benchmark.py:247,254,278 — ``evaluate(Qrels(qrels),
Run(run), ["ndcg@10", "map@5", "mrr@10"])``).  The reference delegates to
the ranx library, which is not vendored here; these aggregations
implement the published trec_eval definitions ranx follows:

- ``ndcg@k`` — Jarvelin-form nDCG (ranx's default ``ndcg``):
  DCG@k = sum_{i<=k} rel_i / log2(i + 1) over the score-ranked run,
  normalized by the ideal DCG of the query's relevance-sorted qrels.
- ``map@k`` — average precision with the run truncated at k but the
  denominator the query's TOTAL relevant count (trec_eval convention):
  AP@k = sum_{hit i<=k} P@i / R.  R counts rel > 0 judgments only; if
  ranx's denominator also counts explicitly-judged zeros (its source is
  not vendored to check), that is a documented divergence — the
  reference's MS MARCO qrels carry is_selected=0 rows.
- ``mrr@k`` — reciprocal rank of the first relevant hit within k, 0 if
  none.

Queries are the qrels key set (ranx iterates qrels; a query with no run
rows scores 0 on all three).  Determinism adaptation (documented): ranx
ranks by numpy argsort on -score with unspecified tie order; here ties
break by ascending doc id, making the rank — and therefore every metric
at a tie boundary — reproducible across partitions and engines.

Scale shape: one narrow shuffle keyed on (qid) for the window rank over
(qid, doc_id, score) rows — candidates per query are already top-N
bounded upstream — then per-qid folds; the ideal-DCG side aggregates
qrels the same way.  No text columns cross an exchange and nothing is
collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def retrieval_metrics(run: DataFrame, qrels: DataFrame,
                      k_ndcg: int = 10, k_map: int = 5,
                      k_mrr: int = 10) -> DataFrame:
    """Per-query (qid, ndcg, ap, rr) at the reference harness's cutoffs.

    ``run``: (qid, doc_id, score) retrieval results, any order.
    ``qrels``: (qid, doc_id, rel) graded judgments; rel <= 0 rows are
    non-relevant (kept for rank positions, excluded from gains).
    """
    rel = qrels.select("qid", "doc_id",
                       F.col("rel").cast("double").alias("rel"))
    pos = rel.where(F.col("rel") > 0)

    ranked = run.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("qid")
            .orderBy(F.desc("score"), F.asc("doc_id"))))
    hits = ranked.join(pos, ["qid", "doc_id"], "inner")

    # DCG over judged hits within the ndcg window.
    dcg = hits.where(F.col("rank") <= k_ndcg).groupBy("qid").agg(
        F.sum(F.col("rel") / F.log2(F.col("rank") + 1)).alias("dcg"))

    # Ideal DCG: the query's own judgments, best-first.
    ideal = pos.withColumn(
        "irank",
        F.row_number().over(
            Window.partitionBy("qid")
            .orderBy(F.desc("rel"), F.asc("doc_id"))))
    idcg = ideal.where(F.col("irank") <= k_ndcg).groupBy("qid").agg(
        F.sum(F.col("rel") / F.log2(F.col("irank") + 1)).alias("idcg"))

    # Precision at each relevant hit: running hit count / rank, summed
    # within the map window, over the query's total relevant count.
    hit_no = hits.withColumn(
        "hit_no",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(F.asc("rank"))))
    ap_num = hit_no.where(F.col("rank") <= k_map).groupBy("qid").agg(
        F.sum(F.col("hit_no") / F.col("rank")).alias("ap_num"))
    n_rel = pos.groupBy("qid").agg(F.count("*").alias("n_rel"))

    first_hit = hits.where(F.col("rank") <= k_mrr).groupBy("qid").agg(
        F.min("rank").alias("first_rank"))

    # ranx scores every qrels query, including all-zero-judged ones.
    qids = rel.select("qid").distinct()
    return (qids.join(n_rel, "qid", "left")
            .join(idcg, "qid", "left")
            .join(dcg, "qid", "left")
            .join(ap_num, "qid", "left")
            .join(first_hit, "qid", "left")
            .select(
                "qid",
                F.round(F.coalesce(F.col("dcg") / F.col("idcg"),
                                   F.lit(0.0)), 9).alias("ndcg"),
                F.round(F.coalesce(F.col("ap_num") / F.col("n_rel"),
                                   F.lit(0.0)), 9).alias("ap"),
                F.round(F.coalesce(1.0 / F.col("first_rank"),
                                   F.lit(0.0)), 9).alias("rr")))
