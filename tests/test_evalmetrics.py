"""Retrieval-quality metrics (ndcg@10 / map@5 / mrr@10) pinned against
an independent pure-Python trec_eval-style computation, plus the edge
cases ranx's evaluate() would hit on the reference benchmark harness
(rag/benchmark.py:247): unranked queries, no-relevant queries, and the
documented doc-id tie-break.
"""

import math

import pytest

from ragflow_spark.job.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _ref_metrics(run, qrels, k_ndcg=10, k_map=5, k_mrr=10):
    """Independent fold: dict-based trec_eval formulas."""
    out = {}
    for qid, judged in qrels.items():
        ranked = sorted(run.get(qid, {}).items(),
                        key=lambda kv: (-kv[1], kv[0]))
        rels = [judged.get(d, 0) for d, _ in ranked]
        dcg = sum(r / math.log2(i + 2)
                  for i, r in enumerate(rels[:k_ndcg]) if r > 0)
        ideal = sorted((r for r in judged.values() if r > 0),
                       reverse=True)
        idcg = sum(r / math.log2(i + 2)
                   for i, r in enumerate(ideal[:k_ndcg]))
        n_rel = len(ideal)
        hits = 0
        ap = 0.0
        for i, r in enumerate(rels[:k_map]):
            if r > 0:
                hits += 1
                ap += hits / (i + 1)
        rr = 0.0
        for i, r in enumerate(rels[:k_mrr]):
            if r > 0:
                rr = 1.0 / (i + 1)
                break
        out[qid] = (dcg / idcg if idcg else 0.0,
                    ap / n_rel if n_rel else 0.0, rr)
    return out


def _spark_metrics(spark, run, qrels, **kw):
    from ragflow_spark.operators.evalmetrics import retrieval_metrics

    run_df = spark.createDataFrame(
        [(q, d, float(s)) for q, docs in run.items()
         for d, s in docs.items()],
        schema="qid string, doc_id string, score double")
    qrels_df = spark.createDataFrame(
        [(q, d, int(r)) for q, docs in qrels.items()
         for d, r in docs.items()],
        schema="qid string, doc_id string, rel int")
    return {r["qid"]: (r["ndcg"], r["ap"], r["rr"])
            for r in retrieval_metrics(run_df, qrels_df, **kw).collect()}


def test_matches_reference_fold(spark):
    run = {
        "q1": {"d1": 0.9, "d2": 0.8, "d3": 0.7, "d4": 0.6, "d5": 0.5,
               "d6": 0.4, "d7": 0.3},
        "q2": {"d1": 0.9, "d2": 0.2},
        "q3": {"d9": 1.0},
    }
    qrels = {
        "q1": {"d2": 2, "d5": 1, "d9": 3, "d1": 0},
        "q2": {"d2": 1},
        "q3": {"d1": 1},  # relevant doc never retrieved
    }
    got = _spark_metrics(spark, run, qrels)
    want = _ref_metrics(run, qrels)
    assert set(got) == set(want)
    for q in want:
        for g, w in zip(got[q], want[q]):
            assert g == pytest.approx(w, abs=1e-9), q


def test_query_missing_from_run_scores_zero(spark):
    got = _spark_metrics(spark, {"q1": {"d1": 1.0}},
                         {"q1": {"d1": 1}, "q9": {"d1": 1}})
    assert got["q9"] == (0.0, 0.0, 0.0)
    assert got["q1"] == (1.0, 1.0, 1.0)


def test_no_relevant_judgments_scores_zero(spark):
    got = _spark_metrics(spark, {"q1": {"d1": 1.0}},
                         {"q1": {"d1": 0, "d2": 0}})
    assert got["q1"] == (0.0, 0.0, 0.0)


def test_tie_breaks_by_doc_id(spark):
    # d1/d2 tie on score; d1 ranks first by id, and only d2 is
    # relevant, so rr = 1/2 — a quicksort tie the other way would give
    # 1.  The fold encodes the same rule, so both sides agree.
    run = {"q1": {"d1": 0.5, "d2": 0.5}}
    qrels = {"q1": {"d2": 1}}
    got = _spark_metrics(spark, run, qrels)
    assert got["q1"][2] == pytest.approx(0.5)


def test_cutoffs_truncate_run_not_denominator(spark):
    # 6 relevant docs ranked 1..6; map@5 counts five hits of precision
    # 1.0 but divides by R=6 (trec_eval), not by 5.
    run = {"q1": {f"d{i}": 1.0 - i / 10 for i in range(1, 7)}}
    qrels = {"q1": {f"d{i}": 1 for i in range(1, 7)}}
    got = _spark_metrics(spark, run, qrels)
    assert got["q1"][1] == pytest.approx(5 / 6)


def test_ndcg_window_applies_to_ideal_too(spark):
    # 12 graded docs: both DCG and IDCG stop at rank 10.
    run = {"q1": {f"d{i:02d}": 1.0 - i / 100 for i in range(1, 13)}}
    qrels = {"q1": {f"d{i:02d}": 1 for i in range(1, 13)}}
    got = _spark_metrics(spark, run, qrels)
    assert got["q1"][0] == pytest.approx(1.0)
