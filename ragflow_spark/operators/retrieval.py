"""Keyword retrieval over extracted documents/chunks — the Spark-native
re-expression of the reference's query/search stack
(rag/nlp/query.py FulltextQueryer + rag/nlp/search.py Dealer.search).

The reference compiles a question into an Elasticsearch match
expression: rmWWW strip -> tokenize -> Dealer term weights as boosts.
Spark-first, the same semantics become a relational plan: the weighted
query-term list (tiny) BROADCASTS, the corpus explodes once into
(doc, term, tf) postings, and score(q, d) = sum_t w_t * tf(t, d) — the
boost-weighted term match — aggregates map-side before a top-k
reduction identical to ann_topk's. No inverted index service: the
postings ARE the index, rebuilt or persisted as a bucketed table at
scale (the ES cluster's role). Vector fusion (search.py's hybrid
0.05/0.95 blend) composes downstream with ann_topk over the same ids —
seam documented, keyword scorer is what ships here.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def query_terms(queries: DataFrame) -> DataFrame:
    """(qid, question) -> (qid, term, weight): rmWWW -> split ->
    Dealer.weights (query.py:81-91 english branch shape; the per-term
    cleanup regexes there strip quoting for the ES DSL and are
    DSL-bound, not semantic — terms here are already bare)."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ragflow_spark.extractlib.termweight import (TermWeightDealer,
                                                         rm_www)

        dealer = TermWeightDealer()
        for pdf in it:
            qids, terms, weights = [], [], []
            for qid, question in zip(pdf["qid"], pdf["question"]):
                txt = rm_www(question)
                for t, w in dealer.weights(dealer.split(txt)):
                    qids.append(qid)
                    terms.append(t)
                    weights.append(w)
            yield pd.DataFrame({"qid": qids, "term": terms,
                                "weight": weights})

    return queries.mapInPandas(gen,
                               schema="qid long, term string, "
                                      "weight double")


def doc_postings(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, text) -> (id, term, tf) postings over huqie tokens (the
    content_ltks surface the reference indexes into ES)."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        from ragflow_spark.extractlib.huqie import tokenize

        for pdf in it:
            ids, terms, tfs = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for t, n in Counter(tokenize(text).split()).items():
                    ids.append(did)
                    terms.append(t)
                    tfs.append(n)
            yield pd.DataFrame({id_col: ids, "term": terms, "tf": tfs})

    return docs.select(id_col, text_col).mapInPandas(
        gen, schema=f"{id_col} long, term string, tf int")


def keyword_search(docs: DataFrame, queries: DataFrame,
                   k: int = 5) -> DataFrame:
    """(qid, rank, doc_id, score): boost-weighted term-match top-k.

    Plan: postings (map-only) JOIN broadcast(query terms) -> partial-agg
    score per (qid, doc) -> Arrow local top-k -> tiny merge. The corpus
    never shuffles full documents; the exchange carries scored id pairs.
    """
    terms = query_terms(queries)
    post = doc_postings(docs)
    # ranking happens on the 6-decimal score: float summation order
    # inside the partial agg is engine/partition dependent at the last
    # ulp, and ranking must be reproducible across engines and runs
    scored = (
        post.join(F.broadcast(terms), "term")
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum(F.col("weight") * F.col("tf")),
                     6).alias("score"))
    )

    def local_topk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield (pdf.sort_values(["qid", "score", "doc_id"],
                                   ascending=[True, False, True])
                   .groupby("qid", sort=False).head(k))

    reduced = scored.mapInPandas(
        local_topk, schema="qid long, doc_id long, score double")
    item = F.struct(F.col("score"), (-F.col("doc_id")).alias("nid"))
    merged = (
        reduced.groupBy("qid")
        .agg(F.slice(F.sort_array(F.collect_list(item), asc=False),
                     1, k).alias("top"))
    )
    return (
        merged.select("qid", F.posexplode("top").alias("pos", "c"))
        .select("qid", (F.col("pos") + 1).alias("rank"),
                (-F.col("c.nid")).alias("doc_id"), "c.score")
    )
