"""Term weighting (termweight.py) + keyword retrieval (retrieval.py)."""

import pytest
from pyspark.sql import functions as F

from ragflow_spark.extractlib.termweight import TermWeightDealer, rm_www


@pytest.fixture(scope="module")
def dealer():
    return TermWeightDealer()


def test_rm_www():
    assert rm_www("what is the fast query") == " the fast query"
    # all-stripped falls back to the original
    assert rm_www("什么") == "什么"
    assert rm_www("how to merge") == " to merge" or \
        rm_www("how to merge") == " merge"


def test_weights_normalize(dealer):
    tw = dealer.weights(dealer.split("fast query merge"))
    assert abs(sum(w for _t, w in tw) - 1.0) < 1e-12
    # english fallback weights are equal shares
    assert len({round(w, 9) for _t, w in tw}) == 1
    # terms come back stemmed
    assert [t for t, _w in tw] == ["fast", "queri", "merg"]


def test_weights_dictionary_terms(dealer):
    tw = dict(dealer.weights(dealer.split("数据分析 管道")))
    # 数据 (freq 8000, tag n) outweighs 分析 (freq 6000, tag vn: no
    # noun multiplier)
    assert tw["数据"] > tw["分析"]
    assert abs(sum(tw.values()) - 1.0) < 1e-12


def test_pretoken_drops_stopwords_and_digits(dealer):
    assert "的" not in dealer.pretoken("数据的分析")
    assert dealer.pretoken("数据 7") == ["数据"]  # bare digit dropped
    assert dealer.pretoken("数据 7", num=True) == ["数据", "7"]


def test_token_merge_groups_singles(dealer):
    assert dealer.token_merge(["数", "据", "分析"]) == ["数 据", "分析"]
    assert dealer.token_merge(["分析", "管道"]) == ["分析", "管道"]


def test_synonym_lookup_machinery():
    from ragflow_spark.extractlib.synonyms import SynonymDealer

    syn = SynonymDealer()
    assert syn.lookup("merg") == ["join"]
    assert syn.lookup("vector") == ["array"]  # str promoted to list
    assert syn.lookup("MERG") == ["join"]     # lower-normalized
    assert syn.lookup("nosuchterm") == []
    assert syn.lookup("fast", topn=1) == ["quick"]  # topn cap
    # wordnet seam: [a-z]+ terms route through it, self excluded
    syn2 = SynonymDealer(wordnet_lookup=lambda tk: [tk, "swift", ""])
    assert syn2.lookup("fast") == ["swift"]
    # CJK bypasses the wordnet branch even when present
    assert syn2.lookup("数据") == ["资料"]


def test_query_expansion_boosts():
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.retrieval import query_expansion

    spark = get_spark("local[4]", shuffle_partitions=4)
    queries = spark.createDataFrame(
        [(0, "what is the fast query merge")],
        schema="qid long, question string")
    rows = {(r["term"]): r["boost"]
            for r in query_expansion(queries).collect()}
    w = rows["fast"]
    # question()'s double rmWWW drops 'the': 3 base terms at 1/3
    assert abs(w - 1.0 / 3.0) < 1e-9
    assert "the" not in rows
    # synonyms at w/4 (stemmed through huqie)
    assert abs(rows["quick"] - w / 4) < 1e-12
    assert abs(rows["join"] - w / 4) < 1e-12
    # adjacent-pair phrases at 2*max(w)
    assert abs(rows["queri merg"] - 2 * w) < 1e-12
    assert abs(rows["fast queri"] - 2 * w) < 1e-12


def test_search_expanded_scores_synonym_and_phrase():
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.retrieval import keyword_search_expanded

    spark = get_spark("local[4]", shuffle_partitions=4)
    docs = spark.createDataFrame(
        [(1, "fast query merge data"),   # phrase hits: fast+queri, queri+merg
         (2, "join data data row"),      # synonym-only hit
         (3, "sort order row")],         # no hit
        schema="doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "what is the fast query merge")],
        schema="qid long, question string")
    rows = {r["doc_id"]: r for r in
            keyword_search_expanded(docs, queries, k=3).collect()}
    assert 3 not in rows
    w = 1.0 / 3.0   # 'the' dropped by the double rmWWW
    # doc1: 3 unigrams + 2 phrases = 3w + 2*(2w)
    assert abs(rows[1]["score"] - (3 * w + 2 * 2 * w)) < 1e-6
    # doc2: only the synonym join at w/4
    assert abs(rows[2]["score"] - w / 4) < 1e-6
    assert rows[1]["rank"] == 1 and rows[2]["rank"] == 2


def _ref_token_similarity(dealer, qtwt, dtks):
    """Verbatim re-expression of query.py:222-241 for the test oracle;
    qtwt is the query weight dict (the operator derives it through the
    preprocess pipeline, query.py's question() keyword path)."""
    import math
    from collections import OrderedDict, defaultdict

    def to_dict(tks):
        d = defaultdict(float)
        for t, w in dealer.weights(tks, preprocess=False):
            d[t] += w
        return d

    dtwt = to_dict(list(OrderedDict.fromkeys(dtks)))
    s = 1e-9
    for k, v in qtwt.items():
        if k in dtwt:
            s += v * dtwt[k]
    q = 1e-9
    for v in qtwt.values():
        q += v * v
    return math.sqrt(3.0 * (s / q / math.log10(len(dtwt) + 512)))


def test_rerank_fusion_matches_reference_formula(dealer):
    from ragflow_spark.extractlib.huqie import tokenize
    from ragflow_spark.extractlib.termweight import rm_www
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.retrieval import rerank_fusion

    spark = get_spark("local[4]", shuffle_partitions=4)
    texts = {1: "fast query merge the table scan",
             2: "query query slow window a big",
             3: "fast merge fast stream data"}
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], schema="doc_id long, text string")
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 2.0]), (1, [1.0, 1.0, 0.0]),
         (2, [0.5, -1.0, 1.0]), (3, [2.0, 0.5, 0.5])],
        schema="vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(0, "what is the fast query merge")],
        schema="qid long, question string")
    rows = {r["doc_id"]: r for r in
            rerank_fusion(docs, emb, queries, topn=3, k=3).collect()}

    from ragflow_spark.extractlib.fulltext_query import question
    from ragflow_spark.extractlib.termweight import to_weight_dict
    _q, _e, kws = question("what is the fast query merge",
                           dealer=dealer)
    qtwt = to_weight_dict(dealer, kws)
    import numpy as np
    qv = np.array([1.0, 0.0, 2.0])
    for did, r in rows.items():
        tks = _ref_token_similarity(dealer, qtwt, tokenize(texts[did]).split())
        assert abs(r["tksim"] - tks) < 1e-5, (did, r["tksim"], tks)
        dv = {1: [1.0, 1.0, 0.0], 2: [0.5, -1.0, 1.0],
              3: [2.0, 0.5, 0.5]}[did]
        cos = float(np.dot(qv, dv) / (np.linalg.norm(qv) * np.linalg.norm(dv)))
        assert abs(r["vtsim"] - cos) < 1e-5
        assert abs(r["score"] - (0.3 * tks + 0.7 * cos)) < 1e-5
    # ranks ordered by fused score desc
    ordered = sorted(rows.values(), key=lambda r: r["rank"])
    assert all(a["score"] >= b["score"]
               for a, b in zip(ordered, ordered[1:]))


def test_rerank_fusion_zero_vector_fallback():
    """query.py:211-213 — all cosines zero => fused score IS tksim."""
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.retrieval import rerank_fusion

    spark = get_spark("local[4]", shuffle_partitions=4)
    docs = spark.createDataFrame(
        [(1, "fast query merge"), (2, "fast table scan")],
        schema="doc_id long, text string")
    # no embeddings at all -> every vtsim coalesces to 0
    emb = spark.createDataFrame([], schema="vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(0, "what is the fast query")], schema="qid long, question string")
    rows = rerank_fusion(docs, emb, queries, topn=2, k=2).collect()
    assert rows
    for r in rows:
        assert r["vtsim"] == 0.0
        assert r["score"] == r["tksim"]


def test_bucketed_postings_join_is_shuffle_free():
    """The 100-TB posture claim from the retrieval docstrings, proven
    on a plan: postings persisted BUCKETED BY doc_id co-locate with
    identically bucketed doc metadata, so the join carries no Exchange
    (no shuffle) — the posting table IS the index, maintained once and
    joined for free thereafter."""
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.retrieval import doc_postings

    spark = get_spark("local[4]", shuffle_partitions=4)
    docs = spark.createDataFrame(
        [(i, f"fast query merge row {i % 7}") for i in range(50)],
        schema="doc_id long, text string")
    spark.sql("DROP TABLE IF EXISTS post_bkt")
    spark.sql("DROP TABLE IF EXISTS meta_bkt")
    doc_postings(docs).write.bucketBy(8, "doc_id").sortBy("doc_id") \
        .mode("overwrite").saveAsTable("post_bkt")
    docs.select("doc_id").withColumn("lang", F.lit("en")) \
        .write.bucketBy(8, "doc_id").sortBy("doc_id") \
        .mode("overwrite").saveAsTable("meta_bkt")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("post_bkt").join(spark.table("meta_bkt"),
                                         "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == doc_postings(docs).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS post_bkt")
        spark.sql("DROP TABLE IF EXISTS meta_bkt")


def test_keyword_search_over_persisted_postings_matches_inline():
    """The persisted-index path: postings materialized once (bucketed
    at scale) and handed to keyword_search must score identically to
    the tokenize-per-query path."""
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.retrieval import (doc_postings,
                                                   keyword_search)

    spark = get_spark("local[4]", shuffle_partitions=4)
    docs = spark.createDataFrame(
        [(i, f"fast query merge row {i % 5} scan table")
         for i in range(30)],
        schema="doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "what is the fast query merge")],
        schema="qid long, question string")
    spark.sql("DROP TABLE IF EXISTS postings_tbl")
    doc_postings(docs).write.bucketBy(4, "doc_id").sortBy("doc_id") \
        .mode("overwrite").saveAsTable("postings_tbl")
    try:
        inline = sorted(map(tuple, keyword_search(docs, queries, k=5)
                            .collect()))
        persisted = sorted(map(tuple, keyword_search(
            docs, queries, k=5,
            postings=spark.table("postings_tbl")).collect()))
        assert inline == persisted and inline
    finally:
        spark.sql("DROP TABLE IF EXISTS postings_tbl")


def test_keyword_search_end_to_end():
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.retrieval import keyword_search

    spark = get_spark("local[4]", shuffle_partitions=4)
    docs = spark.createDataFrame(
        [(1, "fast query merge the table"),
         (2, "query query query slow"),
         (3, "window stream only")],
        schema="doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "what is the fast query")], schema="qid long, question string")
    rows = keyword_search(docs, queries, k=3).collect()
    # question() terms = fast/queri at 1/2 ('the' dropped): doc1
    # scores 2*(1/2)=1.0, doc2's tf(query)=3 scores 1.5 -> doc2 first
    by_rank = [(r["rank"], r["doc_id"]) for r in rows]
    assert (1, 2) in by_rank and (2, 1) in by_rank
    assert all(r["qid"] == 0 for r in rows)
    assert len(rows) == 2  # doc 3 matches nothing


def test_retrieval_page_window_and_threshold():
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.retrieval import retrieval_page

    spark = get_spark("local[4]", shuffle_partitions=4)
    docs = spark.createDataFrame(
        [(i, "fast query merge " + " ".join(["row"] * i))
         for i in range(1, 7)],
        schema="doc_id long, text string")
    emb = spark.createDataFrame([], schema="vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(0, "what is the fast query merge")],
        schema="qid long, question string")
    p1 = retrieval_page(docs, emb, queries, page=1, page_size=2,
                        similarity_threshold=0.0)
    p2 = retrieval_page(docs, emb, queries, page=2, page_size=2,
                        similarity_threshold=0.0)
    r1 = sorted((r["rank"], r["doc_id"]) for r in p1.collect())
    r2 = sorted((r["rank"], r["doc_id"]) for r in p2.collect())
    # pages are disjoint windows over the same fused ordering, each
    # re-numbered from 1
    assert len(r1) == 2 and len(r2) == 2
    assert [r for r, _d in r1] == [1, 2] and [r for r, _d in r2] == [1, 2]
    assert {d for _r, d in r1}.isdisjoint({d for _r, d in r2})
    # a sky-high threshold empties the page
    assert retrieval_page(docs, emb, queries,
                          similarity_threshold=99.0).count() == 0


def test_keyword_search_min_match_gate():
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.retrieval import keyword_search

    spark = get_spark("local[4]", shuffle_partitions=4)
    docs = spark.createDataFrame(
        [(1, "fast query merge"),   # 3/3 terms
         (2, "fast table scan"),    # 1/3
         (3, "query merge row")],   # 2/3
        schema="doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "what is the fast query merge")],
        schema="qid long, question string")
    # terms: fast/queri/merg -> 3 terms ('the' dropped); ES rounds the
    # percentage DOWN: floor(0.6*3)=1 hit keeps every matching doc,
    # floor(0.7*3)=2 drops the single-hit doc 2 (a ceil at 0.6 would
    # demand 2 and silently drop it, which the reference returns)
    open_ids = {r["doc_id"] for r in
                keyword_search(docs, queries, k=5).collect()}
    gated_ids = {r["doc_id"] for r in
                 keyword_search(docs, queries, k=5,
                                min_match=0.6).collect()}
    assert open_ids == {1, 2, 3}
    assert gated_ids == {1, 2, 3}
    tight_ids = {r["doc_id"] for r in
                 keyword_search(docs, queries, k=5,
                                min_match=0.7).collect()}
    assert tight_ids == {1, 3}  # docs reaching 2 distinct hits
    # the floor clamps at 1: floor(0.2*3)=0 still needs one real hit
    low_ids = {r["doc_id"] for r in
               keyword_search(docs, queries, k=5,
                              min_match=0.2).collect()}
    assert low_ids == {1, 2, 3}


def test_rerank_query_terms_include_synonyms():
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.retrieval import rerank_query_terms

    spark = get_spark("local[4]", shuffle_partitions=4)
    queries = spark.createDataFrame(
        [(0, "what is the fast query merge")],
        schema="qid long, question string")
    rows = {r["term"]: r["weight"]
            for r in rerank_query_terms(queries).collect()}
    # question() keywords = base tokens + huqie-tokenized synonyms
    # (query.py:93-96): fast->quick,speedi and merg->join extend the
    # 3 base stems ('the' dropped by the double rmWWW) to 6
    # equal-fallback-weight terms
    assert set(rows) == {"fast", "queri", "merg",
                         "quick", "speedi", "join"}
    for w in rows.values():
        assert abs(w - 1.0 / 6.0) < 1e-9


def test_rerank_by_model_keeps_tokenless_candidates():
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.retrieval import rerank_by_model

    spark = get_spark("local[4]", shuffle_partitions=4)
    # doc 2's text tokenizes to nothing -> dtwt is empty; the reference
    # still scores it (tksim ~ sqrt(3e-9/q/log10(512)), vt share kept)
    docs = spark.createDataFrame(
        [(1, "fast query merge"), (2, "???")],
        schema="doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "what is the fast query merge")],
        schema="qid long, question string")
    msims = spark.createDataFrame(
        [(0, 1, 0.4), (0, 2, 0.9)],
        schema="qid long, doc_id long, msim double")
    out = {r["doc_id"]: r for r in
           rerank_by_model(docs, queries, msims, k=5).collect()}
    assert set(out) == {1, 2}
    # the tokenless candidate's fused score is dominated by its msim
    assert out[2]["score"] > 0.6
    assert out[2]["tksim"] < 0.01
