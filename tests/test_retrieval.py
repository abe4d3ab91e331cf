"""Term weighting (termweight.py) + keyword retrieval (retrieval.py)."""

import pytest

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
    # doc 2 has tf(query)=3 > doc 1's the+fast+query=3... both score 3
    # terms the/fast/queri at w=1/3 each: doc1 = 3 matches, doc2 = 3
    by_rank = [(r["rank"], r["doc_id"]) for r in rows]
    assert (1, 1) in by_rank and (2, 2) in by_rank
    assert all(r["qid"] == 0 for r in rows)
    assert len(rows) == 2  # doc 3 matches nothing
