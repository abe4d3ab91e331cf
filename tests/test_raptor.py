"""raptor_tiers vs a direct transcription of the reference's
RecursiveAbstractiveProcessing4TreeOrganizedRetrieval.__call__
(rag/raptor.py:82-180) run with the same deterministic seams, plus the
run_raptor row assembly (task_executor.py:446-467)."""

import re

import pytest

from ragflow_spark.extractlib.tokens import truncate
from ragflow_spark.extractlib.xxh64 import xxh64_hexdigest
from ragflow_spark.job.session import get_spark

CHUNK_SCHEMA = "doc_id long, pos int, content string, vec array<double>"

_CONT = ("(······\n由于长度的原因，回答被截断了，要继续吗？"
         "|For the content length reason, it stopped, continue?)")


@pytest.fixture(scope="module")
def spark():
    s = get_spark("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _seams():
    """Closure seams: cloudpickle ships closures by value, while
    module-level test functions pickle by reference to a module the
    executors cannot import."""
    def summ(content: str) -> str:
        return "S(" + content.replace("\n", "|") + ")"

    def embed(s: str) -> list:
        return [(len(s) % 101) / 100.0, 1.0]
    return summ, embed


_summ, _embed = _seams()  # driver-side copies for the transcription


def _ref_raptor(chunks, llm_max_length=8192, max_token=512, fan_in=4):
    """The reference loop with the block clusterer / fake LLM seams.
    Returns [(layer, pos, content, vec)]; filtered count authoritative
    (the documented divergence for the reference's stale ``end``)."""
    if len(chunks) <= 1:
        return []
    chunks = [(s, a) for s, a in chunks if s and len(a) > 0]
    start, end = 0, len(chunks)
    tiers, layer = [], 0
    while end - start > 1:
        layer += 1
        n = end - start
        if n == 2:
            lbls = [0, 0]
        else:
            lbls = [i // fan_in for i in range(n)]
        n_clusters = max(lbls) + 1
        for c in range(n_clusters):
            texts = [chunks[start + i][0]
                     for i in range(n) if lbls[i] == c]
            lpc = int((llm_max_length - max_token) / len(texts))
            content = "\n".join(
                truncate(t, max(1, lpc)) for t in texts)
            cnt = re.sub(_CONT, "", _summ(content))
            chunks.append((cnt, _embed(cnt)))
            tiers.append((layer, c, cnt, _embed(cnt)))
        start = end
        end = len(chunks)
    return tiers


def _run(spark, docs, **kw):
    from ragflow_spark.operators.raptor import (block_cluster_fn,
                                                raptor_tiers)
    rows = [(doc_id, pos, content, vec)
            for doc_id, chunks in docs.items()
            for pos, (content, vec) in enumerate(chunks)]
    df = spark.createDataFrame(rows, schema=CHUNK_SCHEMA)
    got = {}
    for r in raptor_tiers(df, block_cluster_fn(4), _summ, _embed,
                          **kw).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["layer"], r["pos"], r["content"], r["vec"]))
    return {k: sorted(v) for k, v in got.items()}


def test_tiers_match_reference_loop(spark):
    docs = {
        1: [(f"c1_{i}", [float(i), 1.0]) for i in range(9)],
        2: [(f"c2_{i}", [float(i), 1.0]) for i in range(5)],
        3: [("a", [1.0]), ("b", [2.0])],           # 2-node shortcut
        4: [("only", [1.0])],                       # <2 -> nothing
        5: [],                                      # empty doc
        6: [("x", [1.0]), ("", [2.0]), ("y", [])],  # filters -> 1 left
        7: [(f"c7_{i}", [float(i)]) for i in range(4)],
    }
    got = _run(spark, docs)
    for doc_id, chunks in docs.items():
        want = sorted(_ref_raptor(list(chunks)))
        assert got.get(doc_id, []) == want, doc_id
    assert 4 not in got and 5 not in got and 6 not in got


def test_truncation_budget_applies(spark):
    """llm_max_length small enough that members are cut before the
    join — both sides use the pinned token truncate."""
    docs = {9: [("word " * 50, [1.0, 0.0]),
                ("tiny", [2.0, 0.0]),
                ("verylongrunofletters " * 30, [3.0, 0.0])]}
    got = _run(spark, docs, llm_max_length=560, max_token=512)
    want = sorted(_ref_raptor(docs[9], llm_max_length=560,
                              max_token=512))
    assert got[9] == want
    # budget int((560-512)/3)=16 tokens actually truncated something
    assert all(len(c) < 260 for _, _, c, _ in got[9])


def test_continuation_marker_stripped(spark):
    from ragflow_spark.operators.raptor import (block_cluster_fn,
                                                raptor_tiers)
    df = spark.createDataFrame(
        [(1, 0, "a", [1.0]), (1, 1, "b", [2.0])], schema=CHUNK_SCHEMA)

    def summ(content):
        return ("S(" + content.replace("\n", "|")
                + ")For the content length reason, it stopped, "
                  "continue?")

    rows = raptor_tiers(df, block_cluster_fn(4), summ,
                        _embed).collect()
    # the reference pattern's trailing '?' is an unescaped regex
    # optional, so the strip leaves a literal '?' behind — quirk kept
    assert rows[0]["content"] == "S(a|b)?"


def test_nonshrinking_clusterer_raises(spark):
    from ragflow_spark.operators.raptor import raptor_tiers
    df = spark.createDataFrame(
        [(1, i, f"c{i}", [float(i)]) for i in range(4)],
        schema=CHUNK_SCHEMA)
    with pytest.raises(Exception, match="shrink"):
        raptor_tiers(df, lambda g: g["pos"].rank(
            method="first").astype(int) - 1, _summ, _embed).collect()


def test_raptor_rows_assembly(spark):
    from ragflow_spark.extractlib.huqie import (fine_grained_tokenize,
                                                tokenize)
    from ragflow_spark.operators.raptor import (block_cluster_fn,
                                                raptor_rows,
                                                raptor_tiers)
    chunks = spark.createDataFrame(
        [(1, 0, "alpha beta", [1.0]), (1, 1, "gamma delta", [2.0]),
         (2, 0, "one", [1.0]), (2, 1, "two", [2.0])],
        schema=CHUNK_SCHEMA)
    docs = spark.createDataFrame(
        [(1, "report one.pdf", "kb3", 5), (2, "memo.docx", "kb3", 0)],
        schema="doc_id long, name string, kb_id string, pagerank long")
    tiers = raptor_tiers(chunks, block_cluster_fn(4), _summ, _embed)
    rows = {r["doc_id"]: r
            for r in raptor_rows(tiers, docs,
                                 create_time="2024-05-06 07:08:09",
                                 create_timestamp=123.5).collect()}
    r1 = rows[1]
    assert r1["content_with_weight"] == "S(alpha beta|gamma delta)"
    assert r1["id"] == xxh64_hexdigest(
        (r1["content_with_weight"] + "1").encode("utf-8"))
    assert r1["kb_id"] == ["kb3"]       # run_raptor's list wrap
    assert r1["docnm_kwd"] == "report one.pdf"
    assert r1["title_tks"] == tokenize("report one.pdf")
    assert r1["content_ltks"] == tokenize(r1["content_with_weight"])
    assert r1["content_sm_ltks"] == \
        fine_grained_tokenize(r1["content_ltks"])
    assert r1["create_time"] == "2024-05-06 07:08:09"
    assert r1["create_timestamp_flt"] == 123.5
    assert r1["pagerank_fea"] == 5
    assert rows[2]["pagerank_fea"] is None   # falsy pagerank skipped


def test_bad_cluster_fn_raises_loudly(spark):
    # a cluster_fn that does not shrink the layer must fail the job
    # (reference asserts the same), not loop forever
    import numpy as np
    import pytest
    from ragflow_spark.operators.raptor import raptor_tiers

    def identity_clusters(grp):
        return np.arange(len(grp))

    rows = [(1, i, f"c{i}", [float(i), 1.0]) for i in range(4)]
    df = spark.createDataFrame(rows, schema=CHUNK_SCHEMA)
    with pytest.raises(Exception, match="did not shrink"):
        raptor_tiers(df, identity_clusters, _summ, _embed).collect()
