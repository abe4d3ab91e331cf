"""embed_chunks vs a direct transcription of the reference embedding()
loop (task_executor.py:384-425), and the index_rows field contract
(task_executor.py:256-293)."""

import re

import pytest

from ragflow_spark.extractlib.tokens import truncate
from ragflow_spark.extractlib.xxh64 import xxh64_hexdigest
from ragflow_spark.job.session import get_spark

CHUNKS_SCHEMA = ("doc_id long, chunk_seq long, docnm_kwd string, "
                 "question_kwd array<string>, content_with_weight string")


@pytest.fixture(scope="module")
def spark():
    s = get_spark("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _fake_encode_py(s: str) -> list[float]:
    return [(len(s) % 101) / 100.0,
            ((len(s) * 7) % 89) / 88.0,
            ((len(s) - len(s.replace(" ", ""))) % 67) / 66.0,
            1.0]


def _fake_encode_col(col):
    from pyspark.sql import functions as F
    n = F.length(col)
    sp = n - F.length(F.regexp_replace(col, " ", ""))
    return F.array((n % 101) / 100.0, ((n * 7) % 89) / 88.0,
                   (sp % 67) / 66.0, F.lit(1.0))


def _ref_embedding(docs, title_w=0.1, max_length=512):
    """Transcription of task_executor.embedding with the fake model."""
    tts, cnts = [], []
    for d in docs:
        tts.append(d.get("docnm_kwd") or "Title")
        c = "\n".join(d.get("question_kwd") or [])
        if not c:
            c = d["content_with_weight"]
        c = re.sub(
            r"</?(table|td|caption|tr|th)( [^<>]{0,12})?>", " ", c)
        if not c:
            c = "None"
        cnts.append(c)
    tvec = _fake_encode_py(tts[0])  # tts[0:1] replicated to all rows
    out = []
    for c in cnts:
        cv = _fake_encode_py(truncate(c, max_length - 10))
        out.append([title_w * t + (1 - title_w) * v
                    for t, v in zip(tvec, cv)])
    return out


def test_embed_matches_reference_loop(spark):
    from ragflow_spark.operators.indexing import embed_chunks

    docs = [
        dict(doc_id=1, chunk_seq=0, docnm_kwd="report.pdf",
             question_kwd=None,
             content_with_weight="plain text body here"),
        dict(doc_id=1, chunk_seq=1, docnm_kwd="OTHER-NAME.pdf",
             question_kwd=None,
             content_with_weight="<table border=1><td>cell</td></table>"),
        dict(doc_id=1, chunk_seq=2, docnm_kwd="report.pdf",
             question_kwd=["why is x?", "how is y?"],
             content_with_weight="ignored when questions exist"),
        dict(doc_id=1, chunk_seq=3, docnm_kwd="report.pdf",
             question_kwd=[],
             content_with_weight=""),  # -> "None"
        dict(doc_id=1, chunk_seq=4, docnm_kwd="report.pdf",
             question_kwd=None,
             content_with_weight="word " * 900),  # truncation fires
    ]
    want = _ref_embedding(docs)

    df = spark.createDataFrame(
        [(d["doc_id"], d["chunk_seq"], d["docnm_kwd"],
          d["question_kwd"], d["content_with_weight"]) for d in docs],
        schema=CHUNKS_SCHEMA)
    got = {r["chunk_seq"]: r["q_vec"]
           for r in embed_chunks(df, _fake_encode_col).collect()}
    for i, d in enumerate(docs):
        assert got[d["chunk_seq"]] == pytest.approx(want[i]), i


def test_embed_title_replicates_first_chunk(spark):
    """task_executor.py:400-402 encodes tts[0:1] only; every chunk's
    title component is the FIRST chunk's title vector."""
    from ragflow_spark.operators.indexing import embed_chunks

    df = spark.createDataFrame(
        [(7, 0, "aaa", None, "x"), (7, 1, "bbbbbbbbbb", None, "x")],
        schema=CHUNKS_SCHEMA)
    got = {r["chunk_seq"]: r["q_vec"]
           for r in embed_chunks(df, _fake_encode_col).collect()}
    tvec = _fake_encode_py("aaa")
    cvec = _fake_encode_py("x")
    want = [0.1 * t + 0.9 * c for t, c in zip(tvec, cvec)]
    assert got[0] == pytest.approx(want)
    assert got[1] == pytest.approx(want)  # NOT bbbbbbbbbb's title


def test_embed_missing_docnm_defaults_title(spark):
    from ragflow_spark.operators.indexing import embed_chunks

    df = spark.createDataFrame(
        [(9, 0, None, None, "body")], schema=CHUNKS_SCHEMA)
    got = embed_chunks(df, _fake_encode_col).collect()[0]["q_vec"]
    tvec = _fake_encode_py("Title")
    cvec = _fake_encode_py("body")
    assert got == pytest.approx(
        [0.1 * t + 0.9 * c for t, c in zip(tvec, cvec)])


def test_embed_custom_title_weight(spark):
    from ragflow_spark.operators.indexing import embed_chunks

    df = spark.createDataFrame(
        [(3, 0, "nm", None, "body")], schema=CHUNKS_SCHEMA)
    got = embed_chunks(df, _fake_encode_col,
                       title_w=0.3).collect()[0]["q_vec"]
    tvec = _fake_encode_py("nm")
    cvec = _fake_encode_py("body")
    assert got == pytest.approx(
        [0.3 * t + 0.7 * c for t, c in zip(tvec, cvec)])


def test_index_rows_fields(spark):
    from ragflow_spark.operators.indexing import index_rows

    df = spark.createDataFrame(
        [(11, "first chunk", bytearray(b"\xff\xd8jpg")),
         (11, "second chunk", None)],
        schema="doc_id long, content_with_weight string, image binary")
    rows = {r["content_with_weight"]: r
            for r in index_rows(df, "kb7", pagerank=3,
                                create_time="2024-01-02 03:04:05",
                                create_timestamp=1704164645.0)
            .collect()}
    for content, r in rows.items():
        want_id = xxh64_hexdigest((content + "11").encode("utf-8"))
        assert r["id"] == want_id
        assert r["kb_id"] == "kb7"
        assert r["create_time"] == "2024-01-02 03:04:05"
        assert r["create_timestamp_flt"] == 1704164645.0
        assert r["pagerank_fea"] == 3
    assert rows["first chunk"]["img_id"] == \
        "kb7-" + rows["first chunk"]["id"]
    assert rows["second chunk"]["img_id"] == ""
    assert "image" not in rows["first chunk"].asDict()


def test_index_rows_no_pagerank_field(spark):
    """build_chunks adds PAGERANK_FLD only when task.pagerank is set."""
    from ragflow_spark.operators.indexing import index_rows

    df = spark.createDataFrame(
        [(5, "c", None)],
        schema="doc_id long, content_with_weight string, image binary")
    row = index_rows(df, "kb1").collect()[0]
    assert "pagerank_fea" not in row.asDict()


def test_index_rows_empty_image_is_falsy(spark):
    """task_executor.py:270 gates on Python falsiness: zero-length
    image bytes mean no image."""
    from ragflow_spark.operators.indexing import index_rows

    df = spark.createDataFrame(
        [(1, "c", bytearray(b""))],
        schema="doc_id long, content_with_weight string, image binary")
    assert index_rows(df, "kb").collect()[0]["img_id"] == ""
