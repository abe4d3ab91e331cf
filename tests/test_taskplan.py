"""Task fan-out planner vs a direct transcription of the reference
loop (task_service.py:312-346), digest-stream parity, and the reuse
gates."""

import pytest

from ragflow_spark.extractlib.xxh64 import xxh64_hexdigest
from ragflow_spark.job.session import get_spark

DOCS_SCHEMA = ("doc_id long, file_type string, parser_id string, "
               "layout_recognize string, task_page_size int, "
               "pages long, n_rows long")


@pytest.fixture(scope="module")
def spark():
    s = get_spark("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _ref_tasks(doc):
    """Reference queue_tasks loop, default page_ranges."""
    tasks = []
    if doc["file_type"] == "pdf":
        page_size = doc["task_page_size"] or \
            (22 if doc["parser_id"] == "paper" else 12)
        if doc["parser_id"] in ("one", "knowledge_graph") \
                or doc["layout_recognize"] != "DeepDOC":
            page_size = 10 ** 9
        s, e = 0, min(10 ** 5 - 1, doc["pages"])
        for p in range(s, e, page_size):
            tasks.append((p, min(p + page_size, e)))
    elif doc["parser_id"] == "table":
        for i in range(0, doc["n_rows"], 3000):
            tasks.append((i, min(i + 3000, doc["n_rows"])))
    else:
        tasks.append((0, 100000000))
    return tasks


def test_plan_matches_reference_loop(spark):
    from ragflow_spark.job.taskplan import plan_tasks

    docs = [
        dict(doc_id=1, file_type="pdf", parser_id="naive",
             layout_recognize="DeepDOC", task_page_size=None,
             pages=30, n_rows=0),
        dict(doc_id=2, file_type="pdf", parser_id="paper",
             layout_recognize="DeepDOC", task_page_size=None,
             pages=50, n_rows=0),
        dict(doc_id=3, file_type="pdf", parser_id="one",
             layout_recognize="DeepDOC", task_page_size=None,
             pages=500, n_rows=0),
        dict(doc_id=4, file_type="pdf", parser_id="naive",
             layout_recognize="Plain Text", task_page_size=None,
             pages=77, n_rows=0),
        dict(doc_id=5, file_type="pdf", parser_id="naive",
             layout_recognize="DeepDOC", task_page_size=5,
             pages=12, n_rows=0),
        dict(doc_id=6, file_type="pdf", parser_id="naive",
             layout_recognize="DeepDOC", task_page_size=None,
             pages=0, n_rows=0),  # empty range -> no tasks
        dict(doc_id=7, file_type="xlsx", parser_id="table",
             layout_recognize="DeepDOC", task_page_size=None,
             pages=0, n_rows=7500),
        dict(doc_id=8, file_type="docx", parser_id="naive",
             layout_recognize="DeepDOC", task_page_size=None,
             pages=0, n_rows=0),
        dict(doc_id=9, file_type="pdf", parser_id="naive",
             layout_recognize="DeepDOC", task_page_size=None,
             pages=200000, n_rows=0),  # clamps at 10^5 - 1
    ]
    df = spark.createDataFrame(
        [tuple(d.values()) for d in docs], schema=DOCS_SCHEMA)
    got = {}
    for r in plan_tasks(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["task_seq"], r["from_page"], r["to_page"]))
    for d in docs:
        want = [(i, f, t) for i, (f, t) in enumerate(_ref_tasks(d))]
        assert sorted(got.get(d["doc_id"], [])) == want, d["doc_id"]


def test_digest_stream_matches_reference_hasher(spark):
    from ragflow_spark.job.taskplan import add_task_digests

    cfg = {"tenant_id": "t1", "kb_id": "kb9",
           "parser_config": {"chunk_token_num": 128, "raptor": {"x": 1},
                             "graphrag": True, "layout_recognize": "DeepDOC"},
           "parser_id": "naive"}
    tasks = spark.createDataFrame(
        [(11, 0, 12), (11, 12, 24)],
        schema="doc_id long, from_page long, to_page long")
    got = {(r["from_page"]): r["digest"]
           for r in add_task_digests(tasks, cfg).collect()}

    # the reference hasher: update(str(field)) in sorted key order with
    # raptor/graphrag dropped from parser_config, then the task fields
    stripped = {"chunk_token_num": 128, "layout_recognize": "DeepDOC"}
    for frm, to in [(0, 12), (12, 24)]:
        parts = []
        for field in sorted(cfg):
            val = stripped if field == "parser_config" else cfg[field]
            parts.append(str(val))
        parts += [str(11), str(frm), str(to)]
        want = xxh64_hexdigest("".join(parts).encode("utf-8"))
        assert got[frm] == want


def test_reuse_gates(spark):
    from ragflow_spark.job.taskplan import reuse_prev_chunks

    tasks = spark.createDataFrame(
        [(0, "dA"), (12, "dB"), (24, "dC"), (36, "dD")],
        schema="from_page long, digest string")
    prev = spark.createDataFrame(
        [
            (0, 0, "dA", 1.0, "c1 c2 c3"),   # reusable
            (1, 0, "dA", 1.0, "c9"),         # later duplicate: loses
            (2, 12, "dB", 0.5, "c4"),        # unfinished
            (3, 24, "dC", 1.0, ""),          # no chunk ids
        ],
        schema=("prev_seq long, from_page long, digest string, "
                "progress double, chunk_ids string"))
    got = {r["from_page"]: (r["reused"], r["chunk_ids"],
                            r["n_reused_chunks"])
           for r in reuse_prev_chunks(tasks, prev).collect()}
    assert got[0] == (True, "c1 c2 c3", 3)
    assert got[12] == (False, None, 0)
    assert got[24] == (False, None, 0)
    assert got[36] == (False, None, 0)


def _ref_progress(tsks, use_raptor, use_graphrag):
    """Transcription of update_progress's per-doc fold
    (document_service.py:387-433)."""
    msg, prg, finished, bad = [], 0.0, True, 0
    has_raptor = has_graphrag = False
    priority = 0
    status = "1"
    for t in tsks:
        if 0 <= t["progress"] < 1:
            finished = False
        if t["progress"] == -1:
            bad += 1
        prg += t["progress"] if t["progress"] >= 0 else 0
        msg.append(t["progress_msg"])
        if t["task_type"] == "raptor":
            has_raptor = True
        elif t["task_type"] == "graphrag":
            has_graphrag = True
        priority = max(priority, t["priority"])
    prg /= len(tsks)
    next_task = None
    if finished and bad:
        prg = -1
        status = "4"
    elif finished:
        if use_raptor and not has_raptor:
            next_task = "raptor"
            prg = 0.98 * len(tsks) / (len(tsks) + 1)
        elif use_graphrag and not has_graphrag:
            next_task = "graphrag"
            prg = 0.98 * len(tsks) / (len(tsks) + 1)
        else:
            status = "3"
    return prg, status, next_task, priority, "\n".join(sorted(msg))


def test_doc_progress_matches_reference(spark):
    from ragflow_spark.job.taskplan import doc_progress

    t = lambda p, m, ty="", pr=0: dict(progress=p, progress_msg=m,
                                       task_type=ty, priority=pr)
    docs = {
        1: ([t(1.0, "b"), t(0.5, "a")], False, False),   # running
        2: ([t(1.0, "x"), t(1.0, "y", pr=3)], False, False),  # done
        3: ([t(1.0, "x"), t(-1.0, "boom")], False, False),    # fail
        4: ([t(1.0, "x")], True, False),                  # raptor due
        5: ([t(1.0, "x"), t(1.0, "r", "raptor")], True, True),  # grag
        6: ([t(1.0, "x"), t(1.0, "r", "raptor"),
             t(1.0, "g", "graphrag")], True, True),       # done
        7: ([t(-1.0, "bad"), t(0.2, "going")], False, False),  # running
    }
    tasks = spark.createDataFrame(
        [(d,) + tuple(x.values()) for d, (ts, _, _) in docs.items()
         for x in ts],
        schema="doc_id long, progress double, progress_msg string, "
               "task_type string, priority long")
    flags = spark.createDataFrame(
        [(d, r, g) for d, (_, r, g) in docs.items()],
        schema="doc_id long, use_raptor boolean, use_graphrag boolean")
    got = {r["doc_id"]: r for r in doc_progress(tasks, flags).collect()}
    for d, (ts, r, g) in docs.items():
        prg, status, nxt, pr, msg = _ref_progress(ts, r, g)
        row = got[d]
        assert row["progress"] == pytest.approx(prg), d
        assert row["status"] == status, d
        assert row["next_task"] == nxt, d
        assert row["priority"] == pr and row["msg"] == msg, d


def test_reuse_chunk_count_whitespace(spark):
    """The reference counts chunks with str.split(): whitespace runs
    collapse and an all-space chunk_ids string reuses zero chunks."""
    from ragflow_spark.job.taskplan import reuse_prev_chunks

    tasks = spark.createDataFrame(
        [(0, "dA"), (12, "dB")], schema="from_page long, digest string")
    prev = spark.createDataFrame(
        [(0, 0, "dA", 1.0, "c1  c2 "), (1, 12, "dB", 1.0, "  ")],
        schema=("prev_seq long, from_page long, digest string, "
                "progress double, chunk_ids string"))
    got = {r["from_page"]: (r["reused"], r["n_reused_chunks"])
           for r in reuse_prev_chunks(tasks, prev).collect()}
    assert got[0] == (True, 2)
    assert got[12] == (True, 0)   # truthy-but-blank: reused, 0 chunks
