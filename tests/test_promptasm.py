"""fit_messages / kb_prompts vs direct transcriptions of the reference
message_fit_in and kb_prompt (rag/prompts.py:58-128), plus token_head
slice semantics and chunks_format."""

from collections import defaultdict

import pytest

from ragflow_spark.extractlib.tokens import (num_tokens_from_string,
                                             token_head)
from ragflow_spark.job.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _ref_fit(msg, max_length):
    """Transcription of message_fit_in with token_head as the
    encode/decode slice.  Each message carries its original index in
    ``_i`` so the comparison can address rows by seq."""
    msg = [dict(m, _i=i) for i, m in enumerate(msg)]

    def count(ms):
        return sum(num_tokens_from_string(m["content"]) for m in ms)

    c = count(msg)
    if c < max_length:
        return c, msg
    msg_ = [m for m in msg if m["role"] == "system"]
    if len(msg) > 1:
        msg_.append(msg[-1])
    msg = msg_
    c = count(msg)
    if c < max_length:
        return c, msg
    ll = num_tokens_from_string(msg_[0]["content"])
    ll2 = num_tokens_from_string(msg_[-1]["content"])
    which = 0 if ll / (ll + ll2) > 0.8 else -1
    # in-place, like the reference (prompts.py:85-92): when the
    # conversation ends in a system message, msg_[-1] IS the earlier
    # list entry, so the slice shows through BOTH kept copies
    msg_[which]["content"] = token_head(msg_[which]["content"],
                                        max_length - ll2)
    return max_length, msg


def _ref_kb_prompt(chunks, metas, max_tokens):
    """Transcription of kb_prompt; chunks are dicts with doc_id,
    docnm_kwd, content_with_weight, optional url."""
    knowledges = [c["content_with_weight"] for c in chunks]
    used, chunks_num = 0, 0
    for i, c in enumerate(knowledges):
        used += num_tokens_from_string(c)
        chunks_num += 1
        if max_tokens * 0.97 < used:
            break
    doc2chunks = defaultdict(lambda: {"chunks": [], "meta": {}})
    for i, ck in enumerate(chunks[:chunks_num]):
        doc2chunks[ck["docnm_kwd"]]["chunks"].append(
            (f"URL: {ck['url']}\n" if ck.get("url") else "")
            + f"ID: {i}\n" + ck["content_with_weight"])
        doc2chunks[ck["docnm_kwd"]]["meta"] = \
            metas.get(ck["doc_id"], {})
    out = []
    for nm, cm in doc2chunks.items():
        txt = f"\nDocument: {nm} \n"
        for k, v in cm["meta"].items():
            txt += f"{k}: {v}\n"
        txt += "Relevant fragments as following:\n"
        for chunk in cm["chunks"]:
            txt += f"{chunk}\n"
        out.append((nm, txt))
    return out


def test_token_head_slice_semantics():
    s = "alpha beta gamma delta"          # 2+1+2+2 = 7 tokens
    assert num_tokens_from_string(s) == 7
    assert token_head(s, 0) == ""
    assert token_head(s, 100) == s
    assert token_head(s, 3) == "alpha beta "   # gamma would cross
    assert token_head(s, -2) == "alpha beta gamma "  # keep 7-2=5
    assert token_head(s, -100) == ""
    assert token_head("", 5) == ""


def _fit_run(spark, convs, max_length):
    from ragflow_spark.operators.promptasm import fit_messages
    rows = [(cid, i, m["role"], m["content"])
            for cid, msg in convs.items()
            for i, m in enumerate(msg)]
    df = spark.createDataFrame(
        rows, schema="conv_id long, seq long, role string, "
                     "content string")
    got = {}
    for r in fit_messages(df, max_length).collect():
        got.setdefault(r["conv_id"], []).append(
            (r["seq"], r["role"], r["content"], r["fit_tokens"]))
    return {k: sorted(v) for k, v in got.items()}


def test_fit_messages_matches_reference(spark):
    say = lambda role, n: {"role": role, "content": "word " * n}
    convs = {
        1: [say("system", 3), say("user", 4)],             # fits
        2: [say("system", 5), say("user", 40),
            say("assistant", 40), say("user", 6)],         # sys+last
        3: [say("system", 45), say("user", 30),
            say("user", 8)],     # ratio 45/53>0.8 -> first sliced
        4: [say("system", 10), say("user", 30),
            say("user", 35)],    # ratio 10/45<0.8 -> last sliced
        5: [say("user", 60)],                 # single non-system: empty
        6: [say("system", 60)],               # single system: sliced
        7: [say("system", 4), say("system", 5), say("user", 45)],
    }
    got = _fit_run(spark, convs, max_length=20)
    for cid, msg in convs.items():
        c, fitted = _ref_fit(list(msg), 20)
        want = sorted((m["_i"], m["role"], m["content"], c)
                      for m in fitted)
        assert got.get(cid, []) == want, cid


def test_fit_messages_multi_system_kept(spark):
    got = _fit_run(
        spark,
        {9: [{"role": "system", "content": "word " * 8},
             {"role": "user", "content": "word " * 50},
             {"role": "system", "content": "word " * 7},
             {"role": "user", "content": "word " * 9}]},
        max_length=30)
    # both system messages survive the middle cut
    assert [r[0] for r in got[9]] == [0, 2, 3]
    assert got[9][0][3] == 24  # 8 + 7 + 9 fits after reduction


def _kb_run(spark, chunks, metas, max_tokens):
    from ragflow_spark.operators.promptasm import kb_prompts
    cdf = spark.createDataFrame(
        [(1, i, c["doc_id"], c["docnm_kwd"], c["content_with_weight"],
          c.get("url")) for i, c in enumerate(chunks)],
        schema="qid long, i long, doc_id long, docnm_kwd string, "
               "content_with_weight string, url string")
    mdf = spark.createDataFrame(
        [(d, [(k, str(v)) for k, v in kv.items()])
         for d, kv in metas.items()],
        schema="doc_id long, meta array<struct<k:string,v:string>>")
    return {(r["docnm_kwd"]): (r["doc_seq"], r["prompt"])
            for r in kb_prompts(cdf, mdf, max_tokens).collect()}


def test_kb_prompts_matches_reference(spark):
    chunks = [
        dict(doc_id=1, docnm_kwd="a.pdf",
             content_with_weight="alpha " * 10, url=None),
        dict(doc_id=2, docnm_kwd="b.pdf",
             content_with_weight="bravo " * 10, url="http://u/2"),
        dict(doc_id=1, docnm_kwd="a.pdf",
             content_with_weight="threeword text here", url=None),
        dict(doc_id=3, docnm_kwd="a.pdf",   # same name, other doc:
             content_with_weight="charlie " * 10, url=None),  # meta wins
        dict(doc_id=4, docnm_kwd="c.pdf",   # over budget: kept (quirk)
             content_with_weight="delta " * 300, url=None),
        dict(doc_id=5, docnm_kwd="d.pdf",   # past the cut: dropped
             content_with_weight="echo " * 5, url=None),
    ]
    metas = {1: {"author": "x"}, 3: {"author": "y", "year": "2001"},
             4: {}}
    want = dict()
    for seq, (nm, txt) in enumerate(
            _ref_kb_prompt(chunks, metas, max_tokens=80), 1):
        want[nm] = (seq, txt)
    got = _kb_run(spark, chunks, metas, max_tokens=80)
    assert got == want


def test_chunks_format_coalesce(spark):
    from ragflow_spark.operators.promptasm import chunks_format
    df = spark.createDataFrame(
        [("c1", None, "txt", 7, "nm", "kb", "img", "0-1", "http://x")],
        schema="chunk_id string, id string, content string, "
               "doc_id long, docnm_kwd string, kb_id string, "
               "img_id string, position_int string, url string")
    r = chunks_format(df).collect()[0]
    assert r["id"] == "c1" and r["content"] == "txt"
    assert r["document_id"] == 7 and r["document_name"] == "nm"
    assert r["dataset_id"] == "kb" and r["image_id"] == "img"
    assert r["positions"] == "0-1" and r["url"] == "http://x"


def test_fit_messages_system_last_duplicates(spark):
    """prompts.py:73-75 appends msg[-1] unconditionally, so a
    conversation ENDING in a system message keeps it twice with
    double-counted tokens (both instances are one dict there)."""
    got = _fit_run(
        spark,
        {11: [{"role": "system", "content": "word " * 10},
              {"role": "user", "content": "word " * 40},
              {"role": "system", "content": "word " * 25}]},
        max_length=60)
    c, fitted = _ref_fit(
        [{"role": "system", "content": "word " * 10},
         {"role": "user", "content": "word " * 40},
         {"role": "system", "content": "word " * 25}], 60)
    # 10 + 25 + 25 = 60 (the dup counts twice) -> not < 60, so the
    # slice path runs with budget 60-25=35 >= 25: a no-op slice
    assert c == 60
    assert len(fitted) == 3     # sys0, sys2, sys2 again
    assert sorted(r[0] for r in got[11]) == [0, 2, 2]
    assert all(r[3] == 60 for r in got[11])
    want = sorted((m["_i"], m["role"], m["content"], c)
                  for m in fitted)
    assert got[11] == want


def test_fit_messages_dup_slice_mutates_both(spark):
    """A conversation ending in a system message whose slice lands on
    that message: BOTH kept copies are sliced (the reference slices
    msg_[-1], the same dict object as the earlier list entry)."""
    convs = {21: [{"role": "system", "content": "word " * 21},
                  {"role": "user", "content": "word " * 60},
                  {"role": "system", "content": "word " * 42}]}
    got = _fit_run(spark, convs, max_length=60)
    # tot_b = 21 + 42 + 42 = 105 >= 60 -> slice; ll=21, ll2=42,
    # ratio < 0.8 -> last sliced to 60-42=18 tokens, both copies
    c, fitted = _ref_fit(list(convs[21]), 60)
    assert c == 60
    want = sorted((m["_i"], m["role"], m["content"], c)
                  for m in fitted)
    assert got[21] == want
    assert [r[0] for r in got[21]] == [0, 2, 2]
    assert all(r[2] == "word " * 18 for r in got[21][1:])


def test_fit_messages_meta_surface(spark):
    """meta=True emits the integer evidence columns of the same
    pipeline: branch tag, totals, ll/ll2, slice budget, post-slice
    content length."""
    from ragflow_spark.operators.promptasm import fit_messages
    convs = {
        1: [("system", 3), ("user", 4)],                    # branch A
        2: [("system", 5), ("user", 50), ("user", 6)],      # branch B
        4: [("system", 10), ("user", 60), ("user", 55)],    # C, last
        21: [("system", 21), ("user", 60), ("system", 42)],  # C + dup
    }
    rows = [(cid, i, r, "word " * n)
            for cid, msg in convs.items()
            for i, (r, n) in enumerate(msg)]
    df = spark.createDataFrame(
        rows, schema="conv_id long, seq long, role string, "
                     "content string")
    got = {}
    for r in fit_messages(df, 60, meta=True).collect():
        got.setdefault(r["conv_id"], []).append(r.asDict())
    a = sorted(got[1], key=lambda r: r["seq"])
    assert [r["br"] for r in a] == ["A", "A"]
    assert [r["fit_tokens"] for r in a] == [7, 7]
    assert [r["content_len"] for r in a] == [15, 20]
    assert all(not r["sliced"] and r["budget"] == 0 for r in a)
    b = sorted(got[2], key=lambda r: r["seq"])
    assert [r["seq"] for r in b] == [0, 2]
    assert [r["br"] for r in b] == ["B", "B"]
    assert [r["fit_tokens"] for r in b] == [11, 11]
    c = sorted(got[4], key=lambda r: r["seq"])
    assert [r["seq"] for r in c] == [0, 2]
    assert [r["br"] for r in c] == ["C", "C"]
    assert [(r["ll"], r["ll2"]) for r in c] == [(10, 55), (10, 55)]
    assert [r["sliced"] for r in c] == [False, True]
    assert c[1]["budget"] == 60 - 55 and c[1]["content_len"] == 25
    d = sorted(got[21], key=lambda r: (r["seq"],))
    assert [r["seq"] for r in d] == [0, 2, 2]   # dup row twice
    assert [r["tot_b"] for r in d] == [105, 105, 105]
    assert [r["content_len"] for r in d] == [105, 90, 90]


def test_msg_fit_driver_config_fresh_process():
    """Run the driver-gate msg_fit bisector pair in a FRESH process at
    local[32] / 200 shuffle partitions — the configuration class of
    the r3/r4 driver runs whose value-hash mismatched (CORRECTNESS_r03,
    _r04) but never reproduced locally at local[8]. The checker
    compares the Spark result against the DuckDB oracle hash exactly
    the way the driver does."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ, CHECK_MASTER="local[32]",
               CHECK_SHUFFLE="200")
    out = subprocess.run(
        [sys.executable, "tools/check_correctness.py",
         "/root/testdata/sf0.01", "--only=msg_fit,msg_fit_meta"],
        capture_output=True, text=True, env=env, cwd=repo,
        timeout=600)
    assert "FAILURES: 0" in out.stdout, out.stdout + out.stderr
    assert "msg_fit" in out.stdout.replace("\r", "\n")
