"""community_prompt_inputs vs a transcription of the reference's
pairwise CSV construction (community_reports_extractor.py:60-88), and
parse_community_reports vs the clean + type-gate + markdown rules
(extractor:95-154, utils.py:81-92)."""

import json

import pandas as pd
import pytest

from ragflow_spark.job.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _ref_inputs(ents, node_desc, edge_desc, cap=10000):
    """Reference loop: ents in community order; edge_desc keyed by
    frozenset pair."""
    if len(ents) < 2:
        return None
    ent_df = pd.DataFrame(
        [{"entity": e, "description": node_desc[e]} for e in ents])
    rela_list, k = [], 0
    for i in range(len(ents)):
        if k >= cap:
            break
        for j in range(i + 1, len(ents)):
            if k >= cap:
                break
            d = edge_desc.get(frozenset((ents[i], ents[j])))
            if d is None:
                continue
            rela_list.append({"source": ents[i], "target": ents[j],
                              "description": d})
            k += 1
    rela_df = pd.DataFrame(rela_list)
    return (ent_df.to_csv(index_label="id"),
            rela_df.to_csv(index_label="id"))


def test_prompt_inputs_match_reference(spark):
    from ragflow_spark.operators.community_reports import \
        community_prompt_inputs

    comms = {
        1: ["e1", "e2", "e3", "e4"],
        2: ["e5", "e6"],
        3: ["e7"],              # <2 after all: skipped
        4: ["e8", "e9"],        # no internal edge: empty rela frame
    }
    node_desc = {f"e{i}": f"desc {i}" for i in range(1, 10)}
    # stored orientations deliberately mixed
    edges = [("e2", "e1", "r12"), ("e1", "e3", "r13"),
             ("e4", "e3", "r34"), ("e5", "e6", "r56"),
             ("e1", "e9", "r19")]   # cross-community edge: ignored
    edge_desc = {frozenset((a, b)): d for a, b, d in edges}

    members = spark.createDataFrame(
        [(0, c, i, e) for c, es in comms.items()
         for i, e in enumerate(es)],
        schema="level int, comm long, seq long, ent string")
    nodes = spark.createDataFrame(
        list(node_desc.items()), schema="ent string, description string")
    edf = spark.createDataFrame(
        edges, schema="src string, tgt string, description string")

    got = {r["comm"]: (r["ent_csv"], r["rela_csv"])
           for r in community_prompt_inputs(members, nodes,
                                            edf).collect()}
    for c, es in comms.items():
        want = _ref_inputs(es, node_desc, edge_desc)
        if want is None:
            assert c not in got
        else:
            assert got[c] == want, c


def test_pair_cap_counts_found_pairs(spark):
    from ragflow_spark.operators.community_reports import \
        community_prompt_inputs

    ents = [f"e{i}" for i in range(6)]
    edges = [(ents[i], ents[j], f"r{i}{j}")
             for i in range(6) for j in range(i + 1, 6)]
    edge_desc = {frozenset((a, b)): d for a, b, d in edges}
    members = spark.createDataFrame(
        [(0, 1, i, e) for i, e in enumerate(ents)],
        schema="level int, comm long, seq long, ent string")
    nodes = spark.createDataFrame(
        [(e, "d") for e in ents], schema="ent string, description string")
    edf = spark.createDataFrame(
        edges, schema="src string, tgt string, description string")
    got = community_prompt_inputs(members, nodes, edf,
                                  pair_cap=4).collect()[0]
    want = _ref_inputs(ents, {e: "d" for e in ents}, edge_desc, cap=4)
    assert (got["ent_csv"], got["rela_csv"]) == want
    assert got["rela_csv"].count("\n") == 5     # header + 4 pairs


def _parse(spark, cases):
    from ragflow_spark.operators.community_reports import \
        parse_community_reports
    df = spark.createDataFrame(
        [(0, i, r) for i, r in enumerate(cases)],
        schema="level int, comm long, response string")
    return {r["comm"]: r for r in
            parse_community_reports(df).collect()}


def test_parse_gates_and_markdown(spark):
    ok = {"title": "T", "summary": "S",
          "findings": [{"summary": "f1", "explanation": "x1"},
                       "bare string", {"summary": "f2"}],
          "rating": 8.5, "rating_explanation": "good"}
    cases = [
        json.dumps(ok),                                   # 0 valid
        "The answer is:\n" + json.dumps(ok) + " trailing",  # 1 strip
        json.dumps(ok).replace("{", "{{").replace("}", "}}"),  # 2
        "no braces at all",                               # 3 dropped
        json.dumps({**ok, "rating": 8}),                  # 4 int: drop
        json.dumps({**ok, "title": 3.0}),                 # 5 type: drop
        json.dumps({k: v for k, v in ok.items()
                    if k != "findings"}),                 # 6 missing
        json.dumps({**ok, "findings": []}),               # 7 empty ok
    ]
    got = _parse(spark, cases)
    assert set(got) == {0, 1, 2, 7}
    r = got[0]
    assert r["title"] == "T" and r["rating"] == 8.5
    assert r["n_findings"] == 3
    assert r["report_text"] == (
        "# T\n\nS\n\n## f1\n\nx1\n\n## bare string\n\n\n\n"
        "## f2\n\nNone")
    assert got[1]["report_text"] == r["report_text"]
    assert got[2]["report_text"] == r["report_text"]
    assert got[7]["report_text"] == "# T\n\nS\n\n"
