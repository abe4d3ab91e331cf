"""KGSearch score fusion (graphrag/search.py:140-310): the operator
vs a dict-based simulation transcribed from the reference's control
flow, plus the iteration-order quirks pinned individually."""
import pandas as pd
import pytest

from ragflow_spark.operators.kg_search import (fuse_entities,
                                               fuse_relations,
                                               kg_content, nhop_pairs)


def _simulate(ents_q, ents_t, rels, store, ent_topn=6, rel_topn=6):
    """Reference control flow (search.py:169-224), dicts and all.
    ents_q: [(entity, sim, pagerank, nhops)] in ES order;
    rels: [((f, t), sim, pagerank)] in ES order (keys pre-sorted);
    store: {frozenset pair: description}."""
    eq = {e: {"sim": s, "pagerank": p, "n_hop_ents": nh}
          for e, s, p, nh in ents_q}
    rq = {k: {"sim": s, "pagerank": p} for k, s, p in rels}
    nhop = {}
    for ent in eq.values():
        for nbr in ent["n_hop_ents"]:
            path, wts = nbr["path"], nbr["weights"]
            for i in range(len(path) - 1):
                f, t = path[i], path[i + 1]
                if (f, t) in nhop:
                    nhop[(f, t)]["sim"] += ent["sim"] / (2 + i)
                else:
                    nhop[(f, t)] = {"sim": ent["sim"] / (2 + i)}
                nhop[(f, t)]["pagerank"] = wts[i]
    for ent in ents_t:
        if ent in eq:
            eq[ent]["sim"] *= 2
    for (f, t) in list(rq.keys()):
        pair = tuple(sorted([f, t]))
        s = 0
        if pair in nhop:
            s += nhop[pair]["sim"]
            del nhop[pair]
        s += (f in ents_t) + (t in ents_t)
        rq[(f, t)]["sim"] *= s + 1
    for (f, t) in list(nhop.keys()):
        if frozenset((f, t)) not in store:
            continue
        s = (f in ents_t) + (t in ents_t)
        rq[(f, t)] = {"sim": nhop[(f, t)]["sim"] * (s + 1),
                      "pagerank": nhop[(f, t)]["pagerank"]}
    top_e = sorted(eq.items(), key=lambda x: x[1]["sim"]
                   * x[1]["pagerank"], reverse=True)[:ent_topn]
    top_r = sorted(rq.items(), key=lambda x: x[1]["sim"]
                   * x[1]["pagerank"], reverse=True)[:rel_topn]
    return ([(e, round(v["sim"] * v["pagerank"], 9)) for e, v in top_e],
            [(k, round(v["sim"] * v["pagerank"], 9)) for k, v in top_r])


def _inputs(spark, qid=0):
    ents_q = [("A", 0.4, 2, [{"path": ["A", "B", "C"],
                              "weights": [0.5, 0.7]}]),
              ("B", 0.6, 1, [{"path": ["B", "C"], "weights": [0.9]}]),
              ("D", 0.3, 3, [])]
    ents_t = {"B", "C"}
    rels = [(("B", "C"), 0.5, 2), (("A", "D"), 0.45, 4)]
    store = {frozenset(("A", "B")): "sAB"}
    eq_df = spark.createDataFrame(
        [(qid, e, s, float(p), i, nh, '{"description": "d%d"}' % i)
         for i, (e, s, p, nh) in enumerate(ents_q)],
        "qid long, entity string, sim double, pagerank double, "
        "ent_seq long, nhops array<struct<path:array<string>,"
        "weights:array<double>>>, description string")
    et_df = spark.createDataFrame([(qid, e) for e in sorted(ents_t)],
                                  "qid long, entity string")
    r_df = spark.createDataFrame(
        [(qid, f, t, s, float(p), i, '{"description": "r%d"}' % i)
         for i, ((f, t), s, p) in enumerate(rels)],
        "qid long, f string, t string, sim double, pagerank double, "
        "rel_seq long, description string")
    st_df = spark.createDataFrame(
        [(min(p), max(p), "s" + "".join(sorted(p)))
         for p in store], "f string, t string, description string")
    return ents_q, ents_t, rels, store, eq_df, et_df, r_df, st_df


def test_fusion_matches_reference_simulation(spark):
    ents_q, ents_t, rels, store, eq_df, et_df, r_df, st_df = \
        _inputs(spark)
    exp_e, exp_r = _simulate(ents_q, ents_t, rels, store)
    got_e = fuse_entities(eq_df, et_df).orderBy("rank").collect()
    assert [(r["entity"], round(r["score"], 9)) for r in got_e] == exp_e
    got_r = fuse_relations(r_df, eq_df, et_df, st_df) \
        .orderBy("rank").collect()
    assert [((r["f"], r["t"]), round(r["score"], 9))
            for r in got_r] == exp_r


def test_nhop_accumulation_and_last_writer_pagerank(spark):
    # two entities contribute to the SAME pair with different weights:
    # sims add (0.4/2 + 0.8/3), pagerank is the LAST writer in
    # (ent_seq, nbr_seq, hop_i) order -> 0.9 (ent_seq=1 wins)
    eq_df = spark.createDataFrame(
        [(0, "A", 0.4, 1.0, 0,
          [{"path": ["X", "Y"], "weights": [0.5]}], "{}"),
         (0, "B", 0.8, 1.0, 1,
          [{"path": ["W", "X", "Y"], "weights": [0.2, 0.9]}], "{}")],
        "qid long, entity string, sim double, pagerank double, "
        "ent_seq long, nhops array<struct<path:array<string>,"
        "weights:array<double>>>, description string")
    row = {(r["f"], r["t"]): r for r in nhop_pairs(eq_df).collect()}
    assert row[("X", "Y")]["nhop_sim"] == pytest.approx(
        0.4 / 2 + 0.8 / 3)
    assert row[("X", "Y")]["nhop_pagerank"] == 0.9
    assert row[("W", "X")]["nhop_pagerank"] == 0.2


def test_path_order_pair_not_consumed_by_sorted_text_key(spark):
    # n-hop pair ("e9","e10") is path-ordered; the text relation key
    # sorted(["e9","e10"]) == ("e10","e9") string-wise — the reference
    # dict never matches them, so BOTH survive: the text rel unboosted,
    # the n-hop pair as its own relation via the store
    eq_df = spark.createDataFrame(
        [(0, "e9", 0.6, 1.0, 0,
          [{"path": ["e9", "e10"], "weights": [0.5]}], "{}")],
        "qid long, entity string, sim double, pagerank double, "
        "ent_seq long, nhops array<struct<path:array<string>,"
        "weights:array<double>>>, description string")
    et_df = spark.createDataFrame([], "qid long, entity string")
    r_df = spark.createDataFrame(
        [(0, "e10", "e9", 0.5, 2.0, 0, "{}")],
        "qid long, f string, t string, sim double, pagerank double, "
        "rel_seq long, description string")
    st_df = spark.createDataFrame([("e10", "e9", "sd")],
                                  "f string, t string, "
                                  "description string")
    got = fuse_relations(r_df, eq_df, et_df, st_df).collect()
    pairs = {(r["f"], r["t"]): r for r in got}
    assert set(pairs) == {("e10", "e9"), ("e9", "e10")}
    assert pairs[("e10", "e9")]["sim"] == pytest.approx(0.5)  # s=0
    assert pairs[("e9", "e10")]["sim"] == pytest.approx(0.3)  # 0.6/2

    # the store lookup is orientation-insensitive (get_relation puts
    # both endpoints in both fields): stored as ("e10","e9") yet the
    # path-ordered ("e9","e10") still finds its description
    assert pairs[("e9", "e10")]["description"] == "sd"


def test_leftover_dropped_without_store_description(spark):
    eq_df = spark.createDataFrame(
        [(0, "A", 0.6, 1.0, 0,
          [{"path": ["A", "B"], "weights": [0.5]}], "{}")],
        "qid long, entity string, sim double, pagerank double, "
        "ent_seq long, nhops array<struct<path:array<string>,"
        "weights:array<double>>>, description string")
    et_df = spark.createDataFrame([], "qid long, entity string")
    r_df = spark.createDataFrame(
        [], "qid long, f string, t string, sim double, "
        "pagerank double, rel_seq long, description string")
    st_df = spark.createDataFrame([("X", "Y", "sd")],
                                  "f string, t string, "
                                  "description string")
    assert fuse_relations(r_df, eq_df, et_df, st_df).count() == 0


def test_content_sections_and_budget_overdraft(spark):
    ents = spark.createDataFrame(
        [(0, "A", 1.0, 1.0, 1.5, 1, '{"description": "da"}'),
         (0, "B", 1.0, 1.0, 1.2, 2, None)],
        "qid long, entity string, sim double, pagerank double, "
        "score double, rank int, description string")
    rels = spark.createDataFrame(
        [(0, "A", "B", 1.0, 1.0, 2.25, 1, '{"description": "dr"}')],
        "qid long, f string, t string, sim double, pagerank double, "
        "score double, rank int, description string")
    comms = spark.createDataFrame(
        [(["A", "Z"], "commX", "repX", "evX", 5.0),
         (["Q"], "commQ", "repQ", "evQ", 9.0)],
        "entities array<string>, name string, report string, "
        "evidences string, weight double")
    out = kg_content(ents, rels, comms).collect()
    assert len(out) == 1
    txt = out[0]["content"]
    # pandas to_csv rendering, index column included, null desc -> ""
    assert "\n---- Entities ----\n,Entity,Score,Description\n" \
        "0,A,1.50,da\n1,B,1.20,\n" in txt
    assert "\n---- Relations ----\n,From Entity,To Entity,Score," \
        "Description\n0,A,B,2.25,dr\n" in txt
    # only the entity-sharing community, despite lower weight
    assert "# 1. commX\n## Content\nrepX\n## Evidences\nevX\n" in txt
    assert "commQ" not in txt

    # budget: the row that drives the budget to <=0 is dropped AND its
    # token cost still carries into the next section (the reference
    # mutates max_token before break)
    from ragflow_spark.extractlib.tokens import num_tokens_from_string
    t_a = num_tokens_from_string(str(
        {"Entity": "A", "Score": "1.50", "Description": "da"}))
    t_b = num_tokens_from_string(str(
        {"Entity": "B", "Score": "1.20", "Description": ""}))
    tight = kg_content(ents, rels, comms,
                       max_token=t_a + t_b).collect()[0]
    assert "0,A,1.50,da" in tight["content"]
    assert "1,B" not in tight["content"]          # B dropped at <=0
    assert "---- Relations ----" not in tight["content"]  # overdraft


def test_content_empty_sections_omitted(spark):
    ents = spark.createDataFrame(
        [], "qid long, entity string, sim double, pagerank double, "
        "score double, rank int, description string")
    rels = spark.createDataFrame(
        [(0, "A", "B", 1.0, 1.0, 1.0, 1, None)],
        "qid long, f string, t string, sim double, pagerank double, "
        "score double, rank int, description string")
    comms = spark.createDataFrame(
        [], "entities array<string>, name string, report string, "
        "evidences string, weight double")
    txt = kg_content(ents, rels, comms).collect()[0]["content"]
    assert "---- Entities ----" not in txt
    assert txt.startswith("\n---- Relations ----")
    assert "Community" not in txt


def test_pandas_csv_parity_with_real_pandas():
    """_pandas_csv must be byte-identical to pd.DataFrame(rows)
    .to_csv() — the reference's renderer (search.py:243,252) — across
    QUOTE_MINIMAL's edge cases: delimiter/quote/CR/LF in fields,
    empty strings, None, unicode, and column names needing quotes."""
    import pandas as pd

    from ragflow_spark.operators.kg_search import _pandas_csv

    cases = [
        [{"Entity": "e1", "Score": "2.52", "Description": "plain"}],
        [{"Entity": "a,b", "Score": "0.00",
          "Description": 'say "hi"'},
         {"Entity": "line\nbreak", "Score": "1.10",
          "Description": "tab\there"}],
        [{"Entity": "", "Score": "9.99", "Description": None}],
        [{"Entity": "cr\rhere", "Score": "1.00",
          "Description": "semi;colon"}],
        [{"Entity": "ünïcødé 中文", "Score": "3.14",
          "Description": "emoji 🙂"}],
        [{"A,col": "v", 'B"q': "w"}],
        [{"From Entity": "e1", "To Entity": "e2", "Score": "0.05",
          "Description": "d"} for _ in range(6)],
    ]
    for rows in cases:
        assert _pandas_csv(rows) == pd.DataFrame(rows).to_csv()
