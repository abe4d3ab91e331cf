"""Entity-resolution merge + pagerank vs reference semantics.

PageRank parity is pinned against networkx's own nx.pagerank — the
exact call the reference makes (graphrag/general/index.py:212,
graphrag/entity_resolution.py:118).  The merge fold is pinned against
a tiny in-test reimplementation of extractor.py:192-225 with its
``list.extend``-returns-None bug corrected to the evident intent
(sorted distinct union), keeper/order determinized the same way the
operator documents.
"""
import pytest

import networkx as nx
# scipy is not installed in this container; nx.pagerank delegates to
# scipy — pin against networkx's own pure-python power iteration,
# the same published algorithm
from networkx.algorithms.link_analysis.pagerank_alg import \
    _pagerank_python as nx_pagerank
from pyspark.sql import functions as F

from ragflow_spark.operators.graph import (PageRankNoConvergence,
                                           pagerank)
from ragflow_spark.operators.resolution import (
    GRAPH_FIELD_SEP, merge_resolved_edges, merge_resolved_nodes,
    parse_resolution_results, resolution_mapping,
    truncate_descriptions)


def _pr_dict(df):
    return {r["node"]: r["pr"] for r in df.collect()}


def test_pagerank_matches_networkx_weighted(spark):
    edges = [("a", "b", 3.0), ("b", "c", 1.0), ("c", "d", 2.0),
             ("d", "a", 5.0), ("a", "c", 1.5), ("e", "a", 0.5),
             ("f", "g", 1.0)]
    g = nx.Graph()
    g.add_weighted_edges_from(edges)
    want = nx_pagerank(g)
    got = _pr_dict(pagerank(
        spark.createDataFrame(edges, "src string, dst string, "
                                     "weight double")))
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_pagerank_unweighted_and_selfloop(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "c"),
             ("c", "d")]
    g = nx.Graph()
    g.add_edges_from(edges)
    want = nx_pagerank(g)
    got = _pr_dict(pagerank(
        spark.createDataFrame(edges, "src string, dst string"),
        weight=None))
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_pagerank_isolated_node_is_dangling(spark):
    g = nx.Graph()
    g.add_weighted_edges_from([("a", "b", 1.0), ("b", "c", 2.0)])
    g.add_node("z")
    want = nx_pagerank(g)
    got = _pr_dict(pagerank(
        spark.createDataFrame([("a", "b", 1.0), ("b", "c", 2.0)],
                              "src string, dst string, weight double"),
        nodes=spark.createDataFrame([("a",), ("b",), ("c",), ("z",)],
                                    "node string")))
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_pagerank_fixed_iters_is_deterministic_power_step(spark):
    # one round from uniform on a path a-b: a gets (1-α)/2 + α·x(b)·1,
    # b symmetric — closed form
    df = spark.createDataFrame([("a", "b", 1.0)],
                               "src string, dst string, weight double")
    got = _pr_dict(pagerank(df, iters=1))
    assert got["a"] == pytest.approx(0.15 / 2 + 0.85 * 0.5)
    assert got["b"] == pytest.approx(0.15 / 2 + 0.85 * 0.5)


def test_pagerank_raises_like_nx_on_no_convergence(spark):
    df = spark.createDataFrame([("a", "b", 1.0)],
                               "src string, dst string, weight double")
    with pytest.raises(PageRankNoConvergence):
        pagerank(df, max_iter=0)


def _reference_fold(nodes, edges, clusters):
    """extractor.py:192-225 with the extend-bug corrected and the
    documented determinizations (keeper = min name, sorted absorb
    order).  nodes: {name: (desc, set(src))}; edges:
    {(a, b): (w, desc, set(kw), set(src))} canonical a<b."""
    out_nodes = {k: [v[0], set(v[1]), 1] for k, v in nodes.items()}
    out_edges = {k: [v[0], [v[1]], set(v[2]), set(v[3]), 1]
                 for k, v in edges.items()}
    for cluster in clusters:
        keeper = min(cluster)
        rest = sorted(c for c in cluster if c != keeper)
        for node1 in rest:
            d1, s1 = nodes[node1]
            out_nodes[keeper][0] += GRAPH_FIELD_SEP + d1
            out_nodes[keeper][1] |= set(s1)
            out_nodes[keeper][2] += 1
            del out_nodes[node1]
        # re-point edges
        cset = set(cluster)
        for (a, b), vals in list(out_edges.items()):
            w, descs, kw, src, nm = vals
            if a in cset or b in cset:
                if a in cset and b in cset:
                    del out_edges[(a, b)]
                    continue
                na = keeper if a in cset else a
                nb = keeper if b in cset else b
                lo, hi = min(na, nb), max(na, nb)
                del out_edges[(a, b)]
                if (lo, hi) in out_edges:
                    tgt = out_edges[(lo, hi)]
                    tgt[0] += w
                    tgt[1].extend(descs)
                    tgt[2] |= kw
                    tgt[3] |= src
                    tgt[4] += nm
                else:
                    out_edges[(lo, hi)] = [w, list(descs), set(kw),
                                           set(src), nm]
    return out_nodes, out_edges


@pytest.fixture()
def toy_graph(spark):
    nodes = {f"e{i}": (f"d{i}", {f"s{i % 3}", f"s{i % 4}"})
             for i in range(8)}
    edges = {}
    for i in range(8):
        a, b = f"e{i}", f"e{(i + 3) % 8}"
        lo, hi = min(a, b), max(a, b)
        edges[(lo, hi)] = (float(i % 4 + 1), f"r{i}", {f"k{i % 2}"},
                           {f"c{i}"})
    nodes_df = spark.createDataFrame(
        [(k, v[0], sorted(v[1])) for k, v in nodes.items()],
        "entity string, description string, source_id array<string>")
    edges_df = spark.createDataFrame(
        [(a, b, v[0], v[1], sorted(v[2]), sorted(v[3]))
         for (a, b), v in edges.items()],
        "src string, dst string, weight double, description string, "
        "keywords array<string>, source_id array<string>")
    return nodes, edges, nodes_df, edges_df


def test_merge_resolved_nodes_matches_reference_fold(spark, toy_graph):
    nodes, edges, nodes_df, edges_df = toy_graph
    pairs = [("e0", "e2"), ("e2", "e5"), ("e1", "e7")]
    clusters = [{"e0", "e2", "e5"}, {"e1", "e7"}]
    want_nodes, _ = _reference_fold(nodes, edges, clusters)

    mapping = resolution_mapping(
        spark.createDataFrame(pairs, "ent_a string, ent_b string"))
    got = {r["entity"]: r for r in
           merge_resolved_nodes(nodes_df, mapping).collect()}
    assert set(got) == set(want_nodes)
    for k, (desc, srcs, nm) in want_nodes.items():
        assert got[k]["description"] == desc
        assert got[k]["source_id"] == sorted(srcs)
        assert got[k]["n_merged"] == nm


def test_merge_resolved_edges_matches_reference_fold(spark, toy_graph):
    nodes, edges, nodes_df, edges_df = toy_graph
    pairs = [("e0", "e2"), ("e2", "e5"), ("e1", "e7")]
    clusters = [{"e0", "e2", "e5"}, {"e1", "e7"}]
    _, want_edges = _reference_fold(nodes, edges, clusters)

    mapping = resolution_mapping(
        spark.createDataFrame(pairs, "ent_a string, ent_b string"))
    got = {(r["src"], r["dst"]): r for r in
           merge_resolved_edges(edges_df, mapping).collect()}
    assert set(got) == set(want_edges)
    for k, (w, descs, kw, src, nm) in want_edges.items():
        assert got[k]["weight"] == pytest.approx(w)
        # operator orders merged descriptions by pre-merge canonical
        # endpoint pair; the in-test fold collected them append-order —
        # compare as multisets joined after sorting
        assert sorted(got[k]["description"].split(GRAPH_FIELD_SEP)) \
            == sorted(descs)
        assert got[k]["keywords"] == sorted(kw)
        assert got[k]["source_id"] == sorted(src)
        assert got[k]["n_merged"] == nm


def test_intra_cluster_edge_weight_is_dropped(spark):
    # reference extractor.py:206-208: edges between cluster members
    # vanish with remove_node — their weight is folded nowhere
    nodes_df = spark.createDataFrame(
        [("a", "da", ["s"]), ("b", "db", ["s"]), ("c", "dc", ["s"])],
        "entity string, description string, source_id array<string>")
    edges_df = spark.createDataFrame(
        [("a", "b", 9.0, "rab", ["k"], ["c1"]),
         ("b", "c", 1.0, "rbc", ["k"], ["c2"])],
        "src string, dst string, weight double, description string, "
        "keywords array<string>, source_id array<string>")
    mapping = resolution_mapping(spark.createDataFrame(
        [("a", "b")], "ent_a string, ent_b string"))
    got = merge_resolved_edges(edges_df, mapping).collect()
    assert len(got) == 1
    assert (got[0]["src"], got[0]["dst"]) == ("a", "c")
    assert got[0]["weight"] == 1.0


def test_truncate_descriptions_applies_token_budget(spark):
    from ragflow_spark.extractlib.tokens import truncate
    long = GRAPH_FIELD_SEP.join(f"word{i} alpha beta gamma delta"
                                for i in range(300))
    df = spark.createDataFrame([("e", long), ("f", "short")],
                               "entity string, description string")
    got = {r["entity"]: r["description"]
           for r in truncate_descriptions(df).collect()}
    assert got["e"] == truncate(long, 512)
    assert got["f"] == "short"
    assert len(got["e"]) < len(long)


def _reference_process_results(records_length, results,
                               record_delimiter="##",
                               entity_index_delimiter="<|>",
                               resolution_result_delimiter="&&"):
    # entity_resolution.py:157-182, verbatim logic
    import re
    ans_list = []
    records = [r.strip() for r in results.split(record_delimiter)]
    for record in records:
        pattern_int = (f"{re.escape(entity_index_delimiter)}(\\d+)"
                       f"{re.escape(entity_index_delimiter)}")
        match_int = re.search(pattern_int, record)
        res_int = int(str(match_int.group(1) if match_int else "0"))
        if res_int > records_length:
            continue
        pattern_bool = (f"{re.escape(resolution_result_delimiter)}"
                        f"([a-zA-Z]+)"
                        f"{re.escape(resolution_result_delimiter)}")
        match_bool = re.search(pattern_bool, record)
        res_bool = str(match_bool.group(1) if match_bool else "")
        if res_int and res_bool:
            if res_bool.lower() == "yes":
                ans_list.append(res_int)
    return ans_list


@pytest.mark.parametrize("resp,n", [
    ("For Question <|>1<|>, &&Yes&&.##For Question <|>2<|>, &&No&&.", 2),
    ("<|>3<|> &&yes&&", 2),          # out-of-range skipped pre-verdict
    ("no markers at all", 5),        # missing index -> 0 -> dropped
    ("<|>1<|> no verdict##<|>2<|> &&YES&&", 2),
    ("&&yes&& <|>0<|>", 3),          # explicit 0 index dropped
    ("<|>1<|>&&maybe&&##<|>1<|>&&yes&&##<|>1<|>&&yes&&", 1),
])
def test_parse_resolution_results_matches_reference(spark, resp, n):
    want = _reference_process_results(n, resp)
    df = spark.createDataFrame([(1, resp, n)],
                               "rid long, response string, "
                               "n_records long")
    got = [r["question"]
           for r in parse_resolution_results(df).collect()]
    assert sorted(got) == sorted(want)
