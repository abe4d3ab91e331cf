"""graphrag graph layer: merge, stabilize, CC/LCC, hierarchy, weights.

Pins the deterministic rule semantics of graphrag/utils.py graph_merge
and graphrag/general/leiden.py against small hand-computed graphs; the
LLM extractors and the seeded Leiden optimizer are seams (the split
rule's determinism is what these tests check, not modularity parity).
"""

import pytest

from ragflow_spark.job.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


def test_stabilize_edges_canonical_orientation(spark):
    from ragflow_spark.operators.graph import stabilize_edges

    edges = spark.createDataFrame([(2, 1), (1, 2), (3, 5)],
                                  schema="src long, dst long")
    rows = {(r["src"], r["dst"])
            for r in stabilize_edges(edges).collect()}
    assert rows == {(1, 2), (3, 5)}


def test_clean_entity_name(spark):
    from ragflow_spark.operators.graph import clean_entity_name
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(' ab&amp;c "q" \x01 ',)], schema="s string")
    out = df.select(clean_entity_name(F.col("s")).alias("c")).first()
    # unescape + strip + upper + drop quotes/control chars; the strip
    # runs BEFORE the control-char removal (utils.py:76-78), so a
    # space that preceded a stripped control char survives
    assert out["c"] == "AB&C Q "


def test_merge_graphs_descriptions_and_rank(spark):
    from ragflow_spark.operators.graph import merge_graphs

    mentions = spark.createDataFrame(
        [("apple", "d2", "c2", 2), ("Apple ", "d1", "c1", 1),
         ("banana", "d3", "c3", 3)],
        schema="entity string, description string, source_id string, "
               "seq long")
    edge_mentions = spark.createDataFrame(
        [("apple", "banana", "e2", ["k2"], "c2", 1.0, 2),
         ("banana", "apple", "e1", ["k1"], "c1", 2.0, 1)],
        schema="src string, dst string, description string, "
               "keywords array<string>, source_id string, "
               "weight double, seq long")
    nodes, edges = merge_graphs(mentions, edge_mentions)
    nd = {r["entity"]: r for r in nodes.collect()}
    # same entity (case/space-normalized) merges seq-ordered
    assert nd["APPLE"]["description"] == "d1<SEP>d2"
    assert list(nd["APPLE"]["source_id"]) == ["c1", "c2"]
    assert nd["APPLE"]["rank"] == 1          # one merged edge
    ed = edges.collect()
    assert len(ed) == 1                      # canonical pair merged
    e = ed[0]
    assert (e["src"], e["dst"]) == ("APPLE", "BANANA")
    assert e["weight"] == 3.0                # summed
    assert e["description"] == "e1<SEP>e2"   # seq order
    assert list(e["keywords"]) == ["k1", "k2"]


def test_connected_components_and_largest(spark):
    from ragflow_spark.operators.graph import (connected_components,
                                               largest_component)

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], schema="src long, dst long")
    comp = {r["node"]: r["component"]
            for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    lcc = {(r["src"], r["dst"])
           for r in largest_component(edges).collect()}
    assert lcc == {(1, 2), (2, 3)}


def test_hierarchical_split_chain(spark):
    from ragflow_spark.operators.graph import hierarchical_communities

    # one chain 0-1-...-9, cap 4 -> level 1 greedy chunks 4,4,2
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], schema="src long, dst long")
    rows = hierarchical_communities(edges, max_cluster_size=4).collect()
    lvl0 = {r["node"]: r["cluster"] for r in rows if r["level"] == 0}
    lvl1 = {r["node"]: r["cluster"] for r in rows if r["level"] == 1}
    assert lvl0 == {i: 0 for i in range(10)}
    assert lvl1 == {0: 0, 1: 0, 2: 0, 3: 0,
                    4: 4, 5: 4, 6: 4, 7: 4, 8: 8, 9: 8}
    # no level beyond 1: all sub-communities fit the cap
    assert {r["level"] for r in rows} == {0, 1}


def test_hierarchical_small_component_not_split(spark):
    from ragflow_spark.operators.graph import hierarchical_communities

    # a 3-node component under a cap of 4 stays at level 0 only
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], schema="src long, dst long")
    rows = hierarchical_communities(edges, max_cluster_size=4).collect()
    assert {r["level"] for r in rows} == {0}


def test_hierarchical_star_split_deterministic(spark):
    from ragflow_spark.operators.graph import hierarchical_communities

    # star 0-(1..5), cap 3: greedy union over sorted edges (0,1),(0,2)
    # fills {0,1,2}; 3,4,5 stay singletons (their only edge would
    # overflow the cap)
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], schema="src long, dst long")
    rows = hierarchical_communities(edges, max_cluster_size=3).collect()
    lvl1 = {r["node"]: r["cluster"] for r in rows if r["level"] == 1}
    assert lvl1 == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5}


def test_hierarchical_recursive_levels(spark):
    from ragflow_spark.operators.graph import hierarchical_communities

    # the refinement loop must terminate with every community at the
    # deepest level within the cap (greedy-capped union can never
    # produce an over-cap cluster, so chains finish at level 1)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], schema="src long, dst long")
    rows = hierarchical_communities(edges, max_cluster_size=6).collect()
    import collections
    last = max(r["level"] for r in rows)
    sizes = collections.Counter(
        r["cluster"] for r in rows if r["level"] == last)
    assert max(sizes.values()) <= 6


def test_community_weights_normalized(spark):
    from ragflow_spark.operators.graph import community_weights

    assigns = spark.createDataFrame(
        [(0, 1, 100), (0, 2, 100), (0, 3, 200)],
        schema="level int, node long, cluster long")
    attrs = spark.createDataFrame(
        [(1, 3, 1.0), (2, 1, 1.0), (3, 2, 1.0)],
        schema="node long, rank int, weight double")
    w = {r["cluster"]: r["weight"]
         for r in community_weights(assigns, attrs).collect()}
    # cluster 100 weight 4, cluster 200 weight 2 -> normalized by 4
    assert w == {100: 1.0, 200: 0.5}


def test_hierarchical_communities_string_nodes(spark):
    """The KG keys nodes by entity-name strings; the refinement level
    must handle them (labels = lexicographic min member)."""
    from ragflow_spark.operators.graph import hierarchical_communities

    # a 6-node chain of string entities, cap 3 -> level 1 splits
    edges = spark.createDataFrame(
        [(f"E{i}", f"E{i+1}") for i in range(5)],
        schema="src string, dst string")
    rows = hierarchical_communities(edges, max_cluster_size=3).collect()
    lv0 = {r["node"]: r["cluster"] for r in rows if r["level"] == 0}
    lv1 = {r["node"]: r["cluster"] for r in rows if r["level"] == 1}
    assert set(lv0) == {f"E{i}" for i in range(6)}
    assert set(lv0.values()) == {"E0"}
    assert lv1  # the oversized root community was refined
    assert all(isinstance(c, str) for c in lv1.values())
    assert all(
        sum(1 for v in lv1.values() if v == c) <= 3
        for c in set(lv1.values()))
