"""subgraph_gate vs the reference endpoint rule (index.py:145-157):
relations keep only same-document endpoints; cross-document entity
names must not leak."""

import pytest

from ragflow_spark.job.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


def test_gate_and_stats(spark):
    from ragflow_spark.operators.extraction import subgraph_gate

    ents = spark.createDataFrame(
        [("d1", "A"), ("d1", "B"), ("d1", "A"),   # dup mention
         ("d2", "C")],
        schema="chunk_key string, entity_name string")
    rels = spark.createDataFrame(
        [("d1", "A", "B", 1.0),    # kept
         ("d1", "A", "C", 1.0),    # C is d2's entity: ignored (no leak)
         ("d1", "A", "Z", 1.0),    # Z nowhere: ignored
         ("d2", "C", "C", 2.0)],   # self-pair, both endpoints: kept
        schema="chunk_key string, src_id string, tgt_id string, "
               "weight double")
    kept, stats = subgraph_gate(ents, rels)
    assert sorted((r["chunk_key"], r["src_id"], r["tgt_id"])
                  for r in kept.collect()) == \
        [("d1", "A", "B"), ("d2", "C", "C")]
    got = {r["chunk_key"]: (r["n_nodes"], r["n_edges"],
                            r["ignored_rels"])
           for r in stats.collect()}
    assert got == {"d1": (2, 1, 2), "d2": (1, 1, 0)}


def test_doc_without_relations(spark):
    from ragflow_spark.operators.extraction import subgraph_gate

    ents = spark.createDataFrame(
        [("d9", "X"), ("d9", "Y")],
        schema="chunk_key string, entity_name string")
    rels = spark.createDataFrame(
        [], schema="chunk_key string, src_id string, tgt_id string")
    _kept, stats = subgraph_gate(ents, rels)
    assert [(r["n_nodes"], r["n_edges"], r["ignored_rels"])
            for r in stats.collect()] == [(2, 0, 0)]


def test_rels_without_entities_still_report_ignored(spark):
    """A doc whose response parsed only relations still reports its
    ignored count (the reference's per-rel loop runs regardless)."""
    from ragflow_spark.operators.extraction import subgraph_gate

    ents = spark.createDataFrame(
        [("d1", "A")], schema="chunk_key string, entity_name string")
    rels = spark.createDataFrame(
        [("d2", "X", "Y", 1.0), ("d2", "X", "Z", 1.0)],
        schema="chunk_key string, src_id string, tgt_id string, "
               "weight double")
    _kept, stats = subgraph_gate(ents, rels)
    got = {r["chunk_key"]: (r["n_nodes"], r["n_edges"],
                            r["ignored_rels"])
           for r in stats.collect()}
    assert got["d2"] == (0, 0, 2)
    assert got["d1"] == (1, 0, 0)
