"""Entity-resolution merge — the deterministic half of the reference's
post-LLM graph rewrite (graphrag/entity_resolution.py:107-125 and
graphrag/general/extractor.py:192-225).

The reference pipeline: candidate pairs (operators/entities.py here)
-> LLM yes/no judge (model seam) -> connected components over the
"yes" pairs -> ``_merge_graph_nodes`` folds every component into one
keeper node, re-points edges, and re-ranks with ``nx.pagerank``
(operators/graph.py:pagerank here).  This module re-expresses the
sequential in-place networkx fold as relational algebra:

- ``resolution_mapping``: components over resolved pairs (the
  pointer-jumping CC machinery); keeper = the component's minimum
  entity name.  The reference's keeper is ``nodes[0]`` in
  ``nx.connected_components`` insertion order
  (entity_resolution.py:111-115) — set-iteration order, so the
  reference itself is run-to-run nondeterministic; minimum-name is
  the canonical determinization.
- ``merge_resolved_nodes``: extractor.py:192-225 node fold —
  description = keeper's description then the absorbed members'
  (reference: cluster iteration order; here: sorted by entity name,
  same determinization), joined with ``<SEP>``; keywords/source ids
  united.  NOTE the reference's own accumulation lines are buggy:
  ``sorted(set(node0_attrs[attr].extend(node1_attrs[attr])))``
  (extractor.py:205) and
  ``list(set(edge0_attrs["keywords"].extend(...)))``
  (extractor.py:217-218) call ``list.extend`` — which returns
  ``None`` — inside ``set(...)``, a TypeError whenever reached.  The
  evident intent (sorted distinct union) is what ships here, with
  this citation as the divergence record.
- ``merge_resolved_edges``: edges from an absorbed node to outside
  the cluster re-point to the keeper; parallel edges merge (weights
  summed, descriptions joined, keywords/source ids united); edges
  between cluster members are dropped outright (extractor.py:206-208:
  neighbors in ``nodes_set`` are skipped and vanish with
  ``remove_node``) — their weight is NOT folded anywhere, a reference
  behavior we preserve.
- ``truncate_descriptions``: extractor.py:227-238
  ``_handle_entity_relation_summary`` — the deterministic branch is
  ``truncate(description, 512)`` and an LLM summary fires only above
  12 ``<SEP>`` parts (that call is the model seam); the truncation
  itself is the real ``tokens.truncate`` applied per Arrow batch.
- ``parse_resolution_results``: entity_resolution.py:157-182
  ``_process_results`` — the LLM-answer parser is pure regex
  rule-code even though its input comes from a model: split records
  on ``##``, index between ``<|>...<|>``, verdict between
  ``&&...&&``, keep ``yes`` (case-insensitive) with index in
  [1, records_length].  All four gates (missing index -> 0 -> drop,
  out-of-range index -> skip before the verdict check, missing
  verdict -> drop, non-yes -> drop) are replicated JVM-side.

Scale shape: every shuffle is keyed on entity names (short strings)
or carries per-component attribute rows; components are resolution
clusters (a handful of names), never the corpus.  The CC step is the
same O(log d) pointer-jumping used by dedup.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .dedup import dup_clusters
from .graph import GRAPH_FIELD_SEP


def resolution_mapping(pairs: DataFrame,
                       a_col: str = "ent_a",
                       b_col: str = "ent_b") -> DataFrame:
    """(entity, keeper) for every entity in a resolved component;
    keeper = min member name (determinization of the reference's
    set-iteration-order ``nodes[0]``)."""
    return dup_clusters(pairs, a_col=a_col, b_col=b_col) \
        .select(F.col("doc_id").alias("entity"),
                F.col("cluster_id").alias("keeper"))


def _mapped(col: str, mapping: DataFrame, out: str) -> DataFrame:
    return mapping.select(F.col("entity").alias(col),
                          F.col("keeper").alias(out))


def merge_resolved_nodes(nodes: DataFrame, mapping: DataFrame,
                         entity_col: str = "entity",
                         description_col: str = "description",
                         source_col: str = "source_id") -> DataFrame:
    """Fold resolved components into their keeper node
    (extractor.py:192-225).  Untouched nodes pass through unchanged —
    the reference only rewrites cluster members.  Output:
    (entity, description, source_id array, n_merged)."""
    base = nodes.select(
        F.col(entity_col).alias("entity"),
        F.col(description_col).alias("description"),
        F.col(source_col).alias("source_id"))
    withk = base.join(F.broadcast(_mapped("entity", mapping, "keeper")),
                      "entity", "left") \
        .withColumn("keeper", F.coalesce("keeper", "entity"))
    # keeper's own description leads; absorbed members follow in
    # sorted-name order (determinized cluster iteration order)
    ordk = F.struct((F.col("entity") != F.col("keeper")).alias("o1"),
                    F.col("entity").alias("o2"))
    return (
        withk.groupBy("keeper")
        .agg(F.array_join(
                F.transform(F.array_sort(F.collect_list(
                    F.struct(ordk.alias("o"),
                             F.col("description").alias("d")))),
                    lambda s: s["d"]),
                GRAPH_FIELD_SEP).alias("description"),
             F.array_sort(F.array_distinct(F.flatten(
                 F.collect_list("source_id")))).alias("source_id"),
             F.count("*").alias("n_merged"))
        .withColumnRenamed("keeper", "entity")
    )


def merge_resolved_edges(edges: DataFrame, mapping: DataFrame,
                         src: str = "src", dst: str = "dst",
                         weight: str = "weight",
                         description_col: str = "description",
                         keywords_col: str = "keywords",
                         source_col: str = "source_id") -> DataFrame:
    """Re-point absorbed nodes' edges to their keeper and merge
    parallels (extractor.py:206-220): weights summed, descriptions
    ``<SEP>``-joined (sorted by the pre-merge canonical endpoint pair
    — determinized iteration order), keywords/source ids united.
    Intra-cluster edges are dropped, weight and all, matching the
    reference's ``neighbor in nodes_set`` skip."""
    base = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        F.col(weight).cast("double").alias("weight"),
        F.col(description_col).alias("description"),
        F.col(keywords_col).alias("keywords"),
        F.col(source_col).alias("source_id"))
    m = (base
         .join(F.broadcast(_mapped("src", mapping, "ksrc")),
               "src", "left")
         .join(F.broadcast(_mapped("dst", mapping, "kdst")),
               "dst", "left")
         .withColumn("ksrc", F.coalesce("ksrc", "src"))
         .withColumn("kdst", F.coalesce("kdst", "dst"))
         .where(F.col("ksrc") != F.col("kdst"))
         .withColumn("a", F.least("ksrc", "kdst"))
         .withColumn("b", F.greatest("ksrc", "kdst")))
    okey = F.struct(F.least("src", "dst").alias("o1"),
                    F.greatest("src", "dst").alias("o2"))
    return (
        m.groupBy("a", "b")
        .agg(F.sum("weight").alias("weight"),
             F.array_join(
                 F.transform(F.array_sort(F.collect_list(
                     F.struct(okey.alias("o"),
                              F.col("description").alias("d")))),
                     lambda s: s["d"]),
                 GRAPH_FIELD_SEP).alias("description"),
             F.array_sort(F.array_distinct(F.flatten(
                 F.collect_list("keywords")))).alias("keywords"),
             F.array_sort(F.array_distinct(F.flatten(
                 F.collect_list("source_id")))).alias("source_id"),
             F.count("*").alias("n_merged"))
        .withColumnRenamed("a", "src").withColumnRenamed("b", "dst")
    )


def truncate_descriptions(df: DataFrame, col: str = "description",
                          max_tokens: int = 512) -> DataFrame:
    """extractor.py:227-238 deterministic branch:
    ``truncate(description, 512)`` per row via the real token counter;
    above 12 ``<SEP>`` parts the reference additionally asks an LLM to
    summarize the truncated text — that call is the model seam and the
    truncated text is exactly what it would receive."""
    schema = df.schema

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ragflow_spark.extractlib.tokens import truncate
        for pdf in it:
            pdf[col] = [truncate(s, max_tokens) for s in pdf[col]]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def parse_resolution_results(responses: DataFrame,
                             response_col: str = "response",
                             nrecords_col: str = "n_records",
                             record_delimiter: str = "##",
                             entity_index_delimiter: str = "<|>",
                             resolution_result_delimiter: str = "&&"
                             ) -> DataFrame:
    """entity_resolution.py:157-182 ``_process_results`` over a table
    of LLM responses: one output row per accepted (row, question
    index).  Pure JVM expressions — split, regexp_extract, filters."""
    import re as _re
    # the reference splits literally — escape like the other two
    # delimiters, or a regex-significant custom delimiter mis-splits
    rec = responses.withColumn(
        "_rec", F.explode(F.split(F.col(response_col),
                                  F.lit(_re.escape(record_delimiter)),
                                  -1)))
    pat_int = f"{_re.escape(entity_index_delimiter)}(\\d+)" \
              f"{_re.escape(entity_index_delimiter)}"
    pat_bool = f"{_re.escape(resolution_result_delimiter)}([a-zA-Z]+)" \
               f"{_re.escape(resolution_result_delimiter)}"
    got = rec.withColumn("_i", F.regexp_extract(F.trim("_rec"),
                                                pat_int, 1)) \
        .withColumn("_b", F.regexp_extract(F.trim("_rec"), pat_bool, 1))
    # reference gate order: missing index -> 0; index > n skipped
    # BEFORE the verdict check; 0-index or empty verdict dropped;
    # only lower()=='yes' accepted
    idx = F.when(F.col("_i") == "", F.lit(0)) \
        .otherwise(F.col("_i").cast("long"))
    return (
        got.withColumn("_idx", idx)
        .where(F.col("_idx") <= F.col(nrecords_col))
        .where((F.col("_idx") > 0) & (F.col("_b") != "")
               & (F.lower("_b") == "yes"))
        .drop("_rec", "_i", "_b")
        .withColumnRenamed("_idx", "question")
    )
