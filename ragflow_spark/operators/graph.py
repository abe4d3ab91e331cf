"""graphrag deterministic graph layer, Spark-relational.

Re-expresses the rule-code side of the reference's knowledge-graph
pipeline — the LLM entity/relation extractors and the graspologic
Leiden optimizer stay seams:

- ``merge_graphs``: graphrag/utils.py:197-228 graph_merge as one
  aggregation over per-chunk mention rows instead of sequential
  in-place networkx merges — descriptions joined with ``<SEP>`` in
  chunk order, source ids accumulated, edge weights summed over the
  canonical (min, max) orientation, node rank = merged degree.
- ``normalize_entity_names`` / ``clean_str`` semantics
  (graphrag/utils.py:70-78, leiden.py:57-60): HTML unescape + upper +
  strip + control-char strip.
- ``stabilize_edges``: leiden.py:17-54 _stabilize_graph — canonical
  source<target orientation and a stable (source, target) sort order
  so every run reads the same relationships identically.
- ``connected_components`` / ``largest_component``:
  stable_largest_connected_component (leiden.py:63-68) over the
  pointer-jumping CC machinery from operators/dedup.
- ``hierarchical_communities``: the hierarchy contract of
  graspologic's hierarchical_leiden (leiden.py:72-91) — level 0 is the
  root partition; any community larger than ``max_cluster_size`` is
  recursively split at the next level until every community fits.  The
  seeded Leiden modularity optimizer is the algorithm seam; the
  deterministic stand-in splits an oversized community by greedy
  size-capped union over its stabilized edge order, which respects
  edge locality and is reproducible across engines.  Scale note: the
  reference materializes the ENTIRE graph in one networkx process
  (leiden.py:85-88), so refining one community per Arrow group is
  strictly more distributed than the reference; the level-0 partition
  itself is the O(log d) pointer-jumping rounds, never driver-side.
- ``community_weights``: leiden.py:117-137 run() — community weight =
  sum(rank * weight) over member nodes, normalized by the level's max.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .dedup import dup_clusters

GRAPH_FIELD_SEP = "<SEP>"

# the html entities clean_str's unescape sees in extractor output;
# full html.unescape is python-side — these cover the LLM-emitted set
_UNESCAPES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
              ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'")]


def clean_entity_name(col):
    """clean_str(x.upper()) for entity names (utils.py:70-78,240):
    unescape, strip, upper, drop double quotes and control chars."""
    c = F.trim(col)
    for src, dst in _UNESCAPES:
        c = F.replace(c, F.lit(src), F.lit(dst))
    c = F.upper(c)
    return F.regexp_replace(c, r"[\"\x00-\x1f\x7f-\x9f]", "")


def stabilize_edges(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """_stabilize_graph (leiden.py:17-54): undirected edges get the
    canonical source<target orientation; downstream sorts on
    (source, target) are then stable across runs."""
    return edges.withColumn("_s", F.least(src, dst)) \
        .withColumn("_d", F.greatest(src, dst)) \
        .drop(src, dst) \
        .withColumnRenamed("_s", src).withColumnRenamed("_d", dst)


def merge_graphs(mentions: DataFrame,
                 edge_mentions: DataFrame) -> tuple[DataFrame, DataFrame]:
    """graph_merge (utils.py:197-228) over mention rows.

    ``mentions``: (entity, description, source_id, seq) — one row per
    per-chunk extraction; ``edge_mentions``: (src, dst, description,
    keywords, source_id, weight, seq).  Returns (nodes, edges):

    - nodes: entity, description (``<SEP>``-joined in seq order),
      source_id (collected in seq order), rank (degree of the merged
      graph — utils.py:222-223 recomputes it from g1.degree after
      every merge, so only the final degree survives)
    - edges: canonical (src, dst), weight summed, descriptions joined,
      keywords/source ids accumulated in seq order

    One shuffle per table, keyed on the entity / canonical pair —
    the sequential g2-into-g1 loop is order-equivalent because every
    reference merge op (+= on strings/lists/weights) is associative
    with the seq-ordered aggregation."""
    def _join_ordered(col_struct):
        arr = F.array_sort(F.collect_list(col_struct))
        return arr

    nodes = (
        mentions
        .withColumn("entity", clean_entity_name(F.col("entity")))
        .groupBy("entity")
        .agg(
            F.concat_ws(
                GRAPH_FIELD_SEP,
                F.transform(
                    _join_ordered(F.struct("seq", "description")),
                    lambda s: s["description"])).alias("description"),
            F.transform(
                _join_ordered(F.struct("seq", "source_id")),
                lambda s: s["source_id"]).alias("source_id"),
        )
    )
    ecanon = stabilize_edges(
        edge_mentions
        .withColumn("src", clean_entity_name(F.col("src")))
        .withColumn("dst", clean_entity_name(F.col("dst"))))
    edges = (
        ecanon.groupBy("src", "dst")
        .agg(
            F.sum("weight").alias("weight"),
            F.concat_ws(
                GRAPH_FIELD_SEP,
                F.transform(
                    _join_ordered(F.struct("seq", "description")),
                    lambda s: s["description"])).alias("description"),
            F.flatten(F.transform(
                _join_ordered(F.struct("seq", "keywords")),
                lambda s: s["keywords"])).alias("keywords"),
            F.transform(
                _join_ordered(F.struct("seq", "source_id")),
                lambda s: s["source_id"]).alias("source_id"),
        )
    )
    # rank = degree over the merged (deduplicated) edge set
    deg = (
        edges.select(F.col("src").alias("entity"))
        .unionAll(edges.select(F.col("dst").alias("entity")))
        .groupBy("entity").agg(F.count("*").alias("rank"))
    )
    nodes = nodes.join(deg, "entity", "left") \
        .withColumn("rank", F.coalesce("rank", F.lit(0)))
    return nodes, edges


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """(node, component): component label = min member id (the
    dedup.dup_clusters pointer-jumping machinery)."""
    return dup_clusters(edges, a_col=src, b_col=dst) \
        .withColumnRenamed("doc_id", "node") \
        .withColumnRenamed("cluster_id", "component")


def largest_component(edges: DataFrame, src: str = "src",
                      dst: str = "dst") -> DataFrame:
    """stable_largest_connected_component (leiden.py:63-68): the edge
    set restricted to the biggest component (ties broken by smaller
    component label, deterministically)."""
    comp = connected_components(edges, src, dst)
    sizes = comp.groupBy("component").agg(F.count("*").alias("n"))
    top = sizes.orderBy(F.col("n").desc(), F.col("component")).limit(1)
    keep = comp.join(F.broadcast(top), "component") \
        .select(F.col("node"))
    return (
        stabilize_edges(edges, src, dst)
        .join(F.broadcast(keep).withColumnRenamed("node", src), src)
    )


def hierarchical_communities(edges: DataFrame,
                             max_cluster_size: int = 12,
                             max_levels: int = 8,
                             src: str = "src",
                             dst: str = "dst") -> DataFrame:
    """(level, node, cluster): the hierarchical_leiden contract —
    level 0 is the root partition (connected components here); every
    community larger than ``max_cluster_size`` is split at level+1,
    recursively, until all communities fit.  A node appears at level L
    only if its level L-1 community was split, mirroring graspologic's
    output rows.  Cluster labels are the min member id (canonical,
    deterministic).

    The in-community split is the documented Leiden seam: greedy
    size-capped union over the community's stabilized edge order —
    edges in (src, dst) sort order union their endpoints' clusters
    unless the merged size would exceed the cap.  Each oversized
    community refines inside one Arrow group (the reference holds the
    whole graph in one networkx process; per-community grouping is the
    distributed upper bound of that)."""
    canon = stabilize_edges(edges, src, dst) \
        .select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .distinct()
    comp = connected_components(canon).cache()
    out = comp.select(F.lit(0).alias("level"), "node",
                      F.col("component").alias("cluster"))
    results = [out]

    assign = comp.withColumnRenamed("component", "cluster")
    for level in range(1, max_levels + 1):
        sizes = assign.groupBy("cluster").agg(F.count("*").alias("n"))
        big = sizes.where(F.col("n") > max_cluster_size) \
            .select("cluster")
        n_big = big.count()
        if n_big == 0:
            break
        members = assign.join(F.broadcast(big), "cluster")
        # community edges: both endpoints in the same oversized cluster
        ce = (
            canon
            .join(members.withColumnRenamed("node", "src"), "src")
            .join(members.withColumnRenamed("node", "dst")
                  .withColumnRenamed("cluster", "c2"), "dst")
            .where(F.col("cluster") == F.col("c2"))
            .select("cluster", "src", "dst")
        )

        def split(key, pdf: pd.DataFrame) -> pd.DataFrame:
            rows = pdf.sort_values(["src", "dst"])
            root: dict = {}
            size: dict = {}

            def find(x):
                while root.get(x, x) != x:
                    root[x] = root.get(root[x], root[x])
                    x = root[x]
                return x

            for s, d in zip(rows["src"], rows["dst"]):
                rs, rd = find(s), find(d)
                if rs == rd:
                    continue
                if size.get(rs, 1) + size.get(rd, 1) > max_cluster_size:
                    continue
                lo, hi = min(rs, rd), max(rs, rd)
                root[hi] = lo
                size[lo] = size.get(lo, 1) + size.get(hi, 1)
            nodes = sorted(set(rows["src"]) | set(rows["dst"]))
            return pd.DataFrame({
                "node": nodes,
                "cluster": [min(n, find(n)) for n in nodes]})

        # node ids are whatever the edge table carries — bigint in the
        # synthetic oracle graph, entity-name strings in the KG
        node_t = edges.schema[src].dataType.simpleString()
        refined = ce.groupBy("cluster").applyInPandas(
            split, schema=f"node {node_t}, cluster {node_t}") \
            .localCheckpoint()
        # isolated members of a split community (no intra-edges) keep
        # themselves as singleton clusters
        lone = members.join(refined, "node", "left_anti") \
            .select("node", F.col("node").alias("cluster"))
        assign = refined.unionByName(lone)
        results.append(assign.select(F.lit(level).alias("level"),
                                     "node", "cluster"))
    comp.unpersist()
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def community_weights(assignments: DataFrame,
                      node_attrs: DataFrame) -> DataFrame:
    """(level, cluster, weight): leiden.py run() weights — per
    community sum(rank * weight) over member nodes, then normalized by
    the level's max weight (skipped when the max is 0, matching
    leiden.py:133-137)."""
    w = (
        assignments.join(node_attrs, "node")
        .groupBy("level", "cluster")
        .agg(F.sum(F.col("rank") * F.col("weight")).alias("w"))
    )
    mx = F.max("w").over(Window.partitionBy("level"))
    return w.withColumn("_mx", mx).select(
        "level", "cluster",
        F.round(F.when(F.col("_mx") == 0, F.col("w"))
                .otherwise(F.col("w") / F.col("_mx")), 6).alias("weight"))


class PageRankNoConvergence(RuntimeError):
    """Mirror of networkx's PowerIterationFailedConvergence."""


def pagerank(edges: DataFrame, alpha: float = 0.85,
             max_iter: int = 100, tol: float = 1e-6,
             iters: int | None = None,
             src: str = "src", dst: str = "dst",
             weight: str | None = "weight",
             nodes: DataFrame | None = None) -> DataFrame:
    """(node, pr): weighted PageRank over an undirected graph —
    ``nx.pagerank(graph)`` as the reference calls it after every graph
    merge (graphrag/general/index.py:212-214) and after entity
    resolution (graphrag/entity_resolution.py:117-120), default
    parameters (alpha 0.85, weight attribute, uniform teleport).

    Power-iteration semantics match networkx's published algorithm:
    the undirected graph becomes a doubly-directed one (a self-loop
    stays single), each node's out-probabilities are its incident
    weights normalized by their sum, and

        x'(v) = (1 - a)/n + a * (sum_in x(u) p(u,v) + dangle/n)

    where ``dangle`` is the mass sitting on edgeless nodes (only
    possible here via an explicit ``nodes`` frame listing isolates).
    With ``iters`` set, exactly that many rounds run — the
    deterministic fixed-K twin the SQL oracle unrolls; otherwise the
    nx stopping rule applies (L1 change < n*tol within ``max_iter``,
    else PageRankNoConvergence, nx's PowerIterationFailedConvergence).

    Scale shape: the transition table (u, v, p) is computed once and
    cached; every round is one join keyed on the 8-byte-ish node id +
    one aggregation, localCheckpoint-truncated — the standard Spark
    iterative-graph shape (same as dup_clusters).  Parallel input
    edges are weight-summed first, so the per-round shuffle carries
    (node, double) rows only.  The convergence check is one count-like
    action per round; the fixed-``iters`` path needs none beyond the
    checkpoint."""
    wcol = (F.coalesce(F.col(weight), F.lit(1.0)) if weight
            else F.lit(1.0)).cast("double")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"),
                     wcol.alias("w"))
    directed = e.unionByName(
        e.where(F.col("u") != F.col("v"))
        .select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
    directed = directed.groupBy("u", "v") \
        .agg(F.sum("w").alias("w")).cache()

    node_df = directed.select(F.col("u").alias("node")) \
        .unionByName(directed.select(F.col("v").alias("node"))) \
        .distinct()
    if nodes is not None:
        node_df = node_df.unionByName(
            nodes.select(F.col("node"))).distinct()
    node_df = node_df.cache()
    n = node_df.count()
    if n == 0:
        directed.unpersist()
        return node_df.select("node", F.lit(0.0).alias("pr"))

    outw = directed.groupBy("u").agg(F.sum("w").alias("ow"))
    trans = directed.join(outw, "u").select(
        "u", "v", (F.col("w") / F.col("ow")).alias("p")).cache()
    dangling = node_df.join(
        directed.select(F.col("u").alias("node")).distinct(),
        "node", "left_anti").cache()
    has_dangling = dangling.count() > 0

    ranks = node_df.select(
        "node", F.lit(1.0 / n).alias("pr")).localCheckpoint()
    rounds = iters if iters is not None else max_iter
    converged = iters is not None
    for _ in range(rounds):
        dangle = 0.0
        if has_dangling:
            dangle = dangling.join(ranks, "node") \
                .agg(F.sum("pr")).collect()[0][0] or 0.0
        contrib = (
            trans.join(ranks.withColumnRenamed("node", "u"), "u")
            .groupBy("v")
            .agg(F.sum(F.col("pr") * F.col("p")).alias("c"))
            .withColumnRenamed("v", "node"))
        new = (
            node_df.join(contrib, "node", "left")
            .select("node",
                    (F.lit((1.0 - alpha) / n)
                     + F.lit(alpha * dangle / n)
                     + F.lit(alpha) * F.coalesce("c", F.lit(0.0)))
                    .alias("pr"))
            .localCheckpoint())
        if iters is None:
            err = new.alias("a").join(ranks.alias("b"), "node") \
                .agg(F.sum(F.abs(F.col("a.pr") - F.col("b.pr")))) \
                .collect()[0][0]
            ranks = new
            if err < n * tol:
                converged = True
                break
        else:
            ranks = new
    directed.unpersist()
    trans.unpersist()
    node_df.unpersist()
    dangling.unpersist()
    if not converged:
        raise PageRankNoConvergence(
            f"pagerank failed to converge in {max_iter} iterations")
    return ranks
