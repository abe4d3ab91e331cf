"""Knowledge-graph retrieval score fusion — the deterministic core of
``KGSearch.retrieval`` (reference graphrag/search.py:140-310).

The reference runs three doc-store searches (entity-by-keyword,
entity-by-type, relation-by-text — vector search + LLM query rewrite,
both seams here) and then fuses the candidate sets with pure
arithmetic:

- n-hop paths of the query-matched entities contribute
  ``sim / (2 + i)`` per hop pair, with the pair's pagerank taken from
  the LAST contribution in iteration order (search.py:169-184);
- a query entity also matched by type doubles its sim (:191-195);
- a text-matched relation multiplies its sim by ``s + 1`` where ``s``
  sums the consumed n-hop pair sim and the endpoint type hits
  (:197-207);
- n-hop pairs not consumed by a text match become relations themselves
  (sim × (type hits + 1)), dropped if the relation store has no
  description for them (:209-219, :239-246);
- both lists rank by ``sim * pagerank`` and keep top-n (:221-224).

Everything here is qid-keyed relational algebra: candidate sets are
bounded per query (the reference's N=56 page), so shuffles carry
(qid, entity, scalar) rows and the plan scales with query count, not
corpus size.  Iteration-order quirks are made explicit: "last
contribution" is the lexicographic max of (ent_seq, nbr_seq, hop_i) —
which IS the reference's dict-write order given ES result order — and
the relation list's tie order is (text rels by ES order, then n-hop
pairs by first-contribution order), Python's stable sort made into a
window ordering.
"""
from __future__ import annotations

import csv
import io

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def nhop_pairs(ents_q: DataFrame) -> DataFrame:
    """Explode query-entity n-hop paths into scored hop pairs
    (search.py:169-184).

    ``ents_q``: (qid, entity, sim, pagerank, ent_seq,
    nhops: array<struct<path: array<string>, weights: array<double>>>).
    Returns one row per (qid, f, t) — the PATH-ordered tuple, not the
    sorted pair (the reference keys its dict that way) — with the
    summed sim contributions, the last-writer pagerank, and the
    first-contribution order key the dict's insertion order implies.
    """
    nbr = ents_q.select(
        "qid", "sim", "ent_seq",
        F.posexplode_outer("nhops").alias("nbr_seq", "nbr")) \
        .where(F.col("nbr").isNotNull())
    hops = nbr.select(
        "qid", "sim", "ent_seq", "nbr_seq",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.size("nbr.path") - 2),
            lambda i: F.struct(
                F.col("nbr.path")[i].alias("f"),
                F.col("nbr.path")[i + 1].alias("t"),
                F.col("nbr.weights")[i].alias("w"),
                i.alias("hop_i")))).alias("h")) \
        .select("qid", "sim", "ent_seq", "nbr_seq", "h.*")
    return hops.groupBy("qid", "f", "t").agg(
        F.sum(F.col("sim") / (F.col("hop_i") + 2)).alias("nhop_sim"),
        F.expr("max_by(w, struct(ent_seq, nbr_seq, hop_i))")
         .alias("nhop_pagerank"),
        # struct min orders lexicographically on (ent_seq, nbr_seq,
        # hop_i) with no width assumption (an arithmetic packing
        # would silently corrupt the tie-break past 10^6 paths)
        F.min(F.struct(F.col("ent_seq").cast("long").alias("ent_seq"),
                       F.col("nbr_seq").cast("long").alias("nbr_seq"),
                       F.col("hop_i").cast("long").alias("hop_i")))
         .alias("first_seen"))


def fuse_entities(ents_q: DataFrame, ents_t: DataFrame,
                  ent_topn: int = 6) -> DataFrame:
    """Entity side: double sim on a type hit, rank by sim*pagerank,
    keep top-n per qid (search.py:191-195,221-222).  Ties keep ES
    result order (Python ``sorted`` is stable)."""
    boosted = ents_q.join(
        # distinct: the reference tests set membership, so a store
        # result listing an entity twice must not duplicate candidates
        ents_t.select("qid", "entity").distinct()
        .withColumn("ty_hit", F.lit(1)),
        ["qid", "entity"], "left") \
        .withColumn("sim", F.when(F.col("ty_hit").isNotNull(),
                                  F.col("sim") * 2)
                            .otherwise(F.col("sim")))
    w = Window.partitionBy("qid").orderBy(
        (F.col("sim") * F.col("pagerank")).desc(), F.col("ent_seq"))
    return boosted \
        .withColumn("score", F.col("sim") * F.col("pagerank")) \
        .withColumn("rank", F.row_number().over(w)) \
        .where(F.col("rank") <= ent_topn) \
        .select("qid", "entity", "sim", "pagerank", "score", "rank",
                "description")


def fuse_relations(rels: DataFrame, ents_q: DataFrame,
                   ents_t: DataFrame, rel_store: DataFrame,
                   rel_topn: int = 6) -> DataFrame:
    """Relation side (search.py:197-224).

    ``rels``: (qid, f, t, sim, pagerank, rel_seq, description) with
    (f, t) already string-sorted as ``_relation_info_from_`` emits
    them (:94).  N-hop pairs are path-ordered, so only pairs that
    happen to be in sorted order can be consumed by a text match —
    the reference's exact-tuple dict semantics, kept (a path-ordered
    ("e9","e10") coexists with a text key ("e10","e9")).  Leftover
    n-hop pairs join ``rel_store`` — the ``get_relation`` seam, which
    filters BOTH endpoint fields by the pair set (utils.py:327-340),
    i.e. orientation-insensitively; ``rel_store`` must be unique per
    unordered pair — and drop when no description exists (:239-246).
    """
    nh = nhop_pairs(ents_q)
    matched = rels \
        .join(nh.select("qid", "f", "t", "nhop_sim"),
              ["qid", "f", "t"], "left") \
        .select("qid", "f", "t", "sim", "pagerank", "rel_seq",
                "description",
                F.coalesce("nhop_sim", F.lit(0.0)).alias("s_nhop"),
                F.lit(None).cast(
                    "struct<ent_seq:bigint,nbr_seq:bigint,"
                    "hop_i:bigint>").alias("first_seen"))
    leftover = nh.join(
        rels.select("qid", "f", "t").withColumn("c", F.lit(1)),
        ["qid", "f", "t"], "left_anti") \
        .join(rel_store.select(
            F.least("f", "t").alias("kf"),
            F.greatest("f", "t").alias("kt"),
            F.col("description").alias("sd")),
            (F.least(F.col("f"), F.col("t")) == F.col("kf"))
            & (F.greatest(F.col("f"), F.col("t")) == F.col("kt")),
            "inner") \
        .select("qid", "f", "t", F.col("nhop_sim").alias("sim"),
                F.col("nhop_pagerank").alias("pagerank"),
                F.lit(None).cast("long").alias("rel_seq"),
                F.col("sd").alias("description"),
                F.lit(0.0).alias("s_nhop"), "first_seen")

    # distinct mirrors the reference's set membership: a duplicated
    # store row must not double a candidate's endpoint boost
    ty = ents_t.select("qid", "entity").distinct()
    ty_f = ty.select("qid", F.col("entity").alias("f"),
                     F.lit(1).alias("hit_f"))
    ty_t = ty.select("qid", F.col("entity").alias("t"),
                     F.lit(1).alias("hit_t"))
    fused = matched.unionByName(leftover) \
        .join(ty_f, ["qid", "f"], "left") \
        .join(ty_t, ["qid", "t"], "left")
    s = (F.col("s_nhop") + F.coalesce("hit_f", F.lit(0))
         + F.coalesce("hit_t", F.lit(0)))
    fused = fused.withColumn("sim", F.col("sim") * (s + 1)) \
        .drop("s_nhop", "hit_f", "hit_t")

    # dict order on score ties: text rels in ES order first, then
    # leftover pairs in first-contribution order (stable sort)
    w = Window.partitionBy("qid").orderBy(
        (F.col("sim") * F.col("pagerank")).desc(),
        F.col("rel_seq").asc_nulls_last(),
        F.col("first_seen").asc())
    return fused \
        .withColumn("score", F.col("sim") * F.col("pagerank")) \
        .withColumn("rank", F.row_number().over(w)) \
        .where(F.col("rank") <= rel_topn) \
        .select("qid", "f", "t", "sim", "pagerank", "score", "rank",
                "description")


def _pandas_csv(rows: list[dict]) -> str:
    """``pd.DataFrame(rows).to_csv()`` byte-for-byte, without building
    a DataFrame per query (the reference renders each query's section
    through pandas at search.py:243,252; a tiny-frame construction per
    qid dominated this operator's profile).  pandas' C writer and the
    stdlib csv module agree on QUOTE_MINIMAL string data — RangeIndex
    first column, quoting on ``, " \\r \\n``, doubled quotes, None as
    empty — pinned by test_kg_search's parity cases against real
    pandas.  The line terminator is pinned to ``\\n``: pandas defaults
    to ``os.linesep``, so byte parity is exact on POSIX (both this
    sandbox and the reference's serving environment); a Windows driver
    would be a documented divergence."""
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    cols = list(rows[0].keys())
    w.writerow([""] + cols)
    for i, d in enumerate(rows):
        w.writerow([i] + [d[c] for c in cols])
    return buf.getvalue()


def _desc_text(col):
    """``json.loads(description).get("description", "")`` with the
    reference's empty-string fallback (search.py:232,249-252)."""
    return F.coalesce(F.get_json_object(col, "$.description"),
                      F.lit(""))


def kg_content(ents: DataFrame, rels: DataFrame,
               communities: DataFrame, max_token: int = 8196,
               comm_topn: int = 1) -> DataFrame:
    """Assemble ``content_with_weight`` per qid (search.py:226-310):
    the Entities / Relations CSV sections (pandas ``to_csv``, the
    reference's own renderer) under the sequential token budget — a
    row is dropped and its section cut when the budget, decremented by
    ``num_tokens_from_string(str(row_dict))``, reaches zero, and the
    overdraft of the dropped row still carries into the next section
    (the reference mutates ``max_token`` before breaking).  Community
    reports append top-n by weight among communities sharing an entity
    with the kept entity list; their token cost is subtracted but
    never truncates (:302-310).

    Divergence (documented): the reference builds an ``OrderByExpr``
    on weight_flt but passes a fresh empty one (:293-299), leaving
    community order to the store; we order by (weight desc, name) —
    the order the built-but-unused expression asks for.
    """
    from ragflow_spark.extractlib.tokens import num_tokens_from_string

    # the fused entity list is consumed twice below (the CSV section
    # AND the kept-entity set gating community reports); checkpoint
    # the small per-qid table so it materializes once at first action
    # instead of replaying the fusion pipeline per consumer (19% off
    # the sf0.1 bench; at scale this is a top-N-per-query table, safe
    # to pin).  eager=False: building the DataFrame (e.g. for a plan
    # dump) must not execute the job
    ents = ents.localCheckpoint(eager=False)

    # score formatting happens in the Python renderer below: the
    # reference's "%.2f" % score is CPython semantics (correctly
    # rounded from the exact double) — Spark's format_string is Java,
    # which HALF_UPs the SHORTEST repr and differs on values like
    # 2.52499999999999991 (shortest "2.525" -> "2.53" vs "2.52")
    e = ents.select(
        "qid", "rank", F.col("entity").alias("Entity"),
        F.col("score").alias("Score"),
        _desc_text(F.col("description")).alias("Description"))
    r = rels.select(
        "qid", "rank", F.col("f").alias("From Entity"),
        F.col("t").alias("To Entity"),
        F.col("score").alias("Score"),
        _desc_text(F.col("description")).alias("Description"))
    kept = ents.select("qid", F.col("entity").alias("ke")).distinct()
    comms = communities.alias("c").join(
        kept, F.array_contains(F.col("c.entities"), F.col("ke")),
        "inner") \
        .select("qid", "name", "report", "evidences", "weight") \
        .distinct()
    cw = Window.partitionBy("qid").orderBy(F.col("weight").desc(),
                                           "name")
    comms = comms.withColumn("crank", F.row_number().over(cw)) \
        .where(F.col("crank") <= comm_topn)

    packed = (
        e.groupBy("qid").agg(F.sort_array(F.collect_list(F.struct(
            "rank", "Entity", "Score", "Description"))).alias("ents"))
        .join(r.groupBy("qid").agg(F.sort_array(F.collect_list(
            F.struct("rank",
                     F.col("From Entity").alias("From"),
                     F.col("To Entity").alias("To"),
                     "Score", "Description"))).alias("rels")),
            "qid", "full")
        .join(comms.groupBy("qid").agg(F.sort_array(F.collect_list(
            F.struct("crank", "name", "report", "evidences")))
            .alias("comms")), "qid", "left"))

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {"qid": [], "content": []}
        for qid, r_ents, r_rels, r_comms in zip(
                pdf["qid"], pdf["ents"], pdf["rels"], pdf["comms"]):
            budget = max_token
            ents_rows, rels_rows, txts = [], [], []
            for s in sorted(r_ents if r_ents is not None
                            else [], key=lambda x: x["rank"]):
                d = {"Entity": s["Entity"],
                     "Score": "%.2f" % s["Score"],
                     "Description": s["Description"]}
                ents_rows.append(d)
                budget -= num_tokens_from_string(str(d))
                if budget <= 0:
                    ents_rows.pop()
                    break
            for s in sorted(r_rels if r_rels is not None
                            else [], key=lambda x: x["rank"]):
                d = {"From Entity": s["From"], "To Entity": s["To"],
                     "Score": "%.2f" % s["Score"],
                     "Description": s["Description"]}
                rels_rows.append(d)
                budget -= num_tokens_from_string(str(d))
                if budget <= 0:
                    rels_rows.pop()
                    break
            txt = ""
            if ents_rows:
                txt += "\n---- Entities ----\n{}".format(
                    _pandas_csv(ents_rows))
            if rels_rows:
                txt += "\n---- Relations ----\n{}".format(
                    _pandas_csv(rels_rows))
            for ii, c in enumerate(sorted(
                    r_comms if r_comms is not None else [],
                    key=lambda x: x["crank"])):
                txts.append("# {}. {}\n## Content\n{}\n## Evidences"
                            "\n{}\n".format(ii + 1, c["name"],
                                            c["report"],
                                            c["evidences"]))
                budget -= num_tokens_from_string(str(txts[-1]))
            if txts:
                txt += ("\n---- Community Report ----\n"
                        + "\n".join(txts))
            out["qid"].append(qid)
            out["content"].append(txt)
        return pd.DataFrame(out)

    # AQE coalesces the tiny per-qid shuffles to one partition, which
    # would run the Python renderer serially; spread the CPU-bound
    # render stage across the session's cores (the map-only fan-out
    # rule — the extra exchange carries top-n rows per qid only)
    sc = packed.sparkSession.sparkContext
    packed = packed.repartition(sc.defaultParallelism, "qid")
    return packed.mapInPandas(
        lambda it: (render(pdf) for pdf in it),
        schema="qid bigint, content string")
