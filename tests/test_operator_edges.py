"""Operator edge branches the coverage union showed were never
executed: SQL/Arrow twin equivalence, empty-input guards, default
parameter paths."""

from pyspark.sql import functions as F


def test_simhash_col_matches_arrow_impl(spark):
    # simhash_col is the pure-SQL twin of _simhash_batches; pin their
    # equivalence on tf-weighted repeated words
    from ragflow_spark.operators.dedup import (_WORD_HASH, simhash_col,
                                               simhash_sigs)

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma delta"),
         (3, "alpha beta alpha")],
        "doc_id long, text string")
    whs = F.expr("transform(split(text, ' '), w -> %s)"
                 % _WORD_HASH.format(w="w"))
    got = {r.doc_id: r.simhash for r in docs.withColumn("whs", whs)
           .select("doc_id", simhash_col().alias("simhash")).collect()}
    ref = {r.doc_id: r.simhash for r in simhash_sigs(docs).collect()}
    assert got == ref
    assert got[1] == got[3] != got[2]


def test_dedup_exact_keeps_min_doc_per_text(spark):
    from ragflow_spark.operators.dedup import dedup_exact

    docs = spark.createDataFrame(
        [(3, "same text"), (1, "same text"), (2, "other")],
        "doc_id long, text string")
    kept = sorted(r.doc_id for r in dedup_exact(docs).collect())
    assert kept == [1, 2]


def test_pagerank_no_edges_is_uniform(spark):
    # nx.pagerank over isolated nodes returns 1/n
    from ragflow_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "src string, dst string, "
                                      "weight double")
    nodes = spark.createDataFrame([("a",), ("b",)], "node string")
    pr = {r.node: r.pr for r in pagerank(edges, nodes=nodes).collect()}
    assert pr == {"a": 0.5, "b": 0.5}


def test_raptor_tiers_empty_input(spark):
    from ragflow_spark.operators.raptor import (block_cluster_fn,
                                                raptor_tiers)

    empty = spark.createDataFrame(
        [], "doc_id long, pos int, content string, vec array<double>")
    out = raptor_tiers(empty, block_cluster_fn(4),
                       lambda texts, n: "S", lambda t: [0.0])
    assert out.count() == 0
    assert out.columns == ["doc_id", "layer", "pos", "content", "vec"]


def test_salted_repartition_default_parallelism(spark):
    from ragflow_spark.job.salting import salted_repartition

    df = spark.createDataFrame([("https://h1.example/x", 1)],
                               "url string, v int")
    # no num_partitions: falls to spark.sql.shuffle.partitions
    assert salted_repartition(df).rdd.getNumPartitions() >= 1


def test_subject_clauses_chinese_question_branch(spark):
    # question mode routes CJK questions through the Dealer split
    # (tag_query -> question() Chinese branch); the 怎么样 interrogative
    # loses only 怎么 — the reference's alternation lists 怎么 before
    # 怎么样, so the stray 样 survives as a term (quirk kept)
    from ragflow_spark.operators.tagging import subject_clauses

    q = spark.createDataFrame([(1, "数据分析管道怎么样")],
                              "doc_id long, text string")
    rows = subject_clauses(q, question=True).collect()
    assert sorted({r.term for r in rows}) == ["分析", "数据", "样", "管道"]
    assert all(r.msm == 1 for r in rows)
