

def test_dup_clusters_components():
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.dedup import dup_clusters

    spark = get_spark("local[4]", shuffle_partitions=4)
    # a 9-node chain (diameter 8 exercises multi-round propagation +
    # pointer jumping), a triangle, and an isolated pair
    chain = [(i, i + 1) for i in range(10, 18)]
    pairs = chain + [(30, 31), (31, 32), (30, 32), (50, 51)]
    df = spark.createDataFrame(pairs, schema="doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in dup_clusters(df).collect()}
    assert all(got[i] == 10 for i in range(10, 19))
    assert got[30] == got[31] == got[32] == 30
    assert got[50] == got[51] == 50
    assert len(got) == 9 + 3 + 2


def test_levenshtein_vectors():
    from ragflow_spark.extractlib.textdist import levenshtein

    assert levenshtein("", "") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("fast", "fastx") == 1
    assert levenshtein("flaw", "lawn") == 2
    assert levenshtein("abc", "abc") == 0


def test_is_similar_entity_gate_branches():
    from ragflow_spark.extractlib.textdist import is_similar_entity

    # latin edit branch
    assert is_similar_entity("merge", "merges")        # lev 1 <= 2
    assert not is_similar_entity("ab", "xy")           # lev 2 > 1, no chars
    # char-overlap branch rescues non-latin and distant-latin pairs
    assert is_similar_entity("数据分析", "分析报告")     # shares 分,析
    assert not is_similar_entity("数据", "报告")        # shares none
    assert is_similar_entity("alphabet", "beta")       # chars a,b,e,t
    # the latin bound uses the SHORTER name, but the shared-chars
    # branch still fires for this pair (a and b in common)
    assert is_similar_entity("ab", "abcdef")


def test_entity_candidate_pairs_blocking_is_lossless():
    from ragflow_spark.extractlib.textdist import is_similar_entity
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.entities import entity_candidate_pairs

    spark = get_spark("local[4]", shuffle_partitions=4)
    ents = [(1, "merge", "org"), (2, "merges", "org"),
            (3, "merge", "person"),      # same name, other type
            (4, "xq", "org"), (5, "zw", "org"),  # short, no overlap
            (6, "ab", "org"), (7, "ac", "org"),  # edit-branch only
            (8, "数据分析", "org"), (9, "分析报告", "org")]
    df = spark.createDataFrame(ents,
                               schema="ent_id long, name string, ent_type string")
    got = {(r["ent_a"], r["ent_b"]) for r in
           entity_candidate_pairs(df).collect()}
    want = {(a, b) for i, (a, na, ta) in enumerate(ents)
            for b, nb, tb in ents[i + 1:]
            if ta == tb and is_similar_entity(na, nb)}
    assert got == want
    assert (1, 2) in got and (6, 7) in got and (8, 9) in got
    assert (1, 3) not in got  # type block holds


def test_dup_clusters_vs_union_find_random_both_id_types():
    """The fused union-agg round must equal a plain union-find on
    random graphs — for LONG doc ids and for STRING entity names (the
    resolution_mapping consumer), including tree depths that force
    multiple propagation rounds."""
    import random

    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.dedup import dup_clusters

    spark = get_spark("local[4]", shuffle_partitions=4)

    def uf_clusters(pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        return {x: min(m for m in parent
                       if find(m) == find(x)) for x in parent}

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        pairs = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(30)]
        pairs = [(a, b) for a, b in pairs if a != b]
        df = spark.createDataFrame(pairs,
                                   schema="doc_a long, doc_b long")
        got = {r["doc_id"]: r["cluster_id"]
               for r in dup_clusters(df).collect()}
        assert got == uf_clusters(pairs)
        spairs = [(f"e{a}", f"e{b}") for a, b in pairs]
        sdf = spark.createDataFrame(
            spairs, schema="doc_a string, doc_b string")
        sgot = {r["doc_id"]: r["cluster_id"]
                for r in dup_clusters(sdf).collect()}
        assert sgot == uf_clusters(spairs)


def test_dup_clusters_contraction_across_partitions():
    """The partition-local contraction must stitch components whose
    edges are spread across many partitions: a 16-node chain
    repartitioned into 8 partitions guarantees most consecutive edges
    land apart, so the result can only be right if the groupBy(node)
    stitch connects the local roots."""
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.dedup import dup_clusters

    spark = get_spark("local[4]", shuffle_partitions=4)
    chain = [(i, i + 1) for i in range(100, 115)]
    df = spark.createDataFrame(chain, schema="doc_a long, doc_b long") \
        .repartition(8)
    got = {r["doc_id"]: r["cluster_id"]
           for r in dup_clusters(df).collect()}
    assert got == {i: 100 for i in range(100, 116)}


def test_dup_clusters_self_loops_and_duplicate_edges():
    """Self-pairs register the node without merging anything, and
    repeated/reversed edges don't change the result (the contraction
    consumes the raw pair frame — no distinct/symmetrize pre-pass)."""
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.dedup import dup_clusters

    spark = get_spark("local[4]", shuffle_partitions=4)
    pairs = [(1, 2), (2, 1), (1, 2), (3, 3), (4, 5), (5, 6), (6, 4)]
    df = spark.createDataFrame(pairs, schema="doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in dup_clusters(df).collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 4, 5: 4, 6: 4}


def test_contract_partitions_invariants():
    """Every endpoint appears exactly once per partition it touches,
    an edge's endpoints share a local root, and each local root is the
    minimum of its local set."""
    from pyspark.sql import functions as F
    from ragflow_spark.job.session import get_spark
    from ragflow_spark.operators.dedup import _contract_partitions

    spark = get_spark("local[4]", shuffle_partitions=4)
    pairs = [(10, 11), (11, 12), (30, 31), (12, 30), (50, 51)]
    edges = spark.createDataFrame(
        pairs, schema="src long, dst long").repartition(3)
    m = _contract_partitions(edges)
    rows = m.collect()
    # roots are <= their nodes (min-representative union)
    assert all(r["root"] <= r["node"] for r in rows)
    # every node of the input appears
    assert {r["node"] for r in rows} == {10, 11, 12, 30, 31, 50, 51}
    # stitching the mapping yields the true components
    grp = (m.groupBy("node")
           .agg(F.min("root").alias("r0"),
                F.collect_set("root").alias("rs")).collect())
    assert all(row["r0"] in row["rs"] for row in grp)
