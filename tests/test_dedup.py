

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
