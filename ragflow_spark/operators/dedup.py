"""Deduplication operators for web-corpus curation.

Four families, each the canonical scalable Spark shape:

- **exact** — hash group-by: map-side partial agg, one shuffle of 8-byte
  keys (never the documents themselves).
- **MinHash + LSH** — word-shingle sets -> 128-perm minhash signature ->
  32 bands x 4 rows -> band-hash bucket self-join -> exact-Jaccard verify.
  All signature math is JVM-side higher-order functions (``xxhash64(sh,
  s)`` varies the seed by hashing the band/permutation index with the
  shingle), so signature computation is a narrow map; the only shuffles
  are the band-bucket join (key = 16 bytes) and the verify join.
- **SimHash** — 30-bit signatures from a deterministic polynomial word
  hash (reproducible in ANSI SQL, which is what lets the DuckDB oracle
  value-check the bits), pigeonhole block join for hamming <= 2.
- **n-gram Jaccard** — exact set-similarity join via an inverted shingle
  index (explode -> self-join on shingle -> count = |intersection|), the
  PPJoin-family shape; prefix filtering is the documented scale upgrade.

LSH recall: with J >= 0.8 and 32 bands of 4, P(miss) = (1 - J^4)^32
<= 5e-8 — the verify stage then makes the *output* exact, so results are
deterministic and oracle-comparable.

The driver ``documents`` table has no near-duplicates, so pair operators
run over ``with_near_dups`` — a relational corpus augmentation (drop the
last 3 words of every doc_id % 7 == 2 document) that both Spark and the
DuckDB oracle derive identically.

Reference parity note: the reference dedups at chunk granularity via
content-addressed xxh64 ids (/root/reference/rag/svr/task_executor.py:266)
and task digests (api/db/services/task_service.py:349-360); corpus-level
near-dup has no reference analog — it is part of the training-data
curation surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MOD = 1_000_000_007

# distinct word n-gram shingles of a `words` array column
_SHINGLES = ("array_distinct(transform(sequence(0, size(words) - {n}), "
             "i -> array_join(slice(words, i + 1, {n}), ' ')))")

# polynomial word hash, reproducible in ANSI SQL (ASCII corpus): fold
# chars left-to-right, (h * 31 + code) mod 1e9+7 — bounded, no overflow
_WORD_HASH = ("aggregate(sequence(1, length({w})), cast(0 as bigint), "
              "(a, i) -> (a * 31 + ascii(substring({w}, i, 1))) % "
              f"{MOD})")


def with_near_dups(docs: DataFrame) -> DataFrame:
    """documents ∪ truncated copies (deterministic near-dup injection)."""
    words = F.split(F.col("text"), " ")
    mut = (
        docs.where((F.col("doc_id") % 7 == 2) & (F.size(words) > 6))
        .select(
            (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
            F.expr("array_join(slice(split(text, ' '), 1, "
                   "size(split(text, ' ')) - 3), ' ')").alias("text"),
        )
    )
    return docs.select("doc_id", "text").unionByName(mut)


def _shingle_sets(corpus: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingles array<string>, n_sh) — docs with >= n words."""
    return (
        corpus.withColumn("words", F.split("text", " "))
        .where(F.size("words") >= n)
        .select("doc_id",
                F.expr(_SHINGLES.format(n=n)).alias("shingles"))
        .withColumn("n_sh", F.size("shingles"))
    )


def _verify_jaccard(cand: DataFrame, corpus: DataFrame, n_gram: int,
                    threshold: float) -> DataFrame:
    """Exact Jaccard over candidate (doc_a, doc_b) pairs.

    Scale shape: the pair join carries raw TEXT (a factor n_gram
    smaller than the materialized shingle-set arrays the round-1
    version shuffled), the candidate list is small enough that AQE
    broadcasts it (then the corpus side never shuffles — the inner
    join prunes it to candidate docs during the scan), and the set
    algebra runs in an Arrow batch with a per-batch shingle memo
    instead of a JVM array_intersect over shuffled arrays."""
    import pandas as pd

    texts = corpus.select("doc_id", "text")
    a = texts.select(F.col("doc_id").alias("doc_a"),
                     F.col("text").alias("text_a"))
    b = texts.select(F.col("doc_id").alias("doc_b"),
                     F.col("text").alias("text_b"))
    paired = cand.join(a, "doc_a").join(b, "doc_b")

    def gen(it):
        memo: dict[int, set] = {}

        def sset(did: int, text: str) -> set:
            s = memo.get(did)
            if s is None:
                w = text.split(" ")
                s = {" ".join(w[i:i + n_gram])
                     for i in range(len(w) - n_gram + 1)}
                memo[did] = s
            return s

        for pdf in it:
            da, db, jac = [], [], []
            for doc_a, doc_b, ta, tb in zip(
                    pdf["doc_a"], pdf["doc_b"],
                    pdf["text_a"], pdf["text_b"]):
                sa, sb = sset(int(doc_a), ta), sset(int(doc_b), tb)
                inter = len(sa & sb)
                j = inter / (len(sa) + len(sb) - inter)
                da.append(doc_a)
                db.append(doc_b)
                jac.append(round(j, 6))
            yield pd.DataFrame({"doc_a": da, "doc_b": db,
                                "jaccard": jac})

    return (
        paired.mapInPandas(
            gen, schema="doc_a long, doc_b long, jaccard double")
        .where(F.col("jaccard") >= threshold)
    )


def _minhash_band_batches(n_gram: int, n_perms: int, bands: int):
    """Arrow-batched band-hash computation: the signature math runs in
    numpy (vectorized multiply-mod minhash over crc32 shingle hashes,
    memoized per executor), ~100x faster than interpreted per-lambda
    higher-order functions for the same work. Signatures are internal —
    only candidate pairs leave this stage, and they are exact-verified
    downstream, so the hash family needs determinism, not oracle parity.
    """
    def gen(it):
        import zlib

        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(42)  # fixed seed: stable across runs
        prime = np.uint64((1 << 61) - 1)
        A = rng.integers(1, prime, size=n_perms, dtype=np.uint64)
        B = rng.integers(0, prime, size=n_perms, dtype=np.uint64)
        rows = n_perms // bands
        mixer = rng.integers(1, prime, size=rows, dtype=np.uint64)
        memo: dict[str, int] = {}

        def crc(g: str) -> int:
            h = memo.get(g)
            if h is None:
                h = zlib.crc32(g.encode("utf-8"))
                memo[g] = h
            return h

        for pdf in it:
            out_doc, out_band, out_bh = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = text.split(" ")
                if len(words) < n_gram:
                    continue
                shingles = {" ".join(words[i:i + n_gram])
                            for i in range(len(words) - n_gram + 1)}
                base = np.fromiter((crc(g) for g in shingles),
                                   dtype=np.uint64, count=len(shingles))
                with np.errstate(over="ignore"):
                    sig = ((A[:, None] * base[None, :] + B[:, None])
                           % prime).min(axis=1)
                    bh = (sig.reshape(bands, rows)
                          * mixer[None, :]).sum(axis=1)
                out_doc.extend([doc_id] * bands)
                out_band.extend(range(bands))
                out_bh.extend(bh.astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": out_doc, "band": out_band,
                                "bh": out_bh})
    return gen


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.8,
                      n_gram: int = 3, n_perms: int = 128,
                      bands: int = 32) -> DataFrame:
    """Near-dup pairs (doc_a, doc_b, jaccard) via MinHash-LSH + verify."""
    corpus = with_near_dups(docs)
    band = corpus.mapInPandas(
        _minhash_band_batches(n_gram, n_perms, bands),
        schema="doc_id long, band int, bh long",
    )
    a = band.select(F.col("doc_id").alias("doc_a"), "band", "bh")
    b = band.select(F.col("doc_id").alias("doc_b"), "band", "bh")
    cand = (
        a.join(b, ["band", "bh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    )
    return _verify_jaccard(cand, corpus, n_gram, threshold)


def ngram_jaccard_pairs(docs: DataFrame, n_gram: int = 2,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard set-similarity join with a PREFIX FILTER.

    Lossless pruning (the PPJoin/AllPairs prefix principle): order each
    document's shingles by a global total order (crc32 hash, then the
    shingle itself) and index only its first
    ``n - ceil(threshold * n) + 1`` shingles — two sets with Jaccard
    >= t MUST share at least one prefix shingle under any common order
    (if all prefix shingles differed, the intersection could not reach
    the size Jaccard t requires), so no qualifying pair is lost while
    the inverted-index join drops ~t of its postings. Survivor pairs
    are exact-verified by re-shingling just those documents
    (_verify_jaccard), so the output is identical to the unfiltered
    join."""
    corpus = with_near_dups(docs)
    sh = _shingle_sets(corpus, n_gram)
    pref = sh.select(
        "doc_id",
        F.expr(
            "slice(array_sort(transform(shingles, g -> "
            "struct(crc32(encode(g, 'utf-8')) AS h, g AS g))), 1, "
            f"n_sh - CAST(ceil(n_sh * {threshold}D) AS INT) + 1)"
        ).alias("prefix"),
    ).select("doc_id", F.explode("prefix").alias("pg"))
    inv = pref.select("doc_id", F.col("pg.g").alias("g"))
    a = inv.select(F.col("doc_id").alias("doc_a"), "g")
    b = inv.select(F.col("doc_id").alias("doc_b"), "g")
    cand = (
        a.join(b, "g").where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    )
    return _verify_jaccard(cand, corpus, n_gram, threshold)


def simhash_col() -> Column:
    """30-bit simhash over a ``whs`` word-hash array column (build it
    with ``transform(words, w -> _WORD_HASH)``)."""
    return F.expr(
        "aggregate(sequence(0, 29), cast(0 as bigint), (acc, i) -> acc + "
        "CASE WHEN aggregate(whs, 0, (a, v) -> a + "
        "CASE WHEN shiftright(v, i) % 2 = 1 THEN 1 ELSE -1 END) > 0 "
        "THEN shiftleft(cast(1 as bigint), i) ELSE cast(0 as bigint) END)"
    )


def _simhash_batches(it):
    """Exact same bit formula as ``simhash_col`` (and the SQL oracle),
    computed vectorized: word poly-hashes memoized per executor (Zipfian
    corpora hit the memo almost always), bit votes as one numpy matrix
    op instead of 30 x n_words interpreted lambdas."""
    import numpy as np
    import pandas as pd

    memo: dict[str, int] = {}

    def wh(w: str) -> int:
        h = memo.get(w)
        if h is None:
            h = 0
            for c in w:
                h = (h * 31 + ord(c)) % MOD
            memo[w] = h
        return h

    bitpos = np.arange(30, dtype=np.int64)
    for pdf in it:
        sigs = []
        for text in pdf["text"]:
            words = text.split(" ")
            whs = np.fromiter((wh(w) for w in words), dtype=np.int64,
                              count=len(words))
            bits = (whs[:, None] >> bitpos[None, :]) & 1
            votes = 2 * bits.sum(axis=0) - len(words)
            sigs.append(int(((votes > 0).astype(np.int64)
                             << bitpos).sum()))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": sigs})


def simhash_sigs(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): bit i set iff the +1/-1 vote of word-hash bit i
    over all word occurrences (tf-weighted) is positive. Arrow-batched
    numpy; ``simhash_col`` is the pure-SQL twin of the same formula
    (used by the DuckDB oracle and kept for plan-level parity tests)."""
    return docs.select("doc_id", "text").mapInPandas(
        _simhash_batches, schema="doc_id long, simhash long"
    )


def simhash_pairs(docs: DataFrame, max_ham: int = 2) -> DataFrame:
    """Pairs with simhash hamming distance <= max_ham.

    Pigeonhole LSH: 30 bits in 3 blocks of 10 — hamming <= 2 guarantees
    at least one identical block, so the block-equality self-join is a
    *lossless* candidate generator and the bit_count verify makes the
    result exact (hence oracle-comparable, unlike probabilistic LSH).
    """
    sig = simhash_sigs(docs)
    blk = sig.select(
        "doc_id", "simhash",
        F.posexplode(
            F.expr("transform(sequence(0, 2), b -> "
                   "shiftright(simhash, b * 10) % 1024)")
        ).alias("blk", "bv"),
    )
    a = blk.select(F.col("doc_id").alias("doc_a"),
                   F.col("simhash").alias("sh_a"), "blk", "bv")
    b = blk.select(F.col("doc_id").alias("doc_b"),
                   F.col("simhash").alias("sh_b"), "blk", "bv")
    ham = F.expr("bit_count(sh_a ^ sh_b)")
    return (
        a.join(b, ["blk", "bv"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_ham)
        .distinct()
    )


def exact_dup_groups(docs: DataFrame, col: str = "text") -> DataFrame:
    """Group identical texts: (text_hash, n_dups, keeper_doc_id).

    Shuffles on xxhash64(text) rather than the full text value, so the
    exchange carries 8-byte keys, not multi-KB documents — at 100 TB the
    difference is the job. Collision probability at 10^12 rows is ~3e-8
    (birthday bound), acceptable for dedup; use sha2 for exactness."""
    return (
        docs.groupBy(F.xxhash64(F.col(col)).alias("text_hash"))
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


def dedup_exact(docs: DataFrame, col: str = "text") -> DataFrame:
    """Keep one row per distinct text (the min doc_id).

    Scale shape: the keeper set is computed over ``xxhash64(text)`` so
    the groupBy exchange carries 8-byte keys instead of multi-KB
    documents, then the semi-join is on (doc_id, hash).  Joining back on
    doc_id makes an xxhash64 collision harmless for row *identity* (a
    collision could only merge two distinct texts into one keeper group,
    dropping a row; at 10^12 rows P(any collision) ~ 3e-8 — use
    sha2(text, 256) as the key when that is not acceptable)."""
    hashed = docs.withColumn("_th", F.xxhash64(F.col(col)))
    keepers = hashed.groupBy("_th").agg(F.min("doc_id").alias("doc_id"))
    return (
        hashed.join(keepers, ["doc_id", "_th"], "left_semi")
        .drop("_th")
    )


def _contract_partitions(edges: DataFrame) -> DataFrame:
    """(node, root): partition-local union-find over an edge frame.

    One Arrow-batched pass (``mapInPandas``): each input partition
    runs a sequential union-find over its own edges (attach the larger
    root under the smaller, so a tree's root is always its set's
    minimum id) and emits every endpoint with its partition-local
    root.  No shuffle — the pass accepts whatever partitioning the
    edge frame arrives with, because ANY partitioning is correct: an
    edge's endpoints always share a local root, and a node split
    across partitions stitches its roots in the caller's contracted
    graph.  Memory is bounded by the scan partition
    (``maxPartitionBytes``): 128 MB of 16-byte edge pairs is ~8M
    dict entries."""
    import pandas as pd

    id_type = edges.schema["src"].dataType.simpleString()

    def gen(batches):
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for a, b in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra != rb:
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
        if parent:
            nodes = list(parent)
            yield pd.DataFrame({"node": nodes,
                                "root": [find(n) for n in nodes]})

    return edges.mapInPandas(
        gen, schema=f"node {id_type}, root {id_type}")


def dup_clusters(pairs: DataFrame, max_iters: int = 20,
                 a_col: str = "doc_a", b_col: str = "doc_b") -> DataFrame:
    """(doc_id, cluster_id): connected components over near-duplicate
    pairs — the step that turns pairwise dup detection into dedup
    GROUPS (keep one representative per component). cluster_id is the
    component's minimum doc id.

    Algorithm: partition-local contraction, then iterative min-label
    propagation over the contracted graph (the two-level CC shape of
    Kiveris et al., "Connected Components in MapReduce and Beyond").

    1. **Contract** (map-only): each edge partition union-finds its own
       edges and emits (node, local_root) — no shuffle of the full edge
       set at all (the previous all-rounds-over-all-edges form paid a
       symmetrize+distinct exchange up front and re-joined the full
       edge set every round).
    2. **Stitch**: a node seen by k partitions carries k local roots;
       one groupBy(node) emits (min_root, other_root) edges.  The
       contracted graph's node set is the local ROOTS — orders of
       magnitude smaller than the input (bounded by edge partition
       count x components-per-partition, not by document count).
    3. **Propagate**: the fused pointer-jumping min-label rounds run
       on that contracted graph only, O(log diameter) rounds of
       3 exchanges each — but over roots, not documents.
    4. **Map back**: one join + min-agg restores per-document labels
       (any of a node's roots carries the component label; min() makes
       the agg deterministic).

    Local roots are partition-local minima and stitching/propagation
    takes minima of minima, so cluster_id = the component's global
    minimum id regardless of how edges land in partitions — values are
    partitioning-invariant (the property the correctness gate checks
    across Spark configs)."""
    edges = pairs.select(F.col(a_col).alias("src"),
                         F.col(b_col).alias("dst"))
    # The contraction output feeds two consumers: the stitch/propagate
    # path (executed eagerly by _min_label_prop's per-round counts) and
    # the returned map-back join.  Pin it so (a) the upstream pair
    # generation runs once, not twice, and (b) both consumers see the
    # SAME local roots — a recomputation under different partitioning
    # would assign different (still-valid) local roots, and the
    # map-back join would miss the propagated labels and silently
    # split clusters.  localCheckpoint because the second consumer is
    # the lazily-returned frame (cache() could not be unpersisted
    # here); lineage severing / unreplicated blocks is the known
    # tradeoff (see retrieval.py) — on executor loss the job fails
    # and the checkpoint-resume layer re-runs the batch.
    mapping = _contract_partitions(edges).localCheckpoint(eager=False)
    grp = mapping.groupBy("node").agg(
        F.min("root").alias("r0"),
        F.collect_set("root").alias("rs"))
    cedges = (grp.where(F.size("rs") > 1)
              .select(F.col("r0").alias("src"),
                      F.explode("rs").alias("dst"))
              .where(F.col("src") != F.col("dst")))
    lbls = _min_label_prop(cedges, max_iters) \
        .withColumnRenamed("src", "root")
    return (
        mapping.join(lbls, "root", "left")
        .groupBy("node")
        .agg(F.min(F.coalesce("lbl", F.col("root"))).alias("cluster_id"))
        .select(F.col("node").alias("doc_id"), "cluster_id")
    )


def _min_label_prop(edges: DataFrame, max_iters: int) -> DataFrame:
    """(src, lbl): fused pointer-jumping min-label propagation — each
    round every node takes min(own label, neighbors' labels,
    label-of-label). The label self-join squares propagation distance,
    so convergence is O(log diameter) rounds. Each round is two
    broadcast-free joins keyed on 8-byte ids; the per-round
    convergence check is one count action — the standard Spark shape
    for iterative graph algorithms (GraphX/Pregel does the same under
    the hood). Labels are cached per round and unpersisted after."""
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"),
                     F.col("src").alias("dst"))).distinct().cache()
    labels = edges.select("src").distinct() \
        .withColumn("lbl", F.col("src")).cache()
    for _ in range(max_iters):
        # One round = three candidate streams unioned into a single
        # min-aggregation (3 exchanges: the two candidate joins and
        # the groupBy) instead of nbr-groupBy + jump-join + a 3-way
        # join back onto labels (5).  The own-label stream carries the
        # old label so the convergence flag falls out of the same agg
        # (exactly one own row per src, so max() over the
        # otherwise-null column is deterministic).
        # ids can be longs (doc ids) OR strings (resolution_mapping
        # feeds entity names) — the absent-own-label null must carry
        # the label type or the union coerces the whole column
        null_lbl = F.lit(None).cast(labels.schema["lbl"].dataType)
        own = labels.select("src", F.col("lbl").alias("cand"),
                            F.col("lbl").alias("own_lbl"))
        nbr = (edges.join(labels.withColumnRenamed("src", "dst"), "dst")
               .select("src", F.col("lbl").alias("cand"),
                       null_lbl.alias("own_lbl")))
        jump = (labels.select(F.col("src").alias("l_src"), "lbl")
                .join(labels.select(F.col("src").alias("lbl"),
                                    F.col("lbl").alias("jlbl")), "lbl")
                .select(F.col("l_src").alias("src"),
                        F.col("jlbl").alias("cand"),
                        null_lbl.alias("own_lbl")))
        # localCheckpoint truncates the per-round lineage — without it
        # every round's plan re-embeds all previous rounds and the job
        # slows superlinearly with iteration count.
        new_labels = (
            own.unionByName(nbr).unionByName(jump)
            .groupBy("src")
            .agg(F.min("cand").alias("new_lbl"),
                 F.max("own_lbl").alias("old_lbl"))
            .select("src", "new_lbl",
                    (F.col("new_lbl") != F.col("old_lbl")).alias("chg"))
            .localCheckpoint()
        )
        changed = new_labels.where("chg").count()
        labels.unpersist()
        labels = new_labels.select(
            "src", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    edges.unpersist()
    return labels
