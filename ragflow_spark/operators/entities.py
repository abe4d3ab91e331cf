"""Entity-resolution candidate generation: the deterministic half of
graphrag/entity_resolution.py (:94 candidate pairs within an entity
type, :184-192 is_similarity). The reference enumerates
itertools.combinations per type and gates with is_similarity, then
ships candidates to an LLM judge — the judge is the model seam; the
candidate generator is a classic curation operator and is what ships
here.

Scale shape: never all-pairs. Two blocking passes cover the gate's two
disjuncts exactly, then the verbatim gate verifies:

- char block (overlap > 1): inverted index on distinct characters,
  pairs sharing >= 2 index entries — same bucketed-join shape as the
  n-gram Jaccard dedup.
- edit block (lev <= min_len // 2): that bound forces
  max_len <= 1.5 * min_len, so names bucketed by
  floor(log1.5(len)) meet in same-or-adjacent buckets; each name
  joins its own and next bucket only.

Both blocks emit supersets; the exact ``is_similar_entity`` verify
makes the output authoritative, so blocking is a performance choice,
not a correctness one.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_LOG15 = math.log(1.5)


def entity_candidate_pairs(entities: DataFrame,
                           id_col: str = "ent_id",
                           name_col: str = "name",
                           type_col: str = "ent_type") -> DataFrame:
    """(ent_a, ent_b) candidate pairs (ent_a < ent_b), same-type only,
    satisfying is_similarity — the input to the LLM-judge seam."""
    base = entities.select(
        F.col(id_col).alias("id"), F.col(name_col).alias("nm"),
        F.col(type_col).alias("ty"))

    # char block: >= 2 shared distinct characters
    chars = base.select(
        "id", "nm", "ty",
        F.explode(F.array_distinct(F.split(F.col("nm"), ""))).alias("ch")
    ).where(F.col("ch") != "")
    ca, cb = chars.alias("a"), chars.alias("b")
    char_pairs = (
        ca.join(cb, (F.col("a.ch") == F.col("b.ch"))
                & (F.col("a.ty") == F.col("b.ty"))
                & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"),
                 F.col("a.nm").alias("na"), F.col("b.nm").alias("nb"))
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= 2)
        .select("ia", "ib", "na", "nb")
    )

    # edit block: lev <= min//2 implies len ratio <= 1.5 -> log-banded
    # buckets, each name probes its own and the next bucket
    bucket = F.floor(F.log(F.length("nm")) / _LOG15).cast("int")
    banded = base.withColumn("bk", bucket).select(
        "id", "nm", "ty",
        F.explode(F.array(F.col("bk"), F.col("bk") + 1)).alias("bkt"))
    ba, bb = banded.alias("a"), banded.alias("b")
    band_pairs = (
        ba.join(bb, (F.col("a.bkt") == F.col("b.bkt"))
                & (F.col("a.ty") == F.col("b.ty"))
                & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"),
                F.col("a.nm").alias("na"), F.col("b.nm").alias("nb"))
        .where(F.abs(F.length("na") - F.length("nb"))
               <= F.floor(F.least(F.length("na"), F.length("nb")) / 2))
        .dropDuplicates(["ia", "ib"])
    )

    cand = char_pairs.unionByName(band_pairs).dropDuplicates(["ia", "ib"])

    def verify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ragflow_spark.extractlib.textdist import is_similar_entity

        for pdf in it:
            keep = [is_similar_entity(a, b)
                    for a, b in zip(pdf["na"], pdf["nb"])]
            out = pdf[pd.Series(keep, index=pdf.index)]
            yield out[["ia", "ib"]].rename(
                columns={"ia": "ent_a", "ib": "ent_b"})

    return cand.mapInPandas(verify, schema="ent_a long, ent_b long")
