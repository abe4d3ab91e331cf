"""Prompt assembly: the deterministic chat-side helpers every
reference dialog turn runs (rag/prompts.py:30-128 ``chunks_format``,
``message_fit_in``, ``kb_prompt``), re-expressed over conversation /
retrieval tables so a batch-RAG job assembles millions of prompts in
one pass.

``fit_messages`` — message_fit_in (prompts.py:58-93).  Per
conversation: keep everything when the token total fits; otherwise
keep the system messages plus the final message (the final message
joins only when the conversation has more than one message — a
single over-budget non-system message therefore yields an EMPTY kept
list, and a conversation ENDING in a system message keeps that
message TWICE with its tokens double-counted, both quirks
preserved); if still over, token-slice one side — the
first kept message when it holds >0.8 of the first+last token mass,
else the last — to ``max_length - ll2`` tokens (``ll2`` = the last
kept message's count; the slice budget can go negative, Python slice
semantics kept via ``tokens.token_head``).  The fitted count column
reports what the reference returns: the total, the reduced total, or
``max_length``.

``kb_prompt`` quirks kept (prompts.py:96-128):

- the token budget cut tests AFTER adding a chunk and keeps the
  over-budget chunk: ``chunks_num`` is incremented before the 0.97 ×
  max_tokens check, and the later loops slice with ``[:chunks_num]``
  (the trimmed ``knowledges`` list is discarded);
- documents group by ``docnm_kwd`` in first-seen order, but the meta
  shown for a name is the LAST kept chunk's document's meta (each
  iteration overwrites);
- chunk lines carry the GLOBAL kept-window index (``ID: {i}``from the
  outer enumerate), an optional ``URL:`` line, and the per-doc header
  ``\\nDocument: {nm} \\n`` + meta ``{k}: {v}`` lines +
  ``Relevant fragments as following:``.

Scale shape: token counting is one Arrow batch; everything else is
window cumsums and a (qid, docnm) aggregation — the widest shuffle
row is one chunk line, and per-conversation work never touches the
driver.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ragflow_spark.extractlib.tokens import (num_tokens_from_string,
                                             token_head)


def chunks_format(chunks: DataFrame) -> DataFrame:
    """The API chunk-reference mapping (prompts.py:30-44): each output
    field prefers the retrieval-side name and falls back to the
    store-side name."""
    pairs = [("id", "chunk_id", "id"),
             ("content", "content", "content_with_weight"),
             ("document_id", "doc_id", "document_id"),
             ("document_name", "docnm_kwd", "document_name"),
             ("dataset_id", "kb_id", "dataset_id"),
             ("image_id", "image_id", "img_id"),
             ("positions", "positions", "position_int")]
    cols = set(chunks.columns)

    def pick(k1, k2):
        have = [F.col(k) for k in (k1, k2) if k in cols]
        return F.coalesce(*have) if have else F.lit(None)

    return chunks.select(
        *[pick(k1, k2).alias(out) for out, k1, k2 in pairs],
        (F.col("url") if "url" in cols else F.lit(None)).alias("url"))


def _with_tokens(df: DataFrame, text_col: str,
                 out_col: str) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = [num_tokens_from_string(s)
                            for s in pdf[text_col]]
            yield pdf

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    return df.mapInPandas(batches, schema=f"{fields}, {out_col} long")


def fit_messages(msgs: DataFrame, max_length: int = 4000,
                 meta: bool = False) -> DataFrame:
    """(conv_id, seq, role, content, fit_tokens): the per-conversation
    message list after message_fit_in, one row per surviving message.

    ``msgs``: (conv_id, seq, role, content), ``seq`` the list order.

    ``meta=True`` swaps the sliced ``content`` string for the integer
    evidence surface of the SAME pipeline — branch tag, token totals,
    slice flag/budget, and the post-slice ``length(content)`` — so a
    value-hash divergence localizes to one named intermediate instead
    of an opaque string mismatch (every column is non-null int/bool/
    1-char string; nullable window results are pinned to -1).
    """
    t = _with_tokens(msgs, "content", "_tok")
    w = Window.partitionBy("conv_id")
    t = (t.withColumn("_total", F.sum("_tok").over(w))
         .withColumn("_last_seq", F.max("seq").over(w))
         .withColumn("_n", F.count("*").over(w)))
    keep_b = ((F.col("role") == "system") |
              ((F.col("seq") == F.col("_last_seq")) & (F.col("_n") > 1)))
    t = t.withColumn("_keep_b", keep_b)
    kb = F.when(F.col("_keep_b"), F.col("_tok"))
    t = (t.withColumn("_tot_b", F.sum(kb).over(w))
         .withColumn("_first_kept",
                     F.min(F.when(F.col("_keep_b"), F.col("seq")))
                     .over(w))
         .withColumn("_last_kept",
                     F.max(F.when(F.col("_keep_b"), F.col("seq")))
                     .over(w)))
    ll = F.max(F.when(F.col("seq") == F.col("_first_kept"),
                      F.col("_tok"))).over(w)
    ll2 = F.max(F.when(F.col("seq") == F.col("_last_kept"),
                       F.col("_tok"))).over(w)
    t = t.withColumn("_ll", ll).withColumn("_ll2", ll2)

    # a conversation ENDING in a system message keeps that message
    # twice — the reference appends msg[-1] to the system-filtered
    # list unconditionally (prompts.py:73-75), so its tokens count
    # twice and the output carries a duplicate row (both instances
    # are the same dict there, so a slice mutates both)
    dup = ((F.col("role") == "system")
           & (F.col("seq") == F.col("_last_seq")) & (F.col("_n") > 1))
    t = (t.withColumn("_dup", dup)
         .withColumn(
             "_tot_b",
             F.col("_tot_b")
             + F.coalesce(F.sum(F.when(dup, F.col("_tok"))).over(w),
                          F.lit(0))))

    case_a = F.col("_total") < max_length
    case_b = F.coalesce(F.col("_tot_b"), F.lit(0)) < max_length
    # the reference compares ll / (ll + ll2) > 0.8 in Python floats
    # (rag/prompts.py:84); ll*5 > (ll+ll2)*4 is the exact rational
    # form — identical for every token-count pair below ~2.5e14
    # (the quotient sits ≥ 1/(5q) away from 4/5 whenever unequal,
    # far above double rounding error) and keeps the whole query
    # float-free end to end
    trunc_first = (F.col("_ll") * 5) > ((F.col("_ll") + F.col("_ll2"))
                                        * 4)
    trunc_seq = F.when(trunc_first, F.col("_first_kept")) \
        .otherwise(F.col("_last_kept"))
    kept = t.where(case_a | F.col("_keep_b")).unionByName(
        t.where(~case_a & F.col("_dup")))
    # _slice/_budget are non-nullable (boolean + coalesced long) so
    # the pandas batches below always arrive as bool/int64 regardless
    # of how Arrow splits rows into batches — a nullable long column
    # flips between int64/float64/object depending on the null mix of
    # the particular batch, which is the kind of
    # environment-sensitive surface a value-hash gate can trip on
    slice_b = (~case_a & ~case_b & (F.col("seq") == trunc_seq))
    kept = (kept
            .withColumn("_slice", slice_b)
            .withColumn("_budget",
                        F.when(slice_b,
                               F.lit(max_length) - F.col("_ll2"))
                        .otherwise(F.lit(0)).cast("long"))
            .withColumn("fit_tokens",
                        F.when(case_a, F.col("_total"))
                        .when(case_b, F.col("_tot_b"))
                        .otherwise(F.lit(max_length)).cast("long")))

    def head_batches(it: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["content"] = [
                token_head(s, int(b)) if sl else s
                for s, b, sl in zip(pdf["content"], pdf["_budget"],
                                    pdf["_slice"])]
            yield pdf

    dbg = [F.when(case_a, "A").when(case_b, "B").otherwise("C")
           .alias("br"),
           F.col("_total").cast("long").alias("total"),
           F.coalesce(F.col("_tot_b"), F.lit(-1)).cast("long")
           .alias("tot_b"),
           F.coalesce(F.col("_ll"), F.lit(-1)).cast("long").alias("ll"),
           F.coalesce(F.col("_ll2"), F.lit(-1)).cast("long")
           .alias("ll2")] if meta else []
    sliced = kept.select("conv_id", "seq", "role", "content", *dbg,
                         "_slice", "_budget", "fit_tokens")
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in sliced.schema.fields)
    out = sliced.mapInPandas(head_batches, schema=fields)
    if meta:
        return out.select(
            "conv_id", "seq", "role", "br", "total", "tot_b", "ll",
            "ll2", F.col("_slice").alias("sliced"),
            F.col("_budget").alias("budget"), "fit_tokens",
            F.length("content").cast("long").alias("content_len"))
    return out.drop("_slice", "_budget")


def kb_prompts(chunks: DataFrame, doc_meta: DataFrame,
               max_tokens: int = 4096) -> DataFrame:
    """(qid, docnm_kwd, doc_seq, prompt): kb_prompt's per-document
    knowledge sections for every retrieval result at once.

    ``chunks``: (qid, i, doc_id, docnm_kwd, content_with_weight, url
    nullable) — ``i`` the retrieval order.  ``doc_meta``: (doc_id,
    meta array<struct<k:string,v:string>>), meta line order preserved.
    """
    t = _with_tokens(chunks, "content_with_weight", "_tok")
    wq = (Window.partitionBy("qid").orderBy("i")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    t = t.withColumn("_cum", F.sum("_tok").over(wq))
    over = F.when(F.col("_cum") > max_tokens * 0.97, F.col("i"))
    t = t.withColumn(
        "_first_over",
        F.min(over).over(Window.partitionBy("qid")))
    # the over-budget chunk itself stays (chunks_num counts it)
    kept = t.where(F.col("_first_over").isNull()
                   | (F.col("i") <= F.col("_first_over")))

    line = F.concat(
        F.when(F.col("url").isNotNull(),
               F.concat(F.lit("URL: "), F.col("url"), F.lit("\n")))
        .otherwise(F.lit("")),
        F.lit("ID: "), F.col("i").cast("string"), F.lit("\n"),
        F.col("content_with_weight"))
    kept = kept.withColumn("_line", line)

    grp = (kept.groupBy("qid", "docnm_kwd")
           .agg(F.min("i").alias("_first_i"),
                F.max_by("doc_id", "i").alias("_meta_doc"),
                F.concat_ws(
                    "", F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("i", "_line"))),
                        lambda s: F.concat(s["_line"], F.lit("\n"))))
                .alias("_frags")))
    meta_txt = F.when(F.col("meta").isNull(), F.lit("")).otherwise(
        F.concat_ws(
            "", F.transform(
                F.col("meta"),
                lambda kv: F.concat(kv["k"], F.lit(": "), kv["v"],
                                    F.lit("\n")))))
    out = (grp.join(doc_meta,
                    grp["_meta_doc"] == doc_meta["doc_id"], "left")
           .withColumn(
               "prompt",
               F.concat(F.lit("\nDocument: "), F.col("docnm_kwd"),
                        F.lit(" \n"), meta_txt,
                        F.lit("Relevant fragments as following:\n"),
                        F.col("_frags")))
           .withColumn(
               "doc_seq",
               F.row_number().over(
                   Window.partitionBy("qid").orderBy("_first_i"))))
    return out.select("qid", "docnm_kwd", "doc_seq", "prompt")
