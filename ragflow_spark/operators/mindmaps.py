"""Mind-map extraction as a distributed operator — the Spark face of
``extractlib.mindmap`` (MindMapExtractor,
/root/reference/graphrag/general/mind_map_extractor.py, plus the
document_service.py:592-609 call site that appends one
``knowledge_graph_kwd='mind_map'`` search row per document).

Scale shape: one ``applyInPandas`` group per document — the reference's
batching fold and batch-dict reduce are sequential per doc (and the
sequential order is also what determinizes the reduce, SURVEY §10.1).
Section text never leaves the group; the output is one small JSON row
per doc.  The LLM markdown response is the seam (``llm_fn``);
tests/oracles inject a closed-form generator.
"""

from __future__ import annotations

import re
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ragflow_spark.extractlib import mindmap as MM

# document_service.py:606 — the constant summary-search tokens every
# mind-map row carries
MM_CONTENT_SRC = "summary summarize 总结 概况 file 文件 概括"


def build_mm_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic per-doc chunk sections: 1 + doc_id%3 sections of 20
    pinned-counter tokens each, so at the test budget (max_length 64 →
    51.2) 3-section docs split into two LLM batches."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    return docs.select(
        "doc_id",
        F.explode(F.sequence(
            F.lit(0), (F.col("doc_id") % 3).cast("int"))).alias("seq"),
        ).withColumn("section", F.lit("sec " * 20)) \
        .withColumn("name", F.concat(F.lit("doc_"), "doc_id",
                                     F.lit(".pdf")))


def stub_mm_response(doc_id: int, batch_no: int, text: str) -> str:
    """Closed-form LLM seam: a markdown mind map whose labels are
    functions of (doc_id, batch) — includes a pair bullet (kept) and a
    plain bullet (dropped by the reference's list->kv quirk)."""
    return (f"# T{doc_id % 4}\n"
            f"## S{batch_no}_{(doc_id + batch_no) % 3}\n"
            f"- k{batch_no}_{doc_id % 2}\n"
            f"  - v{(doc_id * 3 + batch_no) % 5}\n"
            f"- drop{doc_id % 6}\n")


def mind_map_rows(sections: DataFrame,
                  llm_fn: Callable[[int, int, str], str]
                  = stub_mm_response,
                  max_length: int = 64,
                  kb_id: str = "kb0") -> DataFrame:
    """One mind-map search row per document (document_service.py:
    594-609): batch the sections under the token budget, parse each
    markdown response, reduce-merge, render the root tree with
    json.dumps(indent=2); a rendering under 32 chars raises in the
    reference and the caller swallows it — such docs emit nothing."""
    from ragflow_spark.extractlib.huqie import tokenize

    content_ltks = tokenize(MM_CONTENT_SRC)

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        did = int(pdf["doc_id"].iloc[0])
        name = str(pdf["name"].iloc[0])
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "docnm_kwd": pd.Series([], dtype="object"),
            "title_tks": pd.Series([], dtype="object"),
            "content_ltks": pd.Series([], dtype="object"),
            "content_with_weight": pd.Series([], dtype="object"),
            "knowledge_graph_kwd": pd.Series([], dtype="object"),
            "kb_id": pd.Series([], dtype="object"),
            "n_batches": pd.Series([], dtype="int32")})
        try:
            batches = MM.batch_sections(
                [str(s) for s in pdf["section"]], max_length)
            dicts = [MM.response_to_dict(llm_fn(did, b, text))
                     for b, text in enumerate(batches)]
            rendered = MM.render_mind_map(MM.assemble_tree(dicts))
        except Exception:
            # the reference call site wraps the whole build in
            # try/except (document_service.py:594-610): a document
            # whose responses don't parse (e.g. a heading-less reply
            # -> empty merge dict -> IndexError in the root wrap)
            # loses its mind-map row, never the job
            return empty
        if len(rendered) < 32:      # the call-site gate: row dropped
            return empty
        return pd.DataFrame([{
            "doc_id": did,
            "docnm_kwd": name,
            "title_tks": tokenize(re.sub(r"\.[a-zA-Z]+$", "", name)),
            "content_ltks": content_ltks,
            "content_with_weight": rendered,
            "knowledge_graph_kwd": "mind_map",
            "kb_id": [kb_id],
            "n_batches": len(batches),
        }])

    return sections.groupBy("doc_id").applyInPandas(
        per_doc,
        schema=("doc_id long, docnm_kwd string, title_tks string, "
                "content_ltks string, content_with_weight string, "
                "knowledge_graph_kwd string, kb_id array<string>, "
                "n_batches int"))
