"""Community-report extraction, distributed
(graphrag/general/community_reports_extractor.py:51-154 + the
``dict_has_keys_with_types`` gate at graphrag/utils.py:81-92).

The reference walks every community in one process: build an entity /
relation CSV pair for the prompt, call the LLM, clean and type-check
the JSON answer, render a markdown report.  Here the prompt-input side
is relational — the community×community pairwise edge scan becomes a
rank-bounded self-join (the reference's ``k >= 10000`` cap is a
per-community ``row_number() <= pair_cap`` WindowGroupLimit instead of
a nested loop, so a million communities build their CSVs in one
shuffle) — and the answer side is one Arrow batch per partition.

Quirks kept:

- communities with fewer than 2 entities are skipped before any work
  (extractor:65);
- the pair scan counts only pairs that HAVE an edge toward the cap,
  in (i, j) member order (extractor:71-82); the edge lookup is
  orientation-insensitive (``graph.get_edge_data`` on an undirected
  graph);
- the CSVs are pandas ``to_csv(index_label="id")`` byte-for-byte —
  built by pandas itself inside the UDF, including the empty-frame
  degenerate output when a community has no internal edges;
- answer cleaning strips everything before the first ``{`` and after
  the last ``}`` and collapses ``{{``/``}}`` (extractor:95-98); a
  JSON-decode failure drops the community silently;
- the type gate requires rating to be a JSON *float* — an integer
  rating is rejected (``isinstance(value, float)``), titles must be
  strings, findings a list (utils.py:81-92);
- the markdown report renders ``## {summary}\\n\\n{explanation}``
  sections, where a bare-string finding contributes its text as the
  summary and an empty explanation (extractor:136-154).

The LLM call itself is the seam: ``parse_community_reports`` consumes
a response column.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

_EXPECTED = [("title", str), ("summary", str), ("findings", list),
             ("rating", float), ("rating_explanation", str)]


def community_prompt_inputs(members: DataFrame, nodes: DataFrame,
                            edges: DataFrame,
                            pair_cap: int = 10000) -> DataFrame:
    """(level, comm, n_ents, ent_csv, rela_csv) per community.

    ``members``: (level, comm, seq, ent) — ``seq`` the community's
    node-list order.  ``nodes``: (ent, description).  ``edges``:
    (src, tgt, description), stored in either orientation.
    """
    rk = F.row_number().over(
        Window.partitionBy("level", "comm").orderBy("seq")) - 1
    m = (members.join(nodes, "ent")
         .select("level", "comm", "seq", "ent", "description")
         .withColumn("rk", rk).drop("seq"))

    li = m.select("level", "comm", F.col("ent").alias("ei"),
                  F.col("rk").alias("ri"))
    lj = m.select("level", "comm", F.col("ent").alias("ej"),
                  F.col("rk").alias("rj"))
    pairs = li.join(lj, ["level", "comm"]).where(F.col("ri") <
                                                 F.col("rj"))
    fwd = pairs.join(edges, (pairs["ei"] == edges["src"])
                     & (pairs["ej"] == edges["tgt"]))
    rev = pairs.join(edges, (pairs["ej"] == edges["src"])
                     & (pairs["ei"] == edges["tgt"]))
    # the undirected store holds ONE row per pair (graph_merge emits
    # canonical pairs); distinct() makes an accidentally
    # double-oriented duplicate of the same row harmless, while
    # same-pair rows with DIFFERING descriptions remain a precondition
    # violation of that contract
    hit = fwd.unionByName(rev).select(
        "level", "comm", "ri", "rj", "ei", "ej",
        "description").distinct()
    # the reference caps at pair_cap FOUND pairs in (i, j) scan order
    hit = (hit.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("level", "comm")
                            .orderBy("ri", "rj")))
        .where(F.col("rn") <= pair_cap))

    ents_g = (m.groupBy("level", "comm")
              .agg(F.count("*").alias("n_ents"),
                   F.array_sort(F.collect_list(F.struct(
                       "rk", "ent", "description"))).alias("_ents"))
              .where(F.col("n_ents") >= 2))
    pairs_g = (hit.groupBy("level", "comm")
               .agg(F.array_sort(F.collect_list(F.struct(
                   "rn", "ei", "ej", "description"))).alias("_rels")))
    j = ents_g.join(pairs_g, ["level", "comm"], "left")

    def csv_batches(it: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in it:
            ent_csv, rela_csv = [], []
            for ents, rels in zip(pdf["_ents"], pdf["_rels"]):
                ent_df = pd.DataFrame(
                    [{"entity": e["ent"],
                      "description": e["description"]} for e in ents])
                ent_csv.append(ent_df.to_csv(index_label="id"))
                rela_df = pd.DataFrame(
                    [] if rels is None else
                    [{"source": r["ei"], "target": r["ej"],
                      "description": r["description"]} for r in rels])
                rela_csv.append(rela_df.to_csv(index_label="id"))
            out = pdf[["level", "comm", "n_ents"]].copy()
            out["ent_csv"] = ent_csv
            out["rela_csv"] = rela_csv
            yield out

    return j.mapInPandas(
        csv_batches,
        schema="level int, comm long, n_ents long, ent_csv string, "
               "rela_csv string")


def parse_community_reports(responses: DataFrame) -> DataFrame:
    """(level, comm, title, summary, rating, rating_explanation,
    n_findings, report_text) for responses surviving the clean + JSON
    parse + type gate.  ``responses``: (level, comm, response)."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for level, comm, resp in zip(pdf["level"], pdf["comm"],
                                         pdf["response"]):
                resp = re.sub(r"^[^\{]*", "", resp)
                resp = re.sub(r"[^\}]*$", "", resp)
                resp = re.sub(r"\{\{", "{", resp)
                resp = re.sub(r"\}\}", "}", resp)
                try:
                    data = json.loads(resp)
                except json.JSONDecodeError:
                    continue
                ok = isinstance(data, dict) and all(
                    k in data and isinstance(data[k], t)
                    for k, t in _EXPECTED)
                if not ok:
                    continue
                title = data.get("title", "Report")
                summary = data.get("summary", "")
                findings = data.get("findings", [])
                sections = "\n\n".join(
                    "## {}\n\n{}".format(
                        f if isinstance(f, str) else f.get("summary"),
                        "" if isinstance(f, str)
                        else f.get("explanation"))
                    for f in findings)
                rows.append({
                    "level": level, "comm": comm, "title": title,
                    "summary": summary, "rating": data["rating"],
                    "rating_explanation": data["rating_explanation"],
                    "n_findings": len(findings),
                    "report_text":
                        f"# {title}\n\n{summary}\n\n{sections}"})
            yield pd.DataFrame(
                rows, columns=["level", "comm", "title", "summary",
                               "rating", "rating_explanation",
                               "n_findings", "report_text"])

    return responses.mapInPandas(
        batches,
        schema="level int, comm long, title string, summary string, "
               "rating double, rating_explanation string, "
               "n_findings long, report_text string")
