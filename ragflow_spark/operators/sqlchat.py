"""Chat-with-table ("use_sql") — the deterministic machinery around
the text-to-SQL model call
(api/db/services/dialog_service.py:374-485).

The reference asks the LLM for SQL over the chunk store, sanitizes
whatever comes back, force-prepends identity columns, runs it, and
renders the result as a markdown table with per-row citation markers.
The LLM call and the store execution are seams; everything else is
here, batched over a table of questions:

``refine_sql`` — the response sanitizer (dialog_service.py:390-410),
pure JVM expressions:

- strip ``<think>…</think>`` (DOTALL), lowercase, collapse CR/LF to a
  space, drop everything before the LAST ``select `` (the reference's
  greedy ``.*select ``), collapse space runs, cut at the first
  ``;``/``；``/``\\u0060\\u0060\\u0060``;
- anything not starting ``select `` is rejected (null);
- a query with no aggregate (``(sum|avg|max|min)(`` or ``group by ``)
  gets ``doc_id,docnm_kwd`` prepended; ``select *`` instead expands to
  the first 12 non-forbidden field-map keys
  (forbidden_select_fields4resume, rag/app/resume.py:30).

``sql_answer_tables`` — the result renderer
(dialog_service.py:447-485), one Arrow batch:

- doc_id / docnm_kwd columns are hidden from the display and drive the
  ``Source`` column and the reference chunk list;
- headers map through field_map with the ``(/.*|（…）)`` suffix strip;
- cells are ``rmSpace(str(v))`` and the JOINED row text has the
  substring ``"None"`` replaced by a space — a cell VALUE containing
  "None" is mangled too, quirk kept;
- rows that are empty after ``[ |]+`` removal are dropped, citation
  markers `` ##i$$ |`` number the survivors, and ``Thh:mm:ss…|`` time
  suffixes are stripped from the joined text afterward;
- doc_aggs count rows per doc_id in first-seen order; a result missing
  doc_id or docnm_kwd yields the bare answer with empty references
  (after headers already decided the Source column on doc_id alone —
  the reference tests ``docid_idx and docid_idx``, never doc_name,
  quirk kept).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ragflow_spark.extractlib.merge import rm_space

FORBIDDEN_SELECT_FIELDS4RESUME = [
    "name_pinyin_kwd", "edu_first_fea_kwd", "degree_kwd",
    "sch_rank_kwd", "edu_fea_kwd"]


def refine_sql(responses: DataFrame, field_map: dict,
               sql_col: str = "sql_response",
               out_col: str = "sql") -> DataFrame:
    """responses + ``out_col``: the sanitized, column-prepended SQL
    (null when the model's answer is not a select)."""
    flds = []
    for k in field_map:
        if k in FORBIDDEN_SELECT_FIELDS4RESUME:
            continue
        if len(flds) > 11:
            break
        flds.append(k)
    star_expansion = "select doc_id,docnm_kwd," + ",".join(flds)

    s = F.regexp_replace(F.col(sql_col), r"(?s)<think>.*</think>", "")
    s = F.lower(s)
    s = F.regexp_replace(s, r"[\r\n]+", " ")
    s = F.regexp_replace(s, r".*select ", "select ")
    s = F.regexp_replace(s, r" +", " ")
    s = F.regexp_replace(s, r"([;；]|```).*", "")
    is_select = s.startswith("select ")
    has_agg = s.rlike(r"((sum|avg|max|min)\(|group by )")
    refined = (
        F.when(~is_select, F.lit(None))
        .when(has_agg, s)
        .when(s.startswith("select *"),
              F.concat(F.lit(star_expansion), F.substring(s, 9, 2**30)))
        .otherwise(F.concat(F.lit("select doc_id,docnm_kwd,"),
                            F.substring(s, 7, 2**30))))
    return responses.withColumn(out_col, refined)


def sql_answer_tables(results: DataFrame, field_map: dict) -> DataFrame:
    """(qid, answer, n_chunks, n_doc_aggs) per SQL result.

    ``results``: (qid, columns array<string>, rows
    array<array<string>>) — stringified cells, SQL NULL as the string
    'None' (the reference renders ``str(r[i])``).
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for qid, cols, rows in zip(pdf["qid"], pdf["columns"],
                                       pdf["rows"]):
                cols = list(cols)
                rows = [list(r) for r in rows]
                docid_idx = {i for i, c in enumerate(cols)
                             if c == "doc_id"}
                docnm_idx = {i for i, c in enumerate(cols)
                             if c == "docnm_kwd"}
                col_idx = [i for i in range(len(cols))
                           if i not in (docid_idx | docnm_idx)]
                header = "|" + "|".join(
                    re.sub(r"(/.*|（[^（）]+）)", "",
                           field_map.get(cols[i], cols[i]))
                    for i in col_idx) + \
                    ("|Source|" if docid_idx and docid_idx else "|")
                line = "|" + "|".join("------" for _ in col_idx) + \
                    ("|------|" if docid_idx and docid_idx else "")
                body = ["|" + "|".join(
                    rm_space(str(r[i])) for i in col_idx)
                    .replace("None", " ") + "|" for r in rows]
                body = [r for r in body if re.sub(r"[ |]+", "", r)]
                body = "\n".join(r + f" ##{ii}$$ |"
                                 for ii, r in enumerate(body))
                body = re.sub(
                    r"T[0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+Z)?\|",
                    "|", body)
                answer = "\n".join([header, line, body])
                if not docid_idx or not docnm_idx:
                    out.append({"qid": qid, "answer": answer,
                                "n_chunks": 0, "n_doc_aggs": 0})
                    continue
                di = list(docid_idx)[0]
                aggs = {}
                for r in rows:
                    aggs.setdefault(r[di], 0)
                    aggs[r[di]] += 1
                out.append({"qid": qid, "answer": answer,
                            "n_chunks": len(rows),
                            "n_doc_aggs": len(aggs)})
            yield pd.DataFrame(
                out, columns=["qid", "answer", "n_chunks",
                              "n_doc_aggs"])

    return results.mapInPandas(
        batches,
        schema="qid long, answer string, n_chunks long, "
               "n_doc_aggs long")
