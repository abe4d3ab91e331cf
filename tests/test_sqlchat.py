"""refine_sql / sql_answer_tables vs direct transcriptions of
use_sql's sanitizer and markdown composer
(api/db/services/dialog_service.py:390-485)."""

import re

import pytest

from ragflow_spark.extractlib.merge import rm_space
from ragflow_spark.job.session import get_spark
from ragflow_spark.operators.sqlchat import \
    FORBIDDEN_SELECT_FIELDS4RESUME

FIELD_MAP = {
    "name_kwd": "Name/姓名", "age_int": "Age（年龄）",
    "degree_kwd": "Degree", "name_pinyin_kwd": "Pinyin",
    "corp_nm_tks": "Company", "title_tks": "Title",
    "f1": "F1", "f2": "F2", "f3": "F3", "f4": "F4", "f5": "F5",
    "f6": "F6", "f7": "F7", "f8": "F8", "f9": "F9", "f10": "F10",
    "f11": "F11", "f12": "F12",
}


@pytest.fixture(scope="module")
def spark():
    s = get_spark("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _ref_refine(sql, field_map):
    sql = re.sub(r"<think>.*</think>", "", sql, flags=re.DOTALL)
    sql = re.sub(r"[\r\n]+", " ", sql.lower())
    sql = re.sub(r".*select ", "select ", sql.lower())
    sql = re.sub(r" +", " ", sql)
    sql = re.sub(r"([;；]|```).*", "", sql)
    if sql[: len("select ")] != "select ":
        return None
    if not re.search(r"((sum|avg|max|min)\(|group by )", sql.lower()):
        if sql[: len("select *")] != "select *":
            sql = "select doc_id,docnm_kwd," + sql[6:]
        else:
            flds = []
            for k in field_map.keys():
                if k in FORBIDDEN_SELECT_FIELDS4RESUME:
                    continue
                if len(flds) > 11:
                    break
                flds.append(k)
            sql = "select doc_id,docnm_kwd," + ",".join(flds) + sql[8:]
    return sql


def test_refine_sql_matches_reference(spark):
    from ragflow_spark.operators.sqlchat import refine_sql

    cases = [
        "select name_kwd from t where age_int > 3",
        "Sure! Here is the SQL:\nSELECT name_kwd FROM t;",
        "<think>long\nreasoning</think>select *  from t where x=1",
        "select sum(age_int) from t group by name_kwd",
        "select avg(age_int) from t",
        "I cannot write SQL for that.",
        "```sql\nselect name_kwd from t\n``` hope that helps",
        "select a select name_kwd from t",   # greedy: keeps the last
        "update t set x=1",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)],
        schema="qid long, sql_response string")
    got = {r["qid"]: r["sql"]
           for r in refine_sql(df, FIELD_MAP).collect()}
    for i, c in enumerate(cases):
        assert got[i] == _ref_refine(c, FIELD_MAP), (i, c)
    # the star expansion skipped forbidden fields and capped at 12
    assert got[2].startswith("select doc_id,docnm_kwd,name_kwd,"
                             "age_int,corp_nm_tks,title_tks,f1,")
    assert "degree_kwd" not in got[2]     # forbidden field skipped
    assert "f8" in got[2] and "f9" not in got[2]   # 12-field cap


def _ref_answer(cols, rows, field_map):
    docid_idx = {i for i, c in enumerate(cols) if c == "doc_id"}
    docnm_idx = {i for i, c in enumerate(cols) if c == "docnm_kwd"}
    col_idx = [i for i in range(len(cols))
               if i not in (docid_idx | docnm_idx)]
    columns = "|" + "|".join(
        re.sub(r"(/.*|（[^（）]+）)", "", field_map.get(cols[i], cols[i]))
        for i in col_idx) + ("|Source|" if docid_idx and docid_idx
                             else "|")
    line = "|" + "|".join("------" for _ in col_idx) + \
        ("|------|" if docid_idx and docid_idx else "")
    body = ["|" + "|".join(rm_space(str(r[i])) for i in col_idx)
            .replace("None", " ") + "|" for r in rows]
    body = [r for r in body if re.sub(r"[ |]+", "", r)]
    body = "\n".join(r + f" ##{ii}$$ |" for ii, r in enumerate(body))
    body = re.sub(r"T[0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+Z)?\|", "|",
                  body)
    return "\n".join([columns, line, body])


def test_answer_table_matches_reference(spark):
    from ragflow_spark.operators.sqlchat import sql_answer_tables

    cols = ["doc_id", "docnm_kwd", "name_kwd", "age_int", "joined"]
    rows = [
        ["d1", "a.pdf", "Zhang San", "33", "2020-01-02T11:22:33"],
        ["d1", "a.pdf", "None of the above", "None",
         "2021-05-06T07:08:09.5Z"],
        ["d2", "b.pdf", " ", "None", "None"],   # empties out: dropped
        ["d2", "b.pdf", "Li Si", "28", "2022-03-04T05:06:07"],
    ]
    df = spark.createDataFrame(
        [(1, cols, rows)],
        schema="qid long, columns array<string>, "
               "rows array<array<string>>")
    got = sql_answer_tables(df, FIELD_MAP).collect()[0]
    assert got["answer"] == _ref_answer(cols, rows, FIELD_MAP)
    assert got["n_chunks"] == 4        # chunk refs keep ALL rows
    assert got["n_doc_aggs"] == 2
    # header used the field_map label with the /… suffix stripped
    assert got["answer"].splitlines()[0] == "|Name|Age|joined|Source|"


def test_answer_table_missing_identity_columns(spark):
    from ragflow_spark.operators.sqlchat import sql_answer_tables

    df = spark.createDataFrame(
        [(2, ["name_kwd"], [["only row"]])],
        schema="qid long, columns array<string>, "
               "rows array<array<string>>")
    got = sql_answer_tables(df, FIELD_MAP).collect()[0]
    assert got["n_chunks"] == 0 and got["n_doc_aggs"] == 0
    assert got["answer"].splitlines()[0] == "|Name|"
