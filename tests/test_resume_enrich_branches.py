"""Pin resume-enrichment sub-branches the main suite never fired.

Targets the surviving coverage misses in resume_enrich.py: epoch-time
education/work dates, abroad-school features, the 本科+专科 ->
专升本 list rewrite, the 好学历-without-好学校 arm, project
responsibility/achivement descs, string-typed work entries, the
forWork y/m continue guards, the full-width-digit subordinates quirk,
corporation_id coercions, political-status folding, _obj parse
failure, and the work_start_time exception arm.  Clock pinned as in
test_resume_enrich.py.

Not covered, by parity with the reference (verified against
step_two.py:80-88,185-196): the per-entry education except arms and
the 至今 end-date arm are unreachable for string-typed inputs —
turnTm2Dt slices to 10 digits so it never overflows, getYMD only
raises via int('') AFTER ed_dt is already poisoned with '' (which
crashes both implementations identically at edu_end_int), and getYMD
never returns an empty day, so the updated_at day fallback is dead in
both trees.
"""

import datetime
import json

import pytest

from ragflow_spark.extractlib.resume_enrich import (_arr2str, enrich,
                                                    for_birth, for_work,
                                                    parse)

TODAY = datetime.date(2025, 6, 1)


def _content(basic=None, contact=None, education=None, work=None,
             project=None):
    obj = {}
    if basic:
        obj["basic"] = basic
    if contact:
        obj["contact"] = contact
    if education is not None:
        obj["education"] = {str(i): e for i, e in enumerate(education)}
    if work is not None:
        obj["work"] = {str(i): w for i, w in enumerate(work)}
    if project is not None:
        obj["project"] = {str(i): p for i, p in enumerate(project)}
    return json.dumps(obj, ensure_ascii=False)


def _enrich(**kw):
    return enrich(_content(**kw), "42", "2021-06-01 00:00:00",
                  today=TODAY)


# ---- helpers -------------------------------------------------------


def test_arr2str_list_and_comma_fold():
    assert _arr2str(["internet", "fin,tech"]) == "internet fin tech"
    assert _arr2str("") == ""
    assert _arr2str("a,b") == "a b"


def test_expect_industry_list_through_step_one():
    cv = _enrich(basic={"expect_industry_name": ["internet",
                                                 "fin,tech"]})
    assert cv["expect_industry_name_tks"]
    assert "internet" in cv["expect_industry_name_kwd"]


# ---- forEdu --------------------------------------------------------


def _edu(school, degree, start="2004-09", end="2008-06"):
    return {"school_name": school, "degree": degree,
            "start_time": start, "end_time": end,
            "discipline_name": "cs"}


def test_edu_epoch_millisecond_times():
    # 1096329600 = 2004-09-28, 1212364800 = 2008-06-02 (UTC)
    cv = _enrich(education=[_edu("hebei university", "1",
                                 start="1096329600000",
                                 end="1212364800000")])
    assert cv["edu_start_kwd"] == ["2004"]
    assert cv["edu_end_kwd"] == ["2008"]
    assert cv["edu_end_int"] == 2008
    # edu_end_dt is the raw epoch string; the tail block re-folds it
    assert cv["work_exp_flt"] == TODAY.year - 2008


def test_edu_abroad_school_features():
    cv = _enrich(education=[_edu("mit", "2")])
    for f in ["留学", "海外知名"]:
        assert f in cv["edu_fea_kwd"]
    assert cv["sch_rank_kwd"] == ["顶尖学校"]      # rank 10


def test_edu_bachelor_then_associate_rewrites_topup():
    # 本科 sorts first (earlier start), so the inline rewrite cannot
    # fire; the post-loop rewrite appends 专升本 and drops 本科
    cv = _enrich(education=[
        _edu("hebei university", "1", start="2000-09", end="2004-06"),
        _edu("hebei university", "4", start="2005-09", end="2007-06"),
    ])
    assert "专升本" in cv["degree_kwd"]
    assert "本科" not in cv["degree_kwd"]
    assert "专科" in cv["degree_kwd"]


def test_edu_good_degree_without_good_school():
    # 本科+硕士 at a non-good school: 好学历 via the degree-pair
    # arm, with no 好学校 alongside
    cv = _enrich(education=[
        _edu("hebei university", "1", start="2000-09", end="2004-06"),
        _edu("hebei university", "2", start="2004-09", end="2007-06"),
    ])
    assert "好学历" in cv["tag_kwd"]
    assert "好学校" not in cv["tag_kwd"]


# ---- forProj -------------------------------------------------------


def test_project_desc_sources_and_discarded_name():
    cv = _enrich(project=[
        {"name": "（442）"},                  # cleans to empty -> skipped
        {"name": "Apollo", "describe": "<b>rewrite</b>",
         "responsibilities": "lead dev", "achivement": "shipped v1",
         "updated_at": "2020"},
    ])
    assert cv["project_kwd"] == ["apollo"]
    joined = cv["pro_desc_ltks"]
    assert "lead" in joined and "ship" in joined


# ---- forWork -------------------------------------------------------


def test_work_string_entries_lax_parsed_or_skipped():
    cv = _enrich(work=[
        "{'corporation_name': 'huawei', 'position_name': 'engineer',"
        " 'start_time': '2010-01', 'end_time': '2012-01'}",
        "not a json object",
    ])
    assert cv["corporation_name_kwd"] == "huawei"
    assert cv["job_num_int"] == 1


def test_work_unparseable_start_skips_duration():
    cv = _enrich(work=[{"corporation_name": "acme",
                        "start_time": "x2008", "end_time": "2012-01"}])
    # per-entry y/m guard skipped the duration AND the outer
    # work_st_tm fold raised on int('') — both degrade silently
    assert cv["job_num_int"] == 0
    assert "latest_job_dt" not in cv
    assert "work_exp_flt" not in cv


def test_work_older_entry_without_end_time_skipped():
    cv = _enrich(work=[
        {"corporation_name": "new corp", "start_time": "2015-01",
         "end_time": "2018-01"},
        {"corporation_name": "old corp", "start_time": "2010-01"},
    ])
    assert cv["job_num_int"] == 1           # older entry dropped


def test_work_future_end_without_updated_at_skipped():
    cv = _enrich(work=[{"corporation_name": "acme",
                        "start_time": "2015-01",
                        "end_time": "2030-01"}])
    # end year > 2022 falls back to updated_at, which is absent
    assert cv["job_num_int"] == 0
    assert cv["latest_job_dt"] == "2015-01-01"


def test_work_invalid_calendar_day_duration_skipped():
    cv = _enrich(work=[{"corporation_name": "acme",
                        "start_time": "2015-01-10",
                        "end_time": "2016-02-31"}])
    # getYMD accepts day 31 in February; strptime then rejects it
    assert cv["job_num_int"] == 0
    assert cv["latest_job_dt"] == "2015-01-10"


def test_work_epoch_start_time_feeds_work_exp():
    # 1262304000 = 2010-01-01 UTC
    cv = _enrich(work=[{"corporation_name": "acme",
                        "start_time": "1262304000000",
                        "end_time": "2012-01"}])
    assert cv["work_exp_flt"] == TODAY.year - 2010


def test_work_subordinates_fullwidth_digit_quirk():
    # the reference filter keeps only all-non-ASCII-digit strings and
    # then int()s them — so only Unicode digits ever survive
    cv = _enrich(work=[{"corporation_name": "acme",
                        "start_time": "2015-01", "end_time": "2016-01",
                        "subordinates_count": "５"}])
    assert cv["max_sub_cnt_int"] == 5
    cv = _enrich(work=[{"corporation_name": "acme",
                        "start_time": "2015-01", "end_time": "2016-01",
                        "subordinates_count": "12"}])
    assert "max_sub_cnt_int" not in cv


def test_for_work_int_corporation_id_coerced():
    cv = for_work({"integerity_flt": 1.0, "corporation_id": 42,
                   "work_obj": ["garbage"]}, TODAY)
    assert cv["corporation_id"] == ["42"]


def test_for_work_missing_corporation_id_becomes_empty_list():
    cv = for_work({"integerity_flt": 1.0, "work_obj": ["garbage"]},
                  TODAY)
    assert cv["corporation_id"] == []


# ---- forBirth ------------------------------------------------------


def test_birth_without_year_returns_unchanged():
    cv = for_birth({"integerity_flt": 1.0, "birth": "unknown-date"},
                   TODAY)
    assert "birth_dt" not in cv and "age_int" not in cv


# ---- parse ---------------------------------------------------------


def test_parse_wall_clock_default_smoke():
    cv = enrich("{}", "7", "2021-01-01 00:00:00")     # today=None path
    assert cv["id"] == "7"


def test_parse_backslash_n_values_dropped():
    # gender would be M/F-folded in step_one; city passes through, so
    # the \N sentinel reaches parse's fold-to-empty loop
    cv = _enrich(basic={"city": "\\N"})
    assert "city_kwd" not in cv


def test_parse_corporation_type_emptied_is_deleted():
    cv = _enrich(basic={"corporation_type": "公司"})
    assert "corporation_type_kwd" not in cv


def test_parse_political_status_folds_and_deletes():
    cv = _enrich(basic={"political_status": "中共党员"})
    assert cv["political_status_kwd"] == ["党员"]
    cv = _enrich(basic={"political_status": "不适用"})
    assert "political_status_kwd" not in cv


def test_parse_obj_json_failure_becomes_empty():
    cv = parse({"project_obj": "not json{", "tob_resume_id": "9"},
               today=TODAY)
    assert "project_kwd" not in cv
    assert cv["id"] == "9"


def test_parse_position_name_small_tokens():
    cv = _enrich(basic={"position_name": "Senior Engineer"})
    assert cv["position_name_tks"]
    assert cv["position_name_sm_tks"]


def test_parse_num_field_int_keeps_string_type():
    # the reference copies the value verbatim into *_int (no cast)
    cv = _enrich(basic={"annual_salary": "30"})
    assert cv["annual_salary_int"] == "30"


def test_parse_datetime_updated_at_formatted():
    cv = parse({"updated_at": datetime.datetime(2021, 6, 1, 12, 30, 5),
                "tob_resume_id": "3"}, today=TODAY)
    assert cv["updated_at_dt"] == "2021-06-01 12:30:05"


def test_parse_top_level_responsibilities_tokenized():
    cv = _enrich(basic={"responsibilities": "<b>ship</b> code"})
    assert "ship" in cv["responsibilities_ltks"]
    assert "<b>" not in cv["responsibilities_ltks"]


def test_parse_work_start_time_digit_prefix_junk_degrades():
    # matches the 9-digit probe, survives turnTm2Dt (10-digit slice),
    # then int() on the full string raises -> except arm keeps the
    # already-assigned work_start_dt and drops work_exp_flt
    cv = _enrich(basic={"work_start_time": "1234567890abc"})
    assert cv["work_start_dt"] == "2009-02-13 23:31:30"
    assert "work_exp_flt" not in cv


def test_parse_fullwidth_name_cleanup_keeps_surname():
    cv = _enrich(contact={"name": "张三（应聘）"})
    assert cv["name_kwd"] == "张三"
