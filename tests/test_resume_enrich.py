"""Resume enrichment (step_one refactor + step_two parse) behaviors.

Each test pins a reference rule from deepdoc/parser/resume/step_one.py
/ step_two.py / entities/ against crafted parse-service dicts, with the
clock pinned (the determinism adaptation documented in resume_enrich).
"""

import datetime
import json

import pytest

from ragflow_spark.extractlib.resume_enrich import (enrich, for_edu,
                                                    get_ymd,
                                                    highest_degree,
                                                    json_loads_lax,
                                                    parse,
                                                    step_one_refactor)
from ragflow_spark.extractlib.resume_entities import (corp_is_good,
                                                      corp_norm,
                                                      corp_tag_of,
                                                      degree_name,
                                                      get_pinyins,
                                                      school_select,
                                                      surname_isit)

TODAY = datetime.date(2025, 6, 1)

BACHELOR = "本科"
ASSOCIATE = "专科"
TOPUP = "专升本"
MASTER = "硕士"
DOCTOR = "博士"
SENIOR_HIGH = "高中"

TOP_BAND = "顶尖学校"
ELITE_BAND = "精英学校"
QUALITY_BAND = "优质学校"
ORDINARY_BAND = "一般学校"

GOOD_SCH_TAG = "好学校"
GOOD_EDU_TAG = "好学历"
GOOD_CORP_TAG = "好公司"
GOOD_CORP_PAST_TAG = "好公司(曾)"
TIER1_TAG = "综合好公司"


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


# ---- small helpers ------------------------------------------------


def test_get_ymd_fallbacks():
    assert get_ymd("2008-09-15") == (2008, "09", "15")
    # year-month only: the day regex backtracks INTO the month digits
    # (reference quirk, step_two.py:427-430)
    assert get_ymd("2008-09") == (2008, "09", "9")
    assert get_ymd("2008") == (2008, "1", "01")
    assert get_ymd("") == ("", "", "01")
    # day>31 and month>12 fall back to 1
    assert get_ymd("2008-13-40") == (2008, "1", "1")


def test_highest_degree_order_and_mba_quirk():
    assert highest_degree([BACHELOR, MASTER]) == MASTER
    assert highest_degree([DOCTOR, SENIOR_HIGH]) == DOCTOR
    assert highest_degree("") == ""
    assert highest_degree(BACHELOR) == BACHELOR
    # MBA is absent from the order map -> ranks -1, below senior high
    # (step_two.py:61 m.get(d, -1), quirk)
    assert highest_degree(["MBA", SENIOR_HIGH]) == SENIOR_HIGH


def test_json_loads_lax_quotes_booleans():
    assert json_loads_lax('{"a": True}') == {"a": "True"}
    assert json_loads_lax('{"a": 1}') == {"a": 1}


def test_surname_gate_and_pinyin():
    assert surname_isit("李")          # common single surname
    assert surname_isit("欧阳")    # two-char surname
    assert not surname_isit("x")
    assert get_pinyins("李伟", " ") == ["li wei"]
    assert get_pinyins("李伟", "") == ["liwei"]


# ---- step_one -----------------------------------------------------


def test_step_one_basic_folding():
    row = step_one_refactor(_content(
        basic={"gender": "M", "degree": "1", "marital": "Y",
               "is_house": "N", "corporation_name": "acme",
               "school_name": "tsinghua university"},
        contact={"name": "李伟", "tel": " 13800138000 ",
                 "phone": ""},
    ), "7", "2021-01-02 03:04:05")
    assert row["gender"] == "男"           # M -> male label
    assert row["degree"] == BACHELOR           # id "1" -> name
    assert row["is_marital"] == "是"       # Y -> yes label
    assert row["is_house"] == "否"         # N -> no label
    assert row["phone"] == "13800138000"       # tel fallback
    assert row["tob_resume_id"] == "7"
    assert "tel" not in row                    # dropped from clms
    assert row["education_obj"] == "{}"        # missing obj -> "{}"


def test_step_one_escapes_tabs_newlines():
    row = step_one_refactor(_content(
        basic={"self_remark": "a\tb\nc\rd"}), "1", "2021-01-01")
    assert row["self_remark"] == "a b\\nc\\nd"


def test_step_one_obj_rename():
    row = step_one_refactor(_content(
        education=[{"school_name": "x"}]), "1", "2021-01-01")
    obj = json.loads(row["education_obj"])
    assert obj["0"]["school_name"] == "x"


# ---- entities -----------------------------------------------------


def test_corp_norm_strips_suffixes():
    # tokenize() runs the Porter stem, exactly like the reference's
    # rag_tokenizer inside corpNorm — both sides normalize to "googl"
    assert corp_norm("Google Inc.", False) == "googl"
    assert corp_norm("Microsoft Corp. ", False) == "microsoft"


def test_corp_good_and_tags():
    # forWork probes with the already-normalized name
    # (step_two.py:295-296: n[c] = corpNorm(...) before is_good)
    assert corp_is_good(corp_norm("Google Inc.", False))
    assert not corp_is_good("unknown llc")
    # outsourced placement never qualifies
    assert not corp_is_good("google外派")
    assert corp_tag_of(corp_norm("google", False)) == [TIER1_TAG]
    assert corp_tag_of("nobody") == []


def test_school_select_alias_and_cleanup():
    assert school_select("THU")["name_en"] == "tsinghua university"
    # the college-of suffix folds to the university proper
    nm = "清华大学计算机学院"
    assert school_select(nm)["rank"] == 2
    assert school_select("nowhere college") is None


# ---- forEdu -------------------------------------------------------


def _edu(school, degree, start="2004-09", end="2008-06",
         discipline="computer science"):
    return {"school_name": school, "degree": degree,
            "start_time": start, "end_time": end,
            "discipline_name": discipline}


def test_edu_rank_bands():
    for school, band in [
        ("tsinghua university", TOP_BAND),       # rank 2
        ("fudan university", ELITE_BAND),        # rank 30
        ("soochow university", QUALITY_BAND),    # rank 80 + 211
        ("hebei university", ORDINARY_BAND),     # unranked
    ]:
        cv = _enrich(education=[_edu(school, "1")])
        assert cv["sch_rank_kwd"] == [band], school


def test_edu_first_degree_and_feas():
    cv = _enrich(education=[
        _edu("soochow university", "4", start="2001-09", end="2004-06"),
        _edu("tsinghua university", "2", start="2008-09",
             end="2011-06"),
        _edu("fudan university", "1", start="2004-09", end="2008-06"),
    ])
    # first degree = first associate/bachelor-tier in start order
    assert cv["first_degree_kwd"] == [ASSOCIATE]
    assert cv["first_school_name_kwd"] == ["soochow university"]
    # the bachelor arrives after an associate -> top-up rewrite
    assert TOPUP in cv["degree_kwd"]
    assert BACHELOR not in cv["degree_kwd"]     # rewritten, not kept
    assert cv["highest_degree_kwd"] == MASTER
    assert cv["edu_end_int"] == 2011
    # 211 from soochow; 985/double-first from tsinghua+fudan
    for f in ["211", "985"]:
        assert f in cv["edu_fea_kwd"]
    # first_fea snapshot stops at the first entry's features
    assert "985" not in cv["edu_first_fea_kwd"]


def test_edu_985_implies_bachelor():
    # degree missing + 985 school + no first degree yet -> degree "1"
    cv = _enrich(education=[
        {"school_name": "tsinghua university", "start_time": "2004-09",
         "end_time": "2008-06", "discipline_name": "ee"}])
    assert cv["degree_kwd"] == [BACHELOR]


def test_edu_adult_school_topup():
    nm = "成人自考大学"   # adult self-study
    cv = _enrich(education=[_edu(nm, "1")])
    assert cv["degree_kwd"] == [TOPUP]


def test_edu_good_school_tags():
    cv = _enrich(education=[_edu("tsinghua university", "1")])
    assert GOOD_SCH_TAG in cv["tag_kwd"]
    assert GOOD_EDU_TAG in cv["tag_kwd"]
    cv = _enrich(education=[_edu("hebei university", "1")])
    assert GOOD_SCH_TAG not in cv.get("tag_kwd", [])


def test_edu_work_exp_from_graduation():
    cv = _enrich(education=[_edu("hebei university", "1",
                                 end="2008-06")])
    assert cv["work_exp_flt"] == TODAY.year - 2008


def test_edu_missing_multiplies_integerity():
    full = _enrich(education=[_edu("hebei university", "1")],
                   basic={"gender": "M"})
    bare = _enrich(basic={"gender": "M"})
    assert bare["integerity_flt"] == pytest.approx(
        full["integerity_flt"] * 0.8 * 0.9 * 0.7 / (0.9 * 0.7))


# ---- forWork ------------------------------------------------------


def _work(corp, start, end, position="engineer", scale=None):
    w = {"corporation_name": corp, "start_time": start,
         "end_time": end, "position_name": position,
         "responsibilities": "build things"}
    if scale:
        w["scale"] = scale
    return w


def test_work_good_corp_current_vs_past():
    cv = _enrich(work=[
        _work("Google Inc.", "2015-03", "2020-01"),
        _work("tiny shop", "2010-01", "2015-02"),
    ])
    assert GOOD_CORP_TAG in cv["tag_kwd"]
    assert GOOD_CORP_PAST_TAG not in cv["tag_kwd"]
    cv = _enrich(work=[
        _work("tiny shop", "2015-03", "2020-01"),
        _work("Google Inc.", "2010-01", "2015-02"),
    ])
    assert GOOD_CORP_TAG not in cv["tag_kwd"]
    assert GOOD_CORP_PAST_TAG in cv["tag_kwd"]
    # past corp tags get the (past) suffix
    assert TIER1_TAG + "(曾)" in cv["tag_kwd"]


def test_work_durations_and_latest_job_quirk():
    cv = _enrich(work=[
        _work("a co", "2018-01-01", "2020-01-01"),
        _work("b co", "2010-01-01", "2015-01-01", scale="500-999"),
    ])
    assert cv["job_num_int"] == 2
    assert cv["cur_dua_int"] == 730          # 2018-01-01 -> 2020-01-01
    assert cv["scale_flt"] == 500
    # latest_job_dt is the LAST iterated (oldest) start, per the
    # reference's loop-carried assignment (step_two.py:313-316)
    assert cv["latest_job_dt"] == "2010-01-01"
    assert cv["work_exp_flt"] == TODAY.year - 2010


def test_work_open_ended_uses_updated_at():
    w = _work("a co", "2018-01-01", "")
    # the fallback closes an open-ended newest job with the WORK
    # ENTRY's own updated_at (step_two.py:320-323)
    w["updated_at"] = "2021-06-01"
    cv = _enrich(work=[w])
    assert cv["cur_dua_int"] == (datetime.date(2021, 6, 1)
                                 - datetime.date(2018, 1, 1)).days


def test_work_corp_proj_sch_deg_composition():
    cv = _enrich(
        education=[_edu("tsinghua university", "2")],
        work=[_work("Google Inc.", "2015-03", "2020-01")])
    assert cv["corp_proj_sch_deg_kwd"] == [
        TIER1_TAG + "+" + TOP_BAND + "+" + MASTER]


# ---- birth / name / phone / misc parse ----------------------------


def test_birth_fields():
    cv = _enrich(basic={"birth": "1986-05-12"})
    assert cv["birth_dt"] == "1986-05-12"
    assert cv["birthday_kwd"] == "0512"
    assert cv["age_int"] == TODAY.year - 1986


def test_name_surname_kept_pinyin_prefixes():
    cv = _enrich(contact={"name": "李伟"})
    assert cv["name_kwd"] == "李伟"
    assert cv["name_pinyin_kwd"] == ["li wei"]
    assert " liw" in cv["name_py_pref_tks"]
    assert " li" in cv["name_py_pref0_tks"]
    assert " liwei" in cv["name_py_pref0_tks"]


def test_name_without_surname_dropped():
    cv = _enrich(contact={"name": "伟伟"})  # no surname char
    assert cv.get("name_kwd", "") == ""


def test_name_latin_needs_two_words():
    cv = _enrich(contact={"name": "John Smith"})
    assert cv["name_kwd"] == "John Smith"
    cv = _enrich(contact={"name": "John"})
    assert cv.get("name_kwd", "") == ""


def test_missing_name_halves_integerity():
    named = _enrich(contact={"name": "John Smith"}, basic={"gender": "M"})
    anon = _enrich(basic={"gender": "M"})
    # name is 1 of the 2 counted fields (2/45 -> 1/45 halves the
    # base) and its absence also halves the score -> exactly 1/4
    assert anon["integerity_flt"] == pytest.approx(
        named["integerity_flt"] / 4.0)


def test_phone_normalization():
    cv = _enrich(contact={"phone": "+86 138-0013-8000"})
    assert cv["phone_kwd"] == ["13800138000"]


def test_corporation_type_folding():
    cv = _enrich(basic={"corporation_type":
                        "外商独资"})
    assert cv["corporation_type_kwd"] == ["外企"]


def test_is_flags_become_tags():
    cv = _enrich(basic={"marital": "Y", "is_house": "N"})
    assert "已婚" in cv["tag_kwd"]      # married
    assert "没房" in cv["tag_kwd"]      # no house


def test_project_obj_kwd_and_tks():
    cv = _enrich(project=[{"name": "Apollo", "describe": "x"},
                          {"name": "Zeus", "describe": "y"}])
    assert cv["project_kwd"] == ["apollo", "zeus"]
    assert "project_tks" in cv
    assert "project_name_tks" in cv


def test_enrich_only_suffixed_keys_survive():
    cv = _enrich(education=[_edu("tsinghua university", "1")],
                 contact={"name": "李伟"},
                 basic={"birth": "1986-05-12"})
    for k in cv:
        assert k == "id" or __import__("re").search(
            r"_(fea|tks|nst|dt|int|flt|ltks|kwd|id)$", k), k
    assert cv["id"] == "42"


def test_parse_work_start_time_epoch_and_datestring():
    # step_two: a 9+-digit work_start_time is epoch-ms (tm2dt + exact
    # year fraction); a YYYY-prefixed string uses get_ymd + year diff
    out = parse({"work_start_time": 1420070400000,
                 "tob_resume_id": "r1"}, today=TODAY)
    assert out["work_start_dt"] == "2015-01-01 00:00:00"
    assert abs(out["work_exp_flt"] - 10.422) < 0.01
    out = parse({"work_start_time": "2018-05-01",
                 "tob_resume_id": "r2"}, today=TODAY)
    assert out["work_start_dt"] == "2018-05-01 00:00:00"
    assert out["work_exp_flt"] == 7
    # month-count fallback when no start time exists
    out = parse({"work_experience": 30, "tob_resume_id": "r3"},
                today=TODAY)
    assert out["work_exp_flt"] == 2.5


def test_parse_kwd_normalization_and_fea_cleanup():
    out = parse({"tob_resume_id": "r4",
                 "city_kwd": ["北京市", "中国", "0", "上海", "北京"]},
                today=TODAY)
    # 市 suffix stripped, 中国/0 dropped, deduped sorted
    assert out["city_kwd"] == ["上海", "北京"]
    out = parse({"tob_resume_id": "r5", "quality_fea": -2}, today=TODAY)
    assert "quality_fea" not in out


def test_turn_tm2dt_forms():
    from ragflow_spark.extractlib.resume_enrich import turn_tm2dt

    assert turn_tm2dt("") == ""
    assert turn_tm2dt("1420070400") == "2015-01-01 00:00:00"
    assert turn_tm2dt("2019-01") == "2019-01"


def test_step_one_malformed_inputs_fold_to_defaults():
    # non-JSON content, non-dict top level, and non-dict contact/basic
    # all degrade to empty fields rather than raising
    for content in ("not json at all", "[1, 2, 3]", '"just a string"'):
        row = step_one_refactor(content, "rid", "2024-01-01")
        assert row["tob_resume_id"] == "rid"
        assert row["education_obj"] == "{}"
        assert row["name"] == ""
    row = step_one_refactor(
        json.dumps({"contact": "oops", "basic": 7}), "rid", "t")
    assert row["phone"] == "" and row["nation"] == ""


def test_step_one_non_dict_obj_key_stringifies_whole_obj():
    # step_one.py:104-115 verbatim: a truthy non-dict obj key makes the
    # else arm stringify the WHOLE parsed object with "None" scrubbed
    obj = {"education": ["x"], "work": None}
    row = step_one_refactor(json.dumps(obj), "rid", "t")
    assert row["education_obj"] == str(obj).replace("None", "")
    # falsy obj keys (None/missing) take the json-dumps-{} arm instead
    assert row["work_obj"] == "{}"


def test_step_one_none_contact_values_become_empty():
    obj = {"contact": {"phone": None, "name": None},
           "basic": {"nation": None}}
    row = step_one_refactor(json.dumps(obj), "rid", "t")
    assert row["phone"] == "" and row["name"] == "" and row["nation"] == ""


def test_entity_lookup_edge_arms():
    from ragflow_spark.extractlib.resume_entities import (corp_norm,
                                                          corp_tag_of,
                                                          degree_id,
                                                          region_get_names,
                                                          region_is_name)
    assert degree_id("") == ""
    assert degree_id("mba") == "6"
    # region id chains walk the parent pointer
    assert region_get_names("33") == ["北京市", "北京"]
    assert region_is_name("河北省")         # suffix-stripped form
    # corp_norm: stop tokens (group) and region tokens drop out
    assert corp_norm("google group beijing", False) == "googl beij"
    # CJK-prefix + latin-tail collapses to the CJK run, and vice versa
    assert corp_norm("字节跳动techteam", False) == "字节跳动"
    assert corp_norm("yahoo日本株式会社", False) == "yahoo"
    # the short-key guard: a 2-char tag key never matches a name
    # twice its length
    assert corp_tag_of("腾讯云计算") == []


def test_school_select_list_and_empty_forms():
    from ragflow_spark.extractlib.resume_entities import school_select
    assert school_select(None) is None
    assert school_select("（）") is None      # cleans to empty
    r = school_select(["tsinghua university", "ignored"])
    assert r and r["name_cn"] == "清华大学"


def test_region_city_suffix_arm():
    import ragflow_spark.extractlib.resume_entities as RE
    old = RE.REGION_NAMES
    RE.REGION_NAMES = old | {"试城市"}
    try:
        # name absent, name+市 present -> the city-suffix arm
        assert RE.region_is_name("试城")
    finally:
        RE.REGION_NAMES = old
