"""Resume enrichment: step_one field refactor + step_two feature parse.

Re-expresses the deterministic enrichment the reference runs on the
parse service's output dict before the resume template assembles its
doc (deepdoc/parser/resume/step_one.py:74-189, step_two.py:53-696,
wired at rag/app/resume.py:66-68).  The remote parse itself stays the
model seam (resume.py:35-73); everything downstream ships here:

- step_one ``refactor``: contact/basic field extraction, degree-id ->
  name, region-id -> name chain, industry joins, M/F and Y/N label
  folding, tel fallback, tab/newline escaping.  The reference builds a
  one-row DataFrame, reindexes to ``sorted(clms)`` and zips the values
  against the alphabetical FIELDS list — which is what renames the
  ``education/work/...`` columns to ``*_obj`` (step_one.py:171-189);
  we produce the FIELDS-keyed dict directly.
- step_two ``parse``: integrity scoring, corporation-type/political-
  status normalization, ``*_obj`` explosion, tks/kwd/num field
  derivation, name + surname + pinyin-prefix features, phone
  normalization, education features (school rank bands, 211/985/
  double-first/abroad flags, first-degree capture, the top-up-degree
  rewrites), project and work features (corp normalization, good-corp
  and corp tags, durations, scale), birth/age, and the final
  suffix-filtered key cleanup.

Determinism adaptations (each marked inline):
- ``today``/``now_ts`` are parameters (the reference reads the wall
  clock: step_two.py:195,447,675) so Spark executors and the DuckDB
  oracle agree on derived ages/experience years.
- list-valued ``*_kwd`` outputs are sorted after the reference's
  ``list(set(...))`` dedup — CPython set order is hash-seed dependent
  across executor processes; ES treats these arrays as bags, so order
  was never load-bearing.
- epoch-seconds timestamps fold through UTC, not server-local time
  (step_two.py turnTm2Dt uses time.localtime).
"""

from __future__ import annotations

import datetime
import json
import re

from .huqie import default_tokenizer, tokenize
from .resume_entities import (corp_baike, corp_is_good, corp_norm,
                              corp_tag_of, degree_name, get_pinyins,
                              region_get_names, school_is_good,
                              school_select, surname_isit)

# step_one.py FIELDS, name part only (the DDL types are the reference's
# downstream table schema, unused here)
STEP_ONE_FIELDS = [
    "address", "annual_salary", "annual_salary_from", "annual_salary_to",
    "birth", "card", "certificate_obj", "city", "corporation_id",
    "corporation_name", "corporation_type", "degree", "discipline_name",
    "education_obj", "email", "expect_annual_salary", "expect_city_names",
    "expect_industry_name", "expect_position_name", "expect_salary_from",
    "expect_salary_to", "expect_type", "gender", "industry_name",
    "industry_names", "is_deleted", "is_fertility", "is_house",
    "is_management_experience", "is_marital", "is_oversea",
    "language_obj", "name", "nation", "phone", "political_status",
    "position_name", "project_obj", "responsibilities", "salary_month",
    "scale", "school_name", "self_remark", "skill_obj", "title_name",
    "tob_resume_id", "updated_at", "wechat", "work_obj",
    "work_experience", "work_start_time",
]

_OBJ_KEYS = ["education", "work", "certificate", "project", "language",
             "skill"]
_CONTACT_KEYS = ["wechat", "phone", "is_deleted", "name", "tel", "email"]
_BASIC_KEYS = [
    "nation", "expect_industry_name", "salary_month", "industry_ids",
    "is_house", "birth", "annual_salary_from", "annual_salary_to",
    "card", "expect_salary_to", "expect_salary_from",
    "expect_position_name", "gender", "city", "is_fertility",
    "expect_city_names", "political_status", "title_name",
    "expect_annual_salary", "industry_name", "address", "position_name",
    "school_name", "corporation_id", "is_oversea", "responsibilities",
    "work_start_time", "degree", "management_experience", "expect_type",
    "corporation_type", "scale", "corporation_name", "self_remark",
    "annual_salary", "work_experience", "discipline_name", "marital",
    "updated_at",
]


def _industry_names(industry_ids) -> str:
    """step_one.py:134-136: region-style name chains per id.  The
    reference resolves against industries.py's id table — same chain
    shape as regions, so the mini region table serves both seams."""
    return " ".join(" ".join(region_get_names(i))
                    for i in str(industry_ids).split(","))


def _arr2str(a) -> str:
    if not a:
        return ""
    if isinstance(a, list):
        a = " ".join(str(i) for i in a)
    return str(a).replace(",", " ")


def step_one_refactor(resume_content: str, tob_resume_id: str,
                      updated_at: str) -> dict:
    """step_one.refactor over one row, FIELDS-keyed dict out.

    All values become strings (the reference's final df.map(str) at
    step_one.py:181-188), with tab -> space and newline -> literal
    backslash-n."""
    try:
        obj = json.loads(resume_content)
    except Exception:
        obj = {}
    if not isinstance(obj, dict):
        obj = {}

    row: dict = {"tob_resume_id": tob_resume_id, "updated_at": updated_at}

    contact = obj.get("contact", {})
    if not isinstance(contact, dict):
        contact = {}
    for c in _OBJ_KEYS:
        v = obj.get(c)
        if isinstance(v, dict) or not v:
            row[c] = json.dumps(v if v else {}, ensure_ascii=False)
        else:
            # the reference's else arm stringifies the WHOLE obj
            # (step_one.py:104-115) — the service always sends dicts,
            # so this arm only fires on malformed input; kept verbatim
            row[c] = str(obj).replace("None", "")
    for c in _CONTACT_KEYS:
        v = contact.get(c, "")
        row[c] = "" if v is None else v
    for c in _BASIC_KEYS:
        basic = obj.get("basic", {})
        if not isinstance(basic, dict):
            basic = {}
        v = basic.get(c, "")
        row[c] = "" if v is None else v

    row["degree"] = degree_name(row["degree"]) if row["degree"] else ""
    row["address"] = " ".join(region_get_names(row["address"])) \
        if row["address"] else ""
    row["industry_names"] = _industry_names(row["industry_ids"])
    row["expect_industry_name"] = _arr2str(row["expect_industry_name"])
    row["gender"] = ("男" if row["gender"] == "M"
                     else ("女" if row["gender"] == "F" else ""))
    for c in ["is_fertility", "is_oversea", "is_house",
              "management_experience", "marital"]:
        row[c] = ("是" if row[c] == "Y"
                  else ("否" if row[c] == "N" else ""))
    row["is_management_experience"] = row["management_experience"]
    row["is_marital"] = row["marital"]
    if not str(row["phone"]).strip() and str(row.get("tel", "")).strip():
        row["phone"] = str(row["tel"]).strip()
    for k in ["industry_ids", "management_experience", "marital", "tel"]:
        row.pop(k, None)

    # the reference reindexes to sorted(clms) and zips values against
    # the alphabetical FIELDS list, renaming education->education_obj
    # etc. positionally; emit the FIELDS-keyed dict directly
    out = {}
    for f in STEP_ONE_FIELDS:
        src = f[:-4] if f.endswith("_obj") else f
        v = row.get(src, "")
        out[f] = str(v).replace("\t", " ").replace("\n", "\\n") \
            .replace("\r", "\\n")
    return out


# ---- step_two helpers ---------------------------------------------


def rm_html_tag(line: str) -> str:
    return re.sub(r"<[a-z0-9.\"=';,:\+_/ -]+>", " ", line, 100000,
                  re.IGNORECASE)


def json_loads_lax(line: str):
    """step_two json_loads (demjson3 + the True/False quoting shim):
    bare True/False become strings; strict JSON passes through."""
    try:
        return json.loads(line)
    except Exception:
        pass
    fixed = re.sub(r": *True\b", ': "True"', line)
    fixed = re.sub(r": *False\b", ': "False"', fixed)
    fixed = fixed.replace("'", '"')
    return json.loads(fixed)


def turn_tm2dt(b) -> str:
    """step_two turnTm2Dt; epoch seconds fold through UTC (the
    reference uses server-local time — determinism adaptation)."""
    if not b:
        return ""
    b = str(b).strip()
    if re.match(r"[0-9]{10,}", b):
        b = datetime.datetime.fromtimestamp(
            int(b[:10]), tz=datetime.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")
    return b


def get_ymd(b):
    """step_two getYMD: y is int or '', m/d are strings, with the
    reference's day/month fallbacks."""
    y, m, d = "", "", "01"
    if not b:
        return (y, m, d)
    b = turn_tm2dt(b)
    if re.match(r"[0-9]{4}", b):
        y = int(b[:4])
    r = re.search(r"[0-9]{4}.?([0-9]{1,2})", b)
    if r:
        m = r.group(1)
    r = re.search(r"[0-9]{4}.?[0-9]{,2}.?([0-9]{1,2})", b)
    if r:
        d = r.group(1)
    if not d or int(d) == 0 or int(d) > 31:
        d = "1"
    if not m or int(m) > 12 or int(m) < 1:
        m = "1"
    return (y, m, d)


def highest_degree(dg) -> str:
    if not dg:
        return ""
    if isinstance(dg, str):
        dg = [dg]
    from .resume_entities import DEGREE_ORDER
    return sorted([(d, DEGREE_ORDER.get(d, -1)) for d in dg],
                  key=lambda x: x[1] * -1)[0][0]


def _mean(xs):
    return sum(xs) / float(len(xs))


# ---- step_two feature passes --------------------------------------


def for_edu(cv: dict, today: datetime.date) -> dict:
    """step_two forEdu: school features, rank bands, degree chains."""
    tok = default_tokenizer()
    if not cv.get("education_obj"):
        cv["integerity_flt"] *= 0.8
        return cv

    first_fea, fea = [], []
    maj, fmaj, deg, fdeg, sch, fsch, st_dt, ed_dt = \
        [], [], [], [], [], [], [], []
    edu_nst = []
    edu_end_dt = ""
    cv["school_rank_int"] = 1000000
    for n in sorted(cv["education_obj"],
                    key=lambda x: x.get("start_time", "3")):
        e = {}
        if n.get("end_time"):
            if n["end_time"] > edu_end_dt:
                edu_end_dt = n["end_time"]
            try:
                dt = n["end_time"]
                if re.match(r"[0-9]{9,}", dt):
                    dt = turn_tm2dt(dt)
                y, m, d = get_ymd(dt)
                ed_dt.append(str(y))
                e["end_dt_kwd"] = str(y)
            except Exception:
                pass
        if n.get("start_time"):
            try:
                dt = n["start_time"]
                if re.match(r"[0-9]{9,}", dt):
                    dt = turn_tm2dt(dt)
                y, m, d = get_ymd(dt)
                st_dt.append(str(y))
                e["start_dt_kwd"] = str(y)
            except Exception:
                pass

        r = school_select(n.get("school_name", ""))
        if r:
            # both type values emit 211 (step_two.py:100-103, quirk)
            if str(r.get("type", "")) == "1":
                fea.append("211")
            if str(r.get("type", "")) == "2":
                fea.append("211")
            if str(r.get("is_abroad", "")) == "1":
                fea.append("留学")
            if str(r.get("is_double_first", "")) == "1":
                fea.append("双一流")
            if str(r.get("is_985", "")) == "1":
                fea.append("985")
            if str(r.get("is_world_known", "")) == "1":
                fea.append("海外知名")
            if r.get("rank") and cv["school_rank_int"] > r["rank"]:
                cv["school_rank_int"] = r["rank"]

        if n.get("school_name") and isinstance(n["school_name"], str):
            sch.append(re.sub(
                r"(211|985|重点大学|[,&;；-])", "",
                n["school_name"]))
            e["sch_nm_kwd"] = sch[-1]
        # the reference's bare split()[-1] (step_two.py:120) raises
        # IndexError on an empty school name; degrade to '' so one
        # malformed resume cannot kill a whole task
        fea.append((tok.fine_grained_tokenize(
            tokenize(n.get("school_name", ""))).split() or [""])[-1])

        if n.get("discipline_name") and isinstance(n["discipline_name"],
                                                   str):
            maj.append(n["discipline_name"])
            e["major_kwd"] = n["discipline_name"]

        if not n.get("degree") and "985" in fea and not first_fea:
            n["degree"] = "1"

        if n.get("degree"):
            d = degree_name(n["degree"])
            if d:
                e["degree_kwd"] = d
            if d == "本科" and (
                    "专科" in deg or "专升本" in deg
                    or "中专" in deg or "大专" in deg
                    or re.search(r"(成人|自考|自学考试)",
                                 n.get("school_name", ""))):
                d = "专升本"
            if d:
                deg.append(d)
            if not fdeg and d in ["中专", "专升本",
                                  "专科", "本科", "大专"]:
                fdeg = [d]
                if n.get("school_name"):
                    fsch = [n["school_name"]]
                if n.get("discipline_name"):
                    fmaj = [n["discipline_name"]]
                first_fea = list(fea)

        edu_nst.append(e)

    # rank bands; the reference probes "海外名校" which forEdu never
    # appends (it appends 留学/海外知名) — dead arms kept verbatim
    cv["sch_rank_kwd"] = []
    if cv["school_rank_int"] <= 20 \
            or ("海外名校" in fea and cv["school_rank_int"] <= 200):
        cv["sch_rank_kwd"].append("顶尖学校")
    elif (50 >= cv["school_rank_int"] > 20) \
            or ("海外名校" in fea
                and 500 >= cv["school_rank_int"] > 200):
        cv["sch_rank_kwd"].append("精英学校")
    elif (cv["school_rank_int"] > 50
          and ("985" in fea or "211" in fea)) \
            or ("海外名校" in fea and cv["school_rank_int"] > 500):
        cv["sch_rank_kwd"].append("优质学校")
    else:
        cv["sch_rank_kwd"].append("一般学校")

    if edu_nst:
        cv["edu_nst"] = edu_nst
    if fea:
        cv["edu_fea_kwd"] = sorted(set(fea))      # sorted: determinism
    if first_fea:
        cv["edu_first_fea_kwd"] = sorted(set(first_fea))
    if maj:
        cv["major_kwd"] = maj
    if fsch:
        cv["first_school_name_kwd"] = fsch
    if fdeg:
        cv["first_degree_kwd"] = fdeg
    if fmaj:
        cv["first_major_kwd"] = fmaj
    if st_dt:
        cv["edu_start_kwd"] = st_dt
    if ed_dt:
        cv["edu_end_kwd"] = ed_dt
        cv["edu_end_int"] = max(int(t) for t in ed_dt)
    if deg:
        if "本科" in deg and "专科" in deg:
            deg.append("专升本")
            deg = [d for d in deg if d != "本科"]
        cv["degree_kwd"] = deg
        cv["highest_degree_kwd"] = highest_degree(deg)
    if edu_end_dt:
        try:
            if re.match(r"[0-9]{9,}", edu_end_dt):
                edu_end_dt = turn_tm2dt(edu_end_dt)
            if edu_end_dt.strip("\n") == "至今":
                edu_end_dt = cv.get("updated_at_dt", str(today))
            y, m, d = get_ymd(edu_end_dt)
            cv["work_exp_flt"] = min(today.year - int(y),
                                     cv.get("work_exp_flt", 1000))
        except Exception:
            pass
    if sch:
        cv["school_name_kwd"] = sch
        if (len(cv.get("degree_kwd", [])) >= 1
            and "本科" in cv["degree_kwd"]) \
                or all(c.lower() in ["硕士", "博士", "mba",
                                     "博士后"]
                       for c in cv.get("degree_kwd", [])) \
                or not cv.get("degree_kwd"):
            for c in sch:
                if school_is_good(c):
                    cv.setdefault("tag_kwd", [])
                    cv["tag_kwd"].append("好学校")
                    cv["tag_kwd"].append("好学历")
                    break
        if (len(cv.get("degree_kwd", [])) >= 1
            and "本科" in cv["degree_kwd"]
            and any(d.lower() in ["硕士", "博士", "mba",
                                  "博士"]
                    for d in cv.get("degree_kwd", []))) \
                or all(d.lower() in ["硕士", "博士", "mba",
                                     "博士后"]
                       for d in cv.get("degree_kwd", [])) \
                or any(d in ["mba", "emba", "博士后"]
                       for d in cv.get("degree_kwd", [])):
            cv.setdefault("tag_kwd", [])
            if "好学历" not in cv["tag_kwd"]:
                cv["tag_kwd"].append("好学历")

    if cv.get("major_kwd"):
        cv["major_tks"] = tokenize(" ".join(maj))
    if cv.get("school_name_kwd"):
        cv["school_name_tks"] = tokenize(" ".join(sch))
    if cv.get("first_school_name_kwd"):
        cv["first_school_name_tks"] = tokenize(" ".join(fsch))
    if cv.get("first_major_kwd"):
        cv["first_major_tks"] = tokenize(" ".join(fmaj))
    return cv


def for_proj(cv: dict) -> dict:
    """step_two forProj: newest project names + html-stripped descs."""
    if not cv.get("project_obj"):
        return cv
    pro_nms, desc = [], []
    for n in sorted(cv.get("project_obj", []),
                    key=lambda x: str(x.get("updated_at", ""))
                    if isinstance(x, dict) else "", reverse=True):
        if n.get("name"):
            pro_nms.append(n["name"])
        if n.get("describe"):
            desc.append(str(n["describe"]))
        if n.get("responsibilities"):
            desc.append(str(n["responsibilities"]))
        if n.get("achivement"):
            desc.append(str(n["achivement"]))
    if pro_nms:
        cv["project_name_tks"] = tokenize(pro_nms[0])
    if desc:
        cv["pro_desc_ltks"] = tokenize(rm_html_tag(" ".join(desc)))
        cv["project_desc_ltks"] = tokenize(rm_html_tag(desc[0]))
    return cv


def for_work(cv: dict, today: datetime.date) -> dict:
    """step_two forWork: corp features, durations, tenure features."""
    tok = default_tokenizer()
    if not cv.get("work_obj"):
        cv["integerity_flt"] *= 0.7
        return cv

    flds = ["position_name", "corporation_name", "corporation_id",
            "responsibilities", "industry_name", "subordinates_count"]
    duas, scales = [], []
    fea = {c: [] for c in flds}
    latest_job_tm = ""
    goodcorp = False
    goodcorp_ = False
    work_st_tm = ""
    corp_tags = []
    for i, n in enumerate(sorted(
            cv.get("work_obj", []),
            key=lambda x: str(x.get("start_time", ""))
            if isinstance(x, dict) else "", reverse=True)):
        if isinstance(n, str):
            try:
                n = json_loads_lax(n)
            except Exception:
                continue
        if n.get("start_time") and (not work_st_tm
                                    or n["start_time"] < work_st_tm):
            work_st_tm = n["start_time"]
        for c in flds:
            if not n.get(c) or str(n[c]) == "0":
                fea[c].append("")
                continue
            if c == "corporation_name":
                n[c] = corp_norm(n[c], False)
                if corp_is_good(n[c]):
                    if i == 0:
                        goodcorp = True
                    else:
                        goodcorp_ = True
                ct = corp_tag_of(n[c])
                if i == 0:
                    corp_tags.extend(ct)
                elif ct and ct[0] != "软外":
                    corp_tags.extend([f"{t}(曾)" for t in ct])
            fea[c].append(rm_html_tag(str(n[c]).lower()))

        y, m, d = get_ymd(n.get("start_time"))
        if not y or not m:
            continue
        st = "%s-%02d-%02d" % (y, int(m), int(d))
        latest_job_tm = st          # last valid iteration wins, i.e.
        # the OLDEST job's start date (reference quirk, :313-316)

        y, m, d = get_ymd(n.get("end_time"))
        if (not y or not m) and i > 0:
            continue
        if not y or not m or int(y) > 2022:
            y, m, d = get_ymd(str(n.get("updated_at", "")))
        if not y or not m:
            continue
        ed = "%s-%02d-%02d" % (y, int(m), int(d))
        try:
            duas.append((datetime.datetime.strptime(ed, "%Y-%m-%d")
                         - datetime.datetime.strptime(st, "%Y-%m-%d"))
                        .days)
        except Exception:
            pass

        if n.get("scale"):
            r = re.search(r"^([0-9]+)", str(n["scale"]))
            if r:
                scales.append(int(r.group(1)))

    if goodcorp:
        cv.setdefault("tag_kwd", []).append("好公司")
    if goodcorp_:
        cv.setdefault("tag_kwd", []).append("好公司(曾)")
    if corp_tags:
        cv.setdefault("tag_kwd", []).extend(corp_tags)
        cv["corp_tag_kwd"] = [c for c in corp_tags
                              if re.match(r"(综合|行业)", c)]

    if latest_job_tm:
        cv["latest_job_dt"] = latest_job_tm
    if fea["corporation_id"]:
        cv["corporation_id"] = fea["corporation_id"]

    if fea["position_name"]:
        cv["position_name_tks"] = tokenize(fea["position_name"][0])
        cv["position_name_sm_tks"] = tok.fine_grained_tokenize(
            cv["position_name_tks"])
        cv["pos_nm_tks"] = tokenize(" ".join(fea["position_name"][1:]))
    if fea["industry_name"]:
        cv["industry_name_tks"] = tokenize(fea["industry_name"][0])
        cv["industry_name_sm_tks"] = tok.fine_grained_tokenize(
            cv["industry_name_tks"])
        cv["indu_nm_tks"] = tokenize(" ".join(fea["industry_name"][1:]))
    if fea["corporation_name"]:
        cv["corporation_name_kwd"] = fea["corporation_name"][0]
        cv["corp_nm_kwd"] = fea["corporation_name"]
        cv["corporation_name_tks"] = tokenize(fea["corporation_name"][0])
        cv["corporation_name_sm_tks"] = tok.fine_grained_tokenize(
            cv["corporation_name_tks"])
        cv["corp_nm_tks"] = tokenize(" ".join(fea["corporation_name"][1:]))
    if fea["responsibilities"]:
        cv["responsibilities_ltks"] = tokenize(fea["responsibilities"][0])
        cv["resp_ltks"] = tokenize(" ".join(fea["responsibilities"][1:]))

    # the reference's filter keeps only ALL-non-digit entries and then
    # int()s them — so max_sub_cnt_int is effectively never produced
    # from numeric data (step_two.py:380-384, quirk kept)
    if fea["subordinates_count"]:
        fea["subordinates_count"] = [
            int(i) for i in fea["subordinates_count"]
            if re.match(r"[^0-9]+$", str(i))]
    if fea["subordinates_count"]:
        cv["max_sub_cnt_int"] = max(fea["subordinates_count"])

    if isinstance(cv.get("corporation_id"), int):
        cv["corporation_id"] = [str(cv["corporation_id"])]
    if not cv.get("corporation_id"):
        cv["corporation_id"] = []
    for i in cv.get("corporation_id", []):
        cv["baike_flt"] = max(corp_baike(i),
                              cv.get("baike_flt", 0))

    if work_st_tm:
        try:
            if re.match(r"[0-9]{9,}", work_st_tm):
                work_st_tm = turn_tm2dt(work_st_tm)
            y, m, d = get_ymd(work_st_tm)
            cv["work_exp_flt"] = min(today.year - int(y),
                                     cv.get("work_exp_flt", 1000))
        except Exception:
            pass

    cv["job_num_int"] = 0
    if duas:
        cv["dua_flt"] = _mean(duas)
        cv["cur_dua_int"] = duas[0]
        cv["job_num_int"] = len(duas)
    if scales:
        cv["scale_flt"] = max(scales)
    return cv


def for_birth(cv: dict, today: datetime.date) -> dict:
    """step_two birth: birth_dt, birthday_kwd, age_int."""
    if not cv.get("birth"):
        cv["integerity_flt"] *= 0.9
        return cv
    y, m, d = get_ymd(cv["birth"])
    if not m or not y:
        return cv
    cv["birth_dt"] = "%s-%02d-%02d" % (y, int(m), int(d))
    cv["birthday_kwd"] = "%02d%02d" % (int(m), int(d))
    cv["age_int"] = today.year - int(y)
    return cv


# ---- step_two parse -----------------------------------------------

_TKS_FLD = ["address", "corporation_name", "discipline_name", "email",
            "expect_city_names", "expect_industry_name",
            "expect_position_name", "industry_name", "industry_names",
            "name", "position_name", "school_name", "self_remark",
            "title_name"]
_SMALL_TKS_FLD = ["corporation_name", "expect_position_name",
                  "position_name", "school_name", "title_name"]
_KWD_FLD = ["address", "city", "corporation_type", "degree",
            "discipline_name", "expect_city_names", "email",
            "expect_industry_name", "expect_position_name",
            "expect_type", "gender", "industry_name", "industry_names",
            "political_status", "position_name", "scale", "school_name",
            "phone", "tel"]
_NUM_FLD = ["annual_salary", "annual_salary_from", "annual_salary_to",
            "expect_annual_salary", "expect_salary_from",
            "expect_salary_to", "salary_month"]

_IS_FLD = [
    ("is_fertility", "已育", "未育"),
    ("is_house", "有房", "没房"),
    ("is_management_experience", "有管理经验",
     "无管理经验"),
    ("is_marital", "已婚", "未婚"),
    ("is_oversea", "有海外经验",
     "无海外经验"),
]

_CORP_TYPE_SUBS = [
    (r"(公司|企业|其它|其他|Others*|\n|"
     r"未填写|Enterprises|Company|companies)", ""),
    (r"[／/．·　<\(（]+.*", ""),
    (r".*(合资|民企|股份制|中外|私营|"
     r"个体|Private|创业|Owned|投资).*", "民营"),
    (r".*(机关|事业).*", "机关"),
    (r".*(非盈利|Non-profit).*", "非盈利"),
    (r".*(外企|外商|欧美|foreign|Institution|"
     r"Australia|港资).*", "外企"),
    (r".*国有.*", "国企"),
    (r"[ （）\(\)人/·0-9-]+", ""),
    (r".*(元|规模|于|=|北京|上海|至今|"
     r"中国|工资|州|shanghai|强|餐饮|融资|"
     r"职).*", ""),
]

_POLITICAL_SUBS = [
    (r".*党员.*", "党员"),
    (r".*(无党派|公民).*", "群众"),
    (r".*团员.*", "团员"),
]


def parse(cv: dict, today: datetime.date | None = None) -> dict:
    """step_two.parse over the step_one dict; ``today`` pins every
    wall-clock read (determinism adaptation)."""
    if today is None:
        today = datetime.date.today()
    tok = default_tokenizer()

    for k in list(cv.keys()):
        if cv[k] == "\\N":
            cv[k] = ""

    rmkeys = [k for k in cv
              if cv[k] is None
              or (isinstance(cv[k], (list, str)) and len(cv[k]) == 0)]
    for k in rmkeys:
        del cv[k]

    integerity = 0.0
    flds_num = 0.0

    def has_values(flds):
        nonlocal integerity, flds_num
        flds_num += len(flds)
        for f in flds:
            v = str(cv.get(f, ""))
            if len(v) > 0 and v != "0" and v != "[]":
                integerity += 1

    has_values(_TKS_FLD)
    has_values(_SMALL_TKS_FLD)
    has_values(_KWD_FLD)
    has_values(_NUM_FLD)
    cv["integerity_flt"] = integerity / flds_num

    if cv.get("corporation_type"):
        for p, r in _CORP_TYPE_SUBS:
            cv["corporation_type"] = re.sub(p, r, cv["corporation_type"],
                                            1000, re.IGNORECASE)
        if len(cv["corporation_type"]) < 2:
            del cv["corporation_type"]

    if cv.get("political_status"):
        for p, r in _POLITICAL_SUBS:
            cv["political_status"] = re.sub(p, r, cv["political_status"])
        if not re.search(r"[党团群]", cv["political_status"]):
            del cv["political_status"]

    if cv.get("phone"):
        cv["phone"] = re.sub(r"^0*86([0-9]{11})", r"\1",
                             re.sub(r"[^0-9]+", "", cv["phone"]))

    for k in list(cv.keys()):
        if k.find("_obj") > 0:
            try:
                cv[k] = json_loads_lax(cv[k])
                cv[k] = [a for _, a in cv[k].items()]
                nms = []
                for n in cv[k]:
                    if not isinstance(n, dict) or not n.get("name"):
                        continue
                    n["name"] = re.sub(r"(（442）|\t )", "",
                                       str(n["name"])).strip().lower()
                    if not n["name"]:
                        continue
                    nms.append(n["name"])
                if nms:
                    t = k[:-4]
                    cv[f"{t}_kwd"] = nms
                    cv[f"{t}_tks"] = tokenize(" ".join(nms))
            except Exception:
                cv[k] = []

        if k in _TKS_FLD and k in cv and isinstance(cv[k], str):
            cv[f"{k}_tks"] = tokenize(cv[k])
            if k in _SMALL_TKS_FLD:
                cv[f"{k}_sm_tks"] = tok.fine_grained_tokenize(
                    cv[f"{k}_tks"])
        if k in _KWD_FLD and k in cv and isinstance(cv[k], str):
            cv[f"{k}_kwd"] = [
                n.lower() for n in re.split(
                    r"[\t,，；;. ]",
                    re.sub(r"([^a-zA-Z])[ ]+([^a-zA-Z ])", r"\1，\2",
                           cv[k])) if n]
        if k in _NUM_FLD and cv.get(k):
            cv[f"{k}_int"] = cv[k]

    cv["email_kwd"] = cv.get("email_tks", "").replace(" ", "")

    if cv.get("name") and isinstance(cv["name"], str):
        nm = re.sub(r"[\n——\-\(（\+].*", "", cv["name"].strip())
        nm = re.sub(r"[ \t　]+", " ", nm)
        if re.match(r"[a-zA-Z ]+$", nm):
            if len(nm.split()) > 1:
                cv["name"] = nm
            else:
                nm = ""
        elif nm and (surname_isit(nm[0]) or surname_isit(nm[:2])):
            nm = re.sub(r"[a-zA-Z]+.*", "", nm[:5])
        else:
            nm = ""
        cv["name"] = nm.strip()
        name = cv["name"]

        cv["name_py_tks"] = " ".join(get_pinyins(nm[:20], "")) + " " \
            + " ".join(get_pinyins(nm[:20], " "))
        cv["name_py_pref0_tks"] = ""
        cv["name_py_pref_tks"] = ""
        for py in get_pinyins(nm[:20], ""):
            for i in range(2, len(py) + 1):
                cv["name_py_pref_tks"] += " " + py[:i]
        for py in get_pinyins(nm[:20], " "):
            py = py.split()
            for i in range(1, len(py) + 1):
                cv["name_py_pref0_tks"] += " " + "".join(py[:i])

        cv["name_kwd"] = name
        cv["name_pinyin_kwd"] = get_pinyins(nm[:20], " ")[:3]
        cv["name_tks"] = (
            tokenize(name) + " "
            + (" ".join(list(name))
               if not re.match(r"[a-zA-Z ]+$", name) else "")
        ) if name else ""
    else:
        cv["integerity_flt"] /= 2.0

    if cv.get("phone"):
        r = re.search(r"(1[3456789][0-9]{9})", cv["phone"])
        cv["phone"] = r.group(1) if r else ""

    if cv.get("updated_at") and isinstance(cv["updated_at"],
                                           datetime.datetime):
        cv["updated_at_dt"] = cv["updated_at"].strftime(
            "%Y-%m-%d %H:%M:%S")
    else:
        y, m, d = get_ymd(str(cv.get("updated_at", "")))
        if not y:
            y = "2012"
        if not m:
            m = "01"
        if not d:
            d = "01"
        cv["updated_at_dt"] = "%s-%02d-%02d 00:00:00" % (y, int(m),
                                                         int(d))

    if cv.get("responsibilities"):
        cv["responsibilities_ltks"] = tokenize(
            rm_html_tag(cv["responsibilities"]))

    fea = []
    for f, yy, nn in _IS_FLD:
        if f not in cv:
            continue
        if cv[f] == "是":
            fea.append(yy)
        if cv[f] == "否":
            fea.append(nn)
    if fea:
        cv["tag_kwd"] = fea

    cv = for_edu(cv, today)
    cv = for_proj(cv)
    cv = for_work(cv, today)
    cv = for_birth(cv, today)

    cv["corp_proj_sch_deg_kwd"] = list(cv.get("corp_tag_kwd", []))
    for i in range(len(cv["corp_proj_sch_deg_kwd"])):
        for j in cv.get("sch_rank_kwd", []):
            cv["corp_proj_sch_deg_kwd"][i] += "+" + j
    for i in range(len(cv["corp_proj_sch_deg_kwd"])):
        if cv.get("highest_degree_kwd"):
            cv["corp_proj_sch_deg_kwd"][i] += \
                "+" + cv["highest_degree_kwd"]

    try:
        if not cv.get("work_exp_flt") and cv.get("work_start_time"):
            if re.match(r"[0-9]{9,}", str(cv["work_start_time"])):
                cv["work_start_dt"] = turn_tm2dt(cv["work_start_time"])
                # reference: (time.time() - start_ms/1000)/(3600*24*365);
                # the clock is pinned to UTC midnight of `today`
                now_ts = datetime.datetime.combine(
                    today, datetime.time(),
                    tzinfo=datetime.timezone.utc).timestamp()
                cv["work_exp_flt"] = (
                    now_ts - int(int(cv["work_start_time"]) / 1000)
                ) / 3600.0 / 24.0 / 365.0
            elif re.match(r"[0-9]{4}[^0-9]", str(cv["work_start_time"])):
                y, m, d = get_ymd(str(cv["work_start_time"]))
                cv["work_start_dt"] = "%s-%02d-%02d 00:00:00" % (
                    y, int(m), int(d))
                cv["work_exp_flt"] = today.year - int(y)
    except Exception:
        pass
    if "work_exp_flt" not in cv and cv.get("work_experience", 0):
        cv["work_exp_flt"] = int(cv["work_experience"]) / 12.0

    for k in list(cv.keys()):
        if not re.search(r"_(fea|tks|nst|dt|int|flt|ltks|kwd|id)$", k):
            del cv[k]
    for k in cv.keys():
        if not re.search("_(kwd|id)$", k) or not isinstance(cv[k], list):
            continue
        cv[k] = sorted(set(                      # sorted: determinism
            re.sub(r"(市)$", "", str(n)) for n in cv[k]
            if n not in ["中国", "0"]))
    for k in [k for k in cv.keys() if re.search(r"_feas*$", k)]:
        if cv[k] <= 0:
            del cv[k]

    cv["tob_resume_id"] = str(cv.get("tob_resume_id", ""))
    cv["id"] = cv["tob_resume_id"]
    return cv


def enrich(resume_content: str, tob_resume_id: str, updated_at: str,
           today: datetime.date | None = None) -> dict:
    """The full reference chain at rag/app/resume.py:66-68: service
    dict (JSON string, the parse seam) -> step_one.refactor ->
    step_two.parse."""
    return parse(step_one_refactor(resume_content, tob_resume_id,
                                   updated_at), today=today)
