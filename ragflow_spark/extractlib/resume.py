"""Resume template, post-parse assembly (rag/app/resume.py:95-171).

The reference sends the binary to a proprietary parsing service
(remote_call, resume.py:35-73) — that parse is the model seam, exactly
like OCR weights. Everything DOWNSTREAM of the parsed-field dict is
deterministic and ships here verbatim: the field_map labels, the
title join ('-'.joined name/gender/position/age + '-简历'), the
parenthetical-stripping content lines, list flattening (singletons
always; multi-valued only outside the forbidden select fields), and
rmSpace / fine-grained tokenization of ``*_tks`` fields.
"""

from __future__ import annotations

import re

from .huqie import default_tokenizer, tokenize
from .merge import rm_space

FORBIDDEN_SELECT_FIELDS = [
    "name_pinyin_kwd", "edu_first_fea_kwd", "degree_kwd",
    "sch_rank_kwd", "edu_fea_kwd",
]

FIELD_MAP = {
    "name_kwd": "姓名/名字",
    "name_pinyin_kwd": "姓名拼音/名字拼音",
    "gender_kwd": "性别（男，女）",
    "age_int": "年龄/岁/年纪",
    "phone_kwd": "电话/手机/微信",
    "email_tks": "email/e-mail/邮箱",
    "position_name_tks": "职位/职能/岗位/职责",
    "expect_city_names_tks": "期望城市",
    "work_exp_flt": "工作年限/工作年份/N年经验/毕业了多少年",
    "corporation_name_tks": "最近就职(上班)的公司/上一家公司",
    "first_school_name_tks": "第一学历毕业学校",
    "first_degree_kwd": "第一学历（高中，职高，硕士，本科，博士，初中，中技，中专，专科，专升本，MPA，MBA，EMBA）",
    "highest_degree_kwd": "最高学历（高中，职高，硕士，本科，博士，初中，中技，中专，专科，专升本，MPA，MBA，EMBA）",
    "first_major_tks": "第一学历专业",
    "edu_first_fea_kwd": "第一学历标签（211，留学，双一流，985，海外知名，重点大学，中专，专升本，专科，本科，大专）",
    "degree_kwd": "过往学历（高中，职高，硕士，本科，博士，初中，中技，中专，专科，专升本，MPA，MBA，EMBA）",
    "major_tks": "学过的专业/过往专业",
    "school_name_tks": "学校/毕业院校",
    "sch_rank_kwd": "学校标签（顶尖学校，精英学校，优质学校，一般学校）",
    "edu_fea_kwd": "教育标签（211，留学，双一流，985，海外知名，重点大学，中专，专升本，专科，本科，大专）",
    "corp_nm_tks": "就职过的公司/之前的公司/上过班的公司",
    "edu_end_int": "毕业年份",
    "industry_name_tks": "所在行业",
    "birth_dt": "生日/出生年份",
    "expect_position_name_tks": "期望职位/期望职能/期望岗位",
}


def chunk_resume(resume: dict, filename: str) -> dict:
    """Parsed-field dict -> the single output doc (resume.py:128-168).
    """
    tok = default_tokenizer()
    titles = []
    for n in ["name_kwd", "gender_kwd", "position_name_tks", "age_int"]:
        v = resume.get(n, "")
        if isinstance(v, list):
            v = v[0]
        if n.find("tks") > 0:
            v = rm_space(v)
        titles.append(str(v))
    doc = {
        "docnm_kwd": filename,
        "title_tks": tokenize("-".join(titles) + "-简历"),
    }
    doc["title_sm_tks"] = tok.fine_grained_tokenize(doc["title_tks"])
    pairs = []
    for n, m in FIELD_MAP.items():
        if not resume.get(n):
            continue
        v = resume[n]
        if isinstance(v, list):
            v = " ".join(v)
        if n.find("tks") > 0:
            v = rm_space(v)
        pairs.append((m, str(v)))

    doc["content_with_weight"] = "\n".join(
        "{}: {}".format(re.sub(r"（[^（）]+）", "", k), v)
        for k, v in pairs)
    doc["content_ltks"] = tokenize(doc["content_with_weight"])
    doc["content_sm_ltks"] = tok.fine_grained_tokenize(
        doc["content_ltks"])
    for n in FIELD_MAP:
        if n not in resume:
            continue
        if isinstance(resume[n], list) and (
                len(resume[n]) == 1
                or n not in FORBIDDEN_SELECT_FIELDS):
            resume[n] = resume[n][0]
        if n.find("_tks") > 0:
            resume[n] = tok.fine_grained_tokenize(resume[n])
        doc[n] = resume[n]
    return doc
