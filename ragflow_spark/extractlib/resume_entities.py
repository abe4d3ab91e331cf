"""Vendored mini resource tables for the resume enrichment layer.

The reference enrichment (deepdoc/parser/resume/entities/) loads
production lookup tables — a 5,7k-row schools.csv with rank bands, a
31k-row corp-baike popularity table, good-school/good-corp/corp-tag
JSON lists, the full Hundred Family Surnames, a pinyin package — that
are downloaded resources, exactly like the huqie production dictionary
(SURVEY.md 7.1e).  This module vendors SMALL deterministic stand-ins
with the identical schema and lookup SEMANTICS (entities/schools.py,
corporations.py, regions.py, degrees.py, rag/nlp/surname.py); swapping
in the production tables is a data drop, not a code change.

Everything is written with ``\\u`` escapes so the module is pure ASCII.
The degree ID map is shipped verbatim — it is the wire contract between
the parse service and step_one (entities/degrees.py:17-33), same
category as FIELD_MAP in resume.py.
"""

from __future__ import annotations

import re

# -- degrees (entities/degrees.py) ----------------------------------

# id -> display name; the ids are the parse service's wire contract
DEGREE_TBL = {
    "94": "EMBA",
    "6": "MBA",
    "95": "MPA",
    "92": "专升本",   # top-up bachelor
    "4": "专科",          # associate
    "90": "中专",         # technical secondary
    "91": "中技",         # skilled worker
    "86": "初中",         # junior high
    "3": "博士",          # doctorate
    "10": "博士后",   # postdoc
    "1": "本科",          # bachelor
    "2": "硕士",          # master
    "87": "职高",         # vocational high
    "89": "高中",         # senior high
}
_DEGREE_ID = {v: k for k, v in DEGREE_TBL.items()}


def degree_name(degree_id) -> str:
    """entities/degrees.py get_name: unknown ids -> ''."""
    return DEGREE_TBL.get(str(degree_id), "")


def degree_id(name: str) -> str:
    if not name:
        return ""
    return _DEGREE_ID.get(name.upper().strip(), "")


# ordering used by highest_degree (step_two.py:57-62); ids absent from
# the map (MBA/EMBA/MPA/postdoc...) rank -1, below junior high — a
# reference quirk kept as-is
DEGREE_ORDER = {
    "初中": 0,           # junior high
    "高中": 1,           # senior high
    "中专": 2,           # technical secondary
    "大专": 3,           # college (da zhuan)
    "专升本": 4,     # top-up bachelor
    "本科": 5,           # bachelor
    "硕士": 6,           # master
    "博士": 7,           # doctorate
    "博士后": 8,     # postdoc
}

# -- schools (entities/schools.py) ----------------------------------

# schema mirrors res/schools.csv; ranks seeded from the public QS-style
# ordering the reference's school.rank.csv encodes.  type "1" and "2"
# BOTH emit the 211 feature (step_two.py:100-103 appends "211" for
# either value — quirk kept).
SCHOOLS = [
    {"name_cn": "清华大学", "name_en": "tsinghua university",
     "alias": "thu+qinghua", "type": "2", "is_985": "1",
     "is_double_first": "1", "is_abroad": "0", "is_world_known": "0",
     "rank": 2},
    {"name_cn": "北京大学", "name_en": "peking university",
     "alias": "pku", "type": "2", "is_985": "1", "is_double_first": "1",
     "is_abroad": "0", "is_world_known": "0", "rank": 1},
    {"name_cn": "复旦大学", "name_en": "fudan university",
     "alias": "fdu", "type": "2", "is_985": "1", "is_double_first": "1",
     "is_abroad": "0", "is_world_known": "0", "rank": 30},
    {"name_cn": "苏州大学", "name_en": "soochow university",
     "alias": "suda", "type": "1", "is_985": "0", "is_double_first": "0",
     "is_abroad": "0", "is_world_known": "0", "rank": 80},
    {"name_cn": "", "name_en": "massachusetts institute of technology",
     "alias": "mit", "type": "0", "is_985": "0", "is_double_first": "0",
     "is_abroad": "1", "is_world_known": "1", "rank": 10},
    {"name_cn": "", "name_en": "stanford university",
     "alias": "stanford", "type": "0", "is_985": "0",
     "is_double_first": "0", "is_abroad": "1", "is_world_known": "1",
     "rank": 15},
    {"name_cn": "河北大学", "name_en": "hebei university",
     "alias": "", "type": "0", "is_985": "0", "is_double_first": "0",
     "is_abroad": "0", "is_world_known": "0", "rank": 1000000},
]

# good_sch.json entries, pre-cleaned the way is_good cleans its probe
GOOD_SCH = {
    "清华大学",
    "北京大学",
    "复旦大学",
    "massachusettsinstituteoftechnology",
    "stanforduniversity",
    "tsinghuauniversity",
    "pekinguniversity",
    "fudanuniversity",
    "mit",
}


def _school_split(txt: str) -> list:
    """entities/schools.py split: glue runs of latin tokens."""
    tks = []
    for t in re.sub(r"[ \t]+", " ", txt).split():
        if tks and re.match(r".*[a-zA-Z]$", tks[-1]) and re.match(r"[a-zA-Z]", t):
            tks[-1] = tks[-1] + " " + t
        else:
            tks.append(t)
    return tks


def school_select(nm):
    """entities/schools.py select: normalize then exact-match
    name_cn / name_en / '+'-separated alias."""
    if not nm:
        return None
    if isinstance(nm, list):
        nm = str(nm[0])
    nm = _school_split(nm)[0]
    nm = str(nm).lower().strip()
    nm = re.sub(r"[(（][^()（）]+[)）]", "", nm)
    nm = re.sub(r"(^the |[,.&（）();；·]+"
                r"|^(英国|美国|瑞士))", "", nm)
    nm = re.sub(r"大学.*学院", "大学", nm)
    if not nm:
        # the reference's pandas match would hit rows with an empty
        # alias cell here (a csv artifact, not intent) — return no-hit
        return None
    for row in SCHOOLS:
        if (row["name_cn"] == nm or row["name_en"] == nm
                or nm in set(row["alias"].split("+"))):
            return dict(row)
    return None


def school_is_good(nm: str) -> bool:
    nm = re.sub(r"[(（][^()（）]+[)）]", "", nm.lower())
    nm = re.sub(r"['‘’“”`,. &（）();；]+",
                "", nm)
    return nm in GOOD_SCH


# -- regions (entities/regions.py) ----------------------------------

# id -> (name, parent_id); root parent "1" is absent, terminating the
# get_names recursion exactly like the reference table
REGION_TBL = {
    "2": ("北京", "1"),          # beijing
    "3": ("天津", "1"),          # tianjin
    "10": ("上海", "1"),         # shanghai
    "20": ("广东", "1"),         # guangdong
    "33": ("北京市", "2"),   # beijing city
    "34": ("天津市", "3"),   # tianjin city
}

_EXTRA_REGION_NAMES = {
    "河北",      # hebei
    "江苏",      # jiangsu
    "浙江",      # zhejiang
    "山东",      # shandong
    "四川",      # sichuan
    "湖北",      # hubei
    "中国",      # china
}
REGION_NAMES = {n for n, _p in REGION_TBL.values()} | _EXTRA_REGION_NAMES


def region_get_names(region_id) -> list:
    """entities/regions.py get_names: name + parent chain."""
    d = REGION_TBL.get(str(region_id))
    if not d:
        return []
    nms = [d[0]]
    nms.extend(region_get_names(d[1]))
    return nms


def region_is_name(nm: str) -> bool:
    """entities/regions.py isName: exact, +city-suffix, -province/
    autonomous-region suffix."""
    if nm in REGION_NAMES:
        return True
    if nm + "市" in REGION_NAMES:
        return True
    if re.sub(r"(省|(回族|壮族|维吾尔)*"
              r"自治区)$", "", nm) in REGION_NAMES:
        return True
    return False


# -- corporations (entities/corporations.py) ------------------------

# corp-token stoplist (corp.tks.freq.json keys): generic tokens
# corpNorm drops from a normalized name
CORP_TKS = {
    "group", "holdings", "holding", "international", "technology",
    "集团",      # group (cn)
}

# baike popularity (corp_baike_len.csv): cid -> article length
BAIKE_LEN = {"101": 2500, "102": 800, "103": 0}

# good_corp.json — normalized at import time like the reference module
_GOOD_CORP_RAW = [
    "google",
    "microsoft",
    "字节跳动",     # bytedance
    "腾讯",                 # tencent
]

# corp_tag.json — keys normalized at import time
_CORP_TAG_RAW = {
    "google": ["综合好公司"],            # first-tier
    "字节跳动": ["综合好公司"],
    "腾讯": ["综合好公司",
                     "行业好公司"],
    "infosys": ["软外"],                             # outsourcing
}


def corp_norm(nm, add_region: bool = True) -> str:
    """corporations.py corpNorm: Q2B fold + noise strip + region/stop
    token removal.  tradi2simp is identity (HanziConv = resource seam,
    same as huqie.py)."""
    from .ragtok import str_q2b

    if not nm or not isinstance(nm, str):
        return ""
    nm = str_q2b(nm).lower()
    nm = re.sub(r"&amp;", "&", nm)
    nm = re.sub(r"[\(\)（）\+'\"\t \*\\【】-]+", " ", nm)
    nm = re.sub(r"([—-]+.*| +co\..*|corp\..*| +inc\..*| +ltd.*)",
                "", nm, 10000, re.IGNORECASE)
    nm = re.sub(r"(计算机|技术|(技术|科"
                r"技|网络)*有限公司|公"
                r"司|有限|研发中心|中"
                r"国|总部)$", "", nm, 10000, re.IGNORECASE)
    if not nm or (len(nm) < 5 and not region_is_name(nm[0:2])):
        return nm

    from .huqie import tokenize

    tks = tokenize(nm).split()
    reg = [t for i, t in enumerate(tks)
           if region_is_name(t) and (t != "中国" or i > 0)]
    nm = ""
    for t in tks:
        if region_is_name(t) or t in CORP_TKS:
            continue
        if re.match(r"[0-9a-zA-Z\\,.]+", t) and re.match(r".*[0-9a-zA-Z\,.]+$", nm):
            nm += " "
        nm += t

    r = re.search(r"^([^a-z0-9 \(\)&]{2,})[a-z ]{4,}$", nm.strip())
    if r:
        nm = r.group(1)
    r = re.search(r"^([a-z ]{3,})[^a-z0-9 \(\)&]{2,}$", nm.strip())
    if r:
        nm = r.group(1)
    return nm.strip() + (("" if not reg else "(%s)" % reg[0])
                         if add_region else "")


def _rm_corp_noise(n: str) -> str:
    n = re.sub(r"[(（][^()（）]+[)）]", "", n)
    n = re.sub(r"[,. &（）()]+", "", n)
    return n


GOOD_CORP = {corp_norm(_rm_corp_noise(c), False) for c in _GOOD_CORP_RAW}
CORP_TAG = {corp_norm(_rm_corp_noise(c), False): v
            for c, v in _CORP_TAG_RAW.items()}


def corp_is_good(nm: str) -> bool:
    """corporations.py is_good: alnum entries exact, others substring;
    outsourced-placement names never qualify."""
    if nm.find("外派") >= 0:
        return False
    nm = corp_norm(_rm_corp_noise(nm), False)
    for n in GOOD_CORP:
        if re.match(r"[0-9a-zA-Z]+$", n):
            if n == nm:
                return True
        elif nm.find(n) >= 0:
            return True
    return False


def corp_tag_of(nm: str) -> list:
    """corporations.py corp_tag: exact for latin keys, substring with
    the short-key/long-name 2x guard for the rest."""
    nm = corp_norm(_rm_corp_noise(nm), False)
    for n in CORP_TAG.keys():
        if re.match(r"[0-9a-zA-Z., ]+$", n):
            if n == nm:
                return CORP_TAG[n]
        elif nm.find(n) >= 0:
            if len(n) < 3 and len(nm) / len(n) >= 2:
                continue
            return CORP_TAG[n]
    return []


def corp_baike(cid, default_v=0):
    return BAIKE_LEN.get(str(cid), default_v)


# -- surnames (rag/nlp/surname.py) ----------------------------------

# leading subset of the Hundred Family Surnames (public-domain list the
# reference vendors in full) + the frequent two-char surnames
SURNAMES = {
    "赵", "钱", "孙", "李", "周", "吴",
    "郑", "王", "冯", "陈", "蒋", "沈",
    "韩", "杨", "朱", "秦", "许", "何",
    "吕", "张", "孔", "曹", "华", "金",
    "魏", "陶", "姜", "谢", "邹", "苏",
    "潘", "范", "彭", "鲁", "韦", "马",
    "苗", "方", "任", "袁", "柳", "司马",
    "上官", "欧阳", "诸葛", "东方",
}


def surname_isit(n: str) -> bool:
    return n.strip() in SURNAMES


# -- pinyin (xpinyin seam) ------------------------------------------

# single-reading romanization for the characters the tests/corpus use;
# xpinyin's polyphone expansion is a resource seam — one reading per
# char means get_pinyins returns exactly one combination
PINYIN = {
    "赵": "zhao", "钱": "qian", "孙": "sun",
    "李": "li", "周": "zhou", "吴": "wu",
    "郑": "zheng", "王": "wang", "陈": "chen",
    "杨": "yang", "张": "zhang", "马": "ma",
    "朱": "zhu", "韩": "han", "冯": "feng",
    "伟": "wei", "敏": "min", "军": "jun",
    "华": "hua", "梅": "mei", "明": "ming",
    "丽": "li", "强": "qiang", "林": "lin",
    "欧": "ou", "阳": "yang",
}


def get_pinyins(nm: str, splitter: str = "") -> list:
    """xpinyin Pinyin.get_pinyins over the mini table: one reading per
    char -> a single combination.  Each CJK char is its own unit;
    maximal non-CJK runs pass through whole (xpinyin keeps them
    as-is)."""
    if not nm:
        return [""]
    units: list = []          # (is_cjk, text) runs
    for ch in nm:
        if "一" <= ch <= "鿿":
            units.append((True, PINYIN.get(ch, ch)))
        elif units and not units[-1][0]:
            units[-1] = (False, units[-1][1] + ch)
        else:
            units.append((False, ch))
    return [splitter.join(t for _cjk, t in units)]
