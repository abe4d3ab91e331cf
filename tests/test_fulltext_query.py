"""FulltextQueryer DSL assembly (rag/nlp/query.py:27-263):
branch selection, boost formats, phrase pairs, caps, fallbacks."""
import re

from ragflow_spark.extractlib.fulltext_query import (QUERY_FIELDS,
                                                     is_chinese,
                                                     paragraph,
                                                     question,
                                                     sub_special_char)


def test_is_chinese_short_english_quirk():
    # <=3 space-split tokens count as "Chinese" (query.py:45-47)
    assert is_chinese("merge data")
    assert not is_chinese("merge the data pipeline fast")
    assert is_chinese("数据 分析 管道 质量 很好")


def test_english_branch_boosts_and_phrases():
    q, extra, kw = question("What is the best way to merge fast queries")
    assert extra is None  # English branch passes no min_match
    # stopwords stripped by rmWWW; stems boosted at %.4f
    assert "(best^0.2000 " in q and "(merg^0.2000" in q
    # synonyms quoted at w/4
    assert '"join"^0.0500' in q
    # adjacent bigram phrases at max(w)*2
    assert '"merg fast"^0.4000' in q and '"fast queri"^0.4000' in q
    # keywords = base tokens + tokenized synonyms
    assert "merg" in kw and "join" in kw


def test_english_single_char_tokens_filtered_but_kept_as_keywords():
    q, _extra, kw = question("a 7 query x plans merge data")
    assert "7" in kw and "x" in kw
    assert "(7^" not in q and "(x^" not in q


def test_english_all_filtered_falls_back_to_raw_text():
    q, extra, kw = question("v w x y z")
    assert q == "v w x y z"
    assert extra is None


def test_chinese_branch_min_match_and_structure():
    q, extra, kw = question("数据分析管道是什么", min_match=0.45)
    assert extra == {"minimum_should_match": 0.45}
    # rmWWW strips the interrogative tail
    assert "是什么" not in q
    # proximity phrase over the huqie tokenization at ^1.5
    assert '~2)^1.5' in q
    # Chinese weights keep full float repr (no %.4f)
    assert re.search(r"\^0\.\d{5,}", q)
    # synonym group at ^0.2
    assert "(资料)^0.2" in q


def test_chinese_keyword_cap():
    txt = "数据分析管道质量评估系统设计实现方法研究报告总结与展望未来工作计划安排"
    _q, _extra, kw = question(txt)
    assert len(kw) < 40  # 32-cap with bounded overshoot


def test_paragraph_string_input_splits_to_chars():
    # the reference iterates the STRING, yielding characters — so the
    # boosted terms are the single CJK chars, not the tokens
    q, _mm = paragraph("数据 分析", keywords=["seed"])
    assert q.startswith('"seed"')
    assert "数^" in q or "(数" in q
    assert "数据^" not in q


def test_paragraph_min_match_formula():
    # min_match = min(3, len(keywords)/10) over the FINAL list
    q, mm = paragraph(["数据", "分析", "管道"], keywords=["a", "b"])
    assert mm == 0.5  # min(3, (2 seeds + 3 boosted terms) / 10)


def test_sub_special_char_escapes():
    assert sub_special_char("a-b*c") == r"a\-b\*c"
    assert sub_special_char(" (x) ") == r"\(x\)"


def test_query_fields_boost_list():
    assert QUERY_FIELDS[0] == "title_tks^10"
    assert "important_kwd^30" in QUERY_FIELDS
