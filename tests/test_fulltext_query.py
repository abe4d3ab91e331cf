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


def test_dealer_resource_dict_branches():
    # term_weight.py:168-221 — branches that need non-empty ne/df
    # tables (the production rag/res resources, injected here)
    from ragflow_spark.extractlib.huqie import HuqieTokenizer
    from ragflow_spark.extractlib.termweight import TermWeightDealer

    tok = HuqieTokenizer("数据 8000 n\n分析 6000 vn\n数码 1000 3\n")
    d = TermWeightDealer(
        ne={"acme": "corp", "paris": "loca", "bob": "firstnm",
            "spam": "toxic", "的": "func"},
        df={"acme": 7, "数据": 11},
        tokenizer=tok)
    # ner multiplier map (term_weight.py:175-177)
    assert d._ner_mult("acme") == 3
    assert d._ner_mult("paris") == 3
    assert d._ner_mult("bob") == 1
    assert d._ner_mult("spam") == 2
    assert d._ner_mult("unknown") == 1
    # df dict hit adds 3 (term_weight.py:212-213)
    assert d._df("acme") == 10
    assert d._df("数据") == 14
    # numeric pos-tag maps to 2 (term_weight.py:187-188)
    assert d._postag_mult("数码") == 2
    # freq/df recursion: an unknown >=4-char term whose fine-grained
    # split yields >1 multi-char part takes min(part)/6 with the 10/3
    # floors (term_weight.py:200-207, 216-221); a slash token splits
    # on the mostly-english fine-grained path
    assert d._freq("ab/cd") == 50.0          # min(300, 300) / 6
    assert d._df("ab/cd") == 50.0
    # a dict-less 4-char CJK term whose split stays whole floors at 10/3
    assert d._freq("烜晫彟龯") == 10
    assert d._df("烜晫彟龯") == 3


def test_token_merge_leading_pair_branch():
    # term_weight.py:122-127: a 1-char lead groups with a multi-char
    # non-latin successor ("多 工位")
    from ragflow_spark.extractlib.termweight import TermWeightDealer

    d = TermWeightDealer()
    assert d.token_merge(["多", "工位", "数据"]) == ["多 工位", "数据"]
    # latin successor does NOT group
    assert d.token_merge(["a", "data", "x"]) == ["a", "data", "x"]


def test_question_chinese_synonym_expansion_and_boost_group():
    from ragflow_spark.extractlib.fulltext_query import question
    from ragflow_spark.extractlib.synonyms import SynonymDealer

    sd = SynonymDealer(dictionary={"数据": "资料"})
    # the synonym wrapper needs a hit on the SPLIT term itself, so the
    # query must contain 数据 as its own term
    query, extra, kws = question("数据 分析", syn=sd)
    # the synonym joins the keywords and the term group gets the
    # (tms)^5 OR (syns)^0.7 wrapper (query.py:186-194)
    assert "资料" in kws
    assert ")^5 OR (" in query
    assert extra == {"minimum_should_match": 0.6}


def test_question_keyword_cap_breaks_at_32():
    from ragflow_spark.extractlib.fulltext_query import question

    terms = ["数据", "分析", "研究", "文档", "提取", "模型", "语言",
             "处理", "规模", "管道", "生命", "起源"] * 4
    _q, _e, kws = question(" ".join(terms))
    assert len(kws) >= 32   # cap breaks the sub-term loop, keywords
    # already appended per split term keep accumulating


def test_question_all_punctuation_returns_none():
    from ragflow_spark.extractlib.fulltext_query import question

    query, extra, kws = question("？？！")
    assert query is None and extra is None and kws == []


def test_paragraph_quotes_multiword_terms():
    from ragflow_spark.extractlib.fulltext_query import paragraph

    q, mm = paragraph(["big data", "数据"], keywords=["seed"])
    assert '"seed"' in q
    assert '"big data"' in q
    assert mm == 0.3  # min(3, (1 seed + 2 boosted) / 10)


def test_need_fine_grained_rejects_short_and_ascii_tech_tokens():
    from ragflow_spark.extractlib.fulltext_query import _need_fine_grained
    assert not _need_fine_grained("ab")            # too short
    assert not _need_fine_grained("c++")           # ascii tech token
    assert not _need_fine_grained("x86_64-v3")
    assert _need_fine_grained("自然语言")


def test_chinese_term_fine_grained_or_expansion():
    # a dict word that fine-grains adds the OR "sub tokens" and the
    # proximity-boosted phrase to its group
    q, _mm, kw = question("自然语言 的 处理")
    assert '自然语言 OR "自然 语言" OR ("自然 语言"~2)^0.5' in q
    assert "自然语言" in kw and "自然" in kw and "语言" in kw


def test_pretoken_masks_surviving_punctuation():
    # tokenize folds \W+ to spaces, but underscore survives and the
    # mask pattern drops it — the only reachable mask case, identical
    # in the reference (term_weight.py:92-110)
    from ragflow_spark.extractlib.termweight import TermWeightDealer
    assert TermWeightDealer().pretoken("好_好") == ["好", "好"]


def test_weight_digit_fastpaths():
    from ragflow_spark.extractlib.termweight import TermWeightDealer
    dl = TermWeightDealer()
    assert dl._ner_mult("12,5") == 2
    assert dl._freq("12 5") == 3
    assert dl._df("12 5") == 5
