"""Trie machinery (huqie.py) + Porter stemmer unit coverage."""

import pytest

from ragflow_spark.extractlib.huqie import (
    HuqieTokenizer,
    default_tokenizer,
    fine_grained_tokenize,
    tokenize,
)
from ragflow_spark.extractlib.porter import stem


def test_porter_published_vectors():
    cases = {
        "caresses": "caress", "ponies": "poni", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "hopping": "hop", "falling": "fall",
        "filing": "file", "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit",
        "adjustable": "adjust", "replacement": "replac",
        "adoption": "adopt", "activate": "activ",
        "effective": "effect", "goodness": "good",
        "controll": "control", "roll": "roll",
        "table": "tabl", "value": "valu", "merge": "merg",
        "query": "queri", "customer": "custom",
    }
    for w, expected in cases.items():
        assert stem(w) == expected, w


def test_dict_load_log_fold():
    tk = default_tokenizer()
    # freq round-trips through int(log(f/1e6)+.5) -> exp fold
    assert tk.freq("数据") > 0
    assert tk.freq("不存在词") == 0
    assert tk.tag("数据") == "n"


def test_max_forward_backward_disagree():
    tk = default_tokenizer()
    fw, _ = tk._max_forward("研究生命起源")
    bw, _ = tk._max_backward("研究生命起源")
    assert fw == ["研究生", "命", "起源"]
    assert bw == ["研究", "生命", "起源"]
    # DFS reconciliation resolves to the linguistically right split
    assert tokenize("研究生命起源") == "研究 生命 起源"


def test_trie_segmentation_cases():
    assert tokenize("中华人民共和国数据分析") == "中华人民共和国 数据 分析"
    assert tokenize("数据分析管道") == "数据 分析 管道"
    assert tokenize("自然语言处理模型") == "自然语言 处理 模型"
    # out-of-vocabulary char passes through as a single token
    assert tokenize("数据库与文档提取") == "数据库 与 文档 提取"


def test_english_path_stems():
    assert tokenize("the fast query merged tables") == \
        "the fast queri merg tabl"
    assert tokenize("Document 7") == "document 7"


def test_fine_grained_second_best():
    assert fine_grained_tokenize("中华人民共和国") == "中华 人民 共和国"
    assert fine_grained_tokenize("数据库") == "数据 库"
    # short tokens and numbers pass through
    assert fine_grained_tokenize("数据 12.5") == "数据 12.5"


def test_fine_grained_mostly_english_slash_split():
    assert fine_grained_tokenize("a/b data") == "a b data"


def test_user_dict_seam():
    tk = HuqieTokenizer("深度学习 4000 n\n深度 2500 n\n学习 6000 v\n")
    assert tk.tokenize("深度学习") == "深度学习"
    assert tk.fine_grained_tokenize("深度学习") == "深度 学习"


def test_dfs_prune_bound():
    tk = default_tokenizer()
    out: list = []
    tk.dfs("数据" * 30, 0, [], out)
    assert len(out) <= 2048


def test_q2b_window_is_arithmetic_not_block():
    # the reference keeps any char whose ord - 0xFEE0 lands in
    # [0x20, 0x7E]; that window starts at U+FF00 (unassigned), one
    # below the nominal FF01 block start
    from ragflow_spark.extractlib.ragtok import str_q2b

    assert str_q2b("＀") == " "
    assert str_q2b("！") == "!"
    assert str_q2b("～") == "~"
    assert str_q2b("｟") == "｟"  # one past the window: kept
    assert str_q2b("　") == " "
    assert str_q2b("ＡＢ中１") == "AB中1"


def test_load_dict_skips_malformed_lines():
    tk = HuqieTokenizer("word\nab 100\nok 1000 n\n")
    assert tk.freq("ok") > 0
    assert tk.freq("ab") == 0 and tk.freq("word") == 0


def test_bidirectional_disagreement_resolved_by_dfs():
    # forward [甲乙][丙] vs backward [甲][乙丙]: the reconciliation
    # re-segments the disputed span by DFS score; the two candidates
    # tie on score so list order (exploration order) wins — the
    # backward-style split (rag_tokenizer.py:314-357)
    tk = HuqieTokenizer(
        "甲乙 9000 n\n乙丙 8000 n\n甲 500 n\n丙 400 n\n丁 300 n\n")
    assert tk.tokenize("甲乙丙") == "甲 乙丙"
    # with a trailing agreed token the disagreement resolves mid-loop
    # (the equal-prefix dfs branch) and the tail rides the same-scan
    assert tk.tokenize("甲乙丙丁") == "甲 乙丙 丁"


def test_fine_grained_all_singles_second_best_keeps_whole():
    # second-best segmentation of a 3-char word is all singles: the
    # len(stk) == len(tk) guard keeps the whole token
    tk = HuqieTokenizer("伽倻琴 2000 n\n伽 100 n\n倻 100 n\n琴 100 n\n")
    assert tk.fine_grained_tokenize("伽倻琴 数据") == "伽倻琴 数据"


def test_fine_grained_english_short_part_rejects_split():
    # an [a-z]-pure token whose second-best split contains a <3-char
    # part stays whole (rag_tokenizer.py:389-393)
    tk = HuqieTokenizer("data 5000 n\ndat 1000 n\n中 100 n\n")
    assert tk.fine_grained_tokenize("data 中 中 中") == "data 中 中 中"


def test_dfs_prefix_prune_skips_extendable_single():
    # 1-char prefix extends in the trie but the 2-char prefix does
    # not: the DFS starts at s+2, so the dictionary word "x" is never
    # tried at this position and only the fallback path remains
    tk = HuqieTokenizer("xy 100 n\nx 200 n\n")
    out: list = []
    tk.dfs("xz", 0, [], out)
    assert [[t for t, _ in seg] for seg in out] == [["x", "z"]]


def test_dfs_saturates_at_2048_segmentations():
    tk = HuqieTokenizer("aa 100 n\na 100 n\n")
    out: list = []
    tk.dfs("a" * 24, 0, [], out)
    assert len(out) == 2048


def test_ragtok_lite_surface():
    # the dictionary-independent fallback surface (ragtok.py): per-char
    # CJK, unstemmed lowercase English runs, q2b folding first
    from ragflow_spark.extractlib.ragtok import (fine_grained_tokenize,
                                                 tokenize_lite)
    assert tokenize_lite("Hello 世界 x2") == "hello 世 界 x2"
    assert tokenize_lite("ＡＢＣ１２３") == "abc123"  # full-width folds
    assert tokenize_lite("") == ""
    # >8-char alnum tokens split into 4-char groups; others pass through
    assert fine_grained_tokenize("abcdefghij 世界 short") == \
        "abcd efgh ij 世界 short"


def test_porter_replace_helper_contract():
    # internal helper: None signals "suffix absent", callers rely on it
    from ragflow_spark.extractlib.porter import _replace
    assert _replace("national", "xyz", "r", 0) is None
    # below the measure floor the word comes back unchanged
    assert _replace("ate", "ate", "", 1) == "ate"


def test_porter_ion_rule_requires_st_stem():
    # step-4 'ion' strips only after s/t with measure > 1 — NLTK
    # first-match-stops semantics (motion keeps, adoption strips)
    from ragflow_spark.extractlib.porter import stem
    assert stem("motion") == "motion"
    assert stem("rebellion") == "rebellion"
    assert stem("adoption") == "adopt"
    assert stem("decision") == "decis"


def test_split_by_lang_switch_inside_chunk():
    # ascii alnum runs are pre-split by SPLIT_CHAR, so a mixed chunk
    # needs a non-ascii non-CJK script adjacent to CJK
    tk = HuqieTokenizer("")
    assert tk._split_by_lang("кот中文") == [("кот", False),
                                           ("中文", True)]


def test_reconcile_mismatch_advances_both_cursors():
    # forward [我,甲乙,丙,丁戊,己] vs backward [我,甲,乙丙,丁,戊己]:
    # the joins re-align at 甲乙丙 with differing next tokens, firing
    # the dual-advance arm before the dfs re-segmentation
    tk = HuqieTokenizer(
        "甲乙 100 n\n乙丙 100 n\n丁戊 100 n\n戊己 100 n\n")
    assert tk.tokenize("我甲乙丙丁戊己") == "我 甲乙 丙 丁戊 己"


def test_reconcile_same_run_extension():
    tk = HuqieTokenizer(
        "阿布 100 n\n次德 100 n\n布次德 600 n\n因果 100 n\n")
    assert tk.tokenize("阿布次德因果因果") == "阿布 次德 因果 因果"


def test_fine_grained_long_cjk_token_passes_through():
    tk = HuqieTokenizer("")
    long_cjk = "一二三四五六七八九十上下"      # > 10 chars: dfs skipped
    assert tk.fine_grained_tokenize(long_cjk) == long_cjk


def test_fine_grained_english_token_in_cjk_context_splits():
    # mostly-CJK input routes the english token through the dfs path;
    # all sub-parts >= 3 chars, so the split is kept and joined
    tk = HuqieTokenizer(
        "data 5000 n\nbase 5000 n\ndatabase 9000 n\n中文 100 n\n")
    assert tk.fine_grained_tokenize("中文一 database") == \
        "中文一 data base"


def test_treebank_contraction_splits():
    # nltk word_tokenize parity (rag_tokenizer.py:300): the
    # apostrophe-free MacIntyre contractions split in two, pre-stem
    tk = HuqieTokenizer("")
    assert tk.tokenize("We cannot wait") == "we can not wait"
    assert tk.tokenize("gonna gotta gimme lemme wanna") == \
        "gon na got ta gim me lem me wan na"
    # 'wanna' at end of input: the Treebank pad supplies the trailing
    # whitespace its pattern requires, so it still splits
    assert tk.tokenize("wanna") == "wan na"


def test_treebank_splits_are_whole_token_only():
    # \b anchors exist only at run ends inside a \w+ token: embedded
    # or suffixed forms never split (they only stem afterwards)
    tk = HuqieTokenizer("")
    assert tk.tokenize("wannabe") == "wannab"       # porter e-drop
    assert tk.tokenize("cannots") == "cannot"       # plural-s strip
    assert "got ta" not in tk.tokenize("gottabe")


def test_treebank_split_fires_after_cjk_adjacency():
    # a contraction glued to CJK still forms its own language run and
    # splits; apostrophe forms were already folded by \W+ upstream
    tk = HuqieTokenizer("中文 100 n\n")
    assert tk.tokenize("中文cannot等") == "中文 can not 等"
    assert tk.tokenize("can't") == "can t"          # \W+ ate the quote
