"""QA template primitives (§2.6 qbullets + qa.py txt branch)."""

from ragflow_spark.extractlib.qa import (QUESTION_PATTERN, be_adoc_text,
                                         index_int, qa_pairs_from_txt,
                                         qbullets_category, rm_prefix)


def test_index_int_converters():
    assert index_int("7") == 7
    assert index_int("THREE".lower()) == 3 and index_int("THREE") == 3
    assert index_int("十二") == 12
    assert index_int("二百零一") == 201
    assert index_int("IX") == 9
    assert index_int("VII") == 7
    assert index_int("junk!") == -1


def test_qbullets_first_pattern_wins():
    # both pattern 5 ('1. ') and pattern 10 (QUESTION n) match some
    # section; hits saturate at 1, so the earlier pattern index wins
    idx, patt = qbullets_category(["1. first", "QUESTION 2 second"])
    assert patt == QUESTION_PATTERN[idx]
    assert idx == 5
    idx2, _ = qbullets_category(["QUESTION 2 second"])
    assert idx2 == 10


def test_rm_prefix():
    assert rm_prefix("Question: what?") == "what?"
    assert rm_prefix("问题：为什么") == "为什么"
    assert rm_prefix("plain") == "plain"


def test_be_adoc_text():
    assert be_adoc_text("Q: a?", "A: b", True) == \
        "Question: a?\tAnswer: b"
    assert be_adoc_text("a?", "b", False) == "问题：a?\t回答：b"


def test_qa_pairs_tab_delimited():
    txt = "q1\ta1\nq2\ta2\nq3\ta3"
    assert qa_pairs_from_txt(txt) == [("q1", "a1"), ("q2", "a2"),
                                      ("q3", "a3")]


def test_qa_pairs_answer_continuation():
    txt = "q1\ta1\ncontinued answer\nq2\ta2"
    assert qa_pairs_from_txt(txt) == [("q1", "a1\ncontinued answer"),
                                      ("q2", "a2")]


def test_qa_pairs_comma_vote():
    txt = "q1,a1\nq2,a2"
    assert qa_pairs_from_txt(txt) == [("q1", "a1"), ("q2", "a2")]


def test_qa_pairs_empty_and_garbage():
    assert qa_pairs_from_txt("") == []
    assert qa_pairs_from_txt("no delimiters here at all") == []


def test_tag_pairs_leading_newline_and_dot_replacement():
    from ragflow_spark.extractlib.qa import tag_pairs_from_txt

    out = tag_pairs_from_txt("alpha\ttagA,v1.2\nbeta\ttagB")
    assert out == [("\nalpha", ["tagA", "v1_2"]), ("\nbeta", ["tagB"])]


def test_tag_pairs_multiline_content():
    from ragflow_spark.extractlib.qa import tag_pairs_from_txt

    out = tag_pairs_from_txt("free line\nalpha\tt1")
    assert out == [("\nfree line\nalpha", ["t1"])]
    assert tag_pairs_from_txt("") == []
