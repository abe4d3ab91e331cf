"""Deterministic token counter invariants."""

from ragflow_spark.extractlib.tokens import num_tokens_from_string, truncate


def test_basic_counts():
    assert num_tokens_from_string("") == 0
    assert num_tokens_from_string("word") == 1          # <=4 letters
    assert num_tokens_from_string("customer") == 2      # ceil(8/4)
    assert num_tokens_from_string("a b c") == 3
    assert num_tokens_from_string("123") == 1
    assert num_tokens_from_string("1234") == 2          # 123 | 4
    assert num_tokens_from_string("文档") == 2           # 1/CJK char
    assert num_tokens_from_string("it's") == 2          # it | 's


def test_matches_sql_formula_for_corpus_words():
    # the DuckDB oracle computes ceil(len/4) per ascii word — parity is
    # what makes the chunk-boundary oracle trustworthy
    import math
    for w in ["key", "agg", "customer", "window", "a", "the", "vector"]:
        assert num_tokens_from_string(w) == math.ceil(len(w) / 4)


def test_truncate():
    s = "customer " * 10  # 2 tokens per word
    out = truncate(s, 6)
    assert num_tokens_from_string(out) <= 6
    assert s.startswith(out)
