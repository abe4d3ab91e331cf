"""Markdown / JSON / txt parser unit tests (SURVEY.md §2.3)."""

import json

from ragflow_spark.extractlib.jsonparse import json_sections, split_json
from ragflow_spark.extractlib.mdparse import (extract_tables_and_remainder,
                                              markdown_sections)
from ragflow_spark.extractlib.txtparse import parser_txt, txt_sections

MD = """# Title

Intro line here.

| a | b |
|---|---|
| 1 | 2 |
| 3 | 4 |

## Section two
Body of section two.

<table><tr><td>html cell</td></tr></table>

Tail text.
"""


def test_md_table_extraction():
    remainder, tables = extract_tables_and_remainder(MD)
    assert len(tables) == 2
    assert "| a | b |" in tables[0]
    assert "html cell" in tables[1]
    assert "| 1 | 2 |" not in remainder
    assert "Tail text." in remainder


def test_md_heading_glue():
    sections, tables = markdown_sections(MD.encode())
    texts = [t for t, _ in sections]
    # '# Title' glues the following (empty) line; '## Section two' glues
    # its body line
    assert any(t.startswith("## Section two\nBody of section two.")
               for t in texts)
    assert len(tables) == 2


def test_md_oversize_line_halves():
    long_line = "word " * 600  # ~600 tokens > 3*128
    sections, _ = markdown_sections(long_line.encode())
    halves = [t for t, _ in sections if t]
    assert len(halves) >= 2
    assert "".join(halves[:2]) == long_line.rstrip("\n")


def test_json_split_small_stays_whole():
    data = {"a": 1, "b": {"c": [1, 2, 3]}}
    chunks = split_json(data)
    assert len(chunks) == 1
    assert chunks[0] == {"a": 1, "b": {"c": {"0": 1, "1": 2, "2": 3}}}


def test_json_split_respects_budget():
    data = {f"k{i}": "x" * 120 for i in range(100)}
    chunks = split_json(data, max_chunk_size=200)
    assert len(chunks) > 1
    # every key lands in exactly one chunk
    keys = [k for c in chunks for k in c]
    assert sorted(keys) == sorted(data)
    sections = json_sections(json.dumps(data).encode(), max_chunk_size=200)
    assert all(json.loads(s) for s in sections)


def test_json_hostile_input():
    assert json_sections(b"not json at all") == []
    assert json_sections(b"") == []


def test_txt_delimiter_split_and_merge():
    txt = "alpha beta. gamma!delta?epsilon\nzeta"
    out = parser_txt(txt, chunk_token_num=1, delimiter="\n!?")
    chunks = [c for c, _ in out]
    assert "".join(chunks) == "alpha beta. gamma" + "delta" + "epsilon" + "zeta"


def test_txt_backtick_multichar_delimiter():
    out = parser_txt("a<SEP>b<SEP>c", chunk_token_num=0,
                     delimiter="`<SEP>`")
    assert [c for c, _ in out] == ["a", "b", "c"]


def test_txt_sections_binary_roundtrip():
    out = txt_sections("héllo\nworld".encode("utf-8"))
    assert out and "héllo" in out[0][0]


def test_parser_txt_rejects_non_string():
    import pytest
    with pytest.raises(TypeError, match="txt type should be str"):
        parser_txt(b"bytes not str")


def test_set_nested_builds_intermediate_dicts():
    from ragflow_spark.extractlib.jsonparse import _set_nested
    d = {}
    _set_nested(d, ["a", "b", "c"], 1)
    assert d == {"a": {"b": {"c": 1}}}
