"""Unit tests for the mind-map machinery (extractlib/mindmap.py) vs
transcriptions of /root/reference/graphrag/general/
mind_map_extractor.py and hand-built goldens."""

import re

from ragflow_spark.extractlib import mindmap as M


def test_dictify_outline_shapes():
    md = ("# A\n"
          "## B\n"
          "### C\n"
          "- x\n"
          "  - y\n"
          "## D\n"
          "text line\n")
    assert M.dictify(md) == {"A": {"B": {"C": ["x", ["y"]]},
                                   "D": "text line"}}


def test_dictify_sibling_bullets_and_multitext():
    md = "# H\n- a\n  - b\n  - c\n- d\n"
    assert M.dictify(md) == {"H": ["a", ["b", "c"], "d"]}
    md2 = "# H\nline one\nline two\n"
    assert M.dictify(md2) == {"H": ["line one", "line two"]}


def test_response_strips_code_fences():
    md = "```markdown\n# H\n- a\n  - b\n```\n"
    assert M.response_to_dict(md) == {"H": {"a": "b"}}


def test_list_to_kv_quirks():
    # unpaired items dropped; plain list becomes {}
    assert M.list_to_kv({"k": ["a", ["v"], "solo"]}) == {"k": {"a": "v"}}
    assert M.list_to_kv({"k": ["a", "b"]}) == {"k": {}}
    # a leading sublist (i == 0) never pairs
    assert M.list_to_kv({"k": [["v"], "a"]}) == {"k": {}}


def _ref_merge(self, d1, d2):
    """Transcription of mind_map_extractor.py:128-139."""
    for k in d1:
        if k in d2:
            if isinstance(d1[k], dict) and isinstance(d2[k], dict):
                _ref_merge(self, d1[k], d2[k])
            elif isinstance(d1[k], list) and isinstance(d2[k], list):
                d2[k].extend(d1[k])
            else:
                d2[k] = d1[k]
        else:
            d2[k] = d1[k]
    return d2


def test_merge_matches_reference():
    cases = [
        ({"a": "x"}, {"a": "y"}),                  # scalar: d1 wins
        ({"a": [1, 2]}, {"a": [3]}),               # list: d1 appended
        ({"a": {"b": "1"}}, {"a": {"c": "2"}}),    # dict: union
        ({"new": "n"}, {"old": "o"}),
    ]
    for d1, d2 in cases:
        import copy
        got = M.merge(copy.deepcopy(d1), copy.deepcopy(d2))
        want = _ref_merge(None, copy.deepcopy(d1), copy.deepcopy(d2))
        assert got == want, (d1, d2)
    # merged key order: later dict's own keys first
    got = M.merge({"a": {"p": "1"}}, {"a": {"q": "2"}})
    assert list(got["a"].keys()) == ["q", "p"]


def test_be_children_keyset_suppression_and_stars():
    ks = {"root"}
    out = M.be_children({"**K**": {"dup": "v1"}, "L": {"dup": "v2"}},
                        ks)
    # star-stripped key; the SECOND 'dup' subtree is suppressed
    assert [n["id"] for n in out] == ["K", "L"]
    assert out[0]["children"][0]["id"] == "dup"
    assert out[1]["children"] == []
    # leaf strings are exempt from suppression (list branch only adds)
    out2 = M.be_children({"p": "leaf", "q": "leaf"}, set())
    assert [c["children"][0]["id"] for c in out2] == ["leaf", "leaf"]


def test_assemble_tree_branches():
    # multi-top-key -> root wrap, non-dict top values skipped
    tree = M.assemble_tree([{"A": {"x": "1"}, "B": "str", "C": {}}])
    assert tree["id"] == "root"
    assert [c["id"] for c in tree["children"]] == ["A", "C"]
    # single top key -> short-circuit
    tree2 = M.assemble_tree([{"Top": {"x": "1"}}])
    assert tree2["id"] == "Top"
    assert tree2["children"][0]["id"] == "x"
    # empty input
    assert M.assemble_tree([]) == {"id": "root", "children": []}


def test_batch_sections_budget_fold():
    # 64 -> budget max(51.2, -448); 20-token sections flush at the 3rd
    secs = ["sec " * 20] * 3
    batches = M.batch_sections(secs, 64)
    assert [len(b) // len("sec " * 20) for b in batches] == [2, 1]
    # a single over-budget section still forms a batch (texts empty
    # at the check)
    assert len(M.batch_sections(["sec " * 100], 64)) == 1
    # exact-boundary: cnt + next == budget flushes (>= comparison)
    secs2 = ["ab " * 26, "ab " * 26]     # 26 + 26 >= 51.2
    assert len(M.batch_sections(secs2, 64)) == 2


def test_render_matches_json_dumps():
    import json

    tree = M.assemble_tree([{"T": {"S": {"k": "v"}}}])
    assert M.render_mind_map(tree) == json.dumps(
        tree, ensure_ascii=False, indent=2)
    assert len(M.render_mind_map({"id": "r", "children": []})) < 40


def test_dictify_ordered_lists():
    """Ordered markers (1. / 1)) parse like unordered bullets —
    markdown_to_json flattens CommonMark's ordered lists to the same
    list-of-items shape its renderer gives dashes."""
    md = ("# Plan\n"
          "1. first\n"
          "2. second\n"
          "# Mixed\n"
          "- top\n"
          "  1) sub one\n"
          "  2) sub two\n"
          "* other\n")
    d = M.dictify(md)
    assert d["Plan"] == ["first", "second"]
    assert d["Mixed"] == ["top", ["sub one", "sub two"], "other"]
    # the kv fold pairs the item with its sibling sublist's head
    assert M.todict(M.dictify(md))["Mixed"] == {"top": "sub one"}


def test_dictify_ordered_nested_under_heading_tree():
    md = ("# Root\n"
          "## A\n"
          "1. x\n"
          "   - y\n"
          "## B\n"
          "text line\n")
    d = M.dictify(md)
    assert d["Root"]["A"] == ["x", ["y"]]
    assert d["Root"]["B"] == "text line"


def test_dictify_documented_divergences():
    """The three stated library divergences (module docstring): this
    parser stays total where markdown_to_json raises ContentError, and
    multi-line paragraphs become line lists."""
    # (a) heading with content AND deeper headings: content kept and
    # the deeper heading re-anchors beside it (the library raises
    # ContentError, which the reference does not catch)
    d = M.dictify("# T\nintro\n## S\n- a\n")
    assert d["T"] == "intro" and d["S"] == ["a"]
    # (a') empty-content heading becomes the container
    d2 = M.dictify("# T\n## S\n- a\n")
    assert d2["T"]["S"] == ["a"]
    # (b) multi-line paragraph -> list of lines
    assert M.dictify("# T\nl1\nl2\n")["T"] == ["l1", "l2"]


def test_dictify_hostile_indent_clamped():
    # pathological indentation must not build unbounded nesting
    md = "# H\n" + "\n".join(
        (" " * (i * 4)) + "- x" + str(i) for i in range(300))
    d = M.dictify(md)

    def depth(v, n=0):
        if isinstance(v, list):
            return max([depth(i, n + 1) for i in v] + [n + 1])
        return n
    assert depth(d["H"]) <= 66
    # and the full pipeline survives it
    M.assemble_tree([M.todict(d)])


def test_mind_map_rows_skips_unparseable_doc(spark):
    """A doc whose LLM reply has no headings loses its row, not the
    job (the reference call site's try/except)."""
    from ragflow_spark.operators.mindmaps import (build_mm_sections,
                                                  mind_map_rows,
                                                  stub_mm_response)

    def flaky(did, b, text):
        if did % 5 == 0:
            return "Sorry, here is a summary:\n- point one\n"
        return stub_mm_response(did, b, text)

    rows = mind_map_rows(
        build_mm_sections(spark, "/root/testdata/sf0.001"),
        llm_fn=flaky).collect()
    ids = {r["doc_id"] for r in rows}
    assert ids and all(d % 5 != 0 for d in ids)
    assert any(d % 5 == 1 for d in ids)


def test_dictify_content_column_nesting():
    """Nesting depth follows CommonMark content columns, not a fixed
    2-space grid: '- ' children need 2 columns but '1. ' children
    need 3 (a 2-space 'child' under an ordered item is a SIBLING in
    markdown_to_json, not a nested list)."""
    assert M.dictify("# H\n1. parent\n  - child\n")["H"] == \
        ["parent", "child"]
    assert M.dictify("# H\n1. parent\n   - child\n")["H"] == \
        ["parent", ["child"]]
    # a partially-dedented marker stays at the inner level; a full
    # dedent below the sublist's marker column pops out
    assert M.dictify("# H\n- a\n  - b\n   - c\n- d\n")["H"] == \
        ["a", ["b", "c"], "d"]
    # re-entering an existing sublist after a dedent appends to it
    assert M.dictify("# H\n- a\n  - b\n- c\n  - d\n")["H"] == \
        ["a", ["b"], "c", ["d"]]


def test_dictify_edge_arms():
    from ragflow_spark.extractlib.mindmap import dictify, list_to_kv
    # heading opened with no content closes as an empty dict
    assert dictify("# T\n## open\n") == {"T": {"open": {}}}
    # deep indent then partial dedent re-enters the existing sub-list
    assert dictify("# T\n- a\n        - d1\n    - d2\n") == \
        {"T": ["a", ["d1", "d2"]]}
    # list_to_kv recurses into dict values and skips scalars
    assert list_to_kv({"k": {"inner": ["a", ["b"]]}, "s": "x"}) == \
        {"k": {"inner": {"a": "b"}}, "s": "x"}
