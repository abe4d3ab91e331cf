"""Graph-extraction parse + mention merges vs verbatim reference logic
(graphrag/general/graph_extractor.py:136-148, extractor.py:63-88,
145-190, graphrag/utils.py:233-296)."""
import html
import re

import pytest

from ragflow_spark.operators.extraction import (
    DEFAULT_ENTITY_TYPES, GRAPH_FIELD_SEP, merge_entity_mentions,
    merge_relation_mentions, parse_extraction_records)


# ---- verbatim reference replicas (pure python, for parity only) ----

def _clean_str(s):
    result = html.unescape(s.strip())
    return re.sub(r"[\"\x00-\x1f\x7f-\x9f]", "", result)


def _split_multi(content, markers):
    results = re.split(
        "|".join(re.escape(m) for m in markers), content)
    return [r.strip() for r in results if r.strip()]


def _is_float(value):
    return bool(re.match(r"^[-+]?[0-9]*\.?[0-9]+$", value))


def _ref_parse(chunk_key, response,
               ent_types=None):
    ent_types = [t.lower() for t in (ent_types or DEFAULT_ENTITY_TYPES)]
    records = _split_multi(response, ["##", "<|COMPLETE|>"])
    rcds = []
    for record in records:
        m = re.search(r"\((.*)\)", record)
        if m is None:
            continue
        rcds.append(m.group(1))
    nodes, edges = [], []
    for record in rcds:
        attrs = _split_multi(record, ["<|>"])
        # handle_single_entity_extraction
        if len(attrs) >= 4 and attrs[0] == '"entity"':
            name = _clean_str(attrs[1].upper())
            if name.strip():
                etype = _clean_str(attrs[2].upper())
                if etype.lower() in ent_types:
                    nodes.append((name.upper(), etype.upper(),
                                  _clean_str(attrs[3]), chunk_key))
                    continue
        # handle_single_relationship_extraction
        if len(attrs) >= 5 and attrs[0] == '"relationship"':
            src = _clean_str(attrs[1].upper())
            tgt = _clean_str(attrs[2].upper())
            pair = sorted([src.upper(), tgt.upper()])
            weight = (float(attrs[-1]) if _is_float(attrs[-1])
                      else 1.0)
            edges.append((pair[0], pair[1], _clean_str(attrs[3]),
                          _clean_str(attrs[4]), weight, chunk_key))
    return nodes, edges


RESPONSES = [
    # plain entity + relationship with explicit float weight
    ('("entity"<|>acme corp<|>organization<|>makes anvils)##'
     '("relationship"<|>acme corp<|>wile e<|>supplies<|>trade<|>2.5)'
     '##<|COMPLETE|>'),
    # type gate: bogus type dropped, html escape in name, quoted name
    ('("entity"<|>a&amp;b<|>geo<|>a place)##'
     '("entity"<|>ghost<|>spirit<|>not a real type)##'
     '("entity"<|>"zeta"<|>person<|>quoted)'),
    # empty name dropped; no-parens record skipped; short relationship
    ('("entity"<|><|>geo<|>nameless)##no parens here##'
     '("relationship"<|>a<|>b<|>too short)'),
    # weight fallbacks: non-float -> 1.0, ".5" and "+3" accepted,
    # "12." rejected by the anchored regex
    ('("relationship"<|>x<|>y<|>d1<|>k<|>heavy)##'
     '("relationship"<|>x<|>z<|>d2<|>k<|>.5)##'
     '("relationship"<|>y<|>z<|>d3<|>k<|>+3)##'
     '("relationship"<|>w<|>z<|>d4<|>k<|>12.)'),
    # endpoint canonical sort: (b, a) -> (A, B)
    ('("relationship"<|>bravo<|>alpha<|>rev<|>k<|>1)'),
]


def _spark_parse(spark, responses):
    df = spark.createDataFrame(
        [(f"ck{i}", i, r) for i, r in enumerate(responses)],
        "chunk_key string, seq long, response string")
    ents, rels = parse_extraction_records(df)
    got_n = [(r["entity_name"], r["entity_type"], r["description"],
              r["source_id"]) for r in ents.collect()]
    got_e = [(r["src_id"], r["tgt_id"], r["description"],
              r["keywords"], r["weight"], r["source_id"])
             for r in rels.collect()]
    return got_n, got_e


def test_parse_matches_reference_on_every_branch(spark):
    want_n, want_e = [], []
    for i, r in enumerate(RESPONSES):
        n, e = _ref_parse(f"ck{i}", r)
        want_n.extend(n)
        want_e.extend(e)
    got_n, got_e = _spark_parse(spark, RESPONSES)
    assert sorted(got_n) == sorted(want_n)
    assert sorted(got_e) == sorted(want_e)


def test_parse_specific_values(spark):
    got_n, got_e = _spark_parse(spark, RESPONSES)
    names = {n[0] for n in got_n}
    assert names == {"ACME CORP", "A&B", "ZETA"}
    weights = {(e[0], e[1]): e[4] for e in got_e}
    assert weights[("X", "Y")] == 1.0          # 'heavy' not a float
    assert weights[("X", "Z")] == 0.5
    assert weights[("Y", "Z")] == 3.0
    assert weights[("W", "Z")] == 1.0          # '12.' fails the regex
    assert ("ALPHA", "BRAVO") in weights       # canonical sort


def test_merge_entity_mentions_vote_and_sorted_set_desc(spark):
    rows = [
        ("E", "GEO", "zz desc", "c1", 0, 0),
        ("E", "PERSON", "aa desc", "c2", 1, 0),
        ("E", "PERSON", "zz desc", "c1", 2, 0),   # dup desc, dup src
        ("F", "GEO", "f desc", "c3", 0, 1),
    ]
    df = spark.createDataFrame(
        rows, "entity_name string, entity_type string, "
              "description string, source_id string, seq long, "
              "rec_pos int")
    got = {r["entity_name"]: r
           for r in merge_entity_mentions(df).collect()}
    assert got["E"]["entity_type"] == "PERSON"   # 2 votes beat 1
    assert got["E"]["description"] == "aa desc" + GRAPH_FIELD_SEP \
        + "zz desc"                              # sorted set
    assert got["E"]["source_id"] == ["c1", "c2"]
    assert got["E"]["n_mentions"] == 3
    assert got["F"]["entity_type"] == "GEO"


def test_merge_entity_type_tie_keeps_first_seen(spark):
    # reference: Counter + stable sort -> insertion (first-seen) order
    rows = [
        ("E", "GEO", "d1", "c", 5, 0),
        ("E", "PERSON", "d2", "c", 1, 0),   # PERSON seen first (seq 1)
        ("E", "GEO", "d3", "c", 7, 0),
        ("E", "PERSON", "d4", "c", 9, 0),
    ]
    df = spark.createDataFrame(
        rows, "entity_name string, entity_type string, "
              "description string, source_id string, seq long, "
              "rec_pos int")
    got = merge_entity_mentions(df).collect()[0]
    assert got["entity_type"] == "PERSON"


def test_merge_relation_mentions(spark):
    rows = [
        ("A", "B", "d2", "k1", 2.5, "c1", 0, 0),
        ("A", "B", "d1", "k2", 0.5, "c2", 1, 0),
        ("A", "B", "d1", "k1", 1.0, "c1", 2, 0),
    ]
    df = spark.createDataFrame(
        rows, "src_id string, tgt_id string, description string, "
              "keywords string, weight double, source_id string, "
              "seq long, rec_pos int")
    got = merge_relation_mentions(df).collect()[0]
    assert got["weight"] == pytest.approx(4.0)
    assert got["description"] == "d1" + GRAPH_FIELD_SEP + "d2"
    assert got["keywords"] == ["k1", "k2"]
    assert got["source_id"] == ["c1", "c2"]
    assert got["n_mentions"] == 3


def _glean_run(spark, row, max_gleanings):
    from ragflow_spark.operators.extraction import light_glean_fold
    df = spark.createDataFrame(
        [row], "chunk_key string, seq long, hint_prompt string, "
               "initial string, gleans array<string>, "
               "ifloops array<string>, continue_prompt string, "
               "ifloop_prompt string")
    return light_glean_fold(df, max_gleanings=max_gleanings) \
        .collect()[0]


def test_light_glean_delimiter_collision(spark):
    """A record delimiter split across the glean boundary: the fold's
    separator-free concatenation (graph_extractor.py:103) must fuse
    '#' + '#' into one '##' so the downstream split sees TWO records,
    and a tuple delimiter split as '<|' + '>' must fuse too."""
    from ragflow_spark.operators.extraction import \
        parse_extraction_records

    r = _glean_run(
        spark,
        ("c1", 0, "", '("entity"<|>a<|>geo<|>d1)#',
         ['#("entity"<|', '>b<|>geo<|>d2)##<|COMPLETE|>'],
         ["yes", "yes"], "", ""),
        max_gleanings=2)
    assert r["n_gleans"] == 2
    assert r["final_result"].count("##") == 2
    df = spark.createDataFrame(
        [(r["chunk_key"], 0, r["final_result"])],
        "chunk_key string, seq long, response string")
    ents, _ = parse_extraction_records(df)
    assert sorted(e["entity_name"] for e in ents.collect()) == \
        ["A", "B"]


def test_light_glean_stop_normalization(spark):
    """The light continuation rule strips whitespace, double quotes,
    then single quotes before lowercasing (graph_extractor.py:108);
    the general extractor's raw == 'YES' comparison must NOT be
    applied."""
    cases = [
        ('"YES"', 3), ("' Yes garbage", 1), (" yes ", 3),
        ("'YES'", 3), ('"no"', 1), ("YES.", 1),
        # '" yes"' strips quotes to ' yes' -> the inner space
        # survives the strip order and kills the match
        ('" yes"', 1),
    ]
    for ifl, want in cases:
        r = _glean_run(
            spark,
            ("c", 0, "", "x", ["a", "b", "c"], [ifl, "yes", "yes"],
             "", ""),
            max_gleanings=3)
        assert r["n_gleans"] == want, ifl


def test_light_glean_last_round_skips_consult(spark):
    """now_glean_index == max_gleanings-1 breaks BEFORE the
    continuation consult (graph_extractor.py:101-102): a 'no' at the
    final slot must not matter, and its tokens must not be counted."""
    r1 = _glean_run(spark, ("c", 0, "word ", "word ",
                            ["word ", "word "], ["yes", "no"],
                            "word ", "word "), max_gleanings=2)
    r2 = _glean_run(spark, ("c", 0, "word ", "word ",
                            ["word ", "word "], ["yes", "yes"],
                            "word ", "word "), max_gleanings=2)
    assert r1["n_gleans"] == r2["n_gleans"] == 2
    assert r1["token_count"] == r2["token_count"]
