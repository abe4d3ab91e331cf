"""Cross-row concat chain: features, rule decision, DFS block build."""

from ragflow_spark.extractlib.pdfrules import (concat_downward,
                                               rule_concat_decision,
                                               updown_concat_features)


def _line(text, top, *, page=1, x0=72, x1=400, layoutno="text-1",
          layout_type="text", h=10):
    return {"text": text, "x0": x0, "x1": x1, "top": top,
            "bottom": top + h, "page_number": page,
            "layoutno": layoutno, "layout_type": layout_type}


MH = [10.0, 10.0]
MW = [5.0, 5.0]


def test_features_shape_and_signals():
    up = _line("ends with comma,", 0)
    down = _line("continues here", 14)
    fea = updown_concat_features(up, down)
    assert len(fea) == 32
    assert fea[3] is True            # same layout type
    assert fea[8] is False           # no sentence end
    assert fea[9] is False           # ',' is ascii comma, not in the set
    up2 = _line("sentence ends.", 0)
    # [a-z]\.$ triggers the sentence-end feature
    assert updown_concat_features(up2, down)[8] is True


def test_rule_decision():
    up = _line("first part of a", 0)
    down = _line("wrapped sentence", 14)
    assert rule_concat_decision(updown_concat_features(up, down))
    up_end = _line("the end is here.", 0)
    assert not rule_concat_decision(
        updown_concat_features(up_end, down))


def test_concat_downward_joins_same_region_lines():
    boxes = [
        _line("alpha beta ", 0),
        _line("gamma delta", 14),
        _line("1 Heading", 60, layoutno="title-2", layout_type="title",
              h=14),
        _line("epsilon zeta", 90, layoutno="text-3"),
    ]
    out = concat_downward(boxes, MH, MW)
    texts = [b["text"] for b in out]
    # same-layout near lines chain via the layout gate; strip+space-join
    assert "alpha beta gamma delta" in texts[0]
    assert any(t.startswith("1 Heading") for t in texts)
    assert any("epsilon zeta" in t for t in texts)


def test_concat_downward_respects_page_gap():
    boxes = [
        _line("page one text", 700),
        _line("page two far away", 1000, page=2, layoutno="text-9"),
    ]
    out = concat_downward(boxes, MH, MW)
    assert len(out) == 2


def test_concat_downward_space_insertion_rule():
    # alnum edges get a space; punctuation edges do not
    boxes = [
        _line("ends with digit 7", 0),
        _line("8 starts with digit", 14),
    ]
    out = concat_downward(boxes, MH, MW)
    assert out[0]["text"] == "ends with digit 7 8 starts with digit"


def test_concat_between_pages_flag_splits_near_cross_page_pair():
    # near cross-page continuation: joined by default, split when
    # concat_between_pages=False (the break arm before the R gate)
    boxes = [
        _line("runs onto the next", 700),
        _line("page continuation", 712, page=2),
    ]
    joined = concat_downward(boxes, MH, MW)
    assert len(joined) == 1 and "page continuation" in joined[0]["text"]
    split = concat_downward(boxes, MH, MW, concat_between_pages=False)
    assert len(split) == 2


def test_concat_region_mismatch_gate():
    # different R (column region) blocks the join unless the up line
    # ends with a full-width comma
    up = _line("left column text", 0)
    down = _line("right column text", 14)
    up["R"], down["R"] = 1, 2
    assert len(concat_downward([dict(up), dict(down)], MH, MW)) == 2
    up_comma = dict(up, text="left column text，")
    out = concat_downward([up_comma, dict(down)], MH, MW)
    assert len(out) == 1 and "right column text" in out[0]["text"]


def test_concat_page_number_and_blank_candidate_skips():
    # a "12/345"-style page marker never chains, and a whitespace-only
    # candidate is skipped rather than joined
    marker = _line("12/345", 0)
    body = _line("body text", 14)
    assert len(concat_downward([marker, dict(body)], MH, MW)) == 2
    blank = _line("   ", 14)
    out = concat_downward([dict(body, top=0, bottom=10), blank], MH, MW)
    assert len(out) == 2


def test_concat_far_candidate_joins_via_rule_decision():
    # the 6th candidate (i - dp >= 5) bypasses the layoutno fast path
    # and must pass rule_concat_decision to chain
    up = _line("a sentence that wraps", 0)
    decoys = [_line(f"decoy {i}", 2 + i, layoutno="text-9")
              for i in range(5)]
    far = _line("onto a later line", 12)
    out = concat_downward([up] + decoys + [far], MH, MW)
    joined = [b["text"] for b in out
              if "a sentence that wraps" in b["text"]]
    assert joined and "onto a later line" in joined[0]


def test_concat_merge_backfills_layout_type():
    # a custom decide exercises the far-accept arm directly; the block
    # merge backfills layout_type from the first typed chunk
    up = _line("untyped first line", 0)
    del up["layout_type"], up["layoutno"]
    down = _line("typed second line", 14)
    out = concat_downward([up, down], MH, MW, decide=lambda fea: True)
    assert len(out) == 1
    assert out[0]["text"] == "untyped first line typed second line"
    assert out[0]["layout_type"] == "text"
