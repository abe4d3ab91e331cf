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
