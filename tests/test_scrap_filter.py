"""__filterout_scraps + the levelled projection classifier
(pdf_parser.py:868-981): keep/drop decisions, DFS grouping, the
empty-group quirk, and the tag-suffixed display string."""
import math

from ragflow_spark.extractlib.pdfgen import build_pdf_scrap
from ragflow_spark.extractlib.pdfplain import PAGE_H
from ragflow_spark.extractlib.pdfrules import (PAGE_W, filterout_scraps,
                                               mean_heights,
                                               parse_boxes_normalized,
                                               proj_match_level,
                                               remove_tag)


def _box(text, x0=72.0, x1=400.0, top=100.0, h=10.0, pn=1, **kw):
    return dict(text=text, x0=x0, x1=x1, top=top, bottom=top + h,
                page_number=pn, **kw)


def test_proj_match_level_classifier():
    assert proj_match_level("ab") is None          # <=2 chars
    assert proj_match_level("12 (3).5%") is False  # numeric junk
    assert proj_match_level("1. Introduction") == 5
    assert proj_match_level("1.2 Methods") == 6
    assert proj_match_level("1.2.3 Detail") == 6   # pattern 6 wins first
    assert proj_match_level("Scope:") == 9
    assert proj_match_level("plain prose line") is None


def test_wide_bullet_group_kept_junk_dropped():
    boxes = [
        _box("1. First wide bullet line here", x1=400, top=62),
        _box("2. Second wide bullet line too", x1=400, top=76),
        _box("3 / 9", x1=97, top=90),   # narrow numeric folio junk
        _box("- 3 -", x1=97, top=104),
    ]
    mh = mean_heights(boxes, 1)
    out = filterout_scraps(boxes, [PAGE_W], mh, [PAGE_H])
    plain = remove_tag(out)
    assert "1. First wide bullet line here" in plain
    assert "2. Second wide bullet line too" in plain
    assert "3 / 9" not in plain and "- 3 -" not in plain
    # bullets chain unconditionally: both lines land in ONE group
    assert "\n\n" not in plain.strip()
    # every kept line carries the reference tag codec
    assert out.count("@@1\t") == 2 and out.count("##") == 2


def test_empty_group_quirk_for_useless_bullet():
    # bullet-led (mj truthy) but narrow and short -> usefull() False:
    # the reference appends "\n".join([]) == "" for this group
    boxes = [_box("1. x", x1=90.0, h=5.0),
             _box("wide plain line kept on width", x1=400.0, top=200)]
    mh = [10.0]
    out = filterout_scraps(boxes, [PAGE_W], mh, [PAGE_H])
    groups = out.split("\n\n")
    assert groups[0] == ""
    assert remove_tag(groups[1]) == "wide plain line kept on width"


def test_plain_xaligned_lines_group_and_width_keep():
    # no bullets anywhere: chain requires x-alignment within pw/10;
    # keep requires mean width >= 0.35*pw (214.2) or > 200
    boxes = [_box("alpha beta gamma delta epsilon", x1=290, top=62),
             _box("zeta eta theta iota kappa lamb", x1=290, top=76)]
    out = filterout_scraps(boxes, [PAGE_W], mean_heights(boxes, 1),
                           [PAGE_H])
    plain = remove_tag(out)
    assert plain.count("\n") == 1 and "\n\n" not in plain


def test_narrow_plain_lines_all_dropped():
    boxes = [_box("tiny", x1=120, h=5.0),
             _box("bits", x1=120, top=300, h=5.0)]
    out = filterout_scraps(boxes, [PAGE_W], [10.0], [PAGE_H])
    assert out == ""


def test_scrap_corpus_end_to_end_closed_form():
    sections = [("h", "alpha beta gamma"), ("h", "delta epsilon zeta")]
    blob = build_pdf_scrap(sections, did=7)
    boxes = parse_boxes_normalized(blob)
    mh = mean_heights(boxes, 1)
    out = filterout_scraps(boxes, [PAGE_W], mh, [PAGE_H])
    plain = remove_tag(out)
    for i, (_h, body) in enumerate(sections):
        assert f"{i + 1}. {body}" in plain
    assert "/" not in plain and "- 3 -" not in plain


def test_hostile_empty_and_nan_width():
    assert filterout_scraps([], [PAGE_W], [10.0], [PAGE_H]) == ""
    assert math.isnan(float("nan"))  # the drop path relies on nan cmp
