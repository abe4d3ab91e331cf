"""Derive libxml2's HTML auto-close pair relation by observation.

libxml2's HTML parser (HTMLparser.c) auto-closes open elements when a
new start tag arrives via ``htmlAutoClose``: a while-loop that pops the
TOP of the element stack as long as ``htmlCheckAutoClose(newtag, top)``
holds — a context-free PAIR check against the static ``htmlStartClose``
table.  (Top-of-stack only: ``<ul><li>a<b>x<li>c`` nests the second li
INSIDE ``<b>`` because (li, b) is not in the table, even though (li, li)
is — verified against the shared library.)

lxml.html — and therefore readability-lxml, whose tree shapes our
extraction must reproduce byte-identically — parses with exactly this
recovery.  Rather than transcribing the C table, this tool derives the
relation from the system libxml2 itself: for every ordered pair
(old, new) over the HTML element universe, parse

    <html><body><old>x<new>y</new></old></body></html>

and observe whether ``old`` was closed before ``new`` (sibling) or kept
open (new nested inside old).  The derived table is frozen into
``ragflow_spark/extractlib/dom.py`` (AUTO_CLOSE_PAIRS); a live pytest
differential re-derives it when the shared library is present.

A second relation is derived the same way: libxml2's htmlEndPriority.
A MISPLACED end tag (one that matches an open element deeper in the
stack) closes through intermediate open elements only while their end
priority is <= its own; crossing a higher-priority element makes the
end tag a no-op.  ``--priorities`` re-derives the pairwise
closes-through matrix and checks it against ``dom.py``'s frozen
``_END_PRIORITY`` order (observed: default 100 < div 150 < td = th 160
< tr 161 < thead = tbody = tfoot 162 < table 170 < head = body =
html 180 — the structural cells are probed separately through the
head-level tbody construction, tests/test_dom_structure.py, since
body cannot sit above body-content elements in this harness).

Usage:  python tools/derive_autoclose.py              # print the table
        python tools/derive_autoclose.py --diff       # diff vs dom.py
        python tools/derive_autoclose.py --priorities # check _END_PRIORITY
"""

from __future__ import annotations

import sys

from tools.libxml_oracle import load_libxml2, serialize_subtree

# HTML4 element universe libxml2 knows (html40ElementTable), minus:
#   html/head/body/frameset/frame/noframes  (document-structure handling,
#       not body-content recovery),
#   script/style/title/textarea             (raw-text content models — a
#       start tag inside them is text, so the probe is meaningless as OLD;
#       they are still probed as NEW),
#   void elements as OLD (they can never stay open).
VOID = {
    "area", "base", "basefont", "br", "col", "embed", "frame", "hr",
    "img", "input", "isindex", "link", "meta", "param", "source",
    "track", "wbr",
}
RAW_TEXT = {"script", "style", "title", "textarea"}

ELEMENTS = [
    "a", "abbr", "acronym", "address", "applet", "b", "bdo", "big",
    "blockquote", "button", "caption", "center", "cite", "code",
    "colgroup", "dd", "del", "dfn", "dir", "div", "dl", "dt", "em",
    "fieldset", "font", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "i", "iframe", "ins", "kbd", "label", "legend", "li", "map", "menu",
    "noscript", "object", "ol", "optgroup", "option", "p", "pre", "q",
    "s", "samp", "select", "small", "span", "strike", "strong", "sub",
    "sup", "table", "tbody", "td", "tfoot", "th", "thead", "tr", "tt",
    "u", "ul", "var",
    # non-HTML4 tags: libxml2 treats unknown names generically; probe a
    # few to pin the generic behavior (expected: no pairs).
    "article", "aside", "section", "nav", "main", "figure",
]

NEW_TAGS = ELEMENTS + sorted(RAW_TEXT) + ["hr", "input", "img", "br"]


def probe_pair(old: str, new: str) -> bool:
    """True when a <new> start tag closes an open <old> (libxml2)."""
    end_new = "" if new in VOID else f"</{new}>"
    doc = (f"<html><body><{old}>x<{new}>y{end_new}"
           f"</{old}></body></html>")
    out = serialize_subtree(doc, "body")
    closed = f"x</{old}>" in out
    nested = f"x<{new}" in out
    if closed == nested:  # pragma: no cover - probe sanity
        raise AssertionError((old, new, out))
    return closed


def derive() -> dict[str, frozenset[str]]:
    """newtag -> frozenset of open tags it auto-closes."""
    olds = [e for e in ELEMENTS if e not in VOID and e not in RAW_TEXT]
    table: dict[str, set[str]] = {}
    for new in NEW_TAGS:
        for old in olds:
            if probe_pair(old, new):
                table.setdefault(new, set()).add(old)
    return {k: frozenset(v) for k, v in table.items()}


def closes_through(match: str, blocker: str) -> bool | None:
    """Does ``</match>`` close through an open <blocker> above it?

    When the blocker's start tag would auto-close the match directly, a
    PRIORITY-100 spacer is inserted between them so the probe isolates
    the blocker's effect (span — or q when the blocker is td/th, whose
    start rows close span).  Returns None when no clean probe exists.
    """
    from ragflow_spark.extractlib.dom import AUTO_CLOSE_PAIRS
    if match in AUTO_CLOSE_PAIRS.get(blocker, ()) or match == blocker:
        spacer = "q" if blocker in ("td", "th") else "span"
        if (match in AUTO_CLOSE_PAIRS.get(spacer, ())
                or spacer in AUTO_CLOSE_PAIRS.get(blocker, ())
                or match == spacer):
            return None
        doc = (f"<html><body><{match}>a<{spacer}>b<{blocker}>c"
               f"</{match}>d</body></html>")
        return f"</{match}>d" in serialize_subtree(doc, "body")
    doc = f"<html><body><{match}>a<{blocker}>b</{match}>c</body></html>"
    return f"</{match}>c" in serialize_subtree(doc, "body")


def check_priorities() -> int:
    """Re-derive the closes-through matrix; verify _END_PRIORITY
    predicts every observable cell."""
    from ragflow_spark.extractlib.dom import _END_PRIORITY
    olds = [e for e in ELEMENTS if e not in VOID and e not in RAW_TEXT]
    bad = 0
    for m in olds:
        pm = _END_PRIORITY.get(m, 100)
        for b in olds:
            got = closes_through(m, b)
            if got is None:
                continue
            want = _END_PRIORITY.get(b, 100) <= pm
            if got != want:
                print(f"MISMATCH </{m}> through <{b}>: "
                      f"observed {'THRU' if got else 'BLOCK'}, "
                      f"priority order predicts "
                      f"{'THRU' if want else 'BLOCK'}")
                bad += 1
    print("DIFF" if bad else "IDENTICAL")
    return 1 if bad else 0


def main() -> int:
    if load_libxml2() is None:
        print("libxml2 shared library not available", file=sys.stderr)
        return 1
    if "--priorities" in sys.argv:
        return check_priorities()
    table = derive()
    if "--diff" in sys.argv:
        from ragflow_spark.extractlib.dom import AUTO_CLOSE_PAIRS
        ours = {k: frozenset(v) for k, v in AUTO_CLOSE_PAIRS.items()}
        missing = {k: v - ours.get(k, frozenset())
                   for k, v in table.items()}
        extra = {k: ours.get(k, frozenset()) - v
                 for k, v in table.items()}
        extra.update({k: ours[k] for k in ours if k not in table})
        bad = False
        for k in sorted(missing):
            if missing[k]:
                print(f"MISSING {k}: {sorted(missing[k])}")
                bad = True
        for k in sorted(extra):
            if extra[k]:
                print(f"EXTRA   {k}: {sorted(extra[k])}")
                bad = True
        print("DIFF" if bad else "IDENTICAL")
        return 1 if bad else 0
    print("AUTO_CLOSE_PAIRS = {")
    for new in sorted(table):
        olds = ", ".join(f'"{t}"' for t in sorted(table[new]))
        print(f'    "{new}": frozenset({{{olds}}}),')
    print("}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
