"""Malformed-HTML recovery parity: dom.py vs libxml2 (what lxml.html,
and therefore readability-lxml, actually parses with).

Three layers:
  * frozen goldens — one per recovery mechanism, produced by the system
    libxml2 2.9.14 through tools/libxml_oracle.py;
  * live re-derivation of the frozen AUTO_CLOSE_PAIRS / _END_PRIORITY
    relations against the shared library when present;
  * a seeded random malformed-document differential (tools/html_fuzz).
"""

from __future__ import annotations

import pytest

from ragflow_spark.extractlib.dom import (AUTO_CLOSE_PAIRS, _END_PRIORITY,
                                          find_first, parse_html)
from ragflow_spark.extractlib.htmlser import serialize_html


def _body(html: str) -> str:
    node = find_first(parse_html(html), "body")
    assert node is not None
    return serialize_html(node)


# (input, libxml2 2.9.14 body dump) — each pins one recovery mechanism.
GOLDENS = [
    # htmlStartClose: block start tags close an open <p>
    ("<html><body><p>one<div>two</div>three</body></html>",
     "<body><p>one</p><div>two</div>three</body>"),
    # a <p> inside a heading closes the heading
    ("<html><body><h1>head<p>para</p></h1></body></html>",
     "<body><h1>head</h1><p>para</p></body>"),
    # the loop is TOP-OF-STACK only: p closes through <b> (pair p->b)...
    ("<html><body><p>a<b>c<p>d</body></html>",
     "<body><p>a<b>c</b></p><p>d</p></body>"),
    # ...but li does NOT close through <b> (no pair li->b): nested
    ("<html><body><ul><li>a<b>x<li>c</ul></body></html>",
     "<body><ul><li>a<b>x<li>c</li></b></li></ul></body>"),
    # cascading table closes: td then tr on a new <tr>
    ("<html><body><table><tr><td>a<td>b<tr><td>c</table></body></html>",
     "<body><table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr>"
     "</table></body>"),
    # a-closes-a: bare nested anchor becomes a sibling
    ('<html><body><a href="1">x<a href="2">y</a></body></html>',
     '<body><a href="1">x</a><a href="2">y</a></body>'),
    # dt/dd mutual closes
    ("<html><body><dl><dt>t1<dd>d1<dt>t2<dd>d2</dl></body></html>",
     "<body><dl><dt>t1</dt><dd>d1</dd><dt>t2</dt><dd>d2</dd></dl>"
     "</body>"),
    # XML self-closing syntax: auto-close first, then an EMPTY element
    ("<html><body><p>a<div/>b</body></html>",
     "<body><p>a</p><div></div>b</body>"),
    # duplicate <body> start tag is ignored (attrs dropped)
    ('<html><body><p>a</p><body class="z"><p>b</p></body></html>',
     "<body><p>a</p><p>b</p></body>"),
    # stray end tag with no open element: ignored, no implied <p></p>
    ("<html><body><b>x</p>y</b></body></html>",
     "<body><b>xy</b></body>"),
    # a matching end tag closes through intermediate open elements
    ("<html><body><div><ul><li>a</div>after</body></html>",
     "<body><div><ul><li>a</li></ul></div>after</body>"),
    # htmlEndPriority: </h1> cannot close through a <td> (160 > 100)
    ("<html><body><h1>a<tfoot><td>b</h1>c</body></html>",
     "<body><h1>a<tfoot><td>bc</td></tfoot></h1></body>"),
    # </td> (160) closes through <div> (150)...
    ("<html><body><table><tr><td>a<div>x</td><td>b</table></body></html>",
     "<body><table><tr><td>a<div>x</div></td><td>b</td></tr></table>"
     "</body>"),
    # ...but </div> (150) cannot close through <td> (160)
    ("<html><body><div>x<td>y</div>z</body></html>",
     "<body><div>x<td>yz</td></div></body>"),
    # </table> (170) closes through everything table-internal
    ("<html><body><table><thead><tr><th>h</table>after</body></html>",
     "<body><table><thead><tr><th>h</th></tr></thead></table>after"
     "</body>"),
]


@pytest.mark.parametrize("html,want", GOLDENS,
                         ids=[f"r{i}" for i in range(len(GOLDENS))])
def test_recovery_goldens(html, want):
    assert _body(html) == want


def _lib_or_skip():
    from tools.libxml_oracle import load_libxml2
    if load_libxml2() is None:
        pytest.skip("libxml2 shared library not available")


def test_goldens_against_live_library():
    _lib_or_skip()
    from tools.libxml_oracle import serialize_subtree
    for html, want in GOLDENS:
        assert serialize_subtree(html, "body") == want, html


def test_autoclose_table_matches_live_library():
    """Re-derive the htmlStartClose relation from the shared library and
    compare with the frozen AUTO_CLOSE_PAIRS."""
    _lib_or_skip()
    from tools.derive_autoclose import derive
    derived = derive()
    ours = {k: v for k, v in AUTO_CLOSE_PAIRS.items()}
    assert derived == ours


def test_end_priority_matches_live_library():
    """The frozen _END_PRIORITY order must predict every observable
    cell of the pairwise closes-through matrix."""
    _lib_or_skip()
    from tools.derive_autoclose import check_priorities
    assert check_priorities() == 0


def test_fuzz_differential():
    """Seeded random malformed documents parse+serialize identically
    through dom.py/htmlser and libxml2."""
    _lib_or_skip()
    from tools.html_fuzz import run
    assert run(400, seed=20260820, verbose=False) == 0


def test_priority_sanity():
    # the derived order the goldens rely on
    assert _END_PRIORITY["div"] < _END_PRIORITY["td"]
    assert _END_PRIORITY["td"] == _END_PRIORITY["th"]
    assert _END_PRIORITY["td"] < _END_PRIORITY["tr"]
    assert _END_PRIORITY["tr"] < _END_PRIORITY["thead"]
    assert _END_PRIORITY["thead"] == _END_PRIORITY["tbody"]
    assert _END_PRIORITY["thead"] < _END_PRIORITY["table"]
