"""Minimal HTML DOM on stdlib ``html.parser`` (the sandbox has no lxml).

Models the subset of the lxml.html Element API that the readability
(Arc90) scorer and the html-text renderer need: ``tag``, ``attrib``,
``text``, ``tail``, child list, parent pointer, ``text_content()``,
``drop_tree()`` (tail-preserving, like ``lxml.html.HtmlElement.drop_tree``).

Recovery on malformed input replicates libxml2's HTML parser (what
lxml.html — and therefore readability-lxml — actually uses):
  * void elements never take children;
  * a start tag auto-closes open elements via libxml2's ``htmlAutoClose``
    loop: while the TOP of the element stack is in the new tag's
    ``htmlStartClose`` row, pop it.  ``AUTO_CLOSE_PAIRS`` below is that
    relation, derived from the system libxml2 2.9.14 by observation
    (``tools/derive_autoclose.py``; a live pytest differential re-derives
    it).  Top-of-stack only: ``<ul><li>a<b>x<li>c`` nests the second li
    inside ``<b>`` because (li, b) is not a pair, even though (li, li) is;
  * XML-style self-closing syntax (``<div/>``) runs the same auto-close,
    then appends an EMPTY element (libxml2 honors the slash in HTML mode);
  * a duplicate ``<html>``/``<body>``/``<head>`` start tag is ignored,
    attributes dropped (libxml2 merges content into the existing node);
  * stray end tags are ignored (no HTML5-style implied ``<p></p>``);
    a matching end tag closes through every intermediate open element;
    unclosed tags close at EOF;
  * comments, processing instructions and doctypes are dropped at parse time
    (both readability-lxml's clean step and html-text's Cleaner remove them;
    the serialized-length retry measure strips comments the same way).

Character references are decoded by ``html.parser`` (convert_charrefs=True),
matching lxml's entity resolution.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional

VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
})

# tag -> set of open tags it implicitly closes (nearest enclosing run)
class _MinimizedAttr(str):
    """Sentinel for a minimized attribute (``<input checked>``): equals
    ``""`` everywhere (lxml exposes ``''`` for these), but the
    serializer recognises the type and emits the bare name, matching
    libxml2's NULL-children representation."""

    __slots__ = ()


MINIMIZED = _MinimizedAttr("")

# libxml2 htmlStartClose relation: new start tag -> open tags it closes
# while they sit on TOP of the element stack.  Derived from the system
# libxml2 2.9.14 by tools/derive_autoclose.py (do not hand-edit; re-run
# the tool with --diff to audit).
AUTO_CLOSE_PAIRS: dict[str, frozenset] = {
    "a": frozenset({"a"}),
    "address": frozenset({"p", "ul"}),
    "blockquote": frozenset({"p"}),
    "caption": frozenset({"p"}),
    "center": frozenset({"b", "font", "i", "p"}),
    "colgroup": frozenset({"caption", "colgroup", "p"}),
    "dd": frozenset({"address", "dir", "dt", "menu", "p", "pre"}),
    "dir": frozenset({"p"}),
    "div": frozenset({"p"}),
    "dl": frozenset({"address", "dir", "dt", "menu", "p", "pre"}),
    "dt": frozenset({"address", "dd", "dir", "menu", "p", "pre"}),
    "fieldset": frozenset({"a", "h1", "h2", "h3", "h4", "h5", "h6",
                           "legend", "p", "pre"}),
    "form": frozenset({"address", "dir", "dl", "form", "h1", "h2", "h3",
                       "h4", "h5", "h6", "menu", "ol", "p", "pre", "ul"}),
    "h1": frozenset({"p"}),
    "h2": frozenset({"p"}),
    "h3": frozenset({"p"}),
    "h4": frozenset({"p"}),
    "h5": frozenset({"p"}),
    "h6": frozenset({"p"}),
    "hr": frozenset({"p"}),
    "li": frozenset({"address", "dl", "h1", "h2", "h3", "h4", "h5", "h6",
                     "li", "p", "pre"}),
    "menu": frozenset({"p", "ul"}),
    "ol": frozenset({"p", "ul"}),
    "optgroup": frozenset({"option"}),
    "option": frozenset({"option"}),
    "p": frozenset({"b", "big", "h1", "h2", "h3", "h4", "h5", "h6", "i",
                    "p", "s", "small", "strike", "tt", "u"}),
    "pre": frozenset({"p", "ul"}),
    "table": frozenset({"a", "h1", "h2", "h3", "h4", "h5", "h6", "p",
                        "pre"}),
    "tbody": frozenset({"caption", "colgroup", "p", "tbody", "td",
                        "tfoot", "th", "thead", "tr"}),
    "td": frozenset({"a", "b", "font", "i", "p", "span", "td", "th",
                     "u"}),
    "tfoot": frozenset({"caption", "colgroup", "p", "tbody", "td", "th",
                        "thead", "tr"}),
    "th": frozenset({"a", "b", "font", "i", "p", "span", "td", "th",
                     "u"}),
    "thead": frozenset({"caption", "colgroup"}),
    "title": frozenset({"p"}),
    "tr": frozenset({"caption", "colgroup", "p", "td", "th", "tr"}),
    "ul": frozenset({"address", "dir", "menu", "ol", "p", "pre"}),
}

# Document-structure tags libxml2 never duplicates: a repeated start tag
# is ignored (content merges into the existing element, attrs dropped).
_SINGLETON_TAGS = frozenset({"html", "head", "body"})

# libxml2 htmlEndPriority: a misplaced end tag closes through open
# elements only while their priority is <= its own; crossing a
# higher-priority element makes the end tag a no-op.  Values derived
# from the system libxml2 2.9.14 by observation (the full pairwise
# closes-through matrix over the element universe reduces to exactly
# this total order — tools/derive_autoclose.py --priorities).
# Unlisted tags have priority 100.
_END_PRIORITY = {
    "div": 150, "td": 160, "th": 160, "tr": 161, "thead": 162,
    "tbody": 162, "tfoot": 162, "table": 170, "head": 180,
    "body": 190, "html": 200,
}


class Node:
    __slots__ = ("tag", "attrib", "text", "tail", "children", "parent")

    def __init__(self, tag: str, attrib: Optional[dict] = None):
        self.tag = tag
        self.attrib = attrib or {}
        self.text: Optional[str] = None
        self.tail: Optional[str] = None
        self.children: list["Node"] = []
        self.parent: Optional["Node"] = None

    # -- lxml-like API -------------------------------------------------
    def get(self, key: str, default=None):
        return self.attrib.get(key, default)

    def set(self, key: str, value: str) -> None:
        self.attrib[key] = value

    def getparent(self) -> Optional["Node"]:
        return self.parent

    def append(self, child: "Node") -> None:
        if child.parent is not None:
            child.parent.children.remove(child)
        child.parent = self
        self.children.append(child)

    def insert(self, idx: int, child: "Node") -> None:
        if child.parent is not None:
            child.parent.children.remove(child)
        child.parent = self
        self.children.insert(idx, child)

    def remove(self, child: "Node") -> None:
        self.children.remove(child)
        child.parent = None

    def index(self, child: "Node") -> int:
        return self.children.index(child)

    def iter(self, tag: Optional[str] = None) -> Iterator["Node"]:
        """Depth-first, self included (document order), like lxml .iter().

        Iterative (explicit stack): generator recursion costs O(depth)
        per yielded node and dominated the extraction profile. Children
        are snapshotted at visit time, same as the recursive form, so
        callers may detach the yielded node mid-iteration."""
        stack = [self]
        while stack:
            n = stack.pop()
            if tag is None or n.tag == tag:
                yield n
            if n.children:
                stack.extend(reversed(n.children))

    def iter_tags(self, tags) -> Iterator["Node"]:
        tags = frozenset(tags)
        for n in self.iter():
            if n.tag in tags:
                yield n

    def text_content(self) -> str:
        """All text in the subtree, in document order (lxml text_content)."""
        out: list[str] = []

        def walk(n: "Node") -> None:
            if n.text:
                out.append(n.text)
            for c in n.children:
                walk(c)
                if c.tail:
                    out.append(c.tail)

        walk(self)
        return "".join(out)

    def drop_tree(self) -> None:
        """Remove self+subtree; merge tail into the previous text position
        (lxml.html drop_tree semantics — readability relies on this)."""
        parent = self.parent
        if parent is None:
            return
        idx = parent.children.index(self)
        if self.tail:
            if idx > 0:
                prev = parent.children[idx - 1]
                prev.tail = (prev.tail or "") + self.tail
            else:
                parent.text = (parent.text or "") + self.tail
        parent.children.pop(idx)
        self.parent = None

    def drop_tag(self) -> None:
        """Remove self but keep children in place (lxml drop_tag)."""
        parent = self.parent
        if parent is None:
            return
        idx = parent.children.index(self)
        kids = self.children
        # splice text: self.text goes before first kid / into prev tail
        if self.text:
            if idx > 0:
                prev = parent.children[idx - 1]
                prev.tail = (prev.tail or "") + self.text
            else:
                parent.text = (parent.text or "") + self.text
        for k in kids:
            k.parent = parent
        parent.children[idx:idx + 1] = kids
        # tail of self goes after last kid / same splice
        if self.tail:
            if kids:
                last = kids[-1]
                last.tail = (last.tail or "") + self.tail
            elif idx > 0:
                prev = parent.children[idx - 1]
                prev.tail = (prev.tail or "") + self.tail
            else:
                parent.text = (parent.text or "") + self.tail
        self.parent = None
        self.children = []

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Node {self.tag} kids={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]
        self._seen_singletons: set = set()

    # -- helpers -------------------------------------------------------
    def _cur(self) -> Node:
        return self.stack[-1]

    def _add_text(self, data: str) -> None:
        cur = self._cur()
        if cur.children:
            last = cur.children[-1]
            last.tail = (last.tail or "") + data
        else:
            cur.text = (cur.text or "") + data

    def _auto_close(self, tag: str) -> None:
        # libxml2 htmlAutoClose: pop while the new tag closes the TOP of
        # the element stack (context-free pair check, top-only).
        closers = AUTO_CLOSE_PAIRS.get(tag)
        if not closers:
            return
        while len(self.stack) > 1 and self.stack[-1].tag in closers:
            self.stack.pop()

    # -- HTMLParser hooks ---------------------------------------------
    @staticmethod
    def _attr_dict(attrs):
        # libxml2's HTML parser keeps the FIRST of duplicate attributes
        # (stdlib yields them in order; last-write-wins would flip it);
        # a minimized attribute carries MINIMIZED — equal to "" for every
        # consumer (lxml's Python-side value) but serialized as the bare
        # name by htmlser (libxml2 stores NULL children for it)
        d = {}
        for k, v in attrs:
            if k not in d:
                d[k] = MINIMIZED if v is None else v
        return d

    def handle_starttag(self, tag, attrs):
        if tag in _SINGLETON_TAGS:
            if tag in self._seen_singletons:
                return  # libxml2 ignores duplicate html/head/body tags
            self._seen_singletons.add(tag)
        self._auto_close(tag)
        node = Node(tag, self._attr_dict(attrs))
        self._cur().append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        # <div/>: libxml2's HTML parser honors the slash — auto-close
        # runs, then an EMPTY element is appended (never pushed).
        if tag in _SINGLETON_TAGS and tag in self._seen_singletons:
            return
        self._auto_close(tag)
        node = Node(tag, self._attr_dict(attrs))
        self._cur().append(node)

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        pri = _END_PRIORITY.get(tag, 100)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
            if _END_PRIORITY.get(self.stack[i].tag, 100) > pri:
                # libxml2 htmlAutoCloseOnClose: a misplaced end tag
                # cannot close through a higher-priority element
                return
        # stray end tag: ignored

    def handle_data(self, data):
        if data:
            self._add_text(data)

    # comments / PIs / doctype dropped (cleaner semantics)
    def handle_comment(self, data):
        pass

    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass


def parse_html(text: str) -> Node:
    """Parse an HTML string into a tree; returns the synthetic ``#root``.

    The root's children are whatever top-level elements the document has
    (usually a single ``html``); fragments parse to multiple children.
    """
    tb = _TreeBuilder()
    tb.feed(text)
    tb.close()
    return tb.root


def find_first(root: Node, tag: str) -> Optional[Node]:
    for n in root.iter(tag):
        return n
    return None


def get_body(root: Node) -> Node:
    body = find_first(root, "body")
    return body if body is not None else root


def drop_tags(root: Node, tags) -> None:
    """Remove all nodes with the given tags (subtree included)."""
    for n in list(root.iter_tags(tags)):
        n.drop_tree()


_ESCAPES = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}


def _esc(s: str) -> str:
    for k, v in _ESCAPES.items():
        s = s.replace(k, v)
    return s


def tostring(node: Node) -> str:
    """Minimal HTML serializer (debugging / golden dumps)."""
    out: list[str] = []

    def walk(n: Node) -> None:
        if n.tag != "#root":
            attrs = "".join(f' {k}="{_esc(v)}"' for k, v in n.attrib.items())
            out.append(f"<{n.tag}{attrs}>")
        if n.text:
            out.append(_esc(n.text))
        for c in n.children:
            walk(c)
            if c.tail:
                out.append(_esc(c.tail))
        if n.tag != "#root" and n.tag not in VOID_TAGS:
            out.append(f"</{n.tag}>")

    walk(node)
    return "".join(out)
