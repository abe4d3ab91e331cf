"""Minimal HTML DOM on stdlib ``html.parser`` (the sandbox has no lxml).

Models the subset of the lxml.html Element API that the readability
(Arc90) scorer and the html-text renderer need: ``tag``, ``attrib``,
``text``, ``tail``, child list, parent pointer, ``text_content()``,
``drop_tree()`` (tail-preserving, like ``lxml.html.HtmlElement.drop_tree``).

Normalizations (deterministic, browser-like):
  * void elements never take children;
  * ``<p>`` auto-closes an open ``<p>``; ``li/tr/td/th/option`` likewise
    auto-close their own kind (libxml2's HTML parser does the same, so this
    keeps our tree shapes close to what readability-lxml sees);
  * stray end tags are ignored; unclosed tags close at EOF;
  * comments, processing instructions and doctypes are dropped at parse time
    (both readability-lxml's clean step and html-text's Cleaner remove them).

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

_AUTO_CLOSE = {
    "p": {"p"},
    "li": {"li"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
    "dd": {"dd", "dt"},
    "dt": {"dd", "dt"},
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
        closers = _AUTO_CLOSE.get(tag)
        if not closers:
            return
        if self._cur().tag in closers:
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
        self._auto_close(tag)
        node = Node(tag, self._attr_dict(attrs))
        self._cur().append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, self._attr_dict(attrs))
        self._cur().append(node)

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
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
