"""Minimal HTML DOM + selector engine with BeautifulSoup-compatible
semantics, built on stdlib ``html.parser`` (bs4 is not a dependency).

The reference parses pages with ``BeautifulSoup(content, 'html.parser')``
and uses only four primitives, all reimplemented here with matching
semantics (reference: dags/crawler/seek_crawler.py:160-235,
dags/crawler/jora_cralwer.py:217-291):

* ``find(name, class_=..., attrs=..., id=...)`` — first matching
  descendant in document order.
* ``find_all(...)`` — all matching descendants in document order.
* class matching: a *single*-word ``class_`` matches if it is any one of
  the element's classes; a *multi*-word ``class_`` string matches only
  if the element's literal ``class`` attribute equals the string exactly
  (bs4's documented behavior for multi-valued class searches).
* ``get_text()`` — concatenation of all descendant text nodes (entities
  decoded) with no separator; ``get_text(separator='\\n', strip=True)``
  — each text node ``.strip()``-ed, empties dropped, joined by the
  separator. Void elements (``<br>`` etc.) contribute no text.

This module is shared by the extraction pandas UDFs and by the
pure-Python reference simulator so both sides parse identically.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Element:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str | None], parent=None):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # Element | str (text node)
        self.parent = parent

    # -- selector engine ---------------------------------------------------
    def _matches(self, name, class_, attrs, id_) -> bool:
        if name is not None and self.tag != name:
            return False
        if id_ is not None and self.attrs.get("id") != id_:
            return False
        if class_ is not None:
            cls_attr = self.attrs.get("class") or ""
            if " " in class_:
                # bs4: multi-class string == exact attribute-value match
                if cls_attr != class_:
                    return False
            else:
                if class_ not in cls_attr.split():
                    return False
        if attrs:
            for k, v in attrs.items():
                if self.attrs.get(k) != v:
                    return False
        return True

    def _iter_descendants(self):
        for child in self.children:
            if isinstance(child, Element):
                yield child
                yield from child._iter_descendants()

    def find_all(self, name=None, class_=None, attrs=None, id=None) -> list["Element"]:
        return [
            e
            for e in self._iter_descendants()
            if e._matches(name, class_, attrs, id)
        ]

    def find(self, name=None, class_=None, attrs=None, id=None):
        for e in self._iter_descendants():
            if e._matches(name, class_, attrs, id):
                return e
        return None

    def element_children(self) -> list["Element"]:
        """Direct child elements (the reference iterates a Tag's children
        at seek_crawler.py:227; our fixtures keep such containers free of
        stray text nodes, so element-only iteration is equivalent)."""
        return [c for c in self.children if isinstance(c, Element)]

    # -- text extraction ---------------------------------------------------
    def _iter_text(self):
        for child in self.children:
            if isinstance(child, Element):
                yield from child._iter_text()
            else:
                yield child

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        if strip:
            parts = [t.strip() for t in self._iter_text()]
            parts = [t for t in parts if t]
        else:
            parts = list(self._iter_text())
        return separator.join(parts)

    def get(self, attr: str, default=None):
        return self.attrs.get(attr, default)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        # convert_charrefs=True (default): entities are decoded into the
        # text stream, matching bs4-on-html.parser text-node contents.
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, dict(attrs), parent=self._stack[-1])
        self._stack[-1].children.append(el)
        if tag not in VOID_ELEMENTS:
            self._stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, dict(attrs), parent=self._stack[-1])
        self._stack[-1].children.append(el)

    def handle_endtag(self, tag):
        # lenient close: pop to nearest matching open tag, like html.parser
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # unmatched end tag: ignored

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def parse_html(content: bytes | str) -> Element:
    """Parse an HTML document; returns the root pseudo-element."""
    if isinstance(content, (bytes, bytearray)):
        content = content.decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    builder.feed(content)
    builder.close()
    return builder.root
