"""HTML main-content extraction -> markdown: the flagship deterministic kernel.

The reference extracts page content via a VLM (document_job.py:65-161); the
north_star replaces that for HTML payloads with a DOM-parse +
boilerplate-strip stage using text-density and link-density heuristics
(Readability / trafilatura-style scoring — public algorithms; see e.g.
Kohlschütter et al., "Boilerplate Detection using Shallow Text Features",
WSDM 2010). This module is pure Python over stdlib ``html.parser`` (no lxml
in the container), fully deterministic, and is the byte-exact golden path for
``extracted text per url``.

Output contract (mirrors the reference's markdown conventions,
src/config.py:78-124): ATX headings, paragraphs separated by blank lines,
``-`` bullets, ``1.`` ordered items, tables passed through as canonical HTML
``<table>`` blocks (the reference prompt mandates HTML tables), fenced code
blocks, ``**bold**`` / ``*emph*``, links rendered as their anchor text.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# --- DOM-lite -----------------------------------------------------------------

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# Tags whose entire subtree is discarded before scoring.
STRIP_TAGS = frozenset(
    "script style noscript svg canvas iframe form button select option template".split()
)
# Structural boilerplate containers discarded by tag name alone.
BOILERPLATE_TAGS = frozenset("nav header footer aside".split())
# class/id substrings marking boilerplate containers (trafilatura-style cue list).
BOILERPLATE_CUE = re.compile(
    r"(?:^|[-_ ])(?:nav|menu|sidebar|footer|header|banner|breadcrumb|comment|"
    r"share|social|related|promo|ad|ads|advert|sponsor|cookie|popup|modal|widget)(?:$|[-_ ])"
)
BLOCK_TAGS = frozenset(
    "p div section article main body html ul ol li table h1 h2 h3 h4 h5 h6 "
    "pre blockquote figure figcaption tr td th thead tbody dl dt dd".split()
)
_WS = re.compile(r"\s+")


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent


class _TreeBuilder(HTMLParser):
    """Forgiving tree builder: unclosed tags are auto-closed at the nearest
    matching open ancestor; stray close tags are ignored."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        # Implicit close: a block tag opening inside <p>, or <li> inside <li>.
        if tag in BLOCK_TAGS and self.cur.tag == "p":
            self.cur = self.cur.parent or self.root
        if tag == "li" and self.cur.tag == "li":
            self.cur = self.cur.parent or self.root
        node = Node(tag, {k: (v or "") for k, v in attrs}, self.cur)
        self.cur.children.append(node)
        if tag not in VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self.cur.children.append(Node(tag, {k: (v or "") for k, v in attrs}, self.cur))

    def handle_endtag(self, tag: str) -> None:
        n: Node | None = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data: str) -> None:
        if data:
            self.cur.children.append(data)


def parse_html(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


# --- boilerplate scoring ------------------------------------------------------

def _is_boilerplate(node: Node) -> bool:
    if node.tag in BOILERPLATE_TAGS:
        return True
    cue = (node.attrs.get("class", "") + " " + node.attrs.get("id", "")).lower()
    return bool(cue.strip() and BOILERPLATE_CUE.search(cue))


def _text_stats(node: Node | str,
                memo: dict[int, tuple[int, int]] | None = None) -> tuple[int, int]:
    """(total_text_len, link_text_len) over a subtree, whitespace-collapsed.
    With ``memo``, every Node's stats are recorded in ONE bottom-up pass —
    the per-candidate recursion otherwise recomputes nested containers
    O(depth) times (profiled: 360k calls for 13.6k nodes, ~0.8 s/batch)."""
    if isinstance(node, str):
        t = _WS.sub(" ", node).strip()
        return len(t), 0
    if node.tag in STRIP_TAGS:
        if memo is not None:
            memo[id(node)] = (0, 0)
        return 0, 0
    total = link = 0
    for c in node.children:
        t, l = _text_stats(c, memo)
        total += t
        link += l
    if node.tag == "a":
        link = total
    if memo is not None:
        memo[id(node)] = (total, link)
    return total, link


def _candidates(node: Node, out: list[tuple[float, Node]],
                memo: dict[int, tuple[int, int]]) -> None:
    """Collect scored content candidates: blocks with high text mass and low
    link density (Readability-style: score = text_len * (1 - link_density))."""
    if isinstance(node, str) or node.tag in STRIP_TAGS or _is_boilerplate(node):
        return
    if node.tag in ("article", "main", "body", "div", "section", "td"):
        total, link = memo[id(node)]
        if total > 0:
            density = link / total
            score = total * (1.0 - density)
            # Semantic containers get a fixed boost, like Readability's
            # tag-name weighting.
            if node.tag in ("article", "main"):
                score *= 2.0
            out.append((score, node))
    for c in node.children:
        if isinstance(c, Node):
            _candidates(c, out, memo)


def select_main_content(root: Node) -> Node:
    """Pick the highest-scoring content container; fall back to the whole tree."""
    memo: dict[int, tuple[int, int]] = {}
    _text_stats(root, memo)
    scored: list[tuple[float, Node]] = []
    _candidates(root, scored, memo)
    if not scored:
        return root
    best_score, best = scored[0]
    for s, n in scored[1:]:
        if s > best_score:
            best_score, best = s, n
    return best


# --- markdown serialization ---------------------------------------------------

_HEADING = {f"h{i}": i for i in range(1, 7)}


def _inline(node: Node | str, parts: list[str]) -> None:
    if isinstance(node, str):
        parts.append(_WS.sub(" ", node))
        return
    tag = node.tag
    if tag in STRIP_TAGS:
        return
    if tag == "br":
        parts.append("\n")
        return
    if tag in ("b", "strong"):
        inner = _collect_inline(node)
        if inner:
            parts.append(f"**{inner}**")
        return
    if tag in ("i", "em"):
        inner = _collect_inline(node)
        if inner:
            parts.append(f"*{inner}*")
        return
    if tag == "code":
        inner = _collect_inline(node)
        if inner:
            parts.append(f"`{inner}`")
        return
    if tag == "a":
        # Links render as their text: the engine extracts content, not nav.
        for c in node.children:
            _inline(c, parts)
        return
    if tag == "img":
        alt = _WS.sub(" ", node.attrs.get("alt", "")).strip()
        src = node.attrs.get("src", "")
        if alt or src:
            parts.append(f"![{alt}]({src})")
        return
    for c in node.children:
        _inline(c, parts)


def _collect_inline(node: Node) -> str:
    parts: list[str] = []
    for c in node.children:
        _inline(c, parts)
    return _WS.sub(" ", "".join(parts)).strip()


def _raw_text(node: Node | str) -> str:
    """Verbatim text (for <pre>), entity-decoded, whitespace preserved."""
    if isinstance(node, str):
        return node
    return "".join(_raw_text(c) for c in node.children)


def _serialize_table(node: Node) -> str:
    """Canonical HTML table serialization (the reference prompt mandates HTML
    ``<table>`` output, src/config.py:97-103). Cell text is inline-collapsed;
    rowspan/colspan attributes are preserved."""
    rows: list[str] = []

    def walk_rows(n: Node) -> None:
        for c in n.children:
            if not isinstance(c, Node):
                continue
            if c.tag == "tr":
                cells = []
                for cell in c.children:
                    if isinstance(cell, Node) and cell.tag in ("td", "th"):
                        attrs = "".join(
                            f' {k}="{cell.attrs[k]}"'
                            for k in ("rowspan", "colspan")
                            if k in cell.attrs
                        )
                        cells.append(f"<{cell.tag}{attrs}>{_collect_inline(cell)}</{cell.tag}>")
                rows.append("<tr>" + "".join(cells) + "</tr>")
            elif c.tag in ("thead", "tbody", "tfoot"):
                walk_rows(c)

    walk_rows(node)
    return "<table>\n" + "\n".join(rows) + "\n</table>"


def _serialize_block(node: Node | str, out: list[str], list_stack: list[tuple[str, int]]) -> None:
    if isinstance(node, str):
        t = _WS.sub(" ", node).strip()
        if t:
            out.append(t)
        return
    tag = node.tag
    if tag in STRIP_TAGS or _is_boilerplate(node):
        return
    if tag in _HEADING:
        text = _collect_inline(node)
        if text:
            out.append("#" * _HEADING[tag] + " " + text)
        return
    if tag == "p":
        text = _collect_inline(node)
        if text:
            out.append(text)
        return
    if tag == "pre":
        code = _raw_text(node).strip("\n")
        out.append(f"```\n{code}\n```")
        return
    if tag == "blockquote":
        inner: list[str] = []
        for c in node.children:
            _serialize_block(c, inner, list_stack)
        if inner:
            out.append("\n".join("> " + line for block in inner for line in block.split("\n")))
        return
    if tag == "table":
        out.append(_serialize_table(node))
        return
    if tag in ("ul", "ol"):
        items: list[str] = []
        counter = 0
        indent = "  " * len(list_stack)
        for c in node.children:
            if isinstance(c, Node) and c.tag == "li":
                counter += 1
                marker = f"{counter}. " if tag == "ol" else "- "
                # An <li> may contain nested lists; serialize its inline text
                # first, then nested blocks.
                inline_parts: list[str] = []
                nested: list[str] = []
                for cc in c.children:
                    if isinstance(cc, Node) and cc.tag in ("ul", "ol"):
                        _serialize_block(cc, nested, list_stack + [(tag, counter)])
                    elif isinstance(cc, Node) and cc.tag in BLOCK_TAGS:
                        sub: list[str] = []
                        _serialize_block(cc, sub, list_stack)
                        if sub:
                            inline_parts.append(" ".join(sub))
                    else:
                        _inline(cc, inline_parts)
                head = _WS.sub(" ", "".join(inline_parts)).strip()
                item = indent + marker + head
                if nested:
                    item += "\n" + "\n".join(nested)
                items.append(item)
        if items:
            out.append("\n".join(items))
        return
    if tag in ("figure",):
        cap = ""
        body: list[str] = []
        for c in node.children:
            if isinstance(c, Node) and c.tag == "figcaption":
                cap = _collect_inline(c)
            else:
                _serialize_block(c, body, list_stack)
        if body:
            out.extend(body)
        if cap:
            out.append(f"*{cap}*")
        return
    if tag == "img":
        parts: list[str] = []
        _inline(node, parts)
        t = "".join(parts).strip()
        if t:
            out.append(t)
        return
    if tag in ("hr",):
        out.append("---")
        return
    # Generic container: recurse. Bare inline runs inside a container are
    # gathered into an implicit paragraph.
    run: list[str] = []

    def flush_run() -> None:
        text = _WS.sub(" ", "".join(run)).strip()
        if text:
            out.append(text)
        run.clear()

    for c in node.children:
        if isinstance(c, Node) and (c.tag in BLOCK_TAGS or c.tag in ("hr", "img")) :
            flush_run()
            _serialize_block(c, out, list_stack)
        else:
            _inline(c, run)
    flush_run()


def serialize_markdown(node: Node) -> str:
    blocks: list[str] = []
    _serialize_block(node, blocks, [])
    return "\n\n".join(b for b in blocks if b)


# --- public API ---------------------------------------------------------------

def extract_markdown(html: str) -> str:
    """HTML bytes-decoded string -> main-content markdown (deterministic)."""
    root = parse_html(html)
    main = select_main_content(root)
    return serialize_markdown(main)


def extract_markdown_from_bytes(payload: bytes) -> str:
    return extract_markdown(payload.decode("utf-8", errors="replace"))
