"""Deterministic HTML boilerplate strip + main-content heuristic (T11).

Absent from the reference (it OCRs page images) but mandated by the
north rule for HTML-payload rows: "HTML boilerplate strip, PDF/layout
parse, DOM heuristics".  Implemented with the stdlib ``html.parser`` so
the exact same pure function runs inside the Spark pandas UDF, inside
the single-process oracle, and inside DuckDB-free tests — byte-identity
across all three.

Rules (fixed, documented, deterministic):

1. Content inside ``script/style/noscript/template/svg/head/iframe``
   is dropped.
2. Entire subtrees under boilerplate containers
   (``nav/header/footer/aside/form/button/menu``) are dropped.
3. Text is accumulated per *block*: a block closes at the end of a
   block-level element (``p, div, h1..h6, li, td, th, blockquote, pre,
   article, section, main, tr, table, ul, ol, dd, dt, figcaption``) or
   at ``<br>``.
4. Whitespace inside a block collapses to single spaces; empty blocks
   vanish.
5. Main-content heuristic: a block is boilerplate if more than half of
   its characters sit inside ``<a>`` tags (link-density test) — unless
   the block is long (>= 80 chars), which rescues legitimate link-heavy
   paragraphs.
6. Surviving blocks join with a single ``\\n``.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

_DROP_CONTENT = frozenset(
    {"script", "style", "noscript", "template", "svg", "head", "iframe"}
)
_DROP_SUBTREE = frozenset({"nav", "header", "footer", "aside", "form", "button", "menu"})
_BLOCK = frozenset(
    {
        "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
        "blockquote", "pre", "article", "section", "main", "tr", "table",
        "ul", "ol", "dd", "dt", "figcaption", "body",
    }
)
_VOID_BREAK = frozenset({"br", "hr"})
_WS = re.compile(r"\s+")


class _MainContentParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []  # (text, anchor_char_count)
        self._parts: list[str] = []
        self._anchor_chars = 0
        self._drop_depth = 0
        self._anchor_depth = 0

    def _flush(self) -> None:
        text = _WS.sub(" ", "".join(self._parts)).strip()
        if text:
            self.blocks.append((text, self._anchor_chars))
        self._parts = []
        self._anchor_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DROP_CONTENT or tag in _DROP_SUBTREE:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in _VOID_BREAK:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_CONTENT or tag in _DROP_SUBTREE:
            if self._drop_depth:
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        if tag == "a" and self._anchor_depth:
            self._anchor_depth -= 1
        if tag in _BLOCK:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if not self._drop_depth and tag in _VOID_BREAK:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._drop_depth:
            return
        self._parts.append(data)
        if self._anchor_depth:
            self._anchor_chars += len(data.strip())

    def close(self) -> None:
        super().close()
        self._flush()


def strip_html(html_text: str) -> str:
    """Extract main content from HTML, deterministically."""
    parser = _MainContentParser()
    try:
        parser.feed(html_text)
        parser.close()
    except Exception:
        # malformed markup: degrade to a tag-free regex strip
        return _WS.sub(" ", unescape(re.sub(r"<[^>]*>", " ", html_text))).strip()
    kept = []
    for text, anchor_chars in parser.blocks:
        n = len(text)
        if n >= 80 or anchor_chars * 2 <= n:
            kept.append(text)
    return "\n".join(kept)


def strip_html_bytes(payload: bytes) -> str:
    """UTF-8 decode (replacement on error) then :func:`strip_html`."""
    return strip_html(payload.decode("utf-8", errors="replace"))
