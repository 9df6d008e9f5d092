"""[EXTENSION] HTML main-content extraction (north_rule: "HTML
boilerplate strip ... DOM heuristics").

Pure-stdlib (html.parser) readability-lite: parse the document into
text blocks at block-element boundaries, then keep blocks that look
like body copy and drop chrome. Heuristics are the classic
Arc90/jusText signals, deterministic and unit-tested:

- subtrees under <script>/<style>/<noscript>/<template>/<svg> are
  never text
- subtrees under <nav>/<header>/<footer>/<aside> and elements whose
  id/class mentions nav/menu/footer/sidebar/banner/comment are chrome
- a block is kept iff its text is long enough (>= 25 chars) AND its
  link density (chars inside <a> / total chars) is < 0.5
- <title> is captured separately

Never raises: malformed HTML falls back to the parser's best effort
and the result records counts, mirroring the PDF kernel's
parse_error discipline.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_SKIP_SUBTREE = {"script", "style", "noscript", "template", "svg"}
_CHROME_TAGS = {"nav", "header", "footer", "aside", "form"}
_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "blockquote", "pre",
    "li", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6", "br",
    "tr", "ul", "ol", "table", "body",
}
_CHROME_HINT = re.compile(
    r"nav|menu|footer|sidebar|side-bar|banner|comment|advert|promo|"
    r"breadcrumb|share|social|cookie", re.I)

MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.5


class _Block:
    __slots__ = ("chars", "link_chars", "chrome")

    def __init__(self, chrome: bool):
        self.chars: list[str] = []
        self.link_chars = 0
        self.chrome = chrome

    def text(self) -> str:
        return re.sub(r"\s+", " ", "".join(self.chars)).strip()


_VOID_TAGS = {"br", "hr", "img", "input", "meta", "link", "source",
              "area", "base", "col", "embed", "track", "wbr"}


class _Extractor(HTMLParser):
    """Maintains an explicit open-tag stack so chrome/skip state from
    attribute hints (e.g. <div class="sidebar">) unwinds correctly on
    the matching close tag, tolerating mis-nested HTML."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        # stack entries: (tag, is_skip, is_chrome)
        self.stack: list[tuple[str, bool, bool]] = []
        self.skip_depth = 0
        self.chrome_depth = 0
        self.link_depth = 0
        self.in_title = False
        self.title_parts: list[str] = []
        self._open_block()

    def _open_block(self) -> None:
        self.blocks.append(_Block(self.chrome_depth > 0))

    @staticmethod
    def _is_chrome_attrs(attrs) -> bool:
        for k, v in attrs:
            if k in ("id", "class", "role") and v and _CHROME_HINT.search(v):
                return True
        return False

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            if tag == "br":
                self._open_block()
            return
        if tag == "title":
            self.in_title = True
            return
        skip = tag in _SKIP_SUBTREE
        chrome = tag in _CHROME_TAGS or self._is_chrome_attrs(attrs)
        self.stack.append((tag, skip, chrome))
        if skip:
            self.skip_depth += 1
        if chrome:
            self.chrome_depth += 1
        if tag == "a":
            self.link_depth += 1
        if tag in _BLOCK_TAGS:
            self._open_block()

    def handle_startendtag(self, tag, attrs):
        if tag == "br":
            self._open_block()

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        if tag == "title":
            self.in_title = False
            return
        # unwind to the matching open tag (lenient on mis-nesting);
        # unmatched close tags are ignored
        if not any(t == tag for t, _s, _c in self.stack):
            return
        while self.stack:
            t, skip, chrome = self.stack.pop()
            if skip:
                self.skip_depth = max(0, self.skip_depth - 1)
            if chrome:
                self.chrome_depth = max(0, self.chrome_depth - 1)
            if t == "a":
                self.link_depth = max(0, self.link_depth - 1)
            if t == tag:
                break
        if tag in _BLOCK_TAGS or tag in _CHROME_TAGS:
            self._open_block()

    def handle_data(self, data):
        if self.skip_depth:
            return
        if self.in_title:
            self.title_parts.append(data)
            return
        blk = self.blocks[-1]
        # a block opened outside chrome but written into while chrome
        # is active must count as chrome
        if self.chrome_depth > 0:
            blk.chrome = True
        blk.chars.append(data)
        if self.link_depth > 0:
            blk.link_chars += len(data)


def extract_main_text(html: str) -> dict:
    """Boilerplate-stripped main text of one HTML document.

    Returns {title, text, n_blocks, n_kept, n_chrome_blocks}.
    """
    ex = _Extractor()
    try:
        ex.feed(html)
        ex.close()
    except Exception:  # html.parser is resilient; belt and braces
        pass
    kept: list[str] = []
    n_blocks = 0
    n_chrome = 0
    for blk in ex.blocks:
        text = blk.text()
        if not text:
            continue
        n_blocks += 1
        if blk.chrome:
            n_chrome += 1
            continue
        if len(text) < MIN_BLOCK_CHARS:
            continue
        density = blk.link_chars / max(1, len("".join(blk.chars)))
        if density >= MAX_LINK_DENSITY:
            n_chrome += 1
            continue
        kept.append(text)
    return {
        "title": re.sub(r"\s+", " ", "".join(ex.title_parts)).strip(),
        "text": "\n\n".join(kept),
        "n_blocks": n_blocks,
        "n_kept": len(kept),
        "n_chrome_blocks": n_chrome,
    }
