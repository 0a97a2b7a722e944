"""HTML main-content extraction (boilerplate stripping) — pure stdlib.

No reference code exists for this path (the reference handles only PDFs);
the north rule (BASELINE.json) mandates "HTML boilerplate stripping via
DOM-tree heuristics (text-density + link-ratio scoring)".  Design follows
the published shallow-text-feature approach of Boilerpipe (Kohlschütter
et al., WSDM 2010) and jusText's paragraph link-density heuristic
(Pomikálek, 2011):

1. parse into a flat sequence of text *blocks* (one per run of text
   under the nearest block-level element; script/style/nav subtrees are
   hard-dropped);
2. score each block:  ``link_ratio`` = anchored chars / chars,
   ``density`` = words per 80-char wrapped line;
3. keep content blocks (long enough, low link ratio, dense enough);
   headings are kept whenever their link ratio is low.

The function is deterministic and shared verbatim between the golden
generator and the Spark UDF, extending the byte-identity gate to HTML
rows.  All thresholds are module constants (part of the spec).
"""

from __future__ import annotations

import math
import re
from html import unescape
from html.parser import HTMLParser

__all__ = ["strip_boilerplate", "extract_html_text"]

RE_WS = re.compile(r"\s+")

# block-level elements: a new text block starts when one opens or closes
BLOCK_TAGS = frozenset("""
    address article aside blockquote body caption dd div dl dt fieldset
    figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr li main nav
    ol p pre section table tbody td tfoot th thead tr ul
""".split())

# subtrees dropped wholesale (never produce text)
DROP_TAGS = frozenset("""
    script style noscript template svg iframe object embed select
    option button datalist
""".split())

# drop-tags that are void or have optional end tags in real-world HTML —
# pushing them onto the drop stack would never unwind (e.g. bare <embed>,
# <option>A<option>B) and silently swallow the rest of the document
DROP_VOID = frozenset({"embed"})
DROP_SELF_SIBLING = frozenset({"option"})  # a new one implicitly closes the last

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "title"})

# boilerplate containers: text directly under these is penalized
NAV_TAGS = frozenset({"nav", "footer", "aside", "header", "form"})

MIN_CHARS = 25          # blocks shorter than this are boilerplate unless heading
MAX_LINK_RATIO = 1 / 3  # jusText-style link-density cut
MIN_DENSITY = 6.0       # words per 80-char wrapped line
WRAP_COLS = 80


class _Block:
    __slots__ = ("tag", "chars", "link_chars", "parts", "in_nav")

    def __init__(self, tag: str, in_nav: bool):
        self.tag = tag
        self.chars = 0
        self.link_chars = 0
        self.parts: list[str] = []
        self.in_nav = in_nav

    def text(self) -> str:
        return RE_WS.sub(" ", "".join(self.parts)).strip()


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur: _Block | None = None
        self._drop_stack: list[str] = []
        self._nav_stack: list[str] = []
        # open anchors, each tracking how many BLOCK opens happened after
        # it opened: a valid HTML5 block-level link (<a><div>card</div></a>)
        # keeps attributing its children's text to the link, while an
        # anchor whose ENCLOSING block closes (count would go negative)
        # is stale/unclosed and is dropped — it must not swallow the rest
        # of the document as link text
        self._anchors: list[int] = []
        self._tag_stack: list[str] = []

    @property
    def _anchor_depth(self) -> int:
        return len(self._anchors)

    @property
    def _drop_depth(self) -> int:
        return len(self._drop_stack)

    @property
    def _nav_depth(self) -> int:
        return len(self._nav_stack)

    # -- helpers ---------------------------------------------------------
    def _open_block(self, tag: str) -> None:
        self._cur = _Block(tag, self._nav_depth > 0)
        self.blocks.append(self._cur)

    def _close_block(self) -> None:
        self._cur = None

    # -- parser events ----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in DROP_TAGS:
            if tag in DROP_SELF_SIBLING and self._drop_stack and \
                    self._drop_stack[-1] == tag:
                pass  # implicit close of the previous sibling
            elif tag not in DROP_VOID:
                self._drop_stack.append(tag)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._anchors.append(0)
        if tag in NAV_TAGS:
            self._nav_stack.append(tag)
        if tag in ("main", "article"):
            # a content landmark implicitly closes dangling boilerplate
            # containers (sloppy HTML with a missing </nav>/</form>/</a>
            # must not swallow the article body)
            self._nav_stack.clear()
            self._anchors.clear()
        if tag == "br":
            return
        if tag in BLOCK_TAGS or tag in HEADING_TAGS:
            # child blocks INHERIT open anchors (HTML5 block-level links:
            # <a><div>card text</div></a> is link text); staleness is
            # resolved at block CLOSE, not at every block boundary
            self._anchors = [d + 1 for d in self._anchors]
            self._tag_stack.append(tag)
            self._open_block(tag)

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in DROP_TAGS:
            # pop to the nearest matching open drop-tag; an end tag whose
            # start never pushed (void / implicitly closed) is a no-op
            if tag in self._drop_stack:
                while self._drop_stack:
                    if self._drop_stack.pop() == tag:
                        break
            return
        if self._drop_depth:
            return
        if tag == "a":
            if self._anchors:
                self._anchors.pop()
        if tag in NAV_TAGS and tag in self._nav_stack:
            while self._nav_stack:  # pop to the nearest matching open tag
                if self._nav_stack.pop() == tag:
                    break
        if tag in BLOCK_TAGS or tag in HEADING_TAGS:
            if self._tag_stack and self._tag_stack[-1] == tag:
                self._tag_stack.pop()
            # an anchor whose enclosing block just closed never closed
            # itself → stale; drop it (count would go negative)
            self._anchors = [d - 1 for d in self._anchors if d > 0]
            self._close_block()

    def handle_data(self, data):
        if self._drop_depth or not data:
            return
        if self._cur is None:
            self._open_block("p")
        n = len(data.strip())
        self._cur.parts.append(data)
        self._cur.chars += n
        if self._anchor_depth:
            self._cur.link_chars += n


def _keep_text(block: _Block) -> str | None:
    """The block's text if it passes the keep rules, else None.

    Output-identical refactor of the original boolean `_score_keep` +
    re-`text()` pair (r5, BENCH.md §4.16): the normalize-regex `text()`
    ran TWICE for every kept block (once to score, once to emit).  The
    cheap gates that don't need the text (`chars == 0` ⟺ empty
    normalized text, since chars sums per-chunk stripped lengths;
    non-heading nav blocks) run first, then the text materializes once
    and is both scored and returned.
    """
    if block.chars == 0:
        return None
    heading = block.tag in HEADING_TAGS
    if block.in_nav and not heading:
        return None
    text = block.text()
    if not text:
        return None
    chars = len(text)
    link_ratio = block.link_chars / max(1, block.chars)
    if heading:
        return text if (link_ratio <= MAX_LINK_RATIO and chars >= 3) \
            else None
    if chars < MIN_CHARS or link_ratio > MAX_LINK_RATIO:
        return None
    words = len(text.split())
    lines = max(1.0, math.ceil(chars / WRAP_COLS))
    return text if (words / lines) >= MIN_DENSITY else None


def strip_boilerplate(html_text: str) -> str:
    """Return main-content text, one kept block per line (\\n-joined)."""
    parser = _BlockParser()
    try:
        parser.feed(html_text)
        parser.close()
    except Exception:
        # html.parser is forgiving; anything fatal → best-effort tag strip
        flat = RE_WS.sub(" ", re.sub(r"<[^>]*>", " ", unescape(html_text))).strip()
        return flat
    kept = [t for t in map(_keep_text, parser.blocks) if t is not None]
    return "\n".join(kept)


RE_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.I)


def detect_charset(payload: bytes) -> str:
    """Charset from BOM or a <meta charset=…> in the first 4 KB;
    UTF-8 otherwise (Common-Crawl reality: mislabeled pages abound,
    so the decode is always errors='replace')."""
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    m = RE_CHARSET.search(payload[:4096])
    if m:
        enc = m.group(1).decode("ascii", errors="replace").lower()
        try:
            import codecs

            codecs.lookup(enc)
            return enc
        except LookupError:
            pass
    return "utf-8"


def extract_html_text(payload: bytes) -> str:
    """Decode bytes (detected charset, replacement on errors) and strip."""
    return strip_boilerplate(payload.decode(detect_charset(payload),
                                            errors="replace"))
