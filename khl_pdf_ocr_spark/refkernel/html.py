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


# ---------------------------------------------------------------------------
# fast tokenizer (r6): exact-stream replacement for feed()+close()
# ---------------------------------------------------------------------------
#
# ``_BlockParser`` consumes exactly three parser events — starttag NAME
# (attrs ignored), endtag NAME, and data under ``convert_charrefs=True``.
# ``_fast_feed`` replays the stdlib ``HTMLParser.goahead`` control flow
# for that event subset using the stdlib's OWN compiled regexes
# (``tagfind_tolerant`` & co.), so every tokenization DECISION — where a
# tag ends, what is a comment, when CDATA content mode starts/ends, how
# malformed markup degrades to data — is made by the same automata as
# the stdlib parser.  It skips only work whose results this consumer
# provably discards:
#
# - the attribute list build (group extraction, quote stripping,
#   ``unescape`` per value, ``.lower()``, tuple/list allocation) — the
#   ``attrfind_tolerant`` regex still runs per attribute because its
#   match END feeds the "did we stop exactly at '>'" check that decides
#   tag-vs-data, but its groups are never touched;
# - ``updatepos`` line/offset accounting — a full extra pass counting
#   newlines over every consumed span (we never read ``getpos()``);
# - ``get_starttag_text``/``lasttag`` bookkeeping slices;
# - the per-call ``feed``→``goahead`` indirection and the dead
#   ``&``-branches (unreachable under ``convert_charrefs=True`` outside
#   CDATA mode, where ``interesting`` only ever stops at ``<``).
#
# feed(whole_doc)+close() composition notes folded in: an incomplete
# construct (-1) takes the ``goahead(end=1)`` consume-to-'>' fallback
# immediately; the unterminated-CDATA tail is swallowed (never emitted);
# the final tail is emitted unescaped in one chunk.  Event-stream
# equality — chunk boundaries, fallback raises and all — is pinned by
# tests/test_html_fast_tokenizer.py (fixture corpus + adversarial +
# seeded fuzz, plus raise-parity for malformed marked sections, where
# both paths must throw so ``strip_boilerplate`` takes its regex-strip
# fallback).  If a future stdlib renames these internals, the import
# guard flips ``_FAST_TOKENIZER`` off and ``strip_boilerplate`` uses
# the stdlib parser itself — behavior, not availability, is the spec.

try:
    import _markupbase as _mb
    from html import parser as _hp

    _TAGFIND = _hp.tagfind_tolerant
    _ATTRFIND = _hp.attrfind_tolerant
    _LOCATESTART = _hp.locatestarttagend_tolerant
    _ENDENDTAG = _hp.endendtag
    _ENDTAGFIND = _hp.endtagfind
    _PICLOSE = _hp.piclose
    _COMMENTCLOSE = _mb._commentclose
    _MARKEDCLOSE = _mb._markedsectionclose
    _MSMARKEDCLOSE = _mb._msmarkedsectionclose
    _DECLNAME_MATCH = _mb._declname_match
    _FAST_TOKENIZER = HTMLParser.CDATA_CONTENT_ELEMENTS == ("script", "style")
except Exception:  # pragma: no cover - stdlib layout drift
    _FAST_TOKENIZER = False

if _FAST_TOKENIZER:
    # set_cdata_mode's exact pattern, precompiled for the only two
    # possible elements
    _CDATA_CLOSE = {t: re.compile(r'</\s*%s\s*>' % t, re.I)
                    for t in ("script", "style")}
_ASCII_EQ_SLASH = "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_NO_ATTRS: list = []  # _BlockParser.handle_starttag never reads attrs


def _fast_html_declaration(rawdata: str, i: int, n: int) -> int:
    """``parse_html_declaration`` + ``parse_marked_section`` +
    ``_scan_name`` mirror (content handlers are no-ops for this
    consumer).  Returns the next index or -1 if incomplete; raises
    AssertionError on exactly the malformed marked sections the stdlib
    raises on (goahead's caller — ``strip_boilerplate`` — catches and
    falls back either way)."""
    if rawdata[i:i + 3] == '<![':
        j = i + 3
        if j == n:
            return -1
        m = _DECLNAME_MATCH(rawdata, j)
        if not m:
            raise AssertionError(
                "expected name token at %r" % rawdata[i:i + 20])
        s = m.group()
        if j + len(s) == n:
            return -1  # name runs to end of buffer: incomplete
        name = s.strip().lower()
        if name in ('temp', 'cdata', 'ignore', 'include', 'rcdata'):
            match = _MARKEDCLOSE.search(rawdata, j)      # ]]>
        elif name in ('if', 'else', 'endif'):
            match = _MSMARKEDCLOSE.search(rawdata, j)    # ]>  (MS Office)
        else:
            raise AssertionError(
                'unknown status keyword %r in marked section'
                % rawdata[j:m.end()])
        if not match:
            return -1
        return match.end()
    if rawdata[i + 2:i + 9].lower() == 'doctype':
        gtpos = rawdata.find('>', i + 9)
        if gtpos == -1:
            return -1
        return gtpos + 1
    # bogus comment (also covers the empty declaration '<!>')
    pos = rawdata.find('>', i + 2)
    if pos == -1:
        return -1
    return pos + 1


def _fast_feed(p: "_BlockParser", rawdata: str) -> None:
    """Drive ``p``'s handle_starttag/handle_endtag/handle_data with the
    identical event stream ``p.feed(rawdata); p.close()`` would emit."""
    n = len(rawdata)
    i = 0
    handle_data = p.handle_data
    handle_starttag = p.handle_starttag
    handle_endtag = p.handle_endtag
    find = rawdata.find
    startswith = rawdata.startswith
    cdata_elem = None            # 'script'/'style' while in CDATA mode
    cdata_close = None           # its compiled ``</\s*elem\s*>`` pattern
    while i < n:
        if cdata_close is None:
            j = find('<', i)
            if j < 0:
                j = n
        else:
            m = cdata_close.search(rawdata, i)
            if m is None:
                return  # unclosed <script>/<style> swallows the tail
            j = m.start()
        if i < j:
            handle_data(unescape(rawdata[i:j]) if cdata_close is None
                        else rawdata[i:j])
        i = j
        if i == n:
            break
        # rawdata[i] == '<'; dispatch exactly like goahead
        nxt = rawdata[i + 1] if i + 1 < n else ''
        if 'a' <= nxt <= 'z' or 'A' <= nxt <= 'Z':
            # -- start tag: check_for_whole_start_tag + parse_starttag
            j2 = _LOCATESTART.match(rawdata, i).end()
            ch = rawdata[j2:j2 + 1]
            endpos = -1
            if ch == '>':
                endpos = j2 + 1
            elif ch == '/':
                if startswith('/>', j2):
                    endpos = j2 + 2
                # lone '/': incomplete (stdlib "buffer boundary")
            elif ch == '' or ch in _ASCII_EQ_SLASH:
                pass  # incomplete: EOF in tag, or inside attribute value
            else:
                endpos = j2 if j2 > i else i + 1
            if endpos >= 0:
                tm = _TAGFIND.match(rawdata, i + 1)
                k2 = tm.end()
                while k2 < endpos:  # attr ends decide tag-vs-data only
                    am = _ATTRFIND.match(rawdata, k2)
                    if not am:
                        break
                    k2 = am.end()
                end = rawdata[k2:endpos].strip()
                if end not in ('>', '/>'):
                    handle_data(rawdata[i:endpos])  # raw, per stdlib
                    i = endpos
                    continue
                tag = tm.group(1).lower()
                handle_starttag(tag, _NO_ATTRS)
                if end == '/>':
                    handle_endtag(tag)  # handle_startendtag default
                elif tag == 'script' or tag == 'style':
                    cdata_elem = tag
                    cdata_close = _CDATA_CLOSE[tag]
                i = endpos
                continue
        elif nxt == '/':
            # -- end tag: parse_endtag
            m = _ENDENDTAG.search(rawdata, i + 1)
            if m:
                gtpos = m.end()
                m2 = _ENDTAGFIND.match(rawdata, i)
                if m2:
                    elem = m2.group(1).lower()
                    if cdata_close is not None and elem != cdata_elem:
                        handle_data(rawdata[i:gtpos])
                    else:
                        handle_endtag(elem)
                        cdata_elem = cdata_close = None
                    i = gtpos
                    continue
                if cdata_close is not None:
                    handle_data(rawdata[i:gtpos])
                    i = gtpos
                    continue
                nm = _TAGFIND.match(rawdata, i + 2)
                if nm:
                    # '>' after the name decides the end (stdlib note:
                    # "not 100% correct" for </tag attr=">"> — mirrored)
                    gtpos = find('>', nm.end())
                    handle_endtag(nm.group(1).lower())
                    i = gtpos + 1
                    continue
                if rawdata[i:i + 3] == '</>':
                    i += 3
                    continue
                pos = find('>', i + 2)  # bogus comment, content ignored
                if pos >= 0:
                    i = pos + 1
                    continue
            # else: incomplete -> fallback below
        elif startswith('<!--', i):
            m = _COMMENTCLOSE.search(rawdata, i + 4)
            if m:
                i = m.end()  # comment content has no consumer
                continue
        elif nxt == '?':
            m = _PICLOSE.search(rawdata, i + 2)
            if m:
                i = m.end()  # PI content has no consumer
                continue
        elif nxt == '!':
            k = _fast_html_declaration(rawdata, i, n)
            if k >= 0:
                i = k
                continue
        elif i + 1 < n:
            handle_data('<')
            i += 1
            continue
        else:
            handle_data('<')  # lone '<' at EOF: close() flushes it
            break
        # -- incomplete construct: goahead's end=1 consume-to-'>' fallback
        k = find('>', i + 1)
        if k < 0:
            k = find('<', i + 1)
            if k < 0:
                k = i + 1
        else:
            k += 1
        handle_data(unescape(rawdata[i:k]) if cdata_close is None
                    else rawdata[i:k])
        i = k


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
        if _FAST_TOKENIZER:
            # event-stream-identical fast tokenizer (see block comment
            # above _fast_feed; parity pinned by
            # tests/test_html_fast_tokenizer.py)
            _fast_feed(parser, html_text)
        else:  # stdlib-internals drift: the parser itself is the spec
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
