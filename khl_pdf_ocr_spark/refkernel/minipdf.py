"""minipdf — a minimal, dependency-free PDF writer and word extractor.

The execution environment has no PyMuPDF/poppler, so the pipeline needs
its own deterministic PDF codec for fixtures and extraction.  The writer
emits structurally valid PDF 1.4 (header, numbered objects, page tree,
content streams, xref, trailer); the reader parses content streams and
reconstructs the per-word tuples the layout kernel consumes.

Reader output matches the shape of PyMuPDF's ``page.get_text("words")``
(see reference ``/root/reference/app.py:92``): 8-tuples
``(x0, y0, x1, y1, text, block_no, line_no, word_no)`` with a TOP-DOWN
y axis (PDF device space is bottom-up; we flip against the MediaBox
height, which is what MuPDF does too).

Supported content-stream subset (what the writer emits, plus a little
slack for robustness): ``BT/ET``, ``Tf``, ``Td``, ``TD``, ``Tm``, ``T*``,
``Tj`` with literal ``( )`` and hex ``< >`` strings.  Cyrillic text is
carried as UTF-8 bytes inside hex strings (unambiguous, no escaping).
Streams may be ``/FlateDecode``-compressed (stdlib zlib).

If PyMuPDF happens to be installed (real-world deployment), the kernel
prefers it for arbitrary wild PDFs — see ``kernel.pdf_words``.
"""

from __future__ import annotations

import re
import binascii
import zlib

__all__ = ["MiniPdfError", "PdfWriter", "build_game_sheet_pdf", "extract_words"]

DEFAULT_PAGE_W = 595.0
DEFAULT_PAGE_H = 842.0

# Approximate glyph metrics for the bbox model.  Both writer and reader
# use the same constants, so round-trips are exact by construction.
ASCENT = 0.8  # fraction of font size above the baseline
CHAR_W = 0.5  # average advance width as a fraction of font size


class MiniPdfError(ValueError):
    """Raised when bytes cannot be parsed as a (mini)PDF document."""


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


class PdfWriter:
    """Builds a single-page PDF from absolutely-positioned words.

    ``add_word(x, y_top, text, size)`` places a word so that the reader
    recovers exactly ``(x0=x, y0=y_top)`` for it.  Coordinates use the
    top-down convention of the layout kernel.
    """

    def __init__(self, page_w: float = DEFAULT_PAGE_W, page_h: float = DEFAULT_PAGE_H,
                 compress: bool = False):
        self.page_w = float(page_w)
        self.page_h = float(page_h)
        self.compress = compress
        self._pages: list[list[bytes]] = [[]]
        self._pad = 0

    def new_page(self) -> None:
        """Start another page (the reference only ever reads page 0 —
        multipage fixtures exercise exactly that restriction)."""
        self._pages.append([])

    def add_word(self, x: float, y_top: float, text: str, size: float = 10.0) -> None:
        # reader computes y_top = page_h - baseline - ASCENT*size  =>  invert here
        baseline = self.page_h - float(y_top) - ASCENT * float(size)
        hex_text = text.encode("utf-8").hex().upper()
        self._pages[-1].append(
            b"BT /F1 %s Tf %s %s Td <%s> Tj ET"
            % (_num(size), _num(x), _num(baseline), hex_text.encode("ascii"))
        )

    def add_padding(self, n_bytes: int) -> None:
        """Inflate the file with an inert stream (size-skew fixtures)."""
        self._pad = max(self._pad, int(n_bytes))

    def tobytes(self) -> bytes:
        n_pages = len(self._pages)
        font_obj = 3 + 2 * n_pages
        kids = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(n_pages))
        objs: list[bytes] = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages),
        ]
        for i, ops in enumerate(self._pages):
            content = b"\n".join(ops) + b"\n"
            filt = b""
            if self.compress:
                content = zlib.compress(content, 6)
                filt = b" /Filter /FlateDecode"
            objs.append(
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %s %s] "
                b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
                % (_num(self.page_w), _num(self.page_h), 4 + 2 * i, font_obj))
            objs.append((b"<< /Length %d%s >>\nstream\n" % (len(content), filt))
                        + content + b"\nendstream")
        objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        if self._pad:
            # incompressible deterministic filler so parquet/snappy cannot
            # shrink the oversize fixtures back down
            filler = zlib.compress(bytes((i * 2654435761) % 256 for i in range(self._pad)), 0)
            objs.append((b"<< /Length %d >>\nstream\n" % len(filler)) + filler + b"\nendstream")

        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = []
        for i, body in enumerate(objs, start=1):
            offsets.append(len(out))
            out += b"%d 0 obj\n" % i
            out += body
            out += b"\nendobj\n"
        xref_at = len(out)
        out += b"xref\n0 %d\n" % (len(objs) + 1)
        out += b"0000000000 65535 f \n"
        for off in offsets:
            out += b"%010d 00000 n \n" % off
        out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
                % (len(objs) + 1, xref_at))
        return bytes(out)


def _num(v: float) -> bytes:
    s = ("%.3f" % float(v)).rstrip("0").rstrip(".")
    return (s or "0").encode("ascii")


def build_game_sheet_pdf(words: list[tuple[float, float, str, float]], *,
                         page_w: float = DEFAULT_PAGE_W, page_h: float = DEFAULT_PAGE_H,
                         compress: bool = False, pad_bytes: int = 0) -> bytes:
    """Convenience wrapper: words are ``(x, y_top, text, font_size)``."""
    w = PdfWriter(page_w, page_h, compress=compress)
    for x, y, t, size in words:
        w.add_word(x, y, t, size)
    if pad_bytes:
        w.add_padding(pad_bytes)
    return w.tobytes()


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]")
_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)

# content-stream tokens we understand
_TOK_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"   # literal string
    rb"|<[0-9A-Fa-f\s]*>"      # hex string
    rb"|/[^\s/<>()\[\]]+"      # name
    rb"|[-+]?\d*\.?\d+"        # number
    rb"|\[|\]"
    rb"|[A-Za-z'*\"]+",        # operator
    re.S,  # '\\.' must match a backslash-newline line continuation
)

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
            b"(": b"(", b")": b")", b"\\": b"\\"}

# fast path: the exact op sequence our writer emits per word.  Streams
# composed solely of these ops skip the general tokenizer (~4× faster);
# anything else falls back to the full token scan.
_FAST_WORD_RE = re.compile(
    rb"BT /F1 ([\d.]+) Tf ([-\d.]+) ([-\d.]+) Td <([0-9A-Fa-f]*)> Tj ET")


def _decode_literal(tok: bytes) -> bytes:
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i:i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt in b"\r\n":  # line continuation: drop backslash AND eol
                i += 2
                if nxt == b"\r" and body[i:i + 1] == b"\n":
                    i += 1
                continue
            if nxt in b"01234567":  # octal escape, up to 3 OCTAL digits
                j = i + 1
                while j < min(i + 4, len(body)) and body[j:j + 1] in b"01234567":
                    j += 1
                out.append(int(body[i + 1:j], 8) & 0xFF)
                i = j
                continue
            # PDF spec: backslash before any other char is ignored
            # (e.g. '\8' is just '8')
            i += 1
            continue
        out += c
        i += 1
    return bytes(out)


def _decode_hex(tok: bytes) -> bytes:
    h = re.sub(rb"\s+", b"", tok[1:-1])
    if len(h) % 2:
        h += b"0"
    return binascii.unhexlify(h)  # == bytes.fromhex; input is whitespace-free


_PAGE_OBJ_RE = re.compile(
    rb"(\d+)\s+\d+\s+obj\s*<<(?:(?!endobj).)*?/Type\s*/Page\b(?:(?!endobj).)*?>>", re.S)
# /Contents may be a single indirect ref or an ARRAY of refs
_CONTENTS_VAL_RE = re.compile(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_OBJ_STREAM_RE_TMPL = rb"(?<![0-9])%d\s+\d+\s+obj\s*<<(.*?)>>\s*stream\r?\n(.*?)endstream"
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")


def _obj_region(data: bytes, num: int) -> bytes | None:
    m = re.search(rb"(?<![0-9])%d\s+\d+\s+obj\b(.*?)endobj" % num, data, re.S)
    return m.group(1) if m else None


def _inflate(body: bytes) -> bytes:
    """Flate-decompress a stream body robustly: ``decompressobj`` stops
    at the end of the deflate stream and ignores any trailing EOL bytes,
    so the 1-in-256 streams whose compressed data itself ends in 0x0A
    survive the endstream-EOL ambiguity (PDF writers may or may not emit
    an EOL before ``endstream``)."""
    d = zlib.decompressobj()
    out = d.decompress(body)
    return out + d.flush()


# object streams (/Type /ObjStm): modern writers pack the catalog/page
# DICTIONARIES inside a compressed stream — header = /N pairs of
# "objnum offset", bodies start at /First.  Content STREAMS can never
# live inside one (PDF 32000-1 §7.5.7), so this only matters for the
# page-tree resolution, never for the text-stream scan.
_OBJSTM_RE = re.compile(
    rb"<<((?:(?!stream).)*?/Type\s*/ObjStm(?:(?!stream).)*?)>>\s*stream\r?\n"
    rb"(.*?)endstream", re.S)


def _objstm_objects(data: bytes) -> dict[int, bytes]:
    """num → body for every object packed in /ObjStm streams."""
    out: dict[int, bytes] = {}
    for m in _OBJSTM_RE.finditer(data):
        sdict, body = m.group(1), m.group(2)
        if body.endswith(b"\n"):
            body = body[:-1]
        if b"/FlateDecode" in sdict:
            try:
                body = _inflate(body)
            except zlib.error:
                continue
        nm = re.search(rb"/N\s+(\d+)", sdict)
        fm = re.search(rb"/First\s+(\d+)", sdict)
        if not (nm and fm):
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        header = body[:first].split()
        if len(header) < 2 * n:
            continue
        try:
            pairs = [(int(header[2 * i]), int(header[2 * i + 1]))
                     for i in range(n)]
        except ValueError:
            continue
        for i, (num, off) in enumerate(pairs):
            end = first + pairs[i + 1][1] if i + 1 < n else len(body)
            out[num] = body[first + off:end]
    return out


def _first_page_obj(data: bytes) -> bytes | None:
    """'Page 0' = Kids[0] of the /Root → /Pages tree — NOT the first
    /Type /Page object in file byte order (objects may be serialized in
    any order).  Descends intermediate /Pages nodes by their first kid.
    Tree nodes may live in /ObjStm streams (parsed lazily, only when a
    direct object lookup misses).  Returns the page object's region, or
    None when unresolvable."""
    objstm: dict[int, bytes] | None = None

    def resolve(num: int) -> bytes | None:
        nonlocal objstm
        r = _obj_region(data, num)
        if r is not None:
            return r
        if objstm is None:
            objstm = _objstm_objects(data)
        return objstm.get(num)

    rm = _ROOT_RE.search(data)
    if not rm:
        return None
    cat = resolve(int(rm.group(1)))
    if not cat:
        return None
    pm = _PAGES_REF_RE.search(cat)
    if not pm:
        return None
    node = resolve(int(pm.group(1)))
    for _ in range(32):  # depth guard against reference cycles
        if node is None:
            return None
        km = _KIDS_RE.search(node)
        if not km:  # leaf — must be an actual /Page
            return node if re.search(rb"/Type\s*/Page\b", node) else None
        refs = _REF_RE.findall(km.group(1))
        if not refs:
            return None
        node = resolve(int(refs[0]))
    return None


def _first_page_stream(data: bytes) -> bytes | None:
    """Resolve the FIRST page's /Contents stream(s) via the page tree.

    The reference processes page 0 only (``pno=0`` at app.py:67,86 and
    every call site) — a multipage document must NOT leak later pages'
    words into the layout.  Page 0 is resolved through /Root → /Pages →
    Kids[0]; the first-/Page-in-file-order heuristic is only the
    fallback when the tree is unresolvable.  Handles both the single-ref
    and the array form of /Contents (multiple streams are concatenated
    in order).

    Return contract: a TREE-resolved page is AUTHORITATIVE — a blank
    first page (no /Contents, legal per spec) or an unreadable content
    ref returns b"" (zero words), NEVER None; falling through to the
    all-streams scan there would leak later pages' text into page 0.
    None means the page truly could not be identified (no tree AND no
    /Page object) → caller's best-effort scan."""
    from_tree = True
    page = _first_page_obj(data)
    if page is None:
        from_tree = False
        pm = _PAGE_OBJ_RE.search(data)
        page = pm.group(0) if pm else None
    if page is None:
        return None

    def _unresolved():
        return b"" if from_tree else None

    cval = _CONTENTS_VAL_RE.search(page)
    if not cval:
        return _unresolved()
    parts = []
    for ref in _REF_RE.findall(cval.group(1)):
        sm = re.search(_OBJ_STREAM_RE_TMPL % int(ref), data, re.S)
        if not sm:
            return _unresolved()
        sdict, body = sm.group(1), sm.group(2)
        if body.endswith(b"\n"):
            body = body[:-1]
        if b"/FlateDecode" in sdict:
            try:
                body = _inflate(body)
            except zlib.error:
                return _unresolved()
        parts.append(body)
    if not parts:
        return _unresolved()
    return b"\n".join(parts)


def extract_words(pdf_bytes: bytes):
    """Parse a PDF and return MuPDF-shaped word tuples for PAGE 0 ONLY
    (top-down y) — mirroring the reference's single-page restriction
    (app.py:67,86).

    Raises :class:`MiniPdfError` on anything that is not a parseable
    PDF — mirrored by the pipeline as a per-row ``pdf_open_error``
    envelope (reference behavior: ``app.py:399-401``).
    """
    if not isinstance(pdf_bytes, (bytes, bytearray)) or not bytes(pdf_bytes).startswith(b"%PDF-"):
        raise MiniPdfError("not a PDF: missing %PDF- header")
    data = bytes(pdf_bytes)

    m = _MEDIABOX_RE.search(data)
    page_h = float(m.group(4)) if m else DEFAULT_PAGE_H

    first = _first_page_stream(data)
    if first is not None:
        # the page tree resolved: page 0's content is AUTHORITATIVE —
        # a textless first page yields zero words (never fall through to
        # the all-streams scan, which would leak later pages' text)
        if b"BT" not in first:
            return []
        streams = [first]
    else:
        # fallback: page tree unresolvable → best-effort over all text
        # streams (single-page writers without /Page objects, tests)
        streams = []
        for sm in _STREAM_RE.finditer(data):
            sdict, body = sm.group(1), sm.group(2)
            if body.endswith(b"\n"):
                body = body[:-1]
            if b"/FlateDecode" in sdict:
                try:
                    body = _inflate(body)
                except zlib.error:
                    continue  # non-content stream (e.g. padding); skip
            if b"BT" in body:
                streams.append(body)
    if not streams:
        # a structurally-valid PDF with no text layer is NOT an error:
        # MuPDF opens it and returns zero words (→ ok=true with empty
        # extraction, matching reference semantics); only documents
        # with no parseable PDF structure at all raise
        if _PAGE_OBJ_RE.search(data) or b"endobj" in data:
            return []
        raise MiniPdfError("no text content stream found")

    words = []
    block_no = -1
    for stream in streams:
        # fast path: uniform writer-emitted word ops
        matches = _FAST_WORD_RE.findall(stream)
        if matches and len(matches) == stream.count(b"BT"):
            for size_b, x_b, y_b, hex_b in matches:
                block_no += 1
                size, x, y = float(size_b), float(x_b), float(y_b)
                # unhexlify == fromhex here (the regex admits no
                # whitespace) minus a per-word ASCII decode
                text = binascii.unhexlify(hex_b).decode(
                    "utf-8", errors="replace").strip()
                if not text:
                    continue
                y_top = page_h - y - ASCENT * size
                words.append((x, y_top, x + CHAR_W * size * len(text),
                              y_top + size, text, block_no, 0, 0))
            continue
        size = 10.0
        x = y = 0.0
        line_start_x = 0.0
        leading = 0.0
        stack: list[bytes] = []
        in_text = False
        line_no = 0
        word_no = 0
        for tok in _TOK_RE.finditer(stream):
            t = tok.group(0)
            c = t[:1]
            if c in b"(<" or c in b"+-.0123456789" or c == b"/":
                stack.append(t)
                continue
            if t == b"[" or t == b"]":
                continue
            # operator
            if t == b"BT":
                in_text = True
                block_no += 1
                line_no = 0
                word_no = 0
                x = y = 0.0
                line_start_x = 0.0
                stack.clear()
            elif t == b"ET":
                in_text = False
                stack.clear()
            elif t == b"Tf":
                if stack:
                    try:
                        size = float(stack[-1])
                    except ValueError:
                        pass
                stack.clear()
            elif t == b"Td" or t == b"TD":
                if len(stack) >= 2:
                    try:
                        dx, dy = float(stack[-2]), float(stack[-1])
                        x += dx
                        y += dy
                        line_start_x = x
                        if t == b"TD":
                            leading = -dy
                    except ValueError:
                        pass
                stack.clear()
            elif t == b"Tm":
                if len(stack) >= 6:
                    try:
                        x = float(stack[-2])
                        y = float(stack[-1])
                        line_start_x = x
                    except ValueError:
                        pass
                stack.clear()
            elif t == b"T*":
                y -= leading
                x = line_start_x
                line_no += 1
                stack.clear()
            elif t == b"TL":
                if stack:
                    try:
                        leading = float(stack[-1])
                    except ValueError:
                        pass
                stack.clear()
            elif t == b"Tj" or t == b"TJ" or t == b"'":
                if t == b"'":  # move-to-next-line-and-show
                    y -= leading
                    x = line_start_x
                    line_no += 1
                if t == b"TJ":
                    # array form: concatenate string elements, ignore the
                    # numeric kerning adjustments
                    parts = [(_decode_hex(s) if s[:1] == b"<" else _decode_literal(s))
                             for s in stack if s[:1] in (b"(", b"<")]
                    text_bytes = b"".join(parts)
                else:
                    raw = stack[-1] if stack else b"()"
                    text_bytes = _decode_hex(raw) if raw[:1] == b"<" else _decode_literal(raw)
                text = text_bytes.decode("utf-8", errors="replace").strip()
                if in_text and text:
                    y_top = page_h - y - ASCENT * size
                    x1 = x + CHAR_W * size * len(text)
                    words.append((x, y_top, x1, y_top + size, text,
                                  block_no, line_no, word_no))
                    word_no += 1
                stack.clear()
            else:
                stack.clear()
    return words
