"""Event-stream parity of the r6 fast HTML tokenizer (html._fast_feed).

The contract: for every input, ``_fast_feed(p, s)`` drives ``p``'s
``handle_starttag`` (tag name) / ``handle_endtag`` / ``handle_data``
with the IDENTICAL event sequence — chunk boundaries included — that
``p.feed(s); p.close()`` would produce under the stdlib parser with
``convert_charrefs=True``; and it raises exactly when the stdlib
raises (``strip_boilerplate`` catches either and takes its regex-strip
fallback, so raise-parity is output parity for that branch).
"""

from __future__ import annotations

import random

import pytest
from html.parser import HTMLParser

from khl_pdf_ocr_spark.refkernel import html as H


def test_fast_tokenizer_is_active():
    # this environment's stdlib exposes the internals the fast path
    # needs; if this ever flips, strip_boilerplate silently (and
    # correctly) degrades to the stdlib parser — but the bench claims
    # in OPTIMIZATION_r06.md assume the fast path, so pin it
    assert H._FAST_TOKENIZER is True


class _StdRecorder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.events = []

    def handle_starttag(self, tag, attrs):
        self.events.append(("start", tag))

    def handle_endtag(self, tag):
        self.events.append(("end", tag))

    def handle_data(self, data):
        self.events.append(("data", data))


class _FastRecorder:
    def __init__(self):
        self.events = []

    def handle_starttag(self, tag, attrs):
        self.events.append(("start", tag))

    def handle_endtag(self, tag):
        self.events.append(("end", tag))

    def handle_data(self, data):
        self.events.append(("data", data))


def _std(s):
    r = _StdRecorder()
    try:
        r.feed(s)
        r.close()
        return ("ok", r.events)
    except Exception as e:  # raise-parity: compare exception class
        return ("raise", type(e).__name__)


def _fast(s):
    r = _FastRecorder()
    try:
        H._fast_feed(r, s)
        return ("ok", r.events)
    except Exception as e:
        return ("raise", type(e).__name__)


ADVERSARIAL = [
    # plain data + charrefs (converted, partial, bogus, trailing)
    "<p>hello &amp; goodbye</p>",
    "a &amp b &#65; &#x41; &bogus; &",
    "tail & near end &gt",
    "&#9731;<b>snow</b>",
    "<b>&unknown;</b>",
    # attribute quirks: '>' inside quotes, mismatched quotes, bare
    # values, unclosed values, junk between attrs
    "<div class='x' onclick=\"a>b\">text</div>",
    "<a href=\"x>y\">t</a>",
    "<a foo@bar>t</a>",
    "<a foo='bar'baz>u</a>",
    "<a =>w",
    "<p attr='unclosed",
    "<a\x00b>v",
    # self-closing and slash forms
    "<br/><img src=x/><span/>t</span>",
    "<a/ >x",
    "<a / >y",
    "<p/",
    "<script/>not cdata</script>",
    # CDATA content mode: script/style, unclosed, near-miss end tags,
    # spaced end tags, case folding
    "<script>var a = '<div>'</script>after",
    "<script>never closed...",
    "<SCRIPT type='t'>x</SCRIPT >tail",
    "<script>a</scripty></script>b",
    "<style>p{}</style><p>ok",
    "<style>@import 'x';",
    # comments / declarations / PIs / marked sections
    "<!-- comment --><p>a</p>",
    "<!-- unterminated",
    "<!-->",
    "<!---->x",
    "<!doctype html><p>d",
    "<!DOCTYPE html\n>x",
    "<![CDATA[ raw <b> ]]>y",
    "<![if !IE]>cond<![endif]>z",
    "<![cdata no close",
    "<![if no close",
    "<![",
    "<!foo>b",
    "<!foo no gt",
    "<!>empty decl",
    "<?php echo '>' ?>w",
    "<?pi no close",
    # end-tag quirks: bare, spaced, attributes, bogus names
    "</>x",
    "</ div>y",
    "</div attr=\">\">z",
    "</@bogus>a",
    "</@bogus no gt",
    # lone/boundary '<'
    "x < y",
    "x <",
    "text<",
    "< p>not a tag</p>",
    "<1tag>no",
    "<",
    ">",
    "&",
    "",
    # implicit closes and nulls
    "<div><p>imp</div>",
    "<td>cell<td>cell2",
    "\x00<p>\x00nul</p>",
    "<p>été &eacute;</p>",
    "<meta charset='utf-8'/><title>T</title>",
]


@pytest.mark.parametrize("case", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
def test_event_parity_adversarial(case):
    assert _fast(case) == _std(case)


def test_raise_parity_malformed_marked_sections():
    # the stdlib raises AssertionError on unknown/garbled marked
    # sections; strip_boilerplate's fallback depends on the fast path
    # raising too
    for s in ("<![unknownkw]]>q", "<![ bad", "<![%]]>"):
        std, fast = _std(s), _fast(s)
        assert std == fast
        assert std[0] == "raise"
        # and the end-to-end output still goes through the regex-strip
        # fallback identically on both paths
        out_fast = H.strip_boilerplate(s)
        H._FAST_TOKENIZER = False
        try:
            out_std = H.strip_boilerplate(s)
        finally:
            H._FAST_TOKENIZER = True
        assert out_fast == out_std


_FRAGMENTS = [
    "<div>", "</div>", "<p class='a b'>", "text ", "&amp;", "&#65;",
    "&#x4G;", "&bogus", "<script>", "</script>", "</script >",
    "<script src='x'>", "<style>", "</style>", "<!--", "-->",
    "<!-- c -->", "<![CDATA[", "]]>", "<![if x]>", "<![endif]>",
    "<![zz]]>", "<?", "?>", "<?pi>", "<!doctype html>", "<!DOCTYPE",
    ">", "<", "</", "<!", "&", ";", "<a href=\"x>y\">", "<a href='x",
    "'", "\"", "<br/>", "<td", " =", "/>", "é", " ", "<b>", "</b>",
    "\n", "x<y", "</ i>", "</>", "<1>", "<a b=c d>", "\x00", "]>",
    "<select>", "</select>", "<option>", "<main>", "<nav>", "<h1>",
    "</h1>", "<title>", "</title>",
]


def test_event_parity_fuzz():
    rng = random.Random(987654321)
    for _ in range(800):
        s = "".join(rng.choice(_FRAGMENTS)
                    for _ in range(rng.randint(1, 30)))
        assert _fast(s) == _std(s), repr(s)


def test_event_parity_attr_soup_fuzz():
    # start-tag parsing is the subtlest surface: tagfind/attrfind/
    # locatestarttagend must agree on where a tag ends or the stdlib
    # degrades the whole tag to data — hammer random attribute soup
    chars = list("abc XYZ='\"/>=<&;-_@$\t\n\x00.")
    rng = random.Random(424242)
    for _ in range(3000):
        body = "".join(rng.choice(chars)
                       for _ in range(rng.randint(0, 25)))
        s = ("pre<" + rng.choice("aA") + body
             + rng.choice([">", "/>", "", ">post", " >x"]))
        assert _fast(s) == _std(s), repr(s)


def test_output_parity_realistic_page():
    page = (
        "<!DOCTYPE html>\n<html><head><title>T &amp; U</title>"
        "<style>.x{color:red}</style><script>if (a<b) { x('</div>'); }"
        "</script></head><body><header><nav><a href='/'>Home</a></nav>"
        "</header><main><h1>Heading</h1>"
        + "".join(f"<p>Paragraph {i} with enough dense running text to "
                  f"clear the density threshold of the extractor easily "
                  f"and stay in the output.</p>" for i in range(20))
        + "<!--[if IE]><p>old ie</p><![endif]-->"
        "</main><footer><p>© <a href='/a'>about</a></p></footer>"
        "</body></html>")
    out_fast = H.strip_boilerplate(page)
    H._FAST_TOKENIZER = False
    try:
        out_std = H.strip_boilerplate(page)
    finally:
        H._FAST_TOKENIZER = True
    assert out_fast == out_std
    assert "Paragraph 7" in out_fast


def test_fixture_corpus_event_and_output_parity():
    # the deterministic fixture generator's html docs — the same
    # recipe the golden corpus uses
    from khl_pdf_ocr_spark.fixtures import gen
    rows = gen.generate_rows(300, seed=99)
    checked = 0
    for row in rows:
        payload = row["html"]
        if payload[:4] == b"%PDF":
            continue
        text = payload.decode(H.detect_charset(payload), errors="replace")
        if "<" not in text[:200]:
            continue
        assert _fast(text) == _std(text)
        out_fast = H.strip_boilerplate(text)
        H._FAST_TOKENIZER = False
        try:
            out_std = H.strip_boilerplate(text)
        finally:
            H._FAST_TOKENIZER = True
        assert out_fast == out_std
        checked += 1
    assert checked > 50  # the mix really contains html docs
