"""Fuzz: the kernel must NEVER raise — at 10^12 documents every
malformed byte sequence occurs; errors must become envelope rows
(app.py:387-419 semantics), not task failures."""

from hypothesis import given, settings
from hypothesis import strategies as st

from khl_pdf_ocr_spark.refkernel.html import extract_html_text, strip_boilerplate
from khl_pdf_ocr_spark.refkernel.kernel import extract_document

RESULT_KEYS = {"ok", "engine", "match", "referees", "goalies",
               "extracted_text", "error", "detail"}


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_kernel_never_raises_on_random_bytes(payload):
    res = extract_document("https://fuzz.test/x", payload)
    assert set(res) == RESULT_KEYS
    assert isinstance(res["ok"], bool)
    assert isinstance(res["extracted_text"], str)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_kernel_never_raises_on_pdf_prefixed_garbage(payload):
    res = extract_document("u", b"%PDF-1.4\n" + payload)
    assert set(res) == RESULT_KEYS
    if not res["ok"]:
        assert res["error"] == "pdf_open_error"


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2048))
def test_kernel_handles_arbitrary_text_payloads(text):
    res = extract_document("u", ("<html><body>" + text + "</body></html>").encode())
    assert res["engine"] == "html"
    assert isinstance(res["extracted_text"], str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=4096))
def test_stripper_never_raises(html):
    out = strip_boilerplate(html)
    assert isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_html_bytes_entry_never_raises(payload):
    assert isinstance(extract_html_text(payload), str)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="<>/ab c=\"'!-&;#x41пр", min_size=0, max_size=512))
def test_stripper_handles_malformed_markup(soup):
    assert isinstance(strip_boilerplate(soup), str)


def test_bpe_token_count_fuzz_three_engines(spark):
    """Seeded random-string fuzz: Spark (Java regex) must agree with
    Python `re` on BPE_TOKEN_RE match counts — a third engine besides
    the DuckDB/RE2 boundary cases, over one batched DataFrame (per-
    example Spark jobs would be prohibitively slow)."""
    import random
    import re as _re

    from pyspark.sql import functions as F

    from khl_pdf_ocr_spark.functions.text import (BPE_TOKEN_RE,
                                                  bpe_token_count)

    rng = random.Random(29)
    alphabet = ("abcXYZ привёт ЁЖ 0123456789 .,!?;:-_()[]'\"/\\\t\n\r "
                "«»№%$#@^&*+=~`|<>")
    cases = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
             for _ in range(300)]
    pat = _re.compile(BPE_TOKEN_RE)
    want = [len(pat.findall(c)) for c in cases]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               ["i", "t"])
    got = {r["i"]: r["n"] for r in
           df.select("i", bpe_token_count(F.col("t")).alias("n")).collect()}
    bad = [(cases[i], got[i], want[i]) for i in range(len(cases))
           if got[i] != want[i]]
    assert not bad, bad[:3]


def test_resize_ppm_conserves_brightness():
    """Box-average resize must conserve mean brightness when the target
    divides the source (every source pixel lands in exactly one box)."""
    import random

    from khl_pdf_ocr_spark.operators.multimodal import decode_ppm, resize_ppm

    rng = random.Random(7)
    w, h = 16, 12
    px = bytes(rng.randrange(256) for _ in range(w * h * 3))
    src = b"P6\n%d %d\n255\n" % (w, h) + px
    _, _, out = decode_ppm(resize_ppm(src, 4, 3))
    mean_in = sum(px) / len(px)
    mean_out = sum(out) / len(out)
    # floor-per-box rounding can only bias down, by < 1 level
    assert 0 <= mean_in - mean_out < 1.0
