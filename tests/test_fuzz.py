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
