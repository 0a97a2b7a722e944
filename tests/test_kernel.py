"""Dispatch kernel: magic bytes, error envelopes, url parsing."""

import json

from khl_pdf_ocr_spark.refkernel import minipdf
from khl_pdf_ocr_spark.refkernel.kernel import (extract_document,
                                                parse_season_uid,
                                                result_to_json)

PDF_URL = "https://x.test/pdf/1369/897689/game-897689-start-ru.pdf"


def _mini_pdf():
    return minipdf.build_game_sheet_pdf([
        (40.0, 40.0, "Дата", 10.0), (80.0, 40.0, "15.09.2025", 10.0),
        (150.0, 40.0, "19:30", 10.0),
        (40.0, 70.0, "ХК", 13.0), (70.0, 70.0, "АВАНГАРД", 13.0),
        (320.0, 70.0, "МЕТАЛЛУРГ", 13.0), (420.0, 70.0, "МАГНИТОГОРСК", 13.0),
        (40.0, 400.0, "конец", 10.0), (320.0, 400.0, "конец", 10.0),
    ])


def test_parse_season_uid():
    assert parse_season_uid(PDF_URL) == ("1369", "897689")
    assert parse_season_uid("https://x.test/html/5") == ("", "")
    assert parse_season_uid("") == ("", "")


def test_pdf_dispatch_and_shape():
    res = extract_document(PDF_URL, _mini_pdf(), mode="all")
    assert res["ok"] and res["engine"] == "all"
    assert res["match"]["season"] == "1369" and res["match"]["uid"] == "897689"
    assert res["match"]["date"] == "15.09.2025"
    assert res["match"]["time_msk"] == "19:30"
    assert res["extracted_text"].startswith("Дата 15.09.2025 19:30")
    assert set(res) == {"ok", "engine", "match", "referees", "goalies",
                        "extracted_text", "error", "detail"}


def test_modes_words_refs_goalies():
    pdf = _mini_pdf()
    words = extract_document(PDF_URL, pdf, mode="words")
    assert words["engine"] == "words"
    refs = extract_document(PDF_URL, pdf, mode="refs")
    assert refs["engine"] == "ocr-refs"
    gk = extract_document(PDF_URL, pdf, mode="gk")
    assert gk["engine"] == "gk"
    # every mode carries the byte-identity field
    assert words["extracted_text"] == refs["extracted_text"] == gk["extracted_text"]


def test_html_dispatch():
    html = (b"<!DOCTYPE html><html><body><p>" +
            ("достаточно длинный основной текст страницы " * 4).encode() +
            b"</p></body></html>")
    res = extract_document("https://x.test/h", html)
    assert res["ok"] and res["engine"] == "html"
    assert "длинный основной текст" in res["extracted_text"]


def test_plain_text_dispatch():
    res = extract_document("https://x.test/t", "строка один\n\n  строка   два \n".encode())
    assert res["engine"] == "text"
    assert res["extracted_text"] == "строка один\nстрока два"


def test_corrupt_pdf_envelope():
    res = extract_document("u", b"%PDF-1.4\nbroken")
    assert res["ok"] is False and res["error"] == "pdf_open_error"
    assert res["extracted_text"] == ""


def test_unknown_binary_envelope():
    res = extract_document("u", b"\x89PNG\r\n\x1a\n" + bytes(range(256)))
    assert res["ok"] is False and res["error"] == "unsupported_format"


def test_null_payload_envelope():
    res = extract_document("u", None)
    assert res["ok"] is False and res["error"] == "download_error"


def test_result_json_utf8_no_escapes():
    res = extract_document(PDF_URL, _mini_pdf())
    j = result_to_json(res)
    assert "АВАНГАРД" in j  # ensure_ascii=False (app.py:417)
    assert "\\u" not in j
    parsed = json.loads(j)
    assert "extracted_text" not in parsed


def test_textless_pdf_is_ok_with_empty_extraction():
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Page /MediaBox [0 0 595 842] >>\nendobj\n"
           b"%%EOF\n")
    res = extract_document("u", pdf)
    assert res["ok"] is True and res["engine"] == "all"
    assert res["extracted_text"] == ""
    assert res["referees"] == {"main": [], "linesmen": []}


def test_plain_text_mentioning_html_markup_stays_text():
    body = ("первая строка обычного текста\n"
            "в учебнике упоминается тег <body> и даже <html> посреди текста\n"
            "третья строка").encode()
    res = extract_document("u", body)
    assert res["engine"] == "text"
    assert "третья строка" in res["extracted_text"]


def _pdf_payloads(n=40, seed=42):
    from khl_pdf_ocr_spark.fixtures.gen import generate_rows

    return [(r["url"], r["html"]) for r in generate_rows(n, seed)
            if r["html"][:5] == b"%PDF-" and "/pdf/" in r["url"]]


def test_debug_threading_refs_mode():
    """debug=1 parity (app.py:263-267): refs mode surfaces the raw
    referee names line on a fixture where the header IS on the page;
    header-miss fixtures surface the note instead."""
    import json as _json

    from khl_pdf_ocr_spark.refkernel.kernel import extract_document, result_to_json

    seen_raw = seen_note = False
    for url, payload in _pdf_payloads():
        res = extract_document(url, payload, mode="refs", debug=True)
        dbg = res["_debug"]
        if res["referees"]["main"]:
            assert dbg["raw_ref_line"]  # the names line, verbatim
            # golden-style check: the raw line contains the first name
            assert res["referees"]["main"][0].split()[0] in dbg["raw_ref_line"]
            seen_raw = True
        elif "note" in dbg:
            assert dbg["note"] == "ref header not found"
            seen_note = True
        # the debug dict rides inside result_json like the JSON response
        assert _json.loads(result_to_json(res))["_debug"] == dbg
        # debug off → key absent (golden shape unchanged)
        assert "_debug" not in extract_document(url, payload, mode="refs")
    assert seen_raw and seen_note  # both fixture classes exercised


def test_debug_threading_all_mode_capability_flag():
    from khl_pdf_ocr_spark.refkernel.kernel import HAS_TESSERACT, extract_document

    url, payload = _pdf_payloads(5)[0]
    res = extract_document(url, payload, mode="all", debug=True)
    assert res["_debug"] == {"has_tesseract": HAS_TESSERACT}
