"""Per-document dispatch kernel: bytes → structured extraction result.

One call = one document row.  Dispatches on magic bytes (Common-Crawl
payloads mix PDFs and web pages in one binary column), runs the
appropriate extractor, and ALWAYS returns the same result shape — errors
become data (``ok=False`` + error class), never exceptions, mirroring
the reference's HTTP error envelopes (``app.py:387-419``) so that a
corrupt document can never fail a Spark task.

Result dict (fixed key order — ``result_json`` is part of the golden
fixtures, rendered with ``ensure_ascii=False`` like app.py:417):

    ok, engine, match{season,uid,date,time_msk,teams{home,away}},
    referees{main,linesmen}, goalies{home,away}[{name,flag}],
    extracted_text, error, detail
"""

from __future__ import annotations

import json
import re

from khl_pdf_ocr_spark.refkernel import html as htmlmod
from khl_pdf_ocr_spark.refkernel import minipdf, pdfops

__all__ = ["extract_document", "result_to_json", "parse_season_uid", "pdf_words"]

# url pattern of the reference's source documents (app.py:55-58)
RE_GAME_URL = re.compile(r"/([^/]+)/([^/]+)/game-\2-start-ru\.pdf$")

_EMPTY_MATCH = {"season": "", "uid": "", "date": "", "time_msk": "",
                "teams": {"home": "", "away": ""}}

try:  # real-world backend for wild PDFs, if present (not in this sandbox)
    import fitz  # type: ignore  # PyMuPDF

    HAS_FITZ = True
except Exception:  # pragma: no cover - environment without PyMuPDF
    fitz = None  # type: ignore
    HAS_FITZ = False

try:  # the reference's tesseract gate (app.py:17-22), for debug parity
    import shutil as _shutil

    import pytesseract  # type: ignore # noqa: F401

    HAS_TESSERACT = _shutil.which("tesseract") is not None
except Exception:  # pragma: no cover
    HAS_TESSERACT = False


def parse_season_uid(url: str) -> tuple[str, str]:
    m = RE_GAME_URL.search(url or "")
    return (m.group(1), m.group(2)) if m else ("", "")


def pdf_words(payload: bytes):
    """PDF bytes → MuPDF-shaped word tuples, page 0 only (app.py:67,86).

    minipdf first (deterministic, dependency-free); PyMuPDF as the
    fallback backend for wild PDFs when installed.
    """
    if HAS_FITZ:
        # full-fidelity backend FIRST when installed: wild PDFs with
        # embedded/CID fonts half-parse under minipdf (glyph-ID hex
        # strings decode to garbage without raising), so minipdf is
        # only the fallback here, not the primary
        try:
            doc = fitz.open(stream=payload, filetype="pdf")
            try:
                return list(doc.load_page(0).get_text("words"))
            finally:
                doc.close()
        except Exception:
            pass  # fall through to minipdf
    try:
        return minipdf.extract_words(payload)
    except minipdf.MiniPdfError:
        raise
    except Exception as e:
        raise minipdf.MiniPdfError(str(e)) from e


def _empty_result(engine: str) -> dict:
    return {
        "ok": True,
        "engine": engine,
        "match": json.loads(json.dumps(_EMPTY_MATCH)),  # deep copy
        "referees": {"main": [], "linesmen": []},
        "goalies": {"home": [], "away": []},
        "extracted_text": "",
        "error": "",
        "detail": "",
    }


def _error_result(error: str, detail: str) -> dict:
    res = _empty_result("error")
    res["ok"] = False
    res["error"] = error
    res["detail"] = detail
    return res


def extract_document(url: str, payload: bytes, mode: str = "all",
                     debug: bool = False) -> dict:
    """The flagship per-document operator.

    mode ∈ {all, words, refs, gk, goalies} mirrors the reference's query
    API (app.py:381-412); every mode also emits ``extracted_text`` (the
    byte-identity gate field applies to every document type).

    ``debug=True`` threads the reference's ``debug=1`` flag
    (app.py:384): refs mode carries ``raw_ref_line`` / header-miss notes
    (app.py:263-267), gk mode the (empty, text-layer) fallback dict
    (app.py:336-341), and mode=all the tesseract capability flag
    (app.py:364-365) — the reference drops sub-extractor debug in
    mode=all, a quirk kept for parity.  The dict lands in the result as
    ``_debug`` and therefore inside ``result_json``, like the JSON
    response.
    """
    if payload is None:
        return _error_result("download_error", "null payload")
    payload = bytes(payload)

    if payload[:5] == b"%PDF-":
        try:
            words8 = pdf_words(payload)
        except Exception as e:  # corrupt PDF → envelope (app.py:399-401)
            return _error_result("pdf_open_error", str(e))
        return _extract_pdf(url, words8, mode, debug)

    # markup must announce itself at the START of the payload — a
    # plain-text document that merely MENTIONS "<body" or "<html"
    # mid-text must not be routed through the boilerplate stripper
    head = payload[:1024].lstrip().lower()
    if head.startswith((b"<!doctype", b"<html", b"<head", b"<body")) \
            or (head.startswith(b"<") and b"<html" in head):
        return _extract_html(payload)

    # plain text (WET-style row): normalize lines, no structure
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        return _error_result("unsupported_format", "binary payload with unknown magic")
    res = _empty_result("text")
    lines = [pdfops.RE_WS.sub(" ", ln).strip() for ln in text.splitlines()]
    res["extracted_text"] = "\n".join(ln for ln in lines if ln)
    return res


def _extract_pdf(url: str, words8, mode: str, debug: bool = False) -> dict:
    # layout reconstruction happens ONCE per document; all sub-extractors
    # fan out from the same parts (fixes the reference's 3× recompute,
    # SURVEY.md §3.1; both steps are pure so semantics are unchanged)
    words = pdfops.sort_project_words(words8)
    lines_all, cols = pdfops.group_words_by_lines_and_cols(words)
    season, uid = parse_season_uid(url)
    res = _empty_result("all")

    if mode == "words":
        res["engine"] = "words"
        res["match"].update(pdfops.find_match_meta(lines_all, cols))
        # season/uid stay EMPTY here: the reference's extract_words
        # response carries only date/time/teams (app.py:182-186);
        # season/uid appear only in mode=all (app.py:359)
    elif mode == "refs":
        main, linesmen, dbg = pdfops.find_ref_lines(lines_all)
        res["engine"] = "ocr-refs"
        res["referees"] = {"main": main, "linesmen": linesmen}
        if debug:  # app.py:265-267
            res["_debug"] = dbg
    elif mode in ("gk", "goalies"):
        res["engine"] = "gk"
        res["goalies"] = {
            "home": pdfops.collect_goalies_from_column(cols["left"]),
            "away": pdfops.collect_goalies_from_column(cols["right"])}
        if debug:  # app.py:340-341 (text path: empty fallback dict)
            res["_debug"] = {}
    else:  # all (default, app.py:411-412)
        sub = pdfops.extract_all_from_parts(lines_all, cols, season, uid)
        res["engine"] = sub["engine"]
        res["match"] = sub["match"]
        res["referees"] = sub["referees"]
        res["goalies"] = sub["goalies"]
        if debug:  # app.py:364-365: capability flag only (quirk kept)
            res["_debug"] = {"has_tesseract": HAS_TESSERACT}

    res["extracted_text"] = "\n".join(lines_all)
    return res


def _extract_html(payload: bytes) -> dict:
    res = _empty_result("html")
    res["extracted_text"] = htmlmod.extract_html_text(payload)
    return res


def result_to_json(res: dict) -> str:
    """Golden-fixture JSON: full result minus the (huge) text payload,
    raw UTF-8 like the reference response (``ensure_ascii=False``,
    app.py:417)."""
    slim = {k: v for k, v in res.items() if k != "extracted_text"}
    return json.dumps(slim, ensure_ascii=False)
