"""OCR second-pass stage: the reference's crop+OCR recipe, end-to-end.

Ports the full fallback logic of the reference extractor (reference
``app.py`` in ``/root/reference``):

- referees (app.py:240-263): rasterize page 0 at 300 dpi, crop the TOP
  THIRD of the page (app.py:242-243), OCR with ``--psm 6`` lang
  ``rus+eng`` (app.py:44,81), re-run the anchor scan over the first 120
  OCR lines, extract overlapping bigram name pairs, and overwrite the
  text-layer result ONLY when OCR yields >= 4 names (app.py:258-260);
- goalies (app.py:311-338): crop the LEFT and RIGHT HALVES of the top
  60 % of the page (integer pixel split, app.py:315-316), OCR each, and
  run the anchor-free per-line name+flag regex (app.py:320-332) —
  applied only when BOTH columns came up empty (app.py:311).

Everything except the raster/OCR engine itself is pure Python, tested
against an injectable fake engine; the real engine (PyMuPDF + Pillow +
tesseract) is environment-gated exactly like the reference's
``HAS_TESSERACT`` guard (app.py:17-22,76-77) — in this sandbox only the
binary deps are missing, never the recipe.

Contract with ``with_ocr_fallback``: the stage emits rows ONLY for
documents the second pass actually improved, so the merge is a plain
anti-join + union with no row-level comparison (the improvement
decision is the reference's own: >= 4 referee names / any goalie found).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator
from typing import Any

import pyarrow as pa
from pyspark.sql import DataFrame

from khl_pdf_ocr_spark.refkernel import pdfops
from khl_pdf_ocr_spark.schemas import (EXTRACT_PA, EXTRACT_PA_DEBUG,
                                       EXTRACT_SCHEMA, EXTRACT_SCHEMA_DEBUG)

__all__ = ["HAS_OCR_ENGINE", "crop_box", "refs_from_ocr_lines",
           "goalies_from_ocr_lines", "default_engine", "make_ocr_stage"]

try:  # optional heavy deps — absent in this sandbox, like tesseract in the ref
    import fitz  # type: ignore
    import pytesseract  # type: ignore
    from PIL import Image, ImageEnhance, ImageFilter  # type: ignore

    HAS_OCR_ENGINE = True
except Exception:  # pragma: no cover
    HAS_OCR_ENGINE = False

# OCR-path referee split (app.py:252): single [,|;] OR whitespace run —
# deliberately DIFFERENT from the text-layer split [,\|;]+|\s+ (app.py:205)
RE_OCR_REF_SPLIT = re.compile(r"[,|;]|\s+")
TESS_LANG = "rus+eng"  # app.py:44
TESS_CONFIG = "--psm 6"  # app.py:81
OCR_DPI = 300  # app.py:242,313


def crop_box(kind: str, width: int, height: int) -> tuple[int, int, int, int]:
    """The reference's exact pixel crop boxes (app.py:242-243,315-316).

    ``refs``     — full width, top third: ``int(height * 0.33)``;
    ``gk_left``  — left half (integer split ``width // 2``), top 60 %;
    ``gk_right`` — right half, top 60 %.
    """
    if kind == "refs":
        return (0, 0, width, int(height * 0.33))
    if kind == "gk_left":
        return (0, 0, width // 2, int(height * 0.6))
    if kind == "gk_right":
        return (width // 2, 0, width, int(height * 0.6))
    raise ValueError(f"unknown crop kind: {kind!r}")


def refs_from_ocr_lines(ocr_lines: list[str]) -> tuple[list[str], list[str], dict]:
    """Referee names from OCR'd top-third lines (app.py:245-260).

    Anchor scan over the first 120 lines for both header phrases; the
    next line is split on ``[,|;]|\\s+``; overlapping adjacent bigram
    pairs of name-shaped tokens; ACCEPT only when >= 4 pairs (else the
    text-layer result stands).  No «Обновлено» strip — the reference's
    OCR path doesn't have one (unlike the text path, app.py:204).
    """
    dbg: dict = {}
    header = -1
    for i, ln in enumerate(ocr_lines[:120]):
        if (pdfops.REF_HEADER_MAIN in ln) and (pdfops.REF_HEADER_LINE in ln):
            header = i
            break
    if header == -1 or header + 1 >= len(ocr_lines):
        return [], [], dbg
    txt = ocr_lines[header + 1]
    parts = [p for p in RE_OCR_REF_SPLIT.split(txt) if p]
    cand = []
    for j in range(len(parts) - 1):
        a, b = parts[j], parts[j + 1]
        if all(pdfops.RE_NAME_TOKEN.match(x) for x in (a, b)):
            cand.append(f"{a} {b}")
    if len(cand) >= 4:
        dbg["ocr_ref_line"] = txt
        return cand[:2], cand[2:4], dbg
    return [], [], dbg


def goalies_from_ocr_lines(lines: list[str]) -> list[dict]:
    """Anchor-free goalie scan of one OCR'd column (app.py:320-332):
    per line, first 2-3-capitalized-word name + standalone С/Р flag."""
    if not lines:
        return []
    out = []
    for ln in lines:
        m = pdfops.RE_GOALIE_NAME.search(ln)
        if not m:
            continue
        flag = "C" if pdfops.RE_FLAG_C.search(ln) else \
            ("R" if pdfops.RE_FLAG_R.search(ln) else "")
        out.append({"name": m.group(1).strip(), "flag": flag})
    return out


# one-slot raster memo: _ocr_document calls the engine up to three times
# per document (refs + both goalie halves, app.py:242,313) but the 300 dpi
# render is the dominant cost — rasterize ONCE per payload and crop per
# kind, like the reference's single pdf_to_pix reuse within each fallback
_raster_memo: tuple[bytes, object] | None = None


def release_raster_memo() -> None:
    """Clear the one-slot raster memo.  Module-level on purpose: the
    mapInArrow kernel closure is rebuilt by cloudpickle with a DETACHED
    globals dict on executors, so assigning the global from inside the
    closure would never touch the real module state — this function is
    pickled by reference and mutates the actual module."""
    global _raster_memo
    _raster_memo = None


def _rasterize(payload: bytes):  # pragma: no cover — needs PyMuPDF/Pillow
    global _raster_memo
    if _raster_memo is not None and _raster_memo[0] is payload:
        return _raster_memo[1]
    doc = fitz.open(stream=payload, filetype="pdf")
    try:
        mat = fitz.Matrix(OCR_DPI / 72, OCR_DPI / 72)
        pix = doc.load_page(0).get_pixmap(matrix=mat, alpha=False)
        img = Image.frombytes("RGB", [pix.width, pix.height], pix.samples)
    finally:
        doc.close()
    _raster_memo = (payload, img)
    return img


def default_engine(payload: bytes, kind: str) -> list[str]:
    """Real raster+OCR engine (requires PyMuPDF + Pillow + tesseract).

    Reproduces pdf_to_pix (app.py:67-71: 300 dpi matrix, RGB, no alpha)
    + the crop + _ocr_image_lines (app.py:74-83: grayscale → contrast
    ×1.4 → sharpen → tesseract --psm 6 rus+eng → per-line whitespace
    collapse → drop empties).  The raster is memoized per payload — the
    three region calls of one document render the page once.
    """
    if not HAS_OCR_ENGINE:  # pragma: no cover — env gate (app.py:76-77)
        return []
    img = _rasterize(payload)
    img = img.crop(crop_box(kind, img.width, img.height))
    gray = img.convert("L")
    gray = ImageEnhance.Contrast(gray).enhance(1.4)
    gray = gray.filter(ImageFilter.SHARPEN)
    txt = pytesseract.image_to_string(gray, lang=TESS_LANG, config=TESS_CONFIG)
    lines = [pdfops.RE_WS.sub(" ", ln).strip() for ln in txt.splitlines()]
    return [ln for ln in lines if ln]


def _ocr_document(url: str, payload: bytes,
                  engine: Callable[[bytes, str], list[str]],
                  mode: str = "all", debug: bool = False) -> dict | None:
    """Text-layer re-extract + OCR fallbacks for one failed document.

    Returns the improved result dict, or None when OCR did not improve
    anything (the with_ocr_fallback contract: emit only improvements).
    Re-running the cheap text layer on the tiny failed subset costs
    ~1 ms/doc vs ~1-10 s/doc for OCR — it keeps phase 1 and phase 2
    decoupled (no struct plumbing through the join).

    ``mode`` must match the phase-1 job mode so replacement rows carry
    the same engine tag / result shape as every other row: refs OCR runs
    for modes all|refs (app.py:240), goalie OCR for all|gk|goalies
    (app.py:311).

    ``debug=True`` threads the reference's debug=1 flag: the text-layer
    ``_debug`` dict (per-mode, refkernel.extract_document) is merged
    with the OCR-path notes (ocr_ref_line app.py:263-267, fallback tag
    app.py:335, ocr_error) and lands in result_json + debug_json.
    """
    from khl_pdf_ocr_spark.refkernel.kernel import extract_document

    res = extract_document(url, payload, mode=mode, debug=debug)
    if not res["ok"]:
        return None
    improved = False
    dbg: dict = {}

    refs = res["referees"]
    if mode in ("all", "refs") and (not refs["main"] or not refs["linesmen"]):
        try:  # app.py:240
            main, linesmen, rdbg = refs_from_ocr_lines(engine(payload, "refs"))
            dbg.update(rdbg)
            if main and linesmen:  # >= 4 names found (app.py:258-260)
                res["referees"] = {"main": main, "linesmen": linesmen}
                improved = True
        except Exception as e:  # app.py:261-262
            dbg["ocr_error"] = str(e)

    gk = res["goalies"]
    if mode in ("all", "gk", "goalies") and not gk["home"] and not gk["away"]:
        try:  # app.py:311 — only if BOTH columns empty
            home = goalies_from_ocr_lines(engine(payload, "gk_left"))
            away = goalies_from_ocr_lines(engine(payload, "gk_right"))
            if home or away:
                res["goalies"] = {"home": home, "away": away}
                dbg["fallback"] = "ocr"  # app.py:335
                improved = True
        except Exception as e:  # app.py:337-338
            dbg["ocr_error"] = str(e)

    if not improved:
        return None
    res["detail"] = "ocr_improved"
    if debug:
        merged = dict(res.get("_debug") or {})
        merged.update(dbg)
        res["_debug"] = merged
    return res


def make_ocr_stage(engine: Callable[[bytes, str], list[str]] | None = None,
                   mode: str = "all", debug: bool = False
                   ) -> Callable[[DataFrame], DataFrame]:
    """Build the phase-2 stage: (url, html) of failed docs → improved
    rows in the extraction schema (``with_ocr_fallback``-compatible).

    ``engine(payload, kind) -> list[str]`` rasterizes page 0, crops the
    named region (``crop_box``) and OCRs it; defaults to the real
    tesseract engine when the optional deps exist.  ``mode`` and
    ``debug`` must match the phase-1 job flags: the engine tag / result
    shape must be row-compatible, and ``debug=True`` emits the debug
    schema (+``debug_json``) so the fallback merge unions cleanly with a
    ``extract_documents(debug=True)`` phase 1.
    """
    import json

    eng = engine if engine is not None else default_engine
    pa_schema = EXTRACT_PA_DEBUG if debug else EXTRACT_PA

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from khl_pdf_ocr_spark.operators.ocr_stage import release_raster_memo
        from khl_pdf_ocr_spark.refkernel.kernel import result_to_json

        for batch in batches:
            urls = batch.column("url").to_pylist()
            payloads = batch.column("html").to_pylist()
            rows: list[dict[str, Any]] = []
            for url, payload in zip(urls, payloads):
                res = _ocr_document(url, bytes(payload) if payload is not None
                                    else b"", eng, mode=mode, debug=debug)
                if res is None:
                    continue
                text = res["extracted_text"]
                row: dict[str, Any] = {
                    "url": url, "ok": res["ok"], "engine": res["engine"],
                    "error": res["error"], "detail": res["detail"],
                    "extracted_text": text,
                    "result_json": result_to_json(res),
                    "match": res["match"], "referees": res["referees"],
                    "goalies": res["goalies"],
                    "n_bytes": len(payload) if payload is not None else 0,
                    "n_lines": (text.count("\n") + 1) if text else 0,
                    "kernel_us": 0,
                }
                if debug:
                    row["debug_json"] = json.dumps(res.get("_debug", {}),
                                                   ensure_ascii=False)
                rows.append(row)
            # release the one-slot raster memo (payload + ~26 MB 300 dpi
            # RGB raster) so long-lived workers don't pin dead memory
            # between OCR batches
            release_raster_memo()
            yield pa.RecordBatch.from_pylist(rows, schema=pa_schema)

    def stage(failed_docs: DataFrame) -> DataFrame:
        return failed_docs.select("url", "html").mapInArrow(
            kernel, EXTRACT_SCHEMA_DEBUG if debug else EXTRACT_SCHEMA)

    return stage
