"""Real raster path — import-gated integration (r2 verdict #5).

This sandbox ships neither PyMuPDF nor Pillow (and pip installs are
off), so these SKIP here; in any environment that has the pure-pip pair
they drive the actual ``_rasterize`` + crop 2/3 of the OCR recipe
(app.py:67-71, 242-243, 315-316) over a minipdf-built fixture — the
remaining 1/3 (the tesseract call itself) stays behind
``HAS_OCR_ENGINE`` exactly like the reference's HAS_TESSERACT gate.
"""

from __future__ import annotations

import pytest

fitz = pytest.importorskip("fitz", reason="PyMuPDF not installed")
pytest.importorskip("PIL", reason="Pillow not installed")

from khl_pdf_ocr_spark.operators.ocr_stage import (OCR_DPI, _rasterize,
                                                   crop_box,
                                                   release_raster_memo)
from khl_pdf_ocr_spark.refkernel.minipdf import (DEFAULT_PAGE_H,
                                                 DEFAULT_PAGE_W,
                                                 build_game_sheet_pdf)


@pytest.fixture()
def pdf_bytes():
    release_raster_memo()
    return build_game_sheet_pdf([
        (50.0, 60.0, "Главный", 10.0), (110.0, 60.0, "судья", 10.0),
        (50.0, 700.0, "нижний", 10.0),
    ])


def test_rasterize_300dpi_geometry(pdf_bytes):
    img = _rasterize(pdf_bytes)
    # app.py:67-71 — 300/72 matrix over the page mediabox, RGB, no alpha
    assert img.mode == "RGB"
    assert img.width == round(DEFAULT_PAGE_W * OCR_DPI / 72)
    assert img.height == round(DEFAULT_PAGE_H * OCR_DPI / 72)


def test_raster_memo_single_render(pdf_bytes):
    a = _rasterize(pdf_bytes)
    b = _rasterize(pdf_bytes)  # same payload object → memo hit
    assert b is a
    release_raster_memo()
    c = _rasterize(pdf_bytes)
    assert c is not a  # memo cleared → fresh render


def test_crop_matches_reference_regions(pdf_bytes):
    img = _rasterize(pdf_bytes)
    refs = img.crop(crop_box("refs", img.width, img.height))
    assert (refs.width, refs.height) == (img.width, int(img.height * 0.33))
    left = img.crop(crop_box("gk_left", img.width, img.height))
    right = img.crop(crop_box("gk_right", img.width, img.height))
    assert left.width == img.width // 2
    assert left.width + right.width == img.width
    assert left.height == right.height == int(img.height * 0.6)
    # the rendered glyphs land in the top third (y=60pt of 842pt) —
    # the refs crop must contain ink, the bottom word must not be in it
    assert refs.convert("L").getextrema()[0] < 255  # some dark pixels
