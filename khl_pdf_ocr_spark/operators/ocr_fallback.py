"""Two-phase OCR fallback — the failed-subset second pass.

The reference runs OCR lazily, only when text-layer extraction failed
(``app.py:240`` for referees, ``app.py:311`` for goalies), because OCR
is ~100-1000× the cost of text-layer parsing.  At cluster scale that
cost bimodality is exactly the skew that kills task balance, so the
pipeline NEVER branches into OCR inside the main map.  Instead
(SURVEY.md §4.3.2):

    phase 1: extract_documents(df)            — dense, fast Arrow batches
    phase 2: failed = out.filter(needs_ocr)   — tiny subset
             failed → salt-repartition → OCR kernel → unionByName

The OCR engine itself (tesseract + rasterization via PyMuPDF/Pillow) is
NOT in this container; the kernel degrades gracefully exactly like the
reference does when tesseract is absent (``app.py:17-22,76-77``):
``HAS_OCR`` is False and the second pass is a no-op pass-through.  The
Spark plumbing — subset selection, salting, schema-stable union — is
real and tested with an injectable fake engine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.partitioning import repartition_for_extraction

__all__ = ["HAS_OCR", "needs_ocr", "with_ocr_fallback"]

try:  # optional heavy deps (absent in this sandbox, like tesseract in the ref)
    import fitz  # type: ignore # noqa: F401
    import pytesseract  # type: ignore # noqa: F401
    from PIL import Image  # type: ignore # noqa: F401

    HAS_OCR = True
except Exception:  # pragma: no cover
    HAS_OCR = False


def needs_ocr(extracted: DataFrame) -> DataFrame:
    """Rows where the text layer came up empty — the reference's fallback
    predicates: no referees (app.py:240) or no goalies at all
    (app.py:311), on otherwise-parseable PDFs, in whichever mode the
    rows were extracted (engines: all / ocr-refs / gk)."""
    no_refs = (F.size("referees.main") == 0) | (F.size("referees.linesmen") == 0)
    no_gk = (F.size("goalies.home") == 0) & (F.size("goalies.away") == 0)
    return extracted.filter(
        ((F.col("engine") == "all") & (no_refs | no_gk))
        | ((F.col("engine") == "ocr-refs") & no_refs)
        | ((F.col("engine") == "gk") & no_gk))


def with_ocr_fallback(extracted: DataFrame, documents: DataFrame,
                      ocr_stage: Callable[[DataFrame], DataFrame] | None = None
                      ) -> DataFrame:
    """Apply the second pass and merge.

    ``ocr_stage`` maps a (url, html) DataFrame of failed docs to rows in
    the extraction schema; defaults to a no-op when OCR deps are absent
    (mirroring app.py:76-77).  The merged result keeps phase-1 rows for
    every url the second pass did not improve.
    """
    if ocr_stage is None:  # no engine → pass-through, BEFORE any job runs
        return extracted

    extracted = extracted.persist()  # probed once, merged once
    failed_urls = needs_ocr(extracted).select("url")
    if failed_urls.limit(1).count() == 0:
        extracted.unpersist()
        return extracted
    # NOTE: on the two-pass path the cache stays pinned until the caller
    # materializes the merged result; unpersist it afterwards in
    # long-lived sessions

    failed_docs = documents.join(F.broadcast(failed_urls), "url", "left_semi") \
                           .select("url", "html")
    # OCR cost is uniform-high → salt-spread the (small) subset wide
    failed_docs = repartition_for_extraction(
        failed_docs, failed_docs.sparkSession.sparkContext.defaultParallelism)
    ocr_rows = ocr_stage(failed_docs)

    keep = extracted.join(F.broadcast(ocr_rows.select("url")), "url", "left_anti")
    return keep.unionByName(ocr_rows)
