"""The flagship operator: Arrow-batched document extraction.

``extract_documents(df)`` maps the refkernel over the binary payload
column with ``mapInArrow`` — one Python process per task, one kernel
call per document, amortized per RecordBatch (iterator form: imports,
regex compilation and schema objects are reused across batches, never
per row; per the "no per-row Python dispatch" mandate in
BASELINE.json:15).

Scale notes (SURVEY.md §3.5, §4.3):
- the caller should ``select("url", "html")`` first (done here) so
  Catalyst prunes the scan to exactly the two needed columns — verify
  with ``df.explain``: ``ReadSchema: struct<url:string,html:binary>``;
- Arrow batch size is capped session-wide (session.py) because payloads
  are MB-scale;
- errors become rows (``ok=false`` + error class), never task failures
  (reference behavior: error envelopes, app.py:387-419).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pyarrow as pa
from pyspark.sql import DataFrame

from khl_pdf_ocr_spark.schemas import (EXTRACT_PA, EXTRACT_PA_DEBUG,
                                       EXTRACT_SCHEMA,
                                       EXTRACT_SCHEMA_DEBUG)

__all__ = ["extract_documents", "extract_batches", "make_extract_fn"]


def _extract_rows(urls, payloads, mode: str, debug: bool = False
                  ) -> list[dict[str, Any]]:
    # Row-dict reference form — kept as the oracle for
    # test_extract_columnar_equals_rows (the hot path is the columnar
    # _extract_columns below, r6 optimization).
    # import inside the task (executor-side) — refkernel is pure stdlib
    import json
    import time

    from khl_pdf_ocr_spark.refkernel.kernel import extract_document, result_to_json

    rows = []
    for url, payload in zip(urls, payloads):
        if url is None:
            # the output schema declares url non-nullable (it is the
            # document key everywhere downstream); a NULL key would
            # otherwise violate the declared schema and surface as a
            # JVM NullPointerException deep in codegen.  Out-of-
            # contract input degrades to an observable sentinel row
            # instead of a task failure — the error-envelope
            # philosophy (app.py's 4xx, never a 500)
            url = ""
        t0 = time.perf_counter()
        res = extract_document(url, payload, mode=mode, debug=debug)
        kernel_us = int((time.perf_counter() - t0) * 1e6)
        text = res["extracted_text"]
        if debug:
            rows.append({
                "url": url, "ok": res["ok"], "engine": res["engine"],
                "error": res["error"], "detail": res["detail"],
                "extracted_text": text, "result_json": result_to_json(res),
                "match": res["match"], "referees": res["referees"],
                "goalies": res["goalies"],
                "n_bytes": len(payload) if payload is not None else 0,
                "n_lines": (text.count("\n") + 1) if text else 0,
                "kernel_us": kernel_us,
                "debug_json": json.dumps(res.get("_debug", {}),
                                         ensure_ascii=False),
            })
            continue
        rows.append({
            "url": url,
            "ok": res["ok"],
            "engine": res["engine"],
            "error": res["error"],
            "detail": res["detail"],
            "extracted_text": text,
            "result_json": result_to_json(res),
            "match": res["match"],
            "referees": res["referees"],
            "goalies": res["goalies"],
            "n_bytes": len(payload) if payload is not None else 0,
            "n_lines": (text.count("\n") + 1) if text else 0,
            "kernel_us": kernel_us,
        })
    return rows


def _extract_columns(urls, payloads, mode: str, debug: bool = False
                     ) -> dict[str, list]:
    """Column-wise twin of ``_extract_rows`` (same kernel calls, same
    values — pinned by ``test_extract_columnar_equals_rows``): the
    per-row dict + ``RecordBatch.from_pylist`` build measured 3.6× the
    cost of appending column lists and building arrays directly
    (guide §4.2: row-wise Python assembly at the Arrow boundary is
    avoidable overhead — ~34 % of the Python-side extraction cost)."""
    import json
    import time

    from khl_pdf_ocr_spark.refkernel.kernel import extract_document, result_to_json

    cols: dict[str, list] = {name: [] for name in (
        "url", "ok", "engine", "error", "detail", "extracted_text",
        "result_json", "match", "referees", "goalies", "n_bytes",
        "n_lines", "kernel_us")}
    if debug:
        cols["debug_json"] = []
    ap = {k: v.append for k, v in cols.items()}
    perf = time.perf_counter
    for url, payload in zip(urls, payloads):
        if url is None:
            # see _extract_rows: NULL key degrades to the "" sentinel
            url = ""
        t0 = perf()
        res = extract_document(url, payload, mode=mode, debug=debug)
        kernel_us = int((perf() - t0) * 1e6)
        text = res["extracted_text"]
        ap["url"](url)
        ap["ok"](res["ok"])
        ap["engine"](res["engine"])
        ap["error"](res["error"])
        ap["detail"](res["detail"])
        ap["extracted_text"](text)
        ap["result_json"](result_to_json(res))
        ap["match"](res["match"])
        ap["referees"](res["referees"])
        ap["goalies"](res["goalies"])
        ap["n_bytes"](len(payload) if payload is not None else 0)
        ap["n_lines"]((text.count("\n") + 1) if text else 0)
        ap["kernel_us"](kernel_us)
        if debug:
            ap["debug_json"](json.dumps(res.get("_debug", {}),
                                        ensure_ascii=False))
    return cols


def extract_batches(batches: Iterator[pa.RecordBatch], mode: str = "all",
                    debug: bool = False) -> Iterator[pa.RecordBatch]:
    """Iterator[RecordBatch] → Iterator[RecordBatch] extraction kernel."""
    schema = EXTRACT_PA_DEBUG if debug else EXTRACT_PA
    for batch in batches:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        cols = _extract_columns(urls, payloads, mode, debug)
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in schema],
            schema=schema)


def make_extract_fn(mode: str = "all", debug: bool = False):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        return extract_batches(batches, mode=mode, debug=debug)

    return fn


def extract_documents(df: DataFrame, mode: str = "all",
                      debug: bool = False) -> DataFrame:
    """documents(url, …, html binary, …) → extraction results.

    Column-prunes to (url, html) before the Arrow boundary so the
    parquet/Iceberg scan reads exactly two columns.

    ``debug=True`` threads the reference's ``debug=1`` flag through the
    kernel (raw_ref_line / fallback notes / capability flags, per mode —
    see ``refkernel.kernel.extract_document``) and adds a ``debug_json``
    column; the debug dict also appears as ``_debug`` in result_json,
    mirroring the JSON response shape (app.py:364-365).
    """
    return df.select("url", "html").mapInArrow(
        make_extract_fn(mode, debug),
        EXTRACT_SCHEMA_DEBUG if debug else EXTRACT_SCHEMA)
