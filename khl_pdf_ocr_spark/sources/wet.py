"""WET export/ingest — Common Crawl's extracted-text interchange
format (WARC ``conversion`` records, ISO 28500 §6.8), the sidecar
every Common-Crawl consumer already reads.

The reference returns extracted text per request (app.py:376-419);
at corpus scale the standard way to SHIP extraction output to other
pipelines is a ``*.warc.wet.gz`` segment set.  This module closes the
interop loop both ways:

* ``export_wet`` — distributed sink: the extraction output table
  (url, warc_ts, extracted text) → one ``.warc.wet.gz`` file per
  partition plus a manifest row (file, records, bytes) per file —
  telemetry first, like every sink in this repo.
* ``read_wet`` — ``binaryFile`` scan + the shared WARC record
  iterator (``warc.iter_warc_records``), keeping only ``conversion``
  records: ``(url, warc_ts, text, wet_file)``.

Spark shape mirrors ``sources/warc.py``: file-level parallelism on
read (WET segments are ~150 MB by convention — the file is the task),
partition-level on write (``repartition(n)`` upstream controls the
segment count/size; one file per task, no shuffle inside the sink),
Arrow batches end to end, per-record best-effort parsing with loud
bad-record counts.
"""

from __future__ import annotations

import gzip
import io
import os
import uuid
from datetime import datetime, timezone

from khl_pdf_ocr_spark.sources.warc import (CRLF, _parse_warc_date,
                                            iter_warc_records)

__all__ = ["write_wet", "read_wet", "export_wet"]


def write_wet(records: list[tuple[str, datetime, str]], *,
              gzipped: bool = False) -> bytes:
    """Serialize ``(url, ts, text)`` to WET bytes — one
    ``WARC-Type: conversion`` record per row, UTF-8 plain-text body,
    one gzip member per record when ``gzipped`` (the Common Crawl
    layout, so readers can resync at member boundaries)."""
    out = io.BytesIO()
    for url, ts, text in records:
        body = (text or "").encode("utf-8")
        hdr = ("WARC/1.0\r\n"
               "WARC-Type: conversion\r\n"
               f"WARC-Target-URI: {url}\r\n"
               f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
               f"Content-Length: {len(body)}\r\n"
               "Content-Type: text/plain\r\n"
               "\r\n").encode()
        rec = hdr + body + CRLF + CRLF
        out.write(gzip.compress(rec) if gzipped else rec)
    return out.getvalue()


_WET_SCHEMA = ("url string, warc_ts timestamp, text string, "
               "wet_file string")


def read_wet(spark, path: str, *, bad_records_acc=None):
    """``*.warc.wet(.gz)`` files → DataFrame(url, warc_ts, text,
    wet_file).  Only ``conversion`` records yield rows; response/
    request/metadata records in mixed archives are skipped silently
    (they are not text), malformed records are skipped and counted
    into ``bad_records_acc`` when given."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    files = (spark.read.format("binaryFile").load(path)
             .select(F.col("path"), F.col("content")))

    def parse(batches):
        for batch in batches:
            names = batch.schema.names
            for i in range(batch.num_rows):
                name = batch.column(names.index("path"))[i].as_py()
                payload = batch.column(names.index("content"))[i].as_py()
                rows = {"url": [], "warc_ts": [], "text": [],
                        "wet_file": []}
                n_bad = 0
                try:
                    for headers, content in iter_warc_records(payload):
                        if headers.get("warc-type") != "conversion":
                            continue
                        url = headers.get("warc-target-uri")
                        if not url:
                            n_bad += 1
                            continue
                        ts = _parse_warc_date(
                            headers.get("warc-date", ""))
                        rows["url"].append(url)
                        rows["warc_ts"].append(ts)
                        rows["text"].append(
                            content.decode("utf-8", errors="replace"))
                        rows["wet_file"].append(os.path.basename(name))
                except Exception:
                    n_bad += 1  # torn archive tail: keep what parsed
                if bad_records_acc is not None and n_bad:
                    bad_records_acc.add(n_bad)
                yield pa.RecordBatch.from_pydict({
                    "url": pa.array(rows["url"], pa.string()),
                    "warc_ts": pa.array(rows["warc_ts"],
                                        pa.timestamp("us", tz="UTC")),
                    "text": pa.array(rows["text"], pa.string()),
                    "wet_file": pa.array(rows["wet_file"], pa.string()),
                })

    return files.mapInArrow(parse, _WET_SCHEMA)


def export_wet(df, out_dir: str, *, url_col: str = "url",
               ts_col: str = "warc_ts", text_col: str = "extracted_text",
               n_files: int | None = None):
    """Write ``df`` as gzipped WET segments under ``out_dir`` — one
    ``.warc.wet.gz`` per partition (``n_files`` repartitions first;
    default keeps the incoming partitioning, so segment sizing is the
    caller's partition sizing) — and RETURN the collected manifest:
    ``[{file, n_records, n_bytes}, ...]``.

    The write happens inside ``mapInArrow`` tasks (no shuffle beyond
    the optional repartition, no driver data path); the manifest rows
    are the only thing collected.  File names embed a uuid so reruns
    never silently overwrite partial output — idempotent jobs should
    write to a fresh ``out_dir`` and commit by rename, the
    ``pipeline.py`` manifest discipline.  NULL timestamps serialize
    as the epoch (deterministic, never wall-clock).  The file write
    uses the local filesystem API — at object-store scale route it
    through the Hadoop FileSystem API exactly like ``ann_index``'s
    ``meta.json`` writer."""
    import pyarrow as pa

    src = df.select(url_col, ts_col, text_col)
    if n_files is not None:
        src = src.repartition(n_files)
    os.makedirs(out_dir, exist_ok=True)

    def sink(batches):
        # streamed per Arrow batch — task memory holds one batch's
        # records, never the whole partition (gzip members concatenate,
        # so incremental appends produce a valid multi-member file).
        # Task-commit protocol: stream into a '_tmp-' name (the '_'
        # prefix also hides it from Spark/Hadoop globs) and rename to
        # the final name only after the partition completes — a
        # crashed/retried attempt leaves no half-file a later
        # read_wet(out_dir glob) would double-count; the returned
        # manifest stays the authoritative file list (review finding)
        epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
        name, tmp, fh, n_records, n_bytes = None, None, None, 0, 0
        ok = False
        try:
            for batch in batches:
                recs = list(zip(batch.column(0).to_pylist(),
                                batch.column(1).to_pylist(),
                                batch.column(2).to_pylist()))
                if not recs:
                    continue
                if fh is None:
                    name = f"part-{uuid.uuid4().hex[:12]}.warc.wet.gz"
                    tmp = os.path.join(out_dir, "_tmp-" + name)
                    fh = open(tmp, "wb")
                payload = write_wet(
                    [(u, ts or epoch, t or "") for u, ts, t in recs],
                    gzipped=True)
                fh.write(payload)
                n_records += len(recs)
                n_bytes += len(payload)
            ok = True
        finally:
            if fh is not None:
                fh.close()
                if ok:
                    os.replace(tmp, os.path.join(out_dir, name))
                else:
                    os.unlink(tmp)
        if name is not None:
            yield pa.RecordBatch.from_pydict({
                "file": pa.array([name], pa.string()),
                "n_records": pa.array([n_records], pa.int64()),
                "n_bytes": pa.array([n_bytes], pa.int64()),
            })

    manifest = src.mapInArrow(
        sink, "file string, n_records long, n_bytes long").collect()
    return [{"file": r["file"], "n_records": r["n_records"],
             "n_bytes": r["n_bytes"]} for r in manifest]
