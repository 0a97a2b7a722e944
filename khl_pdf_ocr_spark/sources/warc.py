"""WARC ingestion — the front door from raw Common-Crawl-style crawl
archives to the engine's canonical documents table.

The north-rule input (BASELINE.json `input_hint`) is a table of
``(url, warc_ts, html, …)`` — this module produces exactly that shape
from WARC files (ISO 28500, the public Common Crawl container format):

    read_warc(spark, "s3://crawl/segments/*.warc.gz")
        -> DataFrame(url string, warc_ts timestamp, html binary,
                     content_type string, warc_file string)

Spark shape: ``binaryFile`` scan (one row per archive file — WARC
files are written ~1 GB precisely so that file-level parallelism is
the right distribution unit) → Arrow-batched ``mapInArrow`` running
the pure-Python record parser per file.  No per-row Python, no
shuffle; downstream ``repartition`` only if archive sizes skew (the
same size-bucketing defense as the extraction stage).  Both plain and
gzipped archives are handled; ``.warc.gz`` files are per-record gzip
MEMBERS (the Common Crawl convention), which ``gzip.decompress``
handles transparently by concatenating members.

Malformed records never kill an archive: parsing is per-record
best-effort, bad records are skipped and COUNTED (``n_bad_records``
in ``parse_warc_stats``) — at 10^12 documents a silent drop is a
correctness bug, a loud per-file count is telemetry.

Only ``WARC-Type: response`` records with an HTTP payload yield rows
(request/metadata/warcinfo records carry no document bytes); the HTTP
envelope is split off and the body becomes the ``html`` binary
column, charset untouched — decoding belongs to the extraction kernel
(refkernel.html.detect_charset), not the reader.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone

CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


def _parse_warc_date(s: str) -> datetime | None:
    """WARC-Date is W3C ISO-8601 UTC (``2026-08-17T03:15:00Z``)."""
    try:
        return datetime.strptime(s.strip(), "%Y-%m-%dT%H:%M:%SZ") \
            .replace(tzinfo=timezone.utc)
    except ValueError:
        try:  # fractional seconds variant (WARC 1.1)
            return datetime.strptime(s.strip(), "%Y-%m-%dT%H:%M:%S.%fZ") \
                .replace(tzinfo=timezone.utc)
        except ValueError:
            return None


def iter_warc_records(payload: bytes):
    """Yield ``(headers: dict[str,str], content: bytes)`` per record.

    Accepts plain or gzipped archives (multi-member gzip = Common
    Crawl's one-member-per-record layout).  Raises only on a payload
    that is not WARC at all; a torn/malformed record mid-archive stops
    iteration at the tear (the remainder is unrecoverable without the
    next member boundary) rather than yielding garbage rows.
    """
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.decompress(payload)
    pos = 0
    n = len(payload)
    while pos < n:
        # skip inter-record blank lines (two CRLFs terminate a record)
        while payload.startswith(CRLF, pos):
            pos += 2
        if pos >= n:
            return
        if not payload.startswith(b"WARC/", pos):
            return  # torn record / trailing junk — stop at the tear
        hdr_end = payload.find(_HDR_END, pos)
        if hdr_end < 0:
            return
        header_block = payload[pos:hdr_end].decode("utf-8",
                                                   errors="replace")
        headers: dict[str, str] = {}
        for line in header_block.split("\r\n")[1:]:  # [0] is WARC/1.x
            name, sep, value = line.partition(":")
            if sep:
                headers[name.strip().lower()] = value.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        if length < 0:
            # a negative length would move the parse position BACKWARDS
            # — on a crafted/corrupt record that cycles back to the
            # record start, the loop would re-yield the same record
            # forever inside a Spark task (r5 review, reproduced)
            return
        body_start = hdr_end + len(_HDR_END)
        if body_start + length > n:
            return  # truncated content block
        yield headers, payload[body_start:body_start + length]
        pos = body_start + length


def _split_http(content: bytes) -> tuple[str | None, bytes] | None:
    """(content-type, body) from an HTTP response payload; (None,
    content) when there is no HTTP envelope (resource records); None
    when the envelope is malformed (caller counts the record bad).

    Real crawls store server bytes verbatim, and real servers emit
    bare-LF header lines — fall back to ``\\n\\n`` before declaring
    the envelope unterminated (r5 review: the old code silently
    replaced such documents with empty bytes, the exact silent drop
    the module contract forbids)."""
    if not content.startswith(b"HTTP/"):
        return None, content
    sep, sep_len = content.find(_HDR_END), len(_HDR_END)
    if sep < 0:
        sep, sep_len = content.find(b"\n\n"), 2
        if sep < 0:
            return None
    ctype = None
    for line in content[:sep].decode("latin-1").splitlines()[1:]:
        name, s, value = line.partition(":")
        if s and name.strip().lower() == "content-type":
            ctype = value.strip()
            break
    return ctype, content[sep + sep_len:]


def parse_warc_file(name: str, payload: bytes) -> tuple[list[dict], int]:
    """All response-record rows of one archive + the bad-record count."""
    rows: list[dict] = []
    bad = 0
    try:
        records = iter_warc_records(payload)
        while True:
            try:
                item = next(records)
            except StopIteration:
                break
            headers, content = item
            if headers.get("warc-type") != "response":
                continue
            url = headers.get("warc-target-uri")
            ts = _parse_warc_date(headers.get("warc-date", ""))
            if not url or ts is None:
                bad += 1
                continue
            split = _split_http(content)
            if split is None:  # unterminated HTTP envelope
                bad += 1
                continue
            ctype, body = split
            rows.append({"url": url, "warc_ts": ts, "html": body,
                         "content_type": ctype, "warc_file": name})
    except (OSError, EOFError, zlib.error):
        # not gzip / not WARC / bit-rotted deflate stream (zlib.error
        # is NOT an OSError subclass — r5 review, reproduced by fuzz)
        bad += 1
    return rows, bad


_WARC_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "content_type string, warc_file string")


def read_warc(spark, path: str, *, bad_records_acc=None):
    """WARC archives → the canonical documents frame
    (url, warc_ts, html, content_type, warc_file).

    One ``binaryFile`` row per archive; the parser runs inside
    ``mapInArrow`` so record materialization is Arrow-batched, never
    per-row Python.  Bad records are skipped on this data path; pass
    ``bad_records_acc`` (a ``spark.sparkContext.accumulator(0)``) to
    collect the skip count from the SAME pass — re-reading ~1 GB
    archives just for telemetry doubles the most expensive ingest
    stage (r5 review).  ``parse_warc_stats`` remains the standalone
    per-archive breakdown for audits that don't run the data path.
    """
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))
    return warc_records_frame(files, bad_records_acc=bad_records_acc)


def warc_records_frame(files, *, bad_records_acc=None):
    """(path, content) frame of raw archives → parsed record frame.

    The shared Arrow-batched map behind ``read_warc`` (batch) and
    ``streaming.warc_stream`` (continuous) — one parser, two triggers.
    """
    import pyarrow as pa

    def parse(batches):
        for batch in batches:
            out = {"url": [], "warc_ts": [], "html": [],
                   "content_type": [], "warc_file": []}
            for name, payload in zip(batch.column("path").to_pylist(),
                                     batch.column("content").to_pylist()):
                rows, bad = parse_warc_file(name, payload)
                if bad_records_acc is not None and bad:
                    bad_records_acc.add(bad)
                for r in rows:
                    for k in out:
                        out[k].append(r[k])
            yield pa.RecordBatch.from_pydict({
                "url": pa.array(out["url"], pa.string()),
                "warc_ts": pa.array(out["warc_ts"],
                                    pa.timestamp("us", tz="UTC")),
                "html": pa.array(out["html"], pa.binary()),
                "content_type": pa.array(out["content_type"], pa.string()),
                "warc_file": pa.array(out["warc_file"], pa.string()),
            })

    return files.select("path", "content").mapInArrow(parse, _WARC_SCHEMA)


def parse_warc_stats(spark, path: str):
    """Per-archive ingest telemetry: (warc_file, n_rows,
    n_bad_records) — the no-silent-caps twin of ``read_warc``."""
    import pyarrow as pa

    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def stats(batches):
        for batch in batches:
            names, n_rows, n_bad = [], [], []
            for name, payload in zip(batch.column("path").to_pylist(),
                                     batch.column("content").to_pylist()):
                rows, bad = parse_warc_file(name, payload)
                names.append(name)
                n_rows.append(len(rows))
                n_bad.append(bad)
            yield pa.RecordBatch.from_pydict({
                "warc_file": pa.array(names, pa.string()),
                "n_rows": pa.array(n_rows, pa.int64()),
                "n_bad_records": pa.array(n_bad, pa.int64()),
            })

    return files.mapInArrow(
        stats, "warc_file string, n_rows long, n_bad_records long")


def write_warc(records: list[tuple[str, datetime, bytes]], *,
               gzipped: bool = False) -> bytes:
    """Serialize (url, ts, html_bytes) response records to WARC bytes —
    the test/fixture writer (one gzip member per record when
    ``gzipped``, the Common Crawl layout)."""
    out = io.BytesIO()
    for url, ts, body in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: " + str(len(body)).encode() +
                _HDR_END + body)
        hdr = ("WARC/1.0\r\n"
               "WARC-Type: response\r\n"
               f"WARC-Target-URI: {url}\r\n"
               f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
               f"Content-Length: {len(http)}\r\n"
               "Content-Type: application/http; msgtype=response\r\n"
               "\r\n").encode()
        rec = hdr + http + CRLF + CRLF
        out.write(gzip.compress(rec) if gzipped else rec)
    return out.getvalue()
