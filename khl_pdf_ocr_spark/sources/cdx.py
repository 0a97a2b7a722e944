"""CDX(J) index support — selection-driven WARC ingest, the Common
Crawl access pattern that makes partial reads of a 100 TB crawl
tractable.

Common Crawl publishes, next to every WARC segment, a CDXJ index: one
line per captured record —

    <urlkey (SURT)> <timestamp> {"url": ..., "status": "200",
        "mime": "text/html", "digest": ..., "length": "1043",
        "offset": "1204", "filename": ".../x.warc.gz"}

and each ``.warc.gz`` record is its OWN gzip member, so any record is
independently readable from ``(filename, offset, length)`` without
touching the rest of the archive.  The workflow this module
implements:

    idx  = read_cdx(spark, "indexes/cdx-*.gz")        # tiny vs crawl
    sel  = idx.filter("status = 200 AND mime = 'text/html'")
    docs = fetch_warc_records(sel)                    # range reads

Scale shape — the reason this exists: the index is ~0.1 % the size of
the crawl and filters JVM-side (status/mime/url predicates are plain
Catalyst expressions with parquet/text pushdown), so a 1 % selection
reads ~1 % of the archive BYTES instead of scanning every record the
way ``read_warc`` must.  ``fetch_warc_records`` repartitions the
selection by ``filename`` and sorts by ``offset`` within partitions:
each task opens an archive once and seeks strictly FORWARD through it
(sequential-ish I/O, one handle at a time), emitting Arrow batches.
Torn offsets / corrupt members are counted, never fatal (the
``read_warc`` telemetry contract).

``index_warc`` is the fixture-side inverse: it walks a per-record-gzip
archive's member boundaries (``zlib`` ``unused_data``) and emits the
CDXJ entries — the same (offset, length) bookkeeping a crawler's
indexer performs at write time.
"""

from __future__ import annotations

import base64
import hashlib
import json
import zlib

from khl_pdf_ocr_spark.sources.warc import (_parse_warc_date, _split_http,
                                            iter_warc_records)

__all__ = ["index_warc", "format_cdxj", "surt_key", "read_cdx",
           "fetch_warc_records", "build_cdx"]


def surt_key(url: str) -> str:
    """Simplified SURT urlkey (`com,example)/path` — the sort key CC
    indexes use so one host's captures are adjacent): reversed host
    labels, comma-joined, then `)` and the lowercased path."""
    rest = url.split("://", 1)[-1]
    host, _, path = rest.partition("/")
    host = host.rsplit("@", 1)[-1].split(":")[0].lower()
    return ",".join(reversed(host.split("."))) + ")/" + path.lower()


def index_warc(filename: str, payload: bytes) -> list[dict]:
    """CDXJ entries for a per-record-gzip WARC archive: one dict per
    response record with (urlkey, cdx_ts, url, status, mime, digest,
    offset, length, filename).  Raises on a non-gzip payload — range
    reads require the one-member-per-record layout; a plain archive
    has no independently readable offsets."""
    if payload[:2] != b"\x1f\x8b":
        raise ValueError("CDX indexing requires a per-record-gzip "
                         "archive (.warc.gz); plain WARC records are "
                         "not independently range-readable")
    entries: list[dict] = []
    mv = memoryview(payload)  # no O(n) slice copy per member
    pos = 0
    while pos < len(payload):
        d = zlib.decompressobj(wbits=31)  # exactly one gzip member
        rec = d.decompress(mv[pos:])
        length = len(payload) - pos - len(d.unused_data)
        entry = _entry_for_member(rec, filename, pos, length)
        if entry is not None:
            entries.append(entry)
        if length <= 0:  # defensive: never loop on a stuck member
            break
        pos += length
    return entries


def _entry_for_member(rec: bytes, filename: str, offset: int,
                      length: int) -> dict | None:
    for headers, content in iter_warc_records(rec):
        if headers.get("warc-type") != "response":
            return None
        url = headers.get("warc-target-uri")
        ts = _parse_warc_date(headers.get("warc-date", ""))
        if not url or ts is None:
            return None
        status = None
        if content.startswith(b"HTTP/"):
            first = content.split(b"\r\n", 1)[0].split(b" ")
            if len(first) >= 2 and first[1].isdigit():
                status = int(first[1])
        split = _split_http(content)
        mime, body = (split if split is not None else (None, b""))
        digest = "sha1:" + base64.b32encode(
            hashlib.sha1(body).digest()).decode()
        return {"urlkey": surt_key(url),
                "cdx_ts": ts.strftime("%Y%m%d%H%M%S"),
                "url": url, "status": status,
                "mime": (mime or "").split(";")[0].strip() or None,
                "digest": digest, "offset": offset, "length": length,
                "filename": filename}
    return None


def format_cdxj(entries: list[dict]) -> str:
    """Entries → CDXJ text (one `urlkey ts {json}` line each)."""
    lines = []
    for e in entries:
        meta = {"url": e["url"], "digest": e["digest"],
                "length": str(e["length"]), "offset": str(e["offset"]),
                "filename": e["filename"]}
        if e.get("status") is not None:
            meta["status"] = str(e["status"])
        if e.get("mime"):
            meta["mime"] = e["mime"]
        lines.append(f"{e['urlkey']} {e['cdx_ts']} "
                     f"{json.dumps(meta, sort_keys=True)}")
    return "\n".join(lines) + "\n"


def read_cdx(spark, path: str):
    """CDXJ files (plain or .gz — Spark's text source gunzips) → the
    index frame (urlkey, cdx_ts, url, status, mime, digest, offset,
    length, filename).  Pure JVM: split off the two leading fields,
    ``from_json`` the rest — predicates on the result are ordinary
    Catalyst filters over a table ~0.1 % the crawl's size."""
    from pyspark.sql import functions as F

    meta = ("url string, status string, mime string, digest string, "
            "length string, offset string, filename string")
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parts = F.split("value", " ", 3)
    j = F.from_json(parts[2], meta)
    return lines.select(
        parts[0].alias("urlkey"),
        parts[1].alias("cdx_ts"),
        j["url"].alias("url"),
        j["status"].cast("int").alias("status"),
        j["mime"].alias("mime"),
        j["digest"].alias("digest"),
        j["offset"].cast("long").alias("offset"),
        j["length"].cast("long").alias("length"),
        j["filename"].alias("filename"))


_DOC_SCHEMA = ("url string, warc_ts timestamp, html binary, "
               "content_type string, warc_file string")


def fetch_warc_records(index, *, base_dir: str | None = None,
                       bad_records_acc=None):
    """Selected index rows → the canonical documents frame
    (url, warc_ts, html, content_type, warc_file) by range-reading
    ONLY the selected gzip members.

    Partitioning: hash-repartition on ``filename`` + sort by
    ``offset`` within partitions, so each task seeks forward through
    each archive with one open handle — at 10^5 selected records per
    1 GB archive that is near-sequential I/O, and an archive's reads
    never spread across tasks (no duplicate opens of the same file
    from many executors).  Unreadable files / torn members count into
    ``bad_records_acc`` and are skipped, never fatal.
    """
    import os

    import pyarrow as pa
    from pyspark.sql import functions as F

    sel = (index.select("filename", "offset", "length")
           .repartition(F.col("filename"))
           .sortWithinPartitions("filename", "offset"))

    def fetch(batches):
        handle, handle_name = None, None

        def read_range(fname: str, off: int, ln: int) -> bytes | None:
            nonlocal handle, handle_name
            path = fname
            if base_dir is not None and not os.path.isabs(path):
                path = os.path.join(base_dir, path)
            if path.startswith("file:"):
                path = path[len("file:"):]
            try:
                if handle_name != path:
                    if handle is not None:
                        handle.close()
                    handle = open(path, "rb")
                    handle_name = path
                handle.seek(off)
                return handle.read(ln)
            except OSError:
                if bad_records_acc is not None:
                    bad_records_acc.add(1)
                handle, handle_name = None, None
                return None

        for batch in batches:
            out = {"url": [], "warc_ts": [], "html": [],
                   "content_type": [], "warc_file": []}
            for fname, off, ln in zip(
                    batch.column("filename").to_pylist(),
                    batch.column("offset").to_pylist(),
                    batch.column("length").to_pylist()):
                if fname is None or off is None or ln is None:
                    # malformed index line (torn download, cut JSON):
                    # read_cdx's from_json yields NULL fields — counted,
                    # never fatal (the module contract)
                    if bad_records_acc is not None:
                        bad_records_acc.add(1)
                    continue
                member = read_range(fname, int(off), int(ln))
                if member is None:
                    continue  # open/seek failure — counted in read_range
                if not member:
                    # offset at/past EOF (truncated archive): a selected
                    # record must never vanish without telemetry
                    if bad_records_acc is not None:
                        bad_records_acc.add(1)
                    continue
                row = _entry_row(member, fname)
                if row is None:
                    if bad_records_acc is not None:
                        bad_records_acc.add(1)
                    continue
                for k in out:
                    out[k].append(row[k])
            yield pa.RecordBatch.from_pydict({
                "url": pa.array(out["url"], pa.string()),
                "warc_ts": pa.array(out["warc_ts"],
                                    pa.timestamp("us", tz="UTC")),
                "html": pa.array(out["html"], pa.binary()),
                "content_type": pa.array(out["content_type"],
                                         pa.string()),
                "warc_file": pa.array(out["warc_file"], pa.string()),
            })
        if handle is not None:
            handle.close()

    return sel.mapInArrow(fetch, _DOC_SCHEMA)


def _entry_row(member: bytes, fname: str) -> dict | None:
    """One gzip member's bytes → a documents-frame row (or None for a
    torn/non-response member)."""
    try:
        for headers, content in iter_warc_records(member):
            if headers.get("warc-type") != "response":
                return None
            url = headers.get("warc-target-uri")
            ts = _parse_warc_date(headers.get("warc-date", ""))
            if not url or ts is None:
                return None
            split = _split_http(content)
            if split is None:
                return None
            ctype, body = split
            return {"url": url, "warc_ts": ts, "html": body,
                    "content_type": ctype, "warc_file": fname}
    except (OSError, EOFError, zlib.error):
        return None
    return None


_IDX_SCHEMA = ("urlkey string, cdx_ts string, url string, status int, "
               "mime string, digest string, offset long, length long, "
               "filename string")


def build_cdx(spark, path: str, *, bad_files_acc=None):
    """Index archives at scale: ``*.warc.gz`` files → the same frame
    ``read_cdx`` yields — the write-time half of the CDX workflow (a
    crawler indexes every archive once; every later partial read pays
    index bytes, not archive bytes).

    ``binaryFile`` scan (file-level parallelism, the ``read_warc``
    shape) → ``index_warc`` per archive inside ``mapInArrow``.  A
    plain/corrupt archive contributes zero entries and counts into
    ``bad_files_acc`` — an unindexable archive must be visible, not
    silently absent from the index.  Persist the result with
    ``df.write.parquet`` (columnar, predicate-pushdown-friendly) or
    as CDXJ text via ``format_cdxj`` for interchange.
    """
    import pyarrow as pa

    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def index(batches):
        cols = ["urlkey", "cdx_ts", "url", "status", "mime", "digest",
                "offset", "length", "filename"]
        types = {"status": pa.int32(), "offset": pa.int64(),
                 "length": pa.int64()}
        for batch in batches:
            out: dict = {c: [] for c in cols}
            for name, payload in zip(batch.column("path").to_pylist(),
                                     batch.column("content").to_pylist()):
                if name.startswith("file:"):
                    name = name[len("file:"):]
                try:
                    entries = index_warc(name, payload)
                except (ValueError, zlib.error):
                    if bad_files_acc is not None:
                        bad_files_acc.add(1)
                    continue
                for e in entries:
                    for c in cols:
                        out[c].append(e[c])
            yield pa.RecordBatch.from_pydict({
                c: pa.array(out[c], types.get(c, pa.string()))
                for c in cols})

    return files.mapInArrow(index, _IDX_SCHEMA)
