"""CDX(J) index support (sources/cdx.py): member-boundary indexing,
SURT keys, the JVM-side index reader, range-read fetch fidelity, and
the cli --format cdx surface."""

from __future__ import annotations

import base64
import gzip
import hashlib
from datetime import datetime, timezone

import pytest

from khl_pdf_ocr_spark.sources.cdx import (fetch_warc_records, format_cdxj,
                                           index_warc, read_cdx, surt_key)
from khl_pdf_ocr_spark.sources.warc import write_warc

TS = datetime(2026, 8, 17, 12, 0, 0, tzinfo=timezone.utc)

RECS = [(f"https://w{i}.site{i % 3}.com/page/{i}",
         TS, f"<html><body>doc {i} body {'x' * (i * 17)}</body></html>"
         .encode()) for i in range(12)]


def test_surt_key_cases():
    assert surt_key("https://en.wikipedia.org/wiki/A") \
        == "org,wikipedia,en)/wiki/a"
    assert surt_key("http://user@News.Example.co.uk:8080/X?Q=1") \
        == "uk,co,example,news)/x?q=1"
    assert surt_key("https://host.com") == "com,host)/"


def test_index_warc_offsets_and_digests():
    payload = write_warc(RECS, gzipped=True)
    entries = index_warc("a.warc.gz", payload)
    assert len(entries) == len(RECS)
    # every (offset, length) slice is an independently readable member
    # that decompresses back to exactly its record
    for e, (url, _, body) in zip(entries, RECS):
        member = payload[e["offset"]:e["offset"] + e["length"]]
        assert gzip.decompress(member).startswith(b"WARC/1.0")
        assert e["url"] == url
        assert e["status"] == 200 and e["mime"] == "text/html"
        want = "sha1:" + base64.b32encode(
            hashlib.sha1(body).digest()).decode()
        assert e["digest"] == want
    # offsets tile the archive exactly
    assert entries[0]["offset"] == 0
    for a, b in zip(entries, entries[1:]):
        assert b["offset"] == a["offset"] + a["length"]
    assert entries[-1]["offset"] + entries[-1]["length"] == len(payload)


def test_index_warc_skips_non_response_members_keeps_offsets():
    payload = write_warc(RECS[:2], gzipped=True)
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: https://w0.site0.com/page/0\r\n"
           b"WARC-Date: 2026-08-17T12:00:00Z\r\n"
           b"Content-Length: 0\r\n\r\n\r\n\r\n")
    spliced = (payload[:len(payload) // 2])
    # rebuild precisely: member boundaries from a fresh index
    first = index_warc("x", payload)[0]
    head = payload[:first["offset"] + first["length"]]
    tail = payload[first["offset"] + first["length"]:]
    spliced = head + gzip.compress(req) + tail
    entries = index_warc("x", spliced)
    assert [e["url"] for e in entries] == [RECS[0][0], RECS[1][0]]
    # the second response's offset accounts for the request member
    member = spliced[entries[1]["offset"]:
                     entries[1]["offset"] + entries[1]["length"]]
    assert b"page/1" in gzip.decompress(member)


def test_index_warc_rejects_plain_archives():
    with pytest.raises(ValueError, match="per-record-gzip"):
        index_warc("x", write_warc(RECS[:1], gzipped=False))


def test_read_cdx_parses_fields(spark, tmp_path):
    payload = write_warc(RECS, gzipped=True)
    entries = index_warc(str(tmp_path / "a.warc.gz"), payload)
    (tmp_path / "idx.cdxj").write_text(format_cdxj(entries))
    got = {r["url"]: r for r in
           read_cdx(spark, str(tmp_path / "idx.cdxj")).collect()}
    assert len(got) == len(RECS)
    for e in entries:
        r = got[e["url"]]
        assert r["offset"] == e["offset"]          # cast to long
        assert r["length"] == e["length"]
        assert r["status"] == 200 and r["mime"] == "text/html"
        assert r["urlkey"] == e["urlkey"]
        assert r["cdx_ts"] == "20260817120000"


def test_fetch_selected_records_byte_identical(spark, tmp_path):
    from pyspark.sql import functions as F

    # two archives; selection spans both
    pa_, pb = write_warc(RECS[:7], gzipped=True), \
        write_warc(RECS[7:], gzipped=True)
    fa, fb = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    open(fa, "wb").write(pa_)
    open(fb, "wb").write(pb)
    entries = index_warc(fa, pa_) + index_warc(fb, pb)
    (tmp_path / "idx.cdxj").write_text(format_cdxj(entries))

    idx = read_cdx(spark, str(tmp_path / "idx.cdxj"))
    sel = idx.filter(F.col("urlkey").like("%site0%"))   # 4 of 12
    acc = spark.sparkContext.accumulator(0)
    docs = fetch_warc_records(sel, bad_records_acc=acc).collect()
    want = {u: b for (u, _, b) in RECS if ".site0." in u}
    assert {r["url"]: bytes(r["html"]) for r in docs} == want
    # collect() yields session-tz-naive datetimes (session tz = UTC)
    assert all(r["warc_ts"].replace(tzinfo=timezone.utc) == TS
               for r in docs)
    assert all(r["content_type"] == "text/html" for r in docs)
    assert acc.value == 0

    # torn index rows (bad offset into gzip middle; missing file) are
    # counted and skipped, never fatal
    bad = sel.limit(0).sparkSession.createDataFrame(
        [(fa, 7, 50), (str(tmp_path / "gone.warc.gz"), 0, 10)],
        "filename string, offset long, length long")
    acc2 = spark.sparkContext.accumulator(0)
    out = fetch_warc_records(bad, bad_records_acc=acc2).collect()
    assert out == [] and acc2.value == 2


def test_cli_format_cdx_end_to_end(spark, tmp_path, fixture_tables):
    import json
    import os
    import subprocess
    import sys

    import duckdb

    # real extractable corpus: the committed fixture docs through the
    # WARC writer, then drive extraction purely from the index
    # selection
    docs_path, _ = fixture_tables
    sample = duckdb.sql(
        f"SELECT url, html FROM read_parquet('{docs_path}') LIMIT 24"
    ).fetchall()
    rows = [(u, TS, bytes(h)) for u, h in sample]
    payload = write_warc(rows, gzipped=True)
    arc = str(tmp_path / "c.warc.gz")
    open(arc, "wb").write(payload)
    (tmp_path / "idx.cdxj").write_text(
        format_cdxj(index_warc(arc, payload)))

    out = str(tmp_path / "ext")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.cli",
         "--format", "cdx", "--input", str(tmp_path / "idx.cdxj"),
         "--cdx-where", "status = 200", "--output", out,
         "--mode", "all", "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=repo)
    assert p.returncode == 0, p.stderr[-3000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["n_docs"] == 24
    rb = spark.read.parquet(f"{out}/data")
    assert rb.count() == 24
    # flag pairing
    q = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.cli",
         "--format", "parquet", "--input", "x", "--output", "y",
         "--cdx-where", "status = 200"],
        capture_output=True, text=True, timeout=120, cwd=repo)
    assert q.returncode == 2 and "cdx" in q.stderr


def test_build_cdx_distributed_indexer(spark, tmp_path):
    """build_cdx over a directory of archives == per-file index_warc;
    an unindexable (plain) archive counts and contributes nothing."""
    pa_, pb = write_warc(RECS[:5], gzipped=True), \
        write_warc(RECS[5:9], gzipped=True)
    fa, fb = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    open(fa, "wb").write(pa_)
    open(fb, "wb").write(pb)
    open(str(tmp_path / "plain.warc"), "wb").write(
        write_warc(RECS[9:], gzipped=False))

    from khl_pdf_ocr_spark.sources.cdx import build_cdx

    acc = spark.sparkContext.accumulator(0)
    got = sorted((r["filename"], r["offset"], r["length"], r["url"],
                  r["status"], r["digest"])
                 for r in build_cdx(spark, str(tmp_path / "*.warc*"),
                                    bad_files_acc=acc).collect())
    want = sorted((e["filename"], e["offset"], e["length"], e["url"],
                   e["status"], e["digest"])
                  for e in index_warc(fa, pa_) + index_warc(fb, pb))
    assert got == want and len(got) == 9
    assert acc.value == 1  # the plain archive, counted not silent

    # the built index round-trips through the fetch path
    idx = build_cdx(spark, str(tmp_path / "*.warc.gz"))
    docs = {r["url"]: bytes(r["html"])
            for r in fetch_warc_records(idx).collect()}
    assert docs == {u: b for (u, _, b) in RECS[:9]}


def test_fetch_counts_malformed_index_lines_and_eof_offsets(spark,
                                                            tmp_path):
    """The 'counted, never fatal' contract under torn INDEX data: a
    truncated CDXJ line yields NULL fields after from_json — it must
    count, not TypeError the job; an offset at/past a truncated
    archive's EOF must count, not vanish silently."""
    payload = write_warc(RECS[:3], gzipped=True)
    fa = str(tmp_path / "a.warc.gz")
    open(fa, "wb").write(payload)
    entries = index_warc(fa, payload)
    good = format_cdxj(entries)
    torn = good + 'com,x)/ 20260817120000 {"url": "https://x.com"\n'
    (tmp_path / "idx.cdxj").write_text(torn)

    idx = read_cdx(spark, str(tmp_path / "idx.cdxj"))
    assert idx.count() == 4
    acc = spark.sparkContext.accumulator(0)
    docs = fetch_warc_records(idx, bad_records_acc=acc).collect()
    assert len(docs) == 3 and acc.value == 1   # torn line counted

    # EOF offset: entry pointing past the archive end
    eof = spark.createDataFrame(
        [(fa, len(payload), 100)],
        "filename string, offset long, length long")
    acc2 = spark.sparkContext.accumulator(0)
    assert fetch_warc_records(eof, bad_records_acc=acc2).collect() == []
    assert acc2.value == 1
