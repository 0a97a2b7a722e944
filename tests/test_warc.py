"""WARC ingestion source (sources/warc.py): record parsing, the
Spark mapInArrow reader, ingest telemetry, and composition with the
extraction pipeline."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from khl_pdf_ocr_spark.sources.warc import (iter_warc_records,
                                            parse_warc_file, read_warc,
                                            parse_warc_stats, write_warc)

TS = datetime(2026, 8, 17, 3, 15, 0, tzinfo=timezone.utc)

DOC_A = b"<html><body><p>" + b"alpha content words " * 20 + b"</p></body></html>"
DOC_B = b"<html><body><p>" + b"beta content words " * 20 + b"</p></body></html>"


def _archive(gzipped=False):
    return write_warc([("https://a.test/1", TS, DOC_A),
                       ("https://b.test/2", TS, DOC_B)], gzipped=gzipped)


@pytest.mark.parametrize("gzipped", [False, True])
def test_roundtrip_both_layouts(gzipped):
    rows, bad = parse_warc_file("f.warc", _archive(gzipped))
    assert bad == 0 and len(rows) == 2
    assert rows[0]["url"] == "https://a.test/1"
    assert rows[0]["html"] == DOC_A          # HTTP envelope stripped
    assert rows[0]["warc_ts"] == TS
    assert rows[0]["content_type"] == "text/html"
    assert rows[1]["html"] == DOC_B


def test_non_response_records_skipped():
    body = b"software: test\r\n"
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: " + str(len(body)).encode() +
            b"\r\n\r\n" + body + b"\r\n\r\n")
    payload = info + _archive()
    rows, bad = parse_warc_file("f", payload)
    assert bad == 0 and [r["url"] for r in rows] == \
        ["https://a.test/1", "https://b.test/2"]


def test_truncated_tail_stops_cleanly():
    payload = _archive() + b"WARC/1.0\r\nWARC-Type: response\r\nConte"
    rows, bad = parse_warc_file("f", payload)
    assert len(rows) == 2                    # the tear never yields garbage


def test_bad_record_counted_not_silent():
    # a response record with an unparseable WARC-Date: skipped + counted
    body = b"HTTP/1.1 200 OK\r\n\r\nx"
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://c.test/3\r\n"
           b"WARC-Date: not-a-date\r\n"
           b"Content-Length: " + str(len(body)).encode() +
           b"\r\n\r\n" + body + b"\r\n\r\n")
    rows, bad = parse_warc_file("f", rec + _archive())
    assert bad == 1 and len(rows) == 2


def test_fractional_seconds_warc11_date():
    rec = write_warc([("https://a.test/1", TS, DOC_A)])
    rec = rec.replace(b"2026-08-17T03:15:00Z", b"2026-08-17T03:15:00.250Z")
    rows, bad = parse_warc_file("f", rec)
    assert bad == 0 and rows[0]["warc_ts"].microsecond == 250_000


def test_read_warc_dataframe(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_archive())
    (tmp_path / "b.warc.gz").write_bytes(_archive(gzipped=True))
    df = read_warc(spark, str(tmp_path / "*.warc*"))
    rows = {(r["url"], r["warc_file"].rsplit("/", 1)[-1]): r
            for r in df.collect()}
    assert len(rows) == 4                    # 2 archives x 2 records
    r = rows[("https://a.test/1", "a.warc")]
    assert bytes(r["html"]) == DOC_A
    assert r["warc_ts"].replace(tzinfo=timezone.utc) == TS
    # schema is the input_hint shape (url, warc_ts, html, ...)
    assert [f.name for f in df.schema.fields[:3]] == \
        ["url", "warc_ts", "html"]
    assert df.schema["html"].dataType.simpleString() == "binary"
    assert df.schema["warc_ts"].dataType.simpleString() == "timestamp"

    stats = {r["warc_file"].rsplit("/", 1)[-1]: r for r in
             parse_warc_stats(spark, str(tmp_path / "*.warc*")).collect()}
    assert stats["a.warc"]["n_rows"] == 2
    assert stats["a.warc"]["n_bad_records"] == 0


def test_warc_to_extraction_pipeline(spark, tmp_path, fixture_tables):
    """The full front door: WARC archive -> read_warc -> the extraction
    kernel, byte-identical to extracting the same payloads from the
    parquet documents table (the reader adds no transformation)."""
    import duckdb

    from khl_pdf_ocr_spark.operators.extract import extract_documents

    docs_path, _ = fixture_tables
    sample = duckdb.sql(
        f"SELECT url, html FROM read_parquet('{docs_path}') LIMIT 6"
    ).fetchall()
    archive = write_warc([(u, TS, bytes(h)) for u, h in sample],
                         gzipped=True)
    (tmp_path / "crawl.warc.gz").write_bytes(archive)

    via_warc = {r["url"]: r["extracted_text"] for r in extract_documents(
        read_warc(spark, str(tmp_path / "crawl.warc.gz"))
        .select("url", "html")).collect()}
    docs = spark.read.parquet(docs_path)
    direct = {r["url"]: r["extracted_text"] for r in extract_documents(
        docs.filter(docs.url.isin([u for u, _ in sample]))).collect()}
    assert via_warc == direct and len(via_warc) == 6


def test_cli_extracts_from_warc(spark, tmp_path, fixture_tables):
    """--format warc on the product CLI: extraction straight from a raw
    crawl archive, stats line included — no staging table."""
    import json
    import os
    import subprocess
    import sys

    import duckdb

    docs_path, _ = fixture_tables
    sample = duckdb.sql(
        f"SELECT url, html FROM read_parquet('{docs_path}') LIMIT 5"
    ).fetchall()
    (tmp_path / "crawl.warc.gz").write_bytes(
        write_warc([(u, TS, bytes(h)) for u, h in sample], gzipped=True))

    out = str(tmp_path / "out")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.cli",
         "--input", str(tmp_path / "crawl.warc.gz"), "--output", out,
         "--format", "warc", "--mode", "all", "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["n_docs"] == 5
    urls = {r["url"] for r in
            spark.read.parquet(f"{out}/data").collect()}
    assert urls == {u for u, _ in sample}


def test_negative_content_length_terminates():
    """A corrupt negative Content-Length must stop the parse cleanly —
    the pre-fix code moved the position BACKWARDS and re-yielded the
    same record forever inside a Spark task (r5 review)."""
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://evil.test/\r\n"
           b"WARC-Date: 2026-08-17T03:15:00Z\r\n"
           b"Content-Length: -57\r\n\r\n")
    rows, bad = parse_warc_file("f", rec + _archive())
    assert rows == []                        # stops at the tear, no spin


def test_corrupt_gzip_counted_not_fatal():
    """zlib.error is not an OSError subclass — a bit-rotted .warc.gz
    must count as one bad archive, never abort the Spark job."""
    payload = b"\x1f\x8b\x08\x00" + b"\xde\xad\xbe\xef" * 64
    rows, bad = parse_warc_file("rot.warc.gz", payload)
    assert rows == [] and bad == 1


def test_lf_only_http_headers_keep_body():
    """Servers that emit bare-LF header lines are stored verbatim in
    WARC — the \\n\\n fallback must keep the document body instead of
    silently emitting html=b'' (r5 review)."""
    body = b"<html><body>lf server</body></html>"
    http = (b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n" + body)
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://lf.test/\r\n"
           b"WARC-Date: 2026-08-17T03:15:00Z\r\n"
           b"Content-Length: " + str(len(http)).encode() +
           b"\r\n\r\n" + http + b"\r\n\r\n")
    rows, bad = parse_warc_file("f", rec)
    assert bad == 0 and rows[0]["html"] == body
    assert rows[0]["content_type"] == "text/html"
    # an envelope with NO terminator at all is malformed → counted
    http2 = b"HTTP/1.1 200 OK\r\nContent-Type: text/html"
    rec2 = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://cut.test/\r\n"
            b"WARC-Date: 2026-08-17T03:15:00Z\r\n"
            b"Content-Length: " + str(len(http2)).encode() +
            b"\r\n\r\n" + http2 + b"\r\n\r\n")
    rows2, bad2 = parse_warc_file("f", rec2)
    assert rows2 == [] and bad2 == 1


def test_bad_records_accumulator_single_pass(spark, tmp_path):
    """Ingest telemetry from the SAME pass as the data (accumulator) —
    no second full parse of ~1 GB archives just for a count."""
    good = _archive()
    body = b"HTTP/1.1 200 OK\r\n\r\nx"
    bad_rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: https://c.test/3\r\n"
               b"WARC-Date: not-a-date\r\n"
               b"Content-Length: " + str(len(body)).encode() +
               b"\r\n\r\n" + body + b"\r\n\r\n")
    (tmp_path / "mixed.warc").write_bytes(bad_rec + good)
    acc = spark.sparkContext.accumulator(0)
    df = read_warc(spark, str(tmp_path / "mixed.warc"),
                   bad_records_acc=acc)
    assert df.count() == 2
    assert acc.value == 1


def test_streaming_warc_ingest_matches_batch(spark, tmp_path):
    """The streaming ingest is the batch reader behind a streaming
    trigger: same parser, value-identical rows — and a second run over
    the same checkpoint processes NOTHING new (exactly-once archives)."""
    from khl_pdf_ocr_spark.streaming.warc_stream import \
        run_streaming_warc_ingest

    inp = tmp_path / "landing"
    inp.mkdir()
    (inp / "a.warc").write_bytes(_archive())
    (inp / "b.warc.gz").write_bytes(_archive(gzipped=True))
    out = str(tmp_path / "ingested")
    run_streaming_warc_ingest(spark, str(inp), out)
    got = {(r["url"], r["warc_file"].rsplit("/", 1)[-1]):
           bytes(r["html"]) for r in
           spark.read.parquet(f"{out}/data").collect()}
    want = {(r["url"], r["warc_file"].rsplit("/", 1)[-1]):
            bytes(r["html"]) for r in
            read_warc(spark, str(inp) + "/*.warc*").collect()}
    assert got == want and len(got) == 4

    # restart over the same checkpoint: no duplicate rows
    run_streaming_warc_ingest(spark, str(inp), out)
    assert spark.read.parquet(f"{out}/data").count() == 4
    # a newly-landed archive IS picked up by the next drain
    (inp / "c.warc").write_bytes(write_warc(
        [("https://c.test/9", TS, DOC_A)]))
    run_streaming_warc_ingest(spark, str(inp), out)
    assert spark.read.parquet(f"{out}/data").count() == 5


def test_streaming_warc_ingest_with_extraction(spark, tmp_path,
                                               fixture_tables):
    """extract=True runs the kernel inside the stream — extracted text
    byte-identical to the batch pipeline over the same payloads."""
    import duckdb

    from khl_pdf_ocr_spark.operators.extract import extract_documents
    from khl_pdf_ocr_spark.streaming.warc_stream import \
        run_streaming_warc_ingest

    docs_path, _ = fixture_tables
    sample = duckdb.sql(
        f"SELECT url, html FROM read_parquet('{docs_path}') LIMIT 4"
    ).fetchall()
    inp = tmp_path / "landing"
    inp.mkdir()
    (inp / "crawl.warc.gz").write_bytes(
        write_warc([(u, TS, bytes(h)) for u, h in sample], gzipped=True))
    out = str(tmp_path / "extracted")
    run_streaming_warc_ingest(spark, str(inp), out, extract=True)
    got = {r["url"]: r["extracted_text"] for r in
           spark.read.parquet(f"{out}/data").collect()}
    docs = spark.read.parquet(docs_path)
    want = {r["url"]: r["extracted_text"] for r in extract_documents(
        docs.filter(docs.url.isin([u for u, _ in sample]))).collect()}
    assert got == want and len(got) == 4
