"""WET export/ingest round trip (sources/wet.py)."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.sources.wet import export_wet, read_wet, write_wet

pytestmark = pytest.mark.usefixtures("spark")

TS = datetime(2026, 8, 17, 3, 15, 0, tzinfo=timezone.utc)


def test_write_read_roundtrip(spark, tmp_path):
    rows = [("https://a.example.com/1", TS, "первый документ\nline two"),
            ("https://b.example.org/2", TS, "plain ascii text"),
            ("https://c.example.net/3", TS, "")]
    payload = write_wet(rows, gzipped=True)
    (tmp_path / "seg-0001.warc.wet.gz").write_bytes(payload)
    got = {(r["url"], r["warc_ts"].replace(tzinfo=timezone.utc), r["text"])
           for r in read_wet(spark, str(tmp_path / "*.warc.wet.gz"))
           .collect()}
    assert got == set(rows)


def test_read_skips_non_conversion_and_counts_bad(spark, tmp_path):
    from khl_pdf_ocr_spark.sources.warc import write_warc

    wet = write_wet([("https://ok.example.com/", TS, "keep me")],
                    gzipped=True)
    # a response record (html container) mixed in: silently skipped
    resp = write_warc([("https://resp.example.com/", TS, b"<p>x</p>")],
                      gzipped=True)
    (tmp_path / "mixed.warc.wet.gz").write_bytes(resp + wet)
    (tmp_path / "ok2.warc.wet.gz").write_bytes(wet)
    # gzip-rotted archive: the decompress fails, the FILE is counted
    # bad and skipped, the job never aborts
    (tmp_path / "rot.warc.wet.gz").write_bytes(
        b"\x1f\x8b\x08BIT-ROTTED-MEMBER")
    acc = spark.sparkContext.accumulator(0)
    df = read_wet(spark, str(tmp_path / "*.warc.wet.gz"),
                  bad_records_acc=acc)
    urls = [r["url"] for r in df.collect()]
    assert urls == ["https://ok.example.com/"] * 2
    assert acc.value >= 1   # the rotted file was counted, not fatal


def test_export_wet_distributed_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"https://site.example.com/p{i}", TS, f"doc body {i}")
         for i in range(20)],
        "url string, warc_ts timestamp, extracted_text string")
    out = str(tmp_path / "wet_out")
    manifest = export_wet(df, out, n_files=3)
    assert len(manifest) == 3
    assert sum(m["n_records"] for m in manifest) == 20
    import os
    files = sorted(os.listdir(out))
    assert files == sorted(m["file"] for m in manifest)
    assert all(f.endswith(".warc.wet.gz") for f in files)
    # read back: content-complete round trip
    back = read_wet(spark, f"{out}/*.warc.wet.gz")
    got = {(r["url"], r["text"]) for r in back.collect()}
    assert got == {(f"https://site.example.com/p{i}", f"doc body {i}")
                   for i in range(20)}
    # NULL text/ts must serialize deterministically, not crash
    df2 = spark.createDataFrame(
        [("https://n.example.com/", None, None)],
        "url string, warc_ts timestamp, extracted_text string")
    m2 = export_wet(df2, str(tmp_path / "wet2"), n_files=1)
    assert m2[0]["n_records"] == 1
    r2 = read_wet(spark, str(tmp_path / "wet2") + "/*.warc.wet.gz") \
        .collect()[0]
    assert r2["text"] == "" and r2["warc_ts"] is not None


def test_export_chains_from_extraction_output(spark, tmp_path):
    """extraction output table -> WET segments: the interop hand-off."""
    from khl_pdf_ocr_spark.pipeline import run_extraction

    body = b"<p>" + b"wet chain body text word " * 30 + b"</p>"
    docs = spark.createDataFrame(
        [(f"https://chain.example.com/p{i}", body) for i in range(4)],
        "url string, html binary") \
        .withColumn("warc_ts", F.lit(TS)) \
        .withColumn("text", F.lit(None).cast("string")) \
        .withColumn("lang", F.lit("en"))
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    out = str(tmp_path / "extracted")
    run_extraction(spark, inp, out, mode="all")
    # the extraction output drops warc_ts (it's in the input table);
    # a real exporter joins it back or stamps the crawl date
    extracted = spark.read.parquet(f"{out}/data") \
        .withColumn("warc_ts", F.lit(TS))
    manifest = export_wet(extracted, str(tmp_path / "wet"), n_files=2)
    assert sum(m["n_records"] for m in manifest) == 4
    back = read_wet(spark, str(tmp_path / "wet") + "/*.warc.wet.gz")
    joined = (back.select("url", F.col("text").alias("wet_text"))
              .join(extracted.select("url", "extracted_text"), "url"))
    assert joined.count() == 4
    mism = joined.filter(
        ~F.col("wet_text").eqNullSafe(F.col("extracted_text"))).count()
    assert mism == 0
