"""Two-phase OCR fallback plumbing (fake engine) + CLI job entry."""

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.extract import extract_documents
from khl_pdf_ocr_spark.operators.ocr_fallback import needs_ocr, with_ocr_fallback


@pytest.fixture(scope="module")
def phase1(spark, fixture_tables):
    docs_path, _ = fixture_tables
    docs = spark.read.parquet(docs_path)
    out = extract_documents(docs)
    out.cache()
    out.count()
    yield docs, out
    out.unpersist()


def test_needs_ocr_selects_failed_pdfs_only(phase1):
    _, out = phase1
    failed = needs_ocr(out)
    rows = failed.select("engine", "error").distinct().collect()
    assert all(r["engine"] == "all" for r in rows)
    n = failed.count()
    assert 0 < n < out.count()  # the no-referee-header variants


def test_fallback_noop_without_engine(phase1):
    docs, out = phase1
    merged = with_ocr_fallback(out, docs, ocr_stage=None)
    assert merged.count() == out.count()


def test_fallback_merges_fake_engine_rows(phase1):
    docs, out = phase1
    n_failed = needs_ocr(out).count()

    def fake_ocr_stage(failed_docs):
        # schema-stable stand-in for the tesseract pass: flags the rows
        sub = extract_documents(failed_docs)
        return sub.withColumn("engine", F.lit("ocr-fake"))

    merged = with_ocr_fallback(out, docs, ocr_stage=fake_ocr_stage)
    assert merged.count() == out.count()  # no dupes, no losses
    assert merged.filter(F.col("engine") == "ocr-fake").count() == n_failed
    assert merged.select("url").distinct().count() == out.count()


def test_cli_end_to_end(fixture_tables, tmp_path):
    docs_path, _ = fixture_tables
    out_dir = str(tmp_path / "cliout")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.cli",
         "--input", docs_path, "--output", out_dir,
         "--mode", "all", "--cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1])
    assert stats["n_docs"] == 200
    assert stats["docs_per_sec"] > 0


def test_preflight(spark):
    from khl_pdf_ocr_spark.pipeline import preflight

    res = preflight(spark)
    assert res["ok"] is True
    assert res["engine"] == "ready"
    assert res["ocr"] is False  # no tesseract/PyMuPDF in this sandbox
    assert res["parallelism"] >= 1


def test_cli_debug_and_ocr_flags(fixture_tables, tmp_path):
    docs_path, _ = fixture_tables
    out_dir = str(tmp_path / "cliout_dbg")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.cli",
         "--input", docs_path, "--output", out_dir,
         "--mode", "refs", "--cpus", "4", "--debug", "--ocr"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert p.returncode == 0, p.stderr[-2000:]
    # no engine in this sandbox → graceful degradation warning on stderr
    assert "ocr_engine_missing" in p.stderr
    import pyarrow.parquet as pq
    import glob
    files = glob.glob(out_dir + "/data/*.parquet")
    cols = pq.ParquetFile(files[0]).schema_arrow.names
    assert "debug_json" in cols


def test_cli_resume_rejects_ocr_and_debug(fixture_tables, tmp_path):
    docs_path, _ = fixture_tables
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.cli",
         "--input", docs_path, "--output", str(tmp_path / "x"),
         "--resume", "--ocr", "--cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=180)
    assert p.returncode != 0
    assert "does not support --ocr/--debug" in p.stderr
