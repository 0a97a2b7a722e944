"""Structured Streaming extraction: AvailableNow drain + checkpoint resume."""

import os
import shutil

from pyspark.sql import functions as F

from khl_pdf_ocr_spark.streaming.job import run_streaming_extraction


def test_streaming_drains_and_matches_goldens(spark, fixture_tables, tmp_path):
    docs_path, gold_path = fixture_tables
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    shutil.copy(docs_path, os.path.join(in_dir, "part-0.parquet"))
    out_dir = str(tmp_path / "out")

    run_streaming_extraction(spark, in_dir, out_dir, max_files_per_trigger=4)

    res = spark.read.parquet(os.path.join(out_dir, "data"))
    g = spark.read.parquet(gold_path).filter(F.col("mode") == "all")
    assert res.count() == g.count()
    joined = res.alias("r").join(g.alias("g"), "url")
    n_match = joined.filter(
        F.col("r.extracted_text").eqNullSafe(F.col("g.extracted_text"))).count()
    assert n_match == g.count()

    # second drain: checkpoint knows the file was processed → no dupes
    run_streaming_extraction(spark, in_dir, out_dir, max_files_per_trigger=4)
    assert spark.read.parquet(os.path.join(out_dir, "data")).count() == g.count()
