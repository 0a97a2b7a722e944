"""Iceberg integration — DEPLOY.md's table + resume contract in code.

Runs end-to-end whenever the Iceberg Spark runtime jar is on the
classpath; SKIPS (visibly, never silently passes) when it isn't — this
sandbox ships no jar, so here these document + gate the deployment
contract: a hadoop-catalog table, ``write_output``'s create path, and
the ``overwritePartitions`` idempotent-resume commit.

The parquet twin of the resume commit (dynamic partition overwrite) has
no jar dependency and is tested unconditionally below — the two code
paths share the ``write_output(mode="overwrite_partitions")`` surface.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.sources.readers import (iceberg_available,
                                               read_documents, write_output)


def _rows(spark, bucket_vals):
    return spark.createDataFrame(
        [(f"https://example.com/{b}/{i}", b, f"text {b}-{i}")
         for b in bucket_vals for i in range(3)],
        ["url", "bucket", "extracted_text"])


@pytest.fixture()
def iceberg_spark(spark, tmp_path):
    """The shared session with a hadoop catalog bound to a temp
    warehouse (catalogs instantiate lazily, so runtime conf works)."""
    if not iceberg_available(spark):
        pytest.skip("iceberg runtime jar not on the classpath")
    spark.conf.set("spark.sql.catalog.it_local",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it_local.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it_local.warehouse",
                   str(tmp_path / "warehouse"))
    return spark


def test_iceberg_roundtrip_and_overwrite_partitions(iceberg_spark):
    spark = iceberg_spark
    tbl = "it_local.db.docs"
    write_output(_rows(spark, [0, 1, 2]), tbl, fmt="iceberg",
                 partition_by=("bucket",))
    assert read_documents(spark, tbl, fmt="iceberg").count() == 9

    # the resume commit: re-writing bucket 1 swaps ONLY bucket 1
    redo = _rows(spark, [1]).withColumn(
        "extracted_text", F.lit("redone"))
    write_output(redo, tbl, fmt="iceberg", mode="overwrite_partitions")
    out = read_documents(spark, tbl, fmt="iceberg")
    assert out.count() == 9
    assert out.filter("bucket = 1").filter(
        "extracted_text = 'redone'").count() == 3
    assert out.filter("bucket != 1").filter(
        "extracted_text = 'redone'").count() == 0


def test_parquet_twin_overwrite_partitions(spark, tmp_path):
    """Jar-free: the same write_output surface, dynamic parquet
    partition overwrite — proves the resume-commit semantics this
    sandbox CAN execute (Iceberg's overwritePartitions is the
    transactional upgrade of exactly this behavior)."""
    path = str(tmp_path / "docs_pq")
    write_output(_rows(spark, [0, 1, 2]), path, partition_by=("bucket",))
    assert spark.read.parquet(path).count() == 9

    redo = _rows(spark, [1]).withColumn("extracted_text", F.lit("redone"))
    write_output(redo, path, mode="overwrite_partitions",
                 partition_by=("bucket",))
    out = spark.read.parquet(path)
    assert out.count() == 9  # untouched buckets survived the overwrite
    assert out.filter("bucket = 1").filter(
        "extracted_text = 'redone'").count() == 3
    assert out.filter("bucket != 1").filter(
        "extracted_text = 'redone'").count() == 0


def test_iceberg_fallback_is_loud(spark, tmp_path, capsys):
    """Without the jar, fmt='iceberg' on a PATH degrades to parquet with
    a stderr warning — never silently."""
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present — fallback path not taken")
    path = str(tmp_path / "fallback_pq")
    write_output(_rows(spark, [0]), path, fmt="iceberg")
    assert "iceberg runtime not on the classpath" in capsys.readouterr().err
    assert read_documents(spark, path, fmt="iceberg").count() == 3
    assert "iceberg runtime not on the classpath" in capsys.readouterr().err
