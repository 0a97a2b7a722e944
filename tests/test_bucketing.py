"""Bucketed co-located joins: the zero-shuffle plan, kept under test.

The scale claim (DEPLOY.md `bucket(4096, url)`): a join of two tables
bucketed identically on the join key needs NO Exchange on either side.
A regression here (bucket spec lost, mismatched counts, disabled
bucketing) silently reintroduces a full-corpus shuffle at 100 TB — so
the plan shape itself is the assertion.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.bucketing import read_table, write_bucketed
from khl_pdf_ocr_spark.plans.inspect import count_exchanges, physical_plan


@pytest.fixture()
def no_broadcast(spark):
    """Force the join planner away from broadcast so the bucketed
    sort-merge path is what gets planned (the 100 TB shape — neither
    side of a corpus-corpus join is broadcastable there)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(no_broadcast, tmp_path):
    spark = no_broadcast
    docs = spark.range(0, 500).select(
        F.concat(F.lit("https://example.com/"), F.col("id")).alias("url"),
        F.col("id").alias("payload_id"))
    extracted = spark.range(0, 500, 2).select(
        F.concat(F.lit("https://example.com/"), F.col("id")).alias("url"),
        (F.col("id") * 10).alias("n_lines"))
    try:
        write_bucketed(docs, "bk_docs", bucket_col="url", n_buckets=8,
                       sort_col="url", path=str(tmp_path / "bk_docs"))
        write_bucketed(extracted, "bk_extracted", bucket_col="url",
                       n_buckets=8, sort_col="url",
                       path=str(tmp_path / "bk_extracted"))
        joined = read_table(spark, "bk_docs").join(
            read_table(spark, "bk_extracted"), "url")
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan, plan
        # THE claim: both scans are bucket-aligned — zero Exchange
        assert count_exchanges(joined) == 0, plan
        assert joined.count() == 250
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_docs")
        spark.sql("DROP TABLE IF EXISTS bk_extracted")


def test_mismatched_bucket_counts_shuffle_one_side(no_broadcast, tmp_path):
    """Disclosure twin: UNEQUAL bucket counts reintroduce an Exchange —
    the discipline write_bucketed's single n_buckets argument exists to
    enforce at call sites."""
    spark = no_broadcast
    a = spark.range(0, 200).select(F.col("id").alias("k"),
                                   F.col("id").alias("va"))
    b = spark.range(0, 200).select(F.col("id").alias("k"),
                                   F.col("id").alias("vb"))
    try:
        write_bucketed(a, "bk_a", bucket_col="k", n_buckets=8,
                       path=str(tmp_path / "bk_a"))
        write_bucketed(b, "bk_b", bucket_col="k", n_buckets=4,
                       path=str(tmp_path / "bk_b"))
        joined = read_table(spark, "bk_a").join(read_table(spark, "bk_b"), "k")
        assert count_exchanges(joined) >= 1
        assert joined.count() == 200
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
