"""Bucketed tables: co-located, shuffle-free url-keyed joins.

DEPLOY.md's Iceberg layout buckets both the crawl table and the
extracted-output table by ``bucket(4096, url)`` so that url-keyed joins
(extraction output ↔ source docs, phase-1 ↔ OCR rows, incremental-crawl
reconciliation) are CO-LOCATED: every join task reads matching buckets
from both sides and the join planner drops the Exchange on both sides
entirely.  At 100 TB that is the difference between a full-corpus
shuffle per join and zero shuffle.

This module is the Spark-native (catalog/parquet) twin of that layout —
``spark.write.bucketBy`` tables carry the bucket spec in the catalog,
and Catalyst plans bucket-compatible joins without Exchanges
(plan-asserted in tests/test_bucketing.py).

Bucket-count discipline: both sides must use the SAME ``n_buckets``
(Spark joins bucketed tables shuffle-free only on equal counts; a
mismatched side gets re-shuffled silently — the helper takes the count
once so call sites can't drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table"]


def write_bucketed(df: DataFrame, table: str, *, bucket_col: str = "url",
                   n_buckets: int = 64, sort_col: str | None = None,
                   fmt: str = "parquet", path: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed catalog table.

    ``sort_col`` additionally sorts within buckets (bucket+sort lets a
    sort-merge join skip its Sort nodes too).  ``path`` makes it an
    external table (data outside the warehouse dir).
    """
    w = df.write.mode(mode).format(fmt).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the bucket spec rides along for join planning."""
    return spark.table(table)
