"""Document-table readers/writers.

Production target is an Iceberg table (BASELINE.json: "over an Iceberg
table of 10^12 Common-Crawl-style documents") — snapshot-isolated scans,
metadata partition/file pruning on ``warc_ts``/bucket columns, and
transactional ``overwritePartitions`` for the idempotent-resume story.
The Iceberg runtime jar is not in this sandbox, so the reader gates on
catalog availability (an explicit classpath probe, never a blanket
except) and falls back to parquet LOUDLY; all downstream code is
format-agnostic DataFrame.  ``tests/test_iceberg.py`` exercises the real
catalog path end-to-end whenever the runtime jar IS present.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_documents", "write_output", "iceberg_available"]

_ICEBERG_CATALOG_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_ICEBERG_CATALOG_CLASS)
        return True
    except Exception:
        return False


def read_documents(spark: SparkSession, path: str, fmt: str = "parquet",
                   *, cdx_where: str | None = None,
                   cdx_base: str | None = None) -> DataFrame:
    """Load the (url, warc_ts, html, text, lang) table.

    ``fmt="iceberg"`` expects ``path`` to be a catalog table name; when
    the runtime jar is absent the reader degrades to parquet with a
    stderr warning (a silent fallback would mask a misconfigured
    cluster).  With the jar present, real read errors propagate.
    ``fmt="warc"`` reads raw Common-Crawl-style archives (plain or
    ``.warc.gz``) through ``sources.warc.read_warc`` — the ingest
    front door, yielding the same (url, warc_ts, html, …) shape.
    ``fmt="cdx"`` treats ``path`` as CDXJ index files and range-reads
    only the selected records' gzip members (``cdx_where`` = SQL
    predicate over the index columns; ``cdx_base`` = directory for
    relative archive filenames) — the partial-crawl access path.
    """
    if fmt == "cdx":
        from pyspark.sql import functions as F

        from khl_pdf_ocr_spark.sources.cdx import (fetch_warc_records,
                                                   read_cdx)

        idx = read_cdx(spark, path)
        if cdx_where:
            idx = idx.filter(F.expr(cdx_where))
        return fetch_warc_records(idx, base_dir=cdx_base)
    if fmt == "warc":
        from khl_pdf_ocr_spark.sources.warc import read_warc

        return read_warc(spark, path)
    if fmt == "iceberg":
        if iceberg_available(spark):
            return spark.read.format("iceberg").load(path)
        print("WARNING: iceberg runtime not on the classpath; "
              f"falling back to parquet for {path!r}", file=sys.stderr)
        fmt = "parquet"
    if path.endswith(".parquet") or fmt == "parquet":
        return spark.read.parquet(path)
    return spark.read.format(fmt).load(path)


def write_output(df: DataFrame, path: str, fmt: str = "parquet",
                 mode: str = "overwrite",
                 partition_by: tuple[str, ...] = ()) -> None:
    """Write results.

    ``fmt="iceberg"`` + ``mode="overwrite"`` creates/replaces the table;
    ``mode="overwrite_partitions"`` is the idempotent-resume commit
    (DEPLOY.md): Iceberg's transactional ``overwritePartitions`` swaps
    exactly the partitions present in ``df`` — re-running a completed
    bucket replaces its own partition and touches nothing else.  The
    parquet twin of that contract is a dynamic-mode partition overwrite
    over ``partition_by`` columns (Iceberg takes its partitioning from
    the table spec instead).
    """
    if fmt == "iceberg":
        if iceberg_available(df.sparkSession):
            if mode == "overwrite_partitions":
                df.writeTo(path).overwritePartitions()
            else:
                w = df.writeTo(path)
                if partition_by:
                    from pyspark.sql import functions as F

                    w = w.partitionedBy(*[F.col(c) for c in partition_by])
                w.createOrReplace()
            return
        print("WARNING: iceberg runtime not on the classpath; "
              f"falling back to parquet for {path!r}", file=sys.stderr)
    if mode == "overwrite_partitions":  # parquet twin: dynamic overwrite
        if not partition_by:
            # partitionBy() with no columns degrades to a FULL-directory
            # dynamic overwrite: an idempotent-resume re-run of one bucket
            # would wipe every other bucket's completed output (ADVICE r3)
            raise ValueError(
                "overwrite_partitions on parquet requires partition_by "
                "columns; an empty partition spec would overwrite the whole "
                "directory instead of swapping this run's partitions")
        (df.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(*partition_by).parquet(path))
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
