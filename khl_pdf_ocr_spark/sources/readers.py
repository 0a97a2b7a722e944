"""Document-table readers.

Production target is an Iceberg table (BASELINE.json: "over an Iceberg
table of 10^12 Common-Crawl-style documents") — snapshot-isolated scans,
metadata partition/file pruning on ``warc_ts``/bucket columns, and
transactional ``overwritePartitions`` for the idempotent-resume story.
The Iceberg runtime jar is not in this sandbox, so the reader gates on
catalog availability and falls back to parquet; all downstream code is
format-agnostic DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_documents", "write_output"]


def read_documents(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Load the (url, warc_ts, html, text, lang) table.

    ``fmt="iceberg"`` expects ``path`` to be a catalog table name.
    """
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(path)
        except Exception:
            # no iceberg runtime on the classpath → parquet fallback
            pass
    if path.endswith(".parquet") or fmt == "parquet":
        return spark.read.parquet(path)
    return spark.read.format(fmt).load(path)


def write_output(df: DataFrame, path: str, fmt: str = "parquet",
                 mode: str = "overwrite") -> None:
    if fmt == "iceberg":
        try:
            df.writeTo(path).createOrReplace()
            return
        except Exception:
            pass
    df.write.mode(mode).parquet(path)
