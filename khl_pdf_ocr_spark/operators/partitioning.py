"""Size-bucketed salted repartitioning — the skew defense.

Per-document extraction cost is driven by payload size (and, with the
optional OCR stage, document type) with a 100-1000× spread; a plain
file-split scan therefore produces straggler tasks: one 5 MB document
costs as much as thousands of 2 KB pages, and Common-Crawl-style inputs
arrive clustered (one WARC file = one crawl host = similar sizes).

AQE cannot fix map-side UDF cost skew — there is no shuffle after the
scan unless we create one (SURVEY.md §4.3.1).  So the pipeline inserts
ONE explicit shuffle before the extraction map:

    key = (size_bucket(payload), salt)   salt = xxhash64(url) % n_salts

where bigger buckets get MORE salts, spreading exactly the documents
that are expensive.  The shuffle moves the raw payload bytes once; in
exchange every task of the extraction stage holds an i.i.d. cost sample,
which is what makes N→4N scaling efficiency hold (BASELINE.md gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["size_bucket", "with_size_bucket", "repartition_for_extraction",
           "BUCKET_BOUNDS", "SALTS_PER_BUCKET"]

# byte-size bucket upper bounds; the last bucket is open-ended
BUCKET_BOUNDS = [4_096, 65_536, 524_288, 4_194_304]
# salts per bucket ∝ expected per-doc cost, so heavy docs spread widest
SALTS_PER_BUCKET = [4, 16, 64, 256, 1024]


def size_bucket(payload: Column) -> Column:
    """0..len(BUCKET_BOUNDS) bucket index by payload byte length."""
    length = F.length(payload)
    expr = F.lit(len(BUCKET_BOUNDS))
    for i in range(len(BUCKET_BOUNDS) - 1, -1, -1):
        expr = F.when(length <= F.lit(BUCKET_BOUNDS[i]), F.lit(i)).otherwise(expr)
    return expr


def _salt_count(bucket: Column) -> Column:
    expr = F.lit(SALTS_PER_BUCKET[-1])
    for i in range(len(SALTS_PER_BUCKET) - 2, -1, -1):
        expr = F.when(bucket == F.lit(i), F.lit(SALTS_PER_BUCKET[i])).otherwise(expr)
    return expr


def with_size_bucket(df: DataFrame, payload_col: str = "html",
                     out_col: str = "size_bucket") -> DataFrame:
    return df.withColumn(out_col, size_bucket(F.col(payload_col)))


def repartition_for_extraction(df: DataFrame, num_partitions: int, *,
                               payload_col: str = "html",
                               key_col: str = "url") -> DataFrame:
    """One explicit shuffle on (size_bucket, salt) before the extract map."""
    bucket = size_bucket(F.col(payload_col))
    salt = F.pmod(F.xxhash64(F.col(key_col)), _salt_count(bucket))
    out = (
        df.withColumn("_sb", bucket)
        .withColumn("_salt", salt)
        .repartition(num_partitions, F.col("_sb"), F.col("_salt"))
        .drop("_sb", "_salt")
    )
    return out
