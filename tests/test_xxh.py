"""functions/xxh.py: the pure-Python XXH64 must match Spark's JVM
``F.xxhash64`` bit-for-bit — it is the independent side of the
hash_split driver oracle, so a drift here would invalidate that gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions.xxh import (spark_hash_bucket,
                                             xxhash64_long,
                                             xxhash64_long_int)

CASES = [0, 1, 2, -1, -2, 17, 255, 256, -123456789, 123456789,
         2**31 - 1, -2**31, 2**62, -2**62, 2**63 - 1, -2**63,
         982451653, -982451653]


def test_matches_spark_xxhash64(spark):
    df = spark.createDataFrame([(v,) for v in CASES], "id long")
    rows = df.select(
        "id",
        F.xxhash64(F.col("id")).alias("h1"),
        F.xxhash64(F.col("id"), F.lit(17)).alias("h2"),
        F.xxhash64(F.col("id"), F.lit(23)).alias("h3"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(17)), F.lit(10_000))
        .alias("b")).collect()
    for r in rows:
        assert xxhash64_long(r["id"]) == r["h1"]
        assert xxhash64_long_int(r["id"], 17) == r["h2"]
        assert xxhash64_long_int(r["id"], 23) == r["h3"]
        assert spark_hash_bucket(r["id"], 17, 10_000) == r["b"]


def test_matches_hash_split_assignment(spark):
    """End-to-end: recompute hash_split's split column in pure Python
    for every doc id — the construction the driver oracle's golden
    table uses."""
    from khl_pdf_ocr_spark.operators.prepare import hash_split

    ids = list(range(200))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r["doc_id"]: r["split"]
           for r in hash_split(df, weights=weights, seed=17).collect()}

    def expect(i):
        b = spark_hash_bucket(i, 17, 10_000)
        if b < 8000:
            return "train"
        return "val" if b < 9000 else "test"

    assert got == {i: expect(i) for i in ids}
