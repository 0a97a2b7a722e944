"""Streaming exact dedup: drop duplicate documents as they land.

The batch pipeline dedups with one hash shuffle (``operators.dedup.
exact_dedup``); on a continuous ingest the same semantics need STATE —
the set of fingerprints seen so far — which Structured Streaming manages
via ``dropDuplicatesWithinWatermark``:

- key   = md5 fingerprint of the normalized text (the exact-dedup key,
  shared with the batch operator via ``functions.text.fingerprint``);
- state is bounded by the event-time watermark: a duplicate arriving
  within ``dedup_horizon`` of the original is dropped; older state is
  evicted, so state size tracks the horizon's ingest volume, never the
  full corpus (the unbounded-state alternative,
  ``dropDuplicates``, would OOM a year-long stream);
- checkpointed → exactly-once across restarts, like the extraction
  stream (job.py).

At crawl scale the horizon mirrors the recrawl cadence: a page refetched
within the horizon dedups in-stream; refetches beyond it are handled by
the batch ``exact_dedup`` pass over the accumulated table.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions import text as X
from khl_pdf_ocr_spark.schemas import INPUT_SCHEMA

__all__ = ["run_streaming_dedup"]


def run_streaming_dedup(spark: SparkSession, input_dir: str, output_dir: str,
                        *, dedup_horizon: str = "1 hour",
                        text_col: str = "text",
                        max_files_per_trigger: int = 8,
                        await_termination: bool = True):
    """Drain ``input_dir`` into ``output_dir`` keeping the FIRST arrival
    per text fingerprint within the watermark horizon.

    Only rows with NON-EMPTY normalized text AND a valid ``warc_ts`` are
    dedup-eligible; everything else passes through untouched
    (fingerprint NULL).  Without the guard, every null/empty-text row in
    a horizon would collide on md5("") and all but the first would be
    silently dropped, and NULL event times give the state operator
    undefined expiry — both silent-data-loss modes.
    """
    stream = (spark.readStream.schema(INPUT_SCHEMA)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(input_dir)
              # normalize ONCE: the lower+regex pipeline is the dominant
              # per-row cost and feeds both the eligibility check and the
              # fingerprint
              .withColumn("_norm", X.normalized_text(
                  F.coalesce(F.col(text_col), F.lit("")))))
    eligible_cond = (F.length("_norm") > 0) & F.col("warc_ts").isNotNull()
    deduped = (stream.filter(eligible_cond)
               .withColumn("fingerprint", F.md5("_norm"))
               .withWatermark("warc_ts", dedup_horizon)
               .dropDuplicatesWithinWatermark(["fingerprint"]))
    passthrough = (stream.filter(~eligible_cond)
                   .withColumn("fingerprint",
                               F.lit(None).cast("string")))
    keyed = deduped.unionByName(passthrough).drop("_norm")
    query = (keyed.writeStream
             .format("parquet")
             .option("path", os.path.join(output_dir, "data"))
             .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
             .trigger(availableNow=True)
             .outputMode("append")
             .start())
    if await_termination:
        query.awaitTermination()
    return query
