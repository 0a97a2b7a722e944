"""Streaming extraction: continuous ingest of newly-landed documents.

The reference is synchronous request/response (one HTTP call per
document, ``app.py:376-419``); its streaming-shaped analogue at crawl
scale is "extract every document as it lands in the table".  This module
expresses the SAME extraction dataflow as a Structured Streaming job:

    readStream (file source, INPUT_SCHEMA) → mapInArrow kernel
      → writeStream parquet, checkpointed, Trigger.AvailableNow

- ``Trigger.AvailableNow`` drains everything present then stops —
  batch-equivalent semantics, streaming checkpoints: restart-safe
  exactly-once file processing (the streaming twin of the manifest
  resume in pipeline.py).
- ``maxFilesPerTrigger`` bounds micro-batch size so executor-python
  memory stays flat regardless of backlog.
- No watermark/stateful ops are needed: extraction is per-row pure map;
  the windowed/sessionized analytics live downstream (see
  ``__spark_entry__.queries()['events_sessionize']`` for the batch
  shape of the same computation).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from khl_pdf_ocr_spark.operators.extract import extract_documents
from khl_pdf_ocr_spark.schemas import INPUT_SCHEMA

__all__ = ["run_streaming_extraction"]


def run_streaming_extraction(spark: SparkSession, input_dir: str, output_dir: str,
                             *, max_files_per_trigger: int = 8,
                             await_termination: bool = True):
    """Drain ``input_dir`` (parquet file source) into ``output_dir``.

    Returns the StreamingQuery (already awaited when
    ``await_termination``)."""
    stream = (spark.readStream.schema(INPUT_SCHEMA)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(input_dir))
    out = extract_documents(stream)
    query = (out.writeStream
             .format("parquet")
             .option("path", os.path.join(output_dir, "data"))
             .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
             .trigger(availableNow=True)
             .outputMode("append")
             .start())
    if await_termination:
        query.awaitTermination()
    return query
