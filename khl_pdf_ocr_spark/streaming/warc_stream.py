"""Streaming WARC ingest: extract documents from crawl archives AS
THEY LAND, instead of waiting for the dump to complete.

    readStream (binaryFile, *.warc*) → warc_records_frame (the SAME
      Arrow-batched parser as the batch reader) → optional extraction
      kernel → writeStream parquet, checkpointed, Trigger.AvailableNow

- One micro-batch row per archive file; ``maxFilesPerTrigger`` bounds
  the bytes held per micro-batch (archives are ~1 GB each — this is
  the backlog-to-memory valve, same role as in ``streaming/job.py``).
- ``Trigger.AvailableNow`` drains the current backlog then stops;
  the streaming checkpoint makes archive processing exactly-once
  across restarts — a crashed ingest resumes at the next unprocessed
  archive, never re-emitting rows for a processed one (the streaming
  twin of the batch manifest resume).
- The parser is SHARED with ``sources.warc.read_warc`` (one codepath,
  two triggers), so batch and streaming ingest are value-identical by
  construction — asserted in tests, not just claimed.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from khl_pdf_ocr_spark.sources.warc import warc_records_frame

__all__ = ["run_streaming_warc_ingest"]

# binaryFile's fixed schema — streaming file sources require it stated
_BINARY_FILE_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("modificationTime", T.TimestampType()),
    T.StructField("length", T.LongType()),
    T.StructField("content", T.BinaryType()),
])


def run_streaming_warc_ingest(spark: SparkSession, input_dir: str,
                              output_dir: str, *, extract: bool = False,
                              mode: str = "all",
                              max_files_per_trigger: int = 4,
                              await_termination: bool = True):
    """Drain ``input_dir``'s ``*.warc*`` backlog into ``output_dir``.

    ``extract=False`` lands the raw documents table (url, warc_ts,
    html, …) — the ingest-only shape feeding a downstream batch
    pipeline; ``extract=True`` runs the extraction kernel in the same
    stream (per-row pure map — no watermark/state needed) and lands
    extracted rows directly.  Returns the StreamingQuery (awaited when
    ``await_termination``).
    """
    files = (spark.readStream.format("binaryFile")
             .schema(_BINARY_FILE_SCHEMA)
             .option("pathGlobFilter", "*.warc*")
             .option("maxFilesPerTrigger", str(max_files_per_trigger))
             .load(input_dir))
    docs = warc_records_frame(files)
    if extract:
        from khl_pdf_ocr_spark.operators.extract import extract_documents

        docs = extract_documents(docs.select("url", "html"), mode=mode)
    query = (docs.writeStream
             .format("parquet")
             .option("path", os.path.join(output_dir, "data"))
             .option("checkpointLocation",
                     os.path.join(output_dir, "_checkpoint"))
             .trigger(availableNow=True)
             .start())
    if await_termination:
        query.awaitTermination()
    return query
