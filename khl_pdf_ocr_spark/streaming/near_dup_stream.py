"""Streaming near-dup flags — the structured-streaming twin of
``dedup.minhash_lsh_incremental``'s history half.

A stream of newly crawled documents is flagged against the STATIC
persisted signature store using only stateless narrow ops plus one
watermarked dedup:

    per-row minhash signature (``with_minhash_signature`` — array
    expressions, no explode→groupBy aggregation state)
      → stateless band explode (``_band_signatures``)
      → stream-static equi-join on (band, bh) against the store's
        re-banded signatures (text never read; AQE broadcasts the
        probe side when small)
      → signature-agreement estimate ≥ threshold
      → ``dropDuplicatesWithinWatermark`` on (id, id_b) — a pair can
        match in several bands; the watermark bounds that state.

Hot history buckets are truncated on the STATIC side before the query
starts (``_truncate_hot_buckets`` — same bound + audit as the batch
operator), so a boilerplate clump in the store can never amplify a
micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from khl_pdf_ocr_spark.operators.dedup import (_band_signatures,
                                               _truncate_hot_buckets,
                                               DEFAULT_MAX_BUCKET,
                                               signature_jaccard_estimate,
                                               with_minhash_signature)

__all__ = ["streaming_near_dup_flags", "run_streaming_near_dup"]

INPUT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("text", T.StringType()),
])


def streaming_near_dup_flags(stream: DataFrame, seen_sigs: DataFrame, *,
                             text_col: str = "text", id_col: str = "doc_id",
                             ts_col: str = "warc_ts", num_perm: int = 64,
                             bands: int = 16, shingle_n: int = 3,
                             verify_threshold: float = 0.5,
                             max_bucket: int | None = DEFAULT_MAX_BUCKET,
                             horizon: str = "1 hour",
                             audit: dict | None = None) -> DataFrame:
    """(streaming df, static (id, sig) store) → streaming flags
    (id, warc_ts, id_b, jaccard).  Rows with NULL/empty text or NULL
    event time are not flaggable and are dropped here — run the exact
    passthrough/dedup stream for those; this operator only ANSWERS
    "is this near-identical to something already ingested?"."""
    eligible = stream.filter(
        # rlike(\S): F.trim strips only spaces — a "\n"-only doc must
        # not slip past the not-flaggable filter (r4 review)
        F.col(text_col).isNotNull() & F.col(text_col).rlike(r"\S")
        & F.col(ts_col).isNotNull())
    sigged = with_minhash_signature(eligible, text_col=text_col,
                                    id_col=id_col, num_perm=num_perm,
                                    shingle_n=shingle_n)
    s_banded = _band_signatures(
        sigged.select(F.col(id_col).alias("id"), F.col(ts_col), "sig"),
        num_perm=num_perm, bands=bands, carry=(ts_col, "sig"))

    hist_sigs = seen_sigs.select("id", "sig")
    probe = hist_sigs.select(F.size("sig").alias("n")).first()
    if probe is not None and probe["n"] != num_perm:
        raise ValueError(
            f"signature store width {probe['n']} != num_perm {num_perm}")
    # carry= keeps sig attached through the band explode — a pure
    # projection, not a second store join per micro-batch (r4 review)
    h_banded = _band_signatures(hist_sigs, num_perm=num_perm, bands=bands,
                                carry=("sig",))
    if max_bucket is not None:
        h_banded = _truncate_hot_buckets(h_banded, max_bucket, audit)
    h_side = h_banded.select(F.col("id").alias("id_b"), "band", "bh",
                             F.col("sig").alias("sig_b"))

    est = signature_jaccard_estimate(F.col("sig"), F.col("sig_b"),
                                     num_perm=num_perm)
    flags = (s_banded.join(h_side, ["band", "bh"])
             .select("id", ts_col, "id_b", est.alias("jaccard"))
             .filter(F.col("jaccard") >= verify_threshold))
    return (flags.withWatermark(ts_col, horizon)
            .dropDuplicatesWithinWatermark(["id", "id_b"]))


def run_streaming_near_dup(spark: SparkSession, input_dir: str,
                           output_dir: str, store_path: str, *,
                           max_files_per_trigger: int = 8,
                           await_termination: bool = True, **kwargs):
    """Drain ``input_dir`` (parquet docs) against the signature store at
    ``store_path``; append flags under ``<output_dir>/data``."""
    seen_sigs = spark.read.parquet(store_path)
    stream = (spark.readStream.schema(INPUT_SCHEMA)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(input_dir))
    flags = streaming_near_dup_flags(stream, seen_sigs, **kwargs)
    query = (flags.writeStream
             .format("parquet")
             .option("path", os.path.join(output_dir, "data"))
             .option("checkpointLocation",
                     os.path.join(output_dir, "_checkpoint"))
             .trigger(availableNow=True)
             .outputMode("append")
             .start())
    if await_termination:
        query.awaitTermination()
    return query
