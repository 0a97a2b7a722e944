"""Structured Streaming extraction: AvailableNow drain + checkpoint resume."""

import os
import shutil

from pyspark.sql import functions as F

from khl_pdf_ocr_spark.streaming.job import run_streaming_extraction


def test_streaming_drains_and_matches_goldens(spark, fixture_tables, tmp_path):
    docs_path, gold_path = fixture_tables
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    shutil.copy(docs_path, os.path.join(in_dir, "part-0.parquet"))
    out_dir = str(tmp_path / "out")

    run_streaming_extraction(spark, in_dir, out_dir, max_files_per_trigger=4)

    res = spark.read.parquet(os.path.join(out_dir, "data"))
    g = spark.read.parquet(gold_path).filter(F.col("mode") == "all")
    assert res.count() == g.count()
    joined = res.alias("r").join(g.alias("g"), "url")
    n_match = joined.filter(
        F.col("r.extracted_text").eqNullSafe(F.col("g.extracted_text"))).count()
    assert n_match == g.count()

    # second drain: checkpoint knows the file was processed → no dupes
    run_streaming_extraction(spark, in_dir, out_dir, max_files_per_trigger=4)
    assert spark.read.parquet(os.path.join(out_dir, "data")).count() == g.count()


def test_streaming_dedup_drops_in_horizon_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a duplicate text landing within the
    horizon is dropped; the first arrival survives; checkpointed restart
    processes nothing twice."""
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from khl_pdf_ocr_spark.streaming.dedup_stream import run_streaming_dedup

    def ts(minute):
        return datetime(2026, 1, 1, 12, minute, tzinfo=timezone.utc)

    in_dir = str(tmp_path / "in"); os.makedirs(in_dir)
    out_dir = str(tmp_path / "out")
    rows = [
        {"url": "u1", "warc_ts": ts(0), "html": b"x", "text": "same text body", "lang": "en"},
        {"url": "u2", "warc_ts": ts(5), "html": b"x", "text": "same text body", "lang": "en"},  # dup
        {"url": "u3", "warc_ts": ts(7), "html": b"x", "text": "Different Text?", "lang": "en"},
        {"url": "u4", "warc_ts": ts(9), "html": b"x", "text": "different text", "lang": "en"},  # dup after normalize
    ]
    schema = pa.schema([("url", pa.string()), ("warc_ts", pa.timestamp("us", tz="UTC")),
                        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string())])
    pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                   os.path.join(in_dir, "part-0.parquet"))

    run_streaming_dedup(spark, in_dir, out_dir, dedup_horizon="30 minutes")
    got = spark.read.parquet(os.path.join(out_dir, "data"))
    urls = {r["url"] for r in got.select("url").collect()}
    assert urls == {"u1", "u3"}

    # second drain: checkpoint knows the file → no dupes, no new rows
    run_streaming_dedup(spark, in_dir, out_dir, dedup_horizon="30 minutes")
    assert spark.read.parquet(os.path.join(out_dir, "data")).count() == 2


def test_streaming_dedup_passthrough_null_and_empty(spark, tmp_path):
    """NULL/empty-text and NULL-ts rows must pass through un-deduped —
    never collide on md5('') (review finding)."""
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from khl_pdf_ocr_spark.streaming.dedup_stream import run_streaming_dedup

    t0 = datetime(2026, 1, 1, 12, 0, tzinfo=timezone.utc)
    in_dir = str(tmp_path / "in"); os.makedirs(in_dir)
    out_dir = str(tmp_path / "out")
    rows = [
        {"url": "n1", "warc_ts": t0, "html": b"x", "text": None, "lang": ""},
        {"url": "n2", "warc_ts": t0, "html": b"x", "text": None, "lang": ""},
        {"url": "e1", "warc_ts": t0, "html": b"x", "text": "  ...  ", "lang": ""},
        {"url": "t1", "warc_ts": None, "html": b"x", "text": "real text here", "lang": "en"},
        {"url": "t2", "warc_ts": t0, "html": b"x", "text": "real text here", "lang": "en"},
    ]
    schema = pa.schema([("url", pa.string()), ("warc_ts", pa.timestamp("us", tz="UTC")),
                        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string())])
    pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                   os.path.join(in_dir, "part-0.parquet"))
    run_streaming_dedup(spark, in_dir, out_dir)
    urls = {r["url"] for r in
            spark.read.parquet(os.path.join(out_dir, "data")).collect()}
    # n1/n2 (null text), e1 (empty after normalize) and t1 (null ts) all
    # survive; t2 is the only dedup-eligible row and also survives
    assert urls == {"n1", "n2", "e1", "t1", "t2"}


def test_stream_static_enrichment_broadcast(spark, fixture_tables, tmp_path):
    """Stream-static join: the streaming extraction output enriched
    against the (static, broadcast-sized) referees master per
    micro-batch — the streaming twin of masters_validate_referees.
    The static side is re-resolvable per batch, so a dimension refresh
    needs no stream restart (Structured Streaming contract)."""
    import os
    import shutil

    from khl_pdf_ocr_spark.sources.masters import load_masters

    docs_path, _ = fixture_tables
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    shutil.copy(docs_path, os.path.join(in_dir, "part-0.parquet"))

    static_docs = spark.read.parquet(docs_path)
    stream = (spark.readStream.schema(static_docs.schema).parquet(in_dir))
    from khl_pdf_ocr_spark.operators.extract import extract_documents

    extracted = extract_documents(stream)
    _, referees = load_masters(spark)
    names = extracted.filter(F.col("engine") == "all").select(
        "url", F.explode(F.concat(F.col("referees.main"),
                                  F.col("referees.linesmen"))).alias("name"))
    dim = F.broadcast(referees.select("name_key").distinct())
    keyed = names.withColumn(
        "_key", F.concat_ws(" ", F.slice(F.split(F.col("name"), r"\s+"), 1, 2)))
    enriched = (keyed.join(dim, keyed["_key"] == dim["name_key"], "left")
                .select("url", "name",
                        F.col("name_key").isNotNull().alias("known")))

    out_dir = str(tmp_path / "enriched")
    q = (enriched.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    n = got.count()
    assert n > 0
    # the batch twin must agree row-for-row
    from khl_pdf_ocr_spark.sources.masters import validate_referee_names

    batch = validate_referee_names(
        extract_documents(static_docs).filter(F.col("engine") == "all"),
        referees)
    assert n == batch.count()
    assert got.filter("known").count() == batch.filter("known").count()
