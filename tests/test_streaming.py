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


def test_streaming_near_dup_matches_batch_incremental(spark, tmp_path):
    """The streaming flags must equal the batch operator's history half
    on the same data — per-row signature expressions == the explode→agg
    signatures, band joins identical, estimates identical."""
    from datetime import datetime, timedelta

    from khl_pdf_ocr_spark.operators.dedup import (minhash_lsh_incremental,
                                                   minhash_signatures,
                                                   with_minhash_signature)
    from khl_pdf_ocr_spark.streaming.near_dup_stream import \
        run_streaming_near_dup

    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill in the afternoon sun light")
    hist = spark.createDataFrame(
        [(100, base, "h"),
         (101, "completely unrelated text about quantum chromodynamics "
               "and lattice gauge theory simulations on supercomputers", "h")],
        ["doc_id", "text", "source"])
    store_path = str(tmp_path / "store")
    minhash_signatures(hist).write.parquet(store_path)

    t0 = datetime(2024, 6, 1)
    day2 = [(200, t0, base),                                      # dup
            (201, t0 + timedelta(minutes=1),
             base + " extra tail words appended here"),           # near-dup
            (202, t0 + timedelta(minutes=2),
             "fresh document about gardening tools and seasonal "
             "planting schedules for temperate climates"),        # novel
            (203, t0 + timedelta(minutes=3), None),               # not flaggable
            (204, t0 + timedelta(minutes=4), "   ")]
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    spark.createDataFrame(day2, ["doc_id", "warc_ts", "text"]) \
        .write.parquet(in_dir)

    run_streaming_near_dup(spark, in_dir, out_dir, store_path)
    got = {(r["id"], r["id_b"]): r["jaccard"] for r in
           spark.read.parquet(out_dir + "/data").collect()}

    # per-row signature parity with the batch formulation, first
    sig_stream = {r["doc_id"]: r["sig"] for r in with_minhash_signature(
        spark.createDataFrame([(200, base)], ["doc_id", "text"])).collect()}
    sig_batch = {r["id"]: r["sig"] for r in minhash_signatures(
        spark.createDataFrame([(200, base)], ["doc_id", "text"])).collect()}
    assert sig_stream[200] == sig_batch[200]

    # streaming flags == batch history half
    batch_df = spark.createDataFrame(
        [(i, t) for i, _, t in day2 if t and t.strip()],
        ["doc_id", "text"])
    pairs, _ = minhash_lsh_incremental(batch_df,
                                       spark.read.parquet(store_path))
    want = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in pairs.collect() if r["match_kind"] == "history"}
    assert got == want
    assert got[(200, 100)] == 1.0
    assert (201, 100) in got and all(b != 101 for (_, b) in got)


def test_streaming_near_dup_hot_store_bucket_bounded(spark, tmp_path):
    """A 300-doc boilerplate clump in the store must not amplify each
    streamed doc into 300 flag rows."""
    from datetime import datetime

    from khl_pdf_ocr_spark.operators.dedup import minhash_signatures
    from khl_pdf_ocr_spark.streaming.near_dup_stream import \
        run_streaming_near_dup

    boiler = "the same boilerplate footer text repeated on every single page " * 4
    hist = spark.createDataFrame([(i, boiler, "h") for i in range(300)],
                                 ["doc_id", "text", "source"]).repartition(8)
    store_path = str(tmp_path / "store")
    minhash_signatures(hist).write.parquet(store_path)
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    spark.createDataFrame([(1000, datetime(2024, 6, 1), boiler)],
                          ["doc_id", "warc_ts", "text"]).write.parquet(in_dir)
    run_streaming_near_dup(spark, in_dir, out_dir, store_path, max_bucket=8)
    rows = spark.read.parquet(out_dir + "/data").collect()
    assert 0 < len(rows) <= 8
    assert all(r["jaccard"] == 1.0 for r in rows)
