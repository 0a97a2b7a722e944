"""Spark pipeline: byte-identity vs goldens, partitioning, masters join,
manifest resume. The primary correctness gate (SURVEY.md §5.2.1)."""

import os

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.extract import extract_documents
from khl_pdf_ocr_spark.operators.partitioning import (SALTS_PER_BUCKET,
                                                      repartition_for_extraction,
                                                      with_size_bucket)
from khl_pdf_ocr_spark.pipeline import run_extraction, run_resumable


@pytest.fixture(scope="module")
def extracted(spark, fixture_tables):
    docs_path, _ = fixture_tables
    df = spark.read.parquet(docs_path)
    out = extract_documents(repartition_for_extraction(df, 16))
    out.cache()
    out.count()
    yield out
    out.unpersist()


def test_byte_identical_vs_goldens(spark, fixture_tables, extracted):
    _, gold_path = fixture_tables
    g = spark.read.parquet(gold_path).filter(F.col("mode") == "all")
    joined = extracted.alias("r").join(g.alias("g"), "url", "full_outer")
    n_total = joined.count()
    assert n_total == g.count() == extracted.count()
    n_text = joined.filter(
        F.col("r.extracted_text").eqNullSafe(F.col("g.extracted_text"))).count()
    n_json = joined.filter(
        F.col("r.result_json").eqNullSafe(F.col("g.result_json"))).count()
    assert n_text == n_total, "extracted_text must be byte-identical per url"
    assert n_json == n_total, "result_json must match goldens per url"


def test_errors_are_rows_not_failures(extracted):
    errs = (extracted.filter(~F.col("ok"))
            .groupBy("error").count().collect())
    err_map = {r["error"]: r["count"] for r in errs}
    assert "pdf_open_error" in err_map
    assert "unsupported_format" in err_map


def test_struct_fields_populated(extracted):
    pdf_rows = extracted.filter(F.col("engine") == "all")
    n = pdf_rows.count()
    assert n > 50
    with_teams = pdf_rows.filter(
        (F.length("match.teams.home") >= 8) & (F.length("match.teams.away") >= 8)).count()
    assert with_teams == n
    with_gk = pdf_rows.filter(F.size("goalies.home") > 0).count()
    assert with_gk == n


def test_column_pruning_reaches_scan(spark, fixture_tables):
    docs_path, _ = fixture_tables
    df = spark.read.parquet(docs_path)
    plan = extract_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<url:string,html:binary>" in plan, plan


def test_size_bucketing(spark, fixture_tables):
    docs_path, _ = fixture_tables
    df = with_size_bucket(spark.read.parquet(docs_path))
    buckets = {r["size_bucket"] for r in df.select("size_bucket").distinct().collect()}
    assert buckets.issuperset({0, 1}), buckets
    assert max(buckets) < len(SALTS_PER_BUCKET)


def test_salted_repartition_spreads_rows(spark, fixture_tables):
    docs_path, _ = fixture_tables
    df = repartition_for_extraction(spark.read.parquet(docs_path), 16)
    sizes = (df.withColumn("pid", F.spark_partition_id())
             .groupBy("pid").count().collect())
    assert len(sizes) > 4  # rows actually spread over partitions
    assert max(r["count"] for r in sizes) < 200  # no single-partition collapse


def test_masters_broadcast_validation(spark, extracted):
    pytest.importorskip("os")
    if not os.path.exists("/root/reference/referees_master.csv"):
        pytest.skip("reference masters unavailable")
    from khl_pdf_ocr_spark.sources.masters import (load_masters,
                                                   validate_referee_names)
    players, referees = load_masters(spark)
    assert referees.count() >= 40
    validated = validate_referee_names(extracted.filter(F.col("engine") == "all"),
                                       referees)
    counts = validated.groupBy("known").count().collect()
    known = {r["known"]: r["count"] for r in counts}
    # fixture referee names are drawn FROM the master list → mostly known
    assert known.get(True, 0) > known.get(False, 0)
    plan = validated._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "masters join must broadcast"


def test_run_extraction_writes_metrics(spark, fixture_tables, tmp_path):
    docs_path, _ = fixture_tables
    out_dir = str(tmp_path / "out")
    _, stats = run_extraction(spark, docs_path, out_dir, num_partitions=8)
    assert stats["n_docs"] == 200
    metrics = spark.read.parquet(os.path.join(out_dir, "_metrics"))
    rows = metrics.collect()
    assert sum(r["n_docs"] for r in rows) == 200
    assert sum(r["n_failed"] for r in rows) > 0
    assert all(r["run_id"] == stats["run_id"] for r in rows)


def test_resume_skips_completed_buckets(spark, fixture_tables, tmp_path):
    docs_path, _ = fixture_tables
    out_dir = str(tmp_path / "resumable")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(spark, docs_path, out_dir, n_buckets=8, fail_after=3)
    partial = len([d for d in os.listdir(os.path.join(out_dir, "data"))
                   if d.startswith("bucket=")])
    assert partial >= 3
    stats = run_resumable(spark, docs_path, out_dir, n_buckets=8)
    assert stats["skipped"] == 3
    assert stats["processed"] == 5
    # full output, no duplicates
    full = spark.read.parquet(os.path.join(out_dir, "data"))
    assert full.count() == 200
    assert full.select("url").distinct().count() == 200


def test_salting_bounds_byte_skew(spark, fixture_tables):
    """The skew story, quantified: on a corpus where all heavy documents
    share one key, hash partitioning on that key concentrates the bytes;
    salted size-bucket repartitioning spreads them."""
    docs_path, _ = fixture_tables
    docs = spark.read.parquet(docs_path)
    n_part = 8

    def max_partition_bytes(df):
        rows = (df.withColumn("pid", F.spark_partition_id())
                .groupBy("pid").agg(F.sum(F.length("html")).alias("b")).collect())
        sizes = [r["b"] for r in rows]
        return max(sizes), sum(sizes) / len(sizes)

    # adversarial layout: everything hashed by a constant-ish key
    skewed = docs.repartition(n_part, F.lit(1))
    mx_skew, _ = max_partition_bytes(skewed)
    salted = repartition_for_extraction(docs, n_part)
    mx_salt, avg_salt = max_partition_bytes(salted)
    assert mx_salt < mx_skew * 0.6
    assert mx_salt < 4 * avg_salt


def test_debug_column_through_spark(spark, fixture_tables):
    docs_path, _ = fixture_tables
    df = spark.read.parquet(docs_path).limit(40)
    out = extract_documents(df, mode="refs", debug=True)
    assert "debug_json" in out.columns
    rows = out.filter(F.col("engine") == "ocr-refs").collect()
    assert rows
    import json
    payloads = [json.loads(r["debug_json"]) for r in rows]
    assert any("raw_ref_line" in p for p in payloads)
    # default path keeps the original schema (no debug column)
    assert "debug_json" not in extract_documents(df).columns


def test_diff_against_extracts_only_added_and_changed(spark, fixture_tables,
                                                      tmp_path):
    """Incremental extraction: crawl2 diffed against crawl1 runs the
    kernel only over added/changed urls; the diff sidecar carries the
    removed work list; stats count every status."""
    docs_path, _ = fixture_tables
    base = spark.read.parquet(docs_path).orderBy("url").limit(40).cache()
    urls = [r["url"] for r in base.select("url").collect()]
    # crawl1 = urls[0:30]; crawl2 drops 0:5 (removed), keeps 5:20
    # unchanged (same html, newer ts), edits 20:30 (html changed),
    # and adds 30:40
    crawl1_path = str(tmp_path / "crawl1")
    crawl2_path = str(tmp_path / "crawl2")
    base.filter(F.col("url").isin(urls[:30])).write.parquet(crawl1_path)
    later = (F.col("warc_ts") + F.expr("INTERVAL 30 DAYS")).alias("warc_ts")
    unchanged = (base.filter(F.col("url").isin(urls[5:20]))
                 .select("url", later, "html", "text", "lang"))
    changed = (base.filter(F.col("url").isin(urls[20:30]))
               .select("url", later,
                       F.concat(F.col("html"), F.lit(b"<!--edit-->"))
                       .alias("html"), "text", "lang"))
    added = (base.filter(F.col("url").isin(urls[30:40]))
             .select("url", later, "html", "text", "lang"))
    unchanged.unionByName(changed).unionByName(added).write.parquet(crawl2_path)

    out_dir = str(tmp_path / "out")
    diff_path = str(tmp_path / "diff")
    _, stats = run_extraction(spark, crawl2_path, out_dir,
                              num_partitions=4, diff_against=crawl1_path,
                              diff_out=diff_path)
    assert stats["crawl_diff"] == {"added": 10, "changed": 10,
                                   "unchanged": 15, "removed": 5}
    assert stats["diff_path"] == diff_path
    assert stats["n_docs"] == 20  # only added + changed hit the kernel
    got = {r["url"] for r in
           spark.read.parquet(os.path.join(out_dir, "data"))
           .select("url").collect()}
    assert got == set(urls[20:40])
    removed = {r["url"] for r in spark.read.parquet(diff_path)
               .filter("status = 'removed'").select("url").collect()}
    assert removed == set(urls[:5])
    base.unpersist()


def test_diff_without_sidecar_uses_checkpoint(spark, fixture_tables,
                                              tmp_path):
    docs_path, _ = fixture_tables
    crawl = str(tmp_path / "c1")
    spark.read.parquet(docs_path).limit(10).write.parquet(crawl)
    out_dir = str(tmp_path / "out2")
    # same crawl on both sides: everything unchanged, nothing extracted
    _, stats = run_extraction(spark, crawl, out_dir, num_partitions=2,
                              diff_against=crawl)
    assert stats["crawl_diff"]["unchanged"] == 10
    assert stats["crawl_diff"]["added"] == 0
    assert stats["n_docs"] == 0
    assert "diff_path" not in stats


def test_diff_keeps_null_url_rows(spark, fixture_tables, tmp_path):
    """NULL-url rows can't equi-join the work list; they must still
    reach the kernel like a plain run, where the kernel maps the
    out-of-contract NULL key to the '' sentinel (the output schema
    declares url non-nullable) instead of a JVM NPE."""
    docs_path, _ = fixture_tables
    base = spark.read.parquet(docs_path).limit(6)
    crawl1 = str(tmp_path / "c1")
    crawl2 = str(tmp_path / "c2")
    base.write.parquet(crawl1)
    nulled = base.withColumn(
        "url", F.when(F.monotonically_increasing_id() == 0,
                      F.lit(None)).otherwise(F.col("url")))
    nulled.write.parquet(crawl2)
    out_dir = str(tmp_path / "out")
    _, stats = run_extraction(spark, crawl2, out_dir, num_partitions=2,
                              diff_against=crawl1)
    # the null-url row is extracted unconditionally (its old url
    # counts as removed; the NULL 'added' label is a diff artifact)
    data = spark.read.parquet(os.path.join(out_dir, "data"))
    assert stats["n_docs"] == data.count() >= 1
    assert data.filter(F.col("url") == "").count() == 1
    # and the plain (no-diff) run degrades identically, not with an NPE
    out2 = str(tmp_path / "out2")
    _, stats2 = run_extraction(spark, crawl2, out2, num_partitions=2)
    assert stats2["n_docs"] == 6


def test_noindex_count_restricted_to_diff_worklist(spark, fixture_tables,
                                                   tmp_path):
    """With --diff-against, the noindex gate runs only over the
    added/changed work list — the stat must count the same subset,
    not the full crawl's signals table."""
    docs_path, _ = fixture_tables
    base = spark.read.parquet(docs_path).orderBy("url").limit(6).cache()
    urls = [r["url"] for r in base.select("url").collect()]
    noindex_html = F.lit(b'<html><meta name="robots" content="noindex">'
                         b'<p>opted out</p></html>')
    crawl1 = str(tmp_path / "c1")
    base.write.parquet(crawl1)
    later = (F.col("warc_ts") + F.expr("INTERVAL 30 DAYS")).alias("warc_ts")
    # urls[0]: noindex AND changed (in work list) -> counted + dropped
    # urls[1]: noindex but UNCHANGED -> skipped by diff, must NOT count
    crawl2_df = base.select(
        "url", later,
        F.when(F.col("url") == urls[0], noindex_html)
        .otherwise(F.col("html")).alias("html"), "text", "lang")
    # make urls[1] noindex in BOTH crawls (so its newest content is
    # unchanged between them)
    for p, src in ((str(tmp_path / "c1b"),
                    spark.read.parquet(crawl1)),
                   (str(tmp_path / "c2"), crawl2_df)):
        src.select("url", "warc_ts",
                   F.when(F.col("url") == urls[1], noindex_html)
                   .otherwise(F.col("html")).alias("html"),
                   "text", "lang").write.parquet(p)
    out_dir = str(tmp_path / "out")
    _, stats = run_extraction(
        spark, str(tmp_path / "c2"), out_dir, num_partitions=2,
        diff_against=str(tmp_path / "c1b"),
        signals_path=str(tmp_path / "signals"), honor_noindex=True)
    assert stats["crawl_diff"]["changed"] == 1
    assert stats["crawl_diff"]["unchanged"] == 5
    # only the work-list noindex page counts (and was actually dropped)
    assert stats["noindex_dropped"] == 1
    assert stats["n_docs"] == 0  # the one changed url was noindex
    base.unpersist()


def test_extract_columnar_equals_rows(fixture_tables):
    # r6 optimization: extract_batches builds RecordBatches column-wise
    # (from_arrays) instead of row-wise (from_pylist).  The row-dict
    # form stays as the reference; the two must be value-identical —
    # including nested match/referees/goalies structs and both debug
    # modes — over the full fixture mix (pdf/html/text/corrupt).
    import pyarrow as pa
    import pyarrow.parquet as pq

    from khl_pdf_ocr_spark.operators.extract import (_extract_rows,
                                                     extract_batches)
    from khl_pdf_ocr_spark.schemas import EXTRACT_PA, EXTRACT_PA_DEBUG

    docs_path, _ = fixture_tables
    tbl = pq.read_table(docs_path, columns=["url", "html"])
    batches = tbl.to_batches(max_chunksize=64)
    for mode, debug in (("all", False), ("refs", True)):
        schema = EXTRACT_PA_DEBUG if debug else EXTRACT_PA
        got = list(extract_batches(iter(batches), mode=mode, debug=debug))
        want = [pa.RecordBatch.from_pylist(
            _extract_rows(b.column("url").to_pylist(),
                          b.column("html").to_pylist(), mode, debug),
            schema=schema) for b in batches]
        assert len(got) == len(want)
        value_cols = [n for n in schema.names if n != "kernel_us"]
        for g, w in zip(got, want):
            for name in value_cols:  # kernel_us is wall-clock, not a value
                assert g.column(name).equals(w.column(name)), name
            assert g.column("kernel_us").type == pa.int64()
            assert g.column("kernel_us").null_count == 0
