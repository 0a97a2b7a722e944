"""End-to-end extraction job: scan → salt-shuffle → extract → write,
with per-partition lineage metrics and checkpoint-manifest resume.

Lifecycle (SURVEY.md §3.5): read documents (Catalyst prunes the scan to
``url, html``) → one explicit repartition on (size_bucket, salt) to
defeat payload-size skew → Arrow-batched refkernel map → write results +
per-partition metrics.  Errors are rows, not task failures.

Resume model (SURVEY.md §4.3.4): the input is split into ``n_buckets``
deterministic url-hash buckets; each bucket is processed and written as
its own unit, then its manifest entry is committed (write-tmp + atomic
rename).  A rerun skips every bucket whose manifest entry exists —
idempotent, exactly-once per bucket.  On an Iceberg deployment the
bucket is a table partition and the manifest commit is Iceberg's
transactional ``overwritePartitions``; the local parquet layout mirrors
that contract 1:1.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.extract import extract_documents
from khl_pdf_ocr_spark.operators.partitioning import repartition_for_extraction
from khl_pdf_ocr_spark.sources.readers import read_documents

__all__ = ["run_extraction", "run_resumable", "partition_metrics", "preflight"]


def preflight(spark: SparkSession) -> dict:
    """Driver-side liveness/capability probe — the batch twin of the
    reference's ``GET /health`` (app.py:371-373): verifies the kernel
    imports and runs ON EXECUTORS (not just the driver) and reports
    whether the optional OCR engine is present.
    """
    from khl_pdf_ocr_spark.operators.extract import extract_documents
    from khl_pdf_ocr_spark.operators.ocr_fallback import HAS_OCR

    probe = spark.createDataFrame(
        [("preflight://doc", bytearray(b"%PDF-1.4"))], ["url", "html"])
    row = extract_documents(probe).select("ok", "error").first()
    kernel_ok = row is not None and row["error"] == "pdf_open_error"
    return {"ok": bool(kernel_ok), "engine": "ready" if kernel_ok else "broken",
            "ocr": HAS_OCR,
            "parallelism": spark.sparkContext.defaultParallelism,
            # surfaced so the spark-submit test can assert that a
            # submit-time --conf wins over the session factory default
            "shuffle_partitions": int(spark.conf.get("spark.sql.shuffle.partitions"))}


def partition_metrics(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-partition lineage rollup (docs in/ok/failed, bytes).

    If the frame already carries a ``partition_id`` column (stamped by
    ``run_extraction`` in the extraction stage itself, i.e. BEFORE the
    write), rows attribute to the task that actually computed them —
    re-reading written output would otherwise regroup by the unrelated
    output-scan splits.
    """
    if "partition_id" not in extracted.columns:
        extracted = extracted.withColumn("partition_id", F.spark_partition_id())
    return (extracted
            .groupBy("partition_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("ok").cast("long")).alias("n_ok"),
                 F.sum((~F.col("ok")).cast("long")).alias("n_failed"),
                 F.sum("n_bytes").alias("n_bytes"),
                 (F.sum("kernel_us") / 1e6).alias("kernel_s"))
            .withColumn("run_id", F.lit(run_id))
            .withColumn("docs_per_sec",
                        F.round(F.col("n_docs") / F.greatest(F.col("kernel_s"),
                                                             F.lit(1e-9)), 2))
            .select("run_id", "partition_id", "n_docs", "n_ok", "n_failed",
                    "n_bytes", "kernel_s", "docs_per_sec"))


def run_extraction(spark: SparkSession, input_path: str, output_path: str | None = None,
                   *, mode: str = "all", num_partitions: int | None = None,
                   salt: bool = False, input_format: str = "parquet",
                   run_id: str | None = None, write_metrics: bool = True,
                   ocr_stage=None, debug: bool = False,
                   cache: list | None = None,
                   reader_opts: dict | None = None,
                   honor_noindex: bool = False,
                   signals_path: str | None = None,
                   outlinks_path: str | None = None,
                   outlinks_text: bool = False,
                   target_file_mb: int | None = None,
                   robots_rules_path: str | None = None,
                   robots_agent: str = "*",
                   diff_against: str | None = None,
                   diff_out: str | None = None,
                   metadata_path: str | None = None):
    """Single-pass job. Returns (extracted_df, stats dict).

    When ``output_path`` is None the result is returned un-materialized
    (callers compose further operators on it).  If ``ocr_stage`` is
    also set on that path, pass ``cache=[]`` and release the lazily
    persisted OCR subset with ``unpersist_ocr_cache(cache)`` after
    materializing — the persisted handle reaches the caller ONLY
    through this list (the DataFrame-attribute side-channel was
    removed, r3 VERDICT #7), so omitting it leaks the cache for the
    session's lifetime in long-lived drivers.

    ``salt=False`` by default: byte-balanced scan splits already balance
    task cost for text-layer extraction; pay the payload shuffle only
    for heavy-tailed per-byte cost (OCR pass, pathological corpora) —
    measured rationale in BENCH.md §4.1.

    ``signals_path`` (optional): write the ingest-signals side table
    (url, license, noindex, canonical_of — ``licensing.page_signals``)
    before extraction; ``honor_noindex=True`` additionally drops pages
    declaring ``<meta name="robots" ... noindex>`` pre-kernel (count in
    ``stats["noindex_dropped"]`` when the signals table is there to
    count from, else None — disclosed, never silently uncounted).

    ``metadata_path`` (optional): write the page-metadata side table
    (url, title, og_title, pub_date, pub_date_parsed, byline —
    ``metadata.page_metadata``) before extraction: the same
    full-crawl-audit contract as ``signals_path``.

    ``outlinks_path`` (optional): write the (src, dst) hyperlink edge
    table (``links.extract_outlinks`` — the WAT-sidecar analogue)
    before extraction; edge count lands in ``stats["outlinks_edges"]``
    from parquet footer metadata, never a rescan.  ``outlinks_text``
    adds the per-link anchor text column (the WAT link-text field;
    feeds ``links.anchor_text_profile``) — well-formed ``<a>...</a>``
    elements only in that mode.

    ``target_file_mb`` (optional): compact the written data dir to
    ~MB parquet files after the metrics pass (``sources.writers.
    compact_parquet`` — true-size decision, no-op when healthy).

    ``diff_against`` (optional): path to the PREVIOUS crawl's documents
    parquet — incremental extraction.  ``snapshots.crawl_diff`` labels
    every url added/removed/changed/unchanged by comparing each side's
    newest capture's content hash; only ``added`` + ``changed`` urls
    reach the kernel (an unchanged page's extraction output already
    exists in the previous run — most of a monthly crawl is
    byte-identical recaptures).  Cost: the diff hashes both crawls'
    html once (a column-pruned projection pass) plus one url semi-join
    of the new batch; at low change rates this is far below the
    extraction it skips.  Per-status counts land in
    ``stats["crawl_diff"]``.  ``diff_out`` persists the full diff
    table as a sidecar (its ``removed`` rows are the downstream
    corpus-maintenance work list) and doubles as the work-list source,
    so neither crawl is hashed twice; without it the slim diff is
    localCheckpoint'ed to the same effect.

    ``ocr_stage`` (optional): phase-2 callable per ``with_ocr_fallback``;
    the lazily-persisted OCR subset is released after the write.  With
    ``debug=True`` build it as ``make_ocr_stage(debug=True)`` so both
    phases emit the debug schema — a mismatch fails fast at the merge's
    unionByName analysis, never silently.
    """
    from khl_pdf_ocr_spark.operators.ocr_fallback import (unpersist_ocr_cache,
                                                          with_ocr_fallback)

    run_id = run_id or uuid.uuid4().hex[:12]
    docs = read_documents(spark, input_path, input_format,
                          **(reader_opts or {}))
    noindex_dropped = None
    if signals_path:
        # the ingest-signals side table (url, license, noindex,
        # canonical_of) — written BEFORE any policy filter so it stays
        # a complete audit of the crawl, dropped pages included; one
        # column-pruned (url, html) projection pass
        from khl_pdf_ocr_spark.operators.licensing import page_signals

        page_signals(docs).write.mode("overwrite").parquet(signals_path)
    if metadata_path:
        # page-metadata sidecar (url, title, og_title, pub_date,
        # pub_date_parsed, byline) — best-effort declarations read
        # while the raw html is in hand, like signals: written before
        # any policy filter so it audits the full crawl
        from khl_pdf_ocr_spark.operators.metadata import page_metadata

        page_metadata(docs).write.mode("overwrite").parquet(metadata_path)
    if outlinks_path:
        # the WAT-sidecar analogue: (src, dst) hyperlink edges written
        # while the raw html is in hand — the host link graph /
        # PageRank quality prior builds from this table without ever
        # rescanning the crawl.  Written BEFORE policy filters (like
        # signals): the link structure of dropped pages still carries
        # rank information about the pages that remain.
        from khl_pdf_ocr_spark.operators.links import extract_outlinks

        extract_outlinks(docs, with_text=outlinks_text) \
            .write.mode("overwrite").parquet(outlinks_path)
    diff_counts = None
    if diff_against:
        # incremental extraction (after the side tables — they audit
        # the FULL crawl — and before the compliance gates, which then
        # run only over the work list)
        from khl_pdf_ocr_spark.operators.snapshots import crawl_diff

        prev = read_documents(spark, diff_against, "parquet")
        diff = crawl_diff(prev, docs, url_col="url", ts_col="warc_ts",
                          content_col="html")
        if diff_out:
            # the diff IS an audit artifact; the read-back also feeds
            # the counts job and the work-list semi-join, so neither
            # crawl's html is hashed twice
            diff.write.mode("overwrite").parquet(diff_out)
            diff = spark.read.parquet(diff_out)
        else:
            diff = diff.localCheckpoint(eager=True)
        diff_counts = {r["status"]: r["n"] for r in
                       diff.groupBy("status")
                       .agg(F.count(F.lit(1)).alias("n")).collect()}
        work = (diff.filter(F.col("status").isin("added", "changed"))
                .select("url"))
        # NULL-url rows never match an equi-join key, so a plain
        # semi-join would silently exclude them from the kernel even
        # though a non-diff run extracts them (as error-envelope rows);
        # route them around the work list instead of dropping them
        docs = (docs.filter(F.col("url").isNotNull())
                .join(work, "url", "left_semi")
                .unionByName(docs.filter(F.col("url").isNull())))
    if honor_noindex:
        # compliance filter pre-kernel: the JVM regex drops opted-out
        # pages before a single byte reaches the Python extraction
        # stage; NULL html passes through (nothing to inspect)
        from khl_pdf_ocr_spark.operators.licensing import robots_noindex

        flag = robots_noindex(F.col("html"))
        docs = docs.filter(~F.coalesce(flag, F.lit(False)))
        if signals_path:
            # count from the just-written side table — never a second
            # scan of the html column.  With a diff work list in play
            # the gate only ran over added/changed urls, so the count
            # must be restricted the same way (the full-crawl signals
            # count would report noindex pages whose extraction was
            # already skipped as unchanged)
            sig_noindex = (spark.read.parquet(signals_path)
                           .filter(F.col("noindex")))
            if diff_against:
                # mirror the kernel work list's NULL-url route-around
                # (ADVICE r5): NULL-url rows bypass the diff semi-join
                # into the gate, so their noindex drops must be counted
                # too — a NULL url never equi-joins the work list
                sig_noindex = (sig_noindex.filter(F.col("url").isNotNull())
                               .join(work, "url", "left_semi")
                               .unionByName(
                                   sig_noindex.filter(F.col("url").isNull())))
            noindex_dropped = sig_noindex.count()
    robots_dropped = None
    if robots_rules_path:
        # RFC 9309 compliance pre-kernel: host-level rule join on the
        # url (html never read) — the crawl-policy twin of the
        # per-page honor_noindex gate.  Counting the ledger is one
        # cheap url-only job, far below the extraction it gates.
        from khl_pdf_ocr_spark.operators.robots import \
            filter_robots_disallowed

        rules = spark.read.parquet(robots_rules_path)
        docs, robots_ledger = filter_robots_disallowed(
            docs, rules, url_col="url", id_col="url", agent=robots_agent)
        robots_dropped = robots_ledger.count()
    if salt:
        n_part = num_partitions or spark.sparkContext.defaultParallelism * 2
        docs = repartition_for_extraction(docs, n_part)
    elif num_partitions:
        # explicit width without salting = plain round-robin rebalance
        docs = docs.repartition(num_partitions)
    out = extract_documents(docs, mode=mode, debug=debug)
    if ocr_stage is not None and not output_path:
        # un-materialized composition: the caller is responsible for
        # caching phase 1 (its lineage feeds three merge branches) and
        # for releasing the OCR-subset persist via the cache list
        out = with_ocr_fallback(out, docs, ocr_stage=ocr_stage, cache=cache)

    stats: dict = {"run_id": run_id}
    if signals_path:
        stats["signals_path"] = signals_path
    if metadata_path:
        stats["metadata_path"] = metadata_path
    if outlinks_path:
        stats["outlinks_path"] = outlinks_path
        # parquet count is footer-metadata only — no data rescan
        stats["outlinks_edges"] = spark.read.parquet(outlinks_path).count()
    if honor_noindex:
        # None = filtered but uncounted (no signals table to count
        # from; counting would rescan html) — disclosed, never silent
        stats["noindex_dropped"] = noindex_dropped
    if robots_rules_path:
        stats["robots_dropped"] = robots_dropped
    if diff_against:
        stats["crawl_diff"] = {s: diff_counts.get(s, 0) for s in
                               ("added", "changed", "unchanged", "removed")}
        if diff_out:
            stats["diff_path"] = diff_out
    if output_path:
        # stamp the extraction task id BEFORE writing, so the persisted
        # metrics attribute docs/sec to the task that computed them
        out = out.withColumn("partition_id", F.spark_partition_id())
        t0 = time.time()
        data_path = os.path.join(output_path, "data")
        if ocr_stage is not None:
            # WRITE PHASE 1 FIRST, then merge from the read-back: the
            # merged plan references phase 1 in three branches, and a
            # read-back makes each reference a cheap parquet scan instead
            # of re-running the extraction kernel over the whole corpus
            phase1_path = os.path.join(output_path, "_phase1")
            out.write.mode("overwrite").parquet(phase1_path)
            phase1 = spark.read.parquet(phase1_path)
            cache_handles: list = []
            merged = with_ocr_fallback(phase1.drop("partition_id"), docs,
                                       ocr_stage=ocr_stage,
                                       cache=cache_handles)
            merged.withColumn("partition_id", F.spark_partition_id()) \
                  .write.mode("overwrite").parquet(data_path)
            unpersist_ocr_cache(cache_handles)  # deterministic release
            out = spark.read.parquet(data_path)  # detach from _phase1
            if "://" not in output_path:  # local fs only — shutil can't
                import shutil             # delete hdfs://-s3a:// URIs

                shutil.rmtree(phase1_path, ignore_errors=True)
            else:
                stats["phase1_staging"] = phase1_path  # caller cleans up
        else:
            out.write.mode("overwrite").parquet(data_path)
        elapsed = time.time() - t0
        metrics = partition_metrics(spark.read.parquet(data_path), run_id)
        if write_metrics:
            metrics.write.mode("overwrite").parquet(os.path.join(output_path, "_metrics"))
        agg = metrics.agg(F.sum("n_docs"), F.sum("n_ok"), F.sum("n_bytes")).first()
        stats.update(n_docs=agg[0] or 0, n_ok=agg[1] or 0, n_bytes=agg[2] or 0,
                     elapsed_s=round(elapsed, 3),
                     docs_per_sec=round((agg[0] or 0) / elapsed, 2) if elapsed else None)
        if target_file_mb is not None:
            # LAST (metrics already aggregated): compaction swaps the
            # files under data_path, so the returned frame is re-read
            # from the new layout
            from khl_pdf_ocr_spark.sources.writers import compact_parquet

            stats["file_layout"] = compact_parquet(
                spark, data_path, target_mb=target_file_mb)
            out = spark.read.parquet(data_path)
    return out, stats


# ---------------------------------------------------------------------------
# Resumable, bucketed variant
# ---------------------------------------------------------------------------


def _manifest_dir(output_dir: str) -> str:
    return os.path.join(output_dir, "_manifest")


def _manifest_path(output_dir: str, bucket: int) -> str:
    return os.path.join(_manifest_dir(output_dir), f"bucket_{bucket:05d}.json")


def completed_buckets(output_dir: str) -> set[int]:
    d = _manifest_dir(output_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for fn in os.listdir(d):
        if fn.startswith("bucket_") and fn.endswith(".json"):
            out.add(int(fn[len("bucket_"):-len(".json")]))
    return out


def run_resumable(spark: SparkSession, input_path: str, output_dir: str, *,
                  n_buckets: int = 16, mode: str = "all",
                  input_format: str = "parquet", run_id: str | None = None,
                  fail_after: int | None = None,
                  reader_opts: dict | None = None) -> dict:
    """Bucketed run with checkpointed manifests; rerun = resume.

    ``fail_after`` injects a crash after N freshly-processed buckets
    (test hook for the resume contract).

    Scale note: locally every bucket filter re-scans the input; on the
    Iceberg deployment the table is partitioned by the same bucket
    expression, so each bucket job prunes to its own files and the scan
    amplification disappears.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    os.makedirs(_manifest_dir(output_dir), exist_ok=True)
    # the bucket expression is the resume unit: resuming with a different
    # n_buckets would skip/duplicate urls — fail fast on mismatch
    for b in sorted(completed_buckets(output_dir)):
        with open(_manifest_path(output_dir, b)) as f:
            prev = json.load(f).get("n_buckets")
        if prev is not None and prev != n_buckets:
            raise ValueError(
                f"manifest bucket_{b:05d} was committed with n_buckets={prev}; "
                f"resume requested n_buckets={n_buckets} — rerun with the "
                "original bucket count or start a fresh output dir")
        break
    docs = read_documents(spark, input_path, input_format,
                          **(reader_opts or {}))
    docs = docs.withColumn("_bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)))
    docs.persist()
    try:
        done = completed_buckets(output_dir)
        processed = skipped = 0
        t0 = time.time()
        for b in range(n_buckets):
            if b in done:
                skipped += 1
                continue
            part = docs.filter(F.col("_bucket") == b).drop("_bucket")
            out = extract_documents(
                repartition_for_extraction(part, max(4, spark.sparkContext.defaultParallelism)),
                mode=mode)
            data_path = os.path.join(output_dir, "data", f"bucket={b}")
            out.write.mode("overwrite").parquet(data_path)
            n = spark.read.parquet(data_path).count()
            tmp = _manifest_path(output_dir, b) + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"run_id": run_id, "bucket": b, "n_docs": n,
                           "n_buckets": n_buckets, "status": "complete"}, f)
            os.replace(tmp, _manifest_path(output_dir, b))  # atomic commit
            processed += 1
            if fail_after is not None and processed >= fail_after:
                raise RuntimeError(f"injected failure after {processed} buckets")
        return {"run_id": run_id, "processed": processed, "skipped": skipped,
                "elapsed_s": round(time.time() - t0, 3)}
    finally:
        docs.unpersist()
