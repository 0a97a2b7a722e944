"""Daily-increment ingestion job — the incremental twin of clean_cli.

    spark-submit --py-files khl_pdf_ocr_spark.zip \
        -m khl_pdf_ocr_spark.increment_cli \
        --input  /crawl/2026-08-17        # today's new batch
        --state  /corpora/main/_state     # fingerprint + signature stores
        --output /corpora/main/2026-08-17

Pipeline per increment (every stage is an existing operator):

    clean_corpus(batch)                   lang/quality + batch-internal
                                          exact+near dedup (+ optional
                                          url stage / decontamination)
    exact_dedup_incremental(·, state)     drop exact copies of anything
                                          EVER kept (exact_dup_history)
    minhash_lsh_incremental(·, state)     drop near-dups of anything
                                          ever kept (near_dup_history;
                                          signature-estimate verified)
    append kept rows → <output>/kept, full ledger → <output>/ledger,
    and the KEPT docs' fingerprints + signatures → the state stores.

The state stores describe exactly the kept corpus: fingerprints are
recomputed over the surviving rows (one cheap map pass) and signatures
are the already-persisted batch signatures semi-joined to survivors —
so a document dropped THIS increment never pollutes the stores.
Document ids must be globally unique across increments (crawl ids are).

History text is never read: both probes run against the KB-per-million
-doc stores, so increment cost is O(new batch), not O(corpus) — the
property that makes daily ingestion of a 10^12-doc corpus feasible.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from khl_pdf_ocr_spark.corpus import clean_corpus
from khl_pdf_ocr_spark.functions import text as X
from khl_pdf_ocr_spark.operators.dedup import (exact_dedup_incremental,
                                               minhash_lsh_incremental)
from khl_pdf_ocr_spark.session import get_spark
from khl_pdf_ocr_spark.sources.readers import read_documents


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--state", required=True,
                    help="state directory: <state>/fingerprints, "
                         "<state>/signatures (created on first run)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--langs", nargs="+", default=["en", "ru"])
    ap.add_argument("--min-quality", type=float, default=0.4)
    ap.add_argument("--near-dup-threshold", type=float, default=0.8)
    ap.add_argument("--url-col", default=None)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    spark = get_spark("khl-increment", cpus=args.cpus)
    try:
        fp_store = os.path.join(args.state, "fingerprints")
        sig_store = os.path.join(args.state, "signatures")
        first_run = not _exists(spark, fp_store)

        batch = read_documents(spark, args.input)
        audit: dict = {}
        kept1, ledger = clean_corpus(
            batch, text_col=args.text_col, id_col=args.id_col,
            allowed_langs=tuple(args.langs), min_quality=args.min_quality,
            near_dup_threshold=args.near_dup_threshold,
            url_col=args.url_col, audit=audit)

        if first_run:
            kept = kept1
            new_sigs = None
        else:
            seen_fp = spark.read.parquet(fp_store)
            kept2, _fps, hist_exact = exact_dedup_incremental(
                kept1, seen_fp, text_col=args.text_col, id_col=args.id_col)
            # kept1 is already batch-deduped → only history rows remain
            ledger = ledger.unionByName(
                hist_exact.filter(F.col("reject_reason")
                                  == "exact_dup_history"))

            seen_sigs = spark.read.parquet(sig_store)
            pairs, new_sigs = minhash_lsh_incremental(
                kept2, seen_sigs, text_col=args.text_col,
                id_col=args.id_col,
                verify_threshold=args.near_dup_threshold, audit=audit)
            hist_drop = (pairs.filter(F.col("match_kind") == "history")
                         .select(F.col("id_a").alias(args.id_col)).distinct())
            ledger = ledger.unionByName(
                hist_drop.select(F.col(args.id_col).alias("id"),
                                 F.lit("near_dup_history")
                                 .alias("reject_reason")))
            kept = kept2.join(F.broadcast(hist_drop), args.id_col,
                              "left_anti")

        base = args.output.rstrip("/")
        kept.write.mode("overwrite").parquet(f"{base}/kept")
        ledger.write.mode("overwrite").parquet(f"{base}/ledger")

        # state append describes exactly the KEPT corpus: recompute
        # fingerprints over survivors; restrict the persisted batch
        # signatures to survivors.  BOTH append frames are
        # localCheckpoint'ed (lineage severed) BEFORE any store write:
        # appending to fp_store fires Spark's recacheByPath, which
        # invalidates every cached plan reading that path — including
        # the persisted new_sigs, whose lineage goes through the
        # pre-append fp_store; an invalidated cache would silently
        # RECOMPUTE against the mutated store and drop this increment's
        # own docs as "history" duplicates (found by the two-day e2e
        # test: the kept doc's signature append came back empty).
        kept_rb = spark.read.parquet(f"{base}/kept")
        fp_append = (kept_rb.select(X.fingerprint(F.col(args.text_col))
                                    .alias("fingerprint"))
                     .filter(F.col("fingerprint").isNotNull())
                     .localCheckpoint())
        if new_sigs is not None:
            keep_ids = kept_rb.select(F.col(args.id_col).alias("id"))
            sig_append = (new_sigs.join(F.broadcast(keep_ids), "id",
                                        "left_semi").localCheckpoint())
            new_sigs.unpersist()
        else:
            from khl_pdf_ocr_spark.operators.dedup import minhash_signatures

            sig_append = minhash_signatures(
                kept_rb, text_col=args.text_col,
                id_col=args.id_col).localCheckpoint()
        fp_append.write.mode("append").parquet(fp_store)
        sig_append.write.mode("append").parquet(sig_store)

        ledger_rb = spark.read.parquet(f"{base}/ledger")
        stats = {
            "first_run": first_run,
            "n_kept": kept_rb.count(),
            "rejected": {r["reject_reason"]: r["n"] for r in
                         ledger_rb.groupBy("reject_reason")
                         .agg(F.count(F.lit(1)).alias("n")).collect()},
            "state_fingerprints": spark.read.parquet(fp_store).count(),
            "state_signatures": spark.read.parquet(sig_store).count(),
            "hot_buckets": (audit["hot_buckets"].count()
                            if "hot_buckets" in audit else 0),
        }
        for cached in audit.get("persisted", ()):
            cached.unpersist()
        print(json.dumps(stats))
        return 0
    finally:
        spark.stop()


def _exists(spark, path: str) -> bool:
    """Hadoop-FS existence probe — works for hdfs:///s3a:// paths, not
    just the local fs."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


if __name__ == "__main__":
    sys.exit(main())
