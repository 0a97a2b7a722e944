"""Corpus-cleaning job entry point — the training-data twin of cli.py.

    spark-submit --py-files khl_pdf_ocr_spark.zip \
        khl_pdf_ocr_spark/clean_cli.py \
        --input  /data/extracted          # parquet dir or iceberg table
        --output /data/cleaned \
        --langs en ru --min-quality 0.3 \
        --near-dup-threshold 0.8 --policy components

Writes ``<output>/kept`` (surviving rows), ``<output>/ledger``
(id, reject_reason for every drop — at scale you audit the drops, not
the keeps) and prints ONE JSON stats line that includes the no-silent-
caps audit: how many LSH band buckets had their candidate generation
chain-bounded (``hot_buckets``), so a silently-degraded near-dup pass
is visible in run telemetry, never just in a docstring.
"""

from __future__ import annotations

import argparse
import json
import sys

from khl_pdf_ocr_spark.corpus import clean_corpus
from khl_pdf_ocr_spark.session import get_spark
from khl_pdf_ocr_spark.sources.readers import read_documents, write_output


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True,
                    help="parquet: output directory (<output>/kept, "
                         "<output>/ledger); iceberg: table-name prefix "
                         "(<output>_kept, <output>_ledger)")
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--langs", nargs="+", default=["en", "ru"])
    ap.add_argument("--min-quality", type=float, default=0.4)
    ap.add_argument("--near-dup-threshold", type=float, default=0.8)
    ap.add_argument("--policy", default="pairs", choices=["pairs", "components"])
    ap.add_argument("--url-col", default=None,
                    help="dedup on the canonical url first (stage 0); "
                         "drops land as url_dup in the ledger")
    ap.add_argument("--decontaminate-against", default=None,
                    help="parquet path of an eval set (text column): "
                         "drop docs sharing any 13-gram with it "
                         "(contaminated ledger reason)")
    ap.add_argument("--repetition", action="store_true",
                    help="append the Gopher-style repetition filter "
                         "(rep_lines/rep_2gram ledger reasons)")
    ap.add_argument("--max-dup-line-fraction", type=float, default=0.3)
    ap.add_argument("--max-top-2gram-fraction", type=float, default=0.2)
    ap.add_argument("--redact-pii", action="store_true",
                    help="replace email/IPv4/phone matches in the kept "
                         "text (counts land in run stats)")
    ap.add_argument("--split", default=None,
                    help="deterministic split assignment, e.g. "
                         "'train=0.98,val=0.01,test=0.01'; kept output "
                         "gains a split column and is partitioned by it")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    spark = get_spark("khl-clean", cpus=args.cpus)
    try:
        docs = read_documents(spark, args.input, args.format)
        audit: dict = {}
        benchmark = (spark.read.parquet(args.decontaminate_against)
                     if args.decontaminate_against else None)
        kept, ledger = clean_corpus(
            docs, text_col=args.text_col, id_col=args.id_col,
            allowed_langs=tuple(args.langs), min_quality=args.min_quality,
            near_dup_threshold=args.near_dup_threshold,
            near_dup_policy=args.policy, url_col=args.url_col,
            benchmark=benchmark, audit=audit)

        if args.repetition:
            from khl_pdf_ocr_spark.operators.prepare import repetition_filter

            kept, rep_ledger = repetition_filter(
                kept, text_col=args.text_col, id_col=args.id_col,
                max_dup_line_fraction=args.max_dup_line_fraction,
                max_top_2gram_fraction=args.max_top_2gram_fraction)
            ledger = ledger.unionByName(rep_ledger)
        pii_cols = []
        if args.redact_pii:
            from khl_pdf_ocr_spark.operators.prepare import (PII_PATTERNS,
                                                             redact_pii)

            pii_cols = [f"n_pii_{kind}" for kind, _, _ in PII_PATTERNS]
            # redact IN PLACE: the kept table's text column becomes the
            # scrubbed one (the raw shard stays in --input; a cleaned
            # corpus with live PII next to a _redacted twin is the worst
            # of both)
            kept = (redact_pii(kept, text_col=args.text_col)
                    .drop(args.text_col)
                    .withColumnRenamed(f"{args.text_col}_redacted",
                                       args.text_col))
        partition_by: tuple = ()
        if args.split:
            from khl_pdf_ocr_spark.operators.prepare import (
                hash_split, parse_split_weights)

            kept = hash_split(kept, id_col=args.id_col,
                              weights=parse_split_weights(args.split))
            partition_by = ("split",)
        # iceberg targets are TABLE IDENTIFIERS (no slashes — writeTo
        # would throw ParseException AFTER the whole job computed);
        # parquet targets are subdirectories
        if args.format == "iceberg":
            kept_t, ledger_t = f"{args.output}_kept", f"{args.output}_ledger"
        else:
            base = args.output.rstrip("/")
            kept_t, ledger_t = f"{base}/kept", f"{base}/ledger"
        write_output(kept, kept_t, args.format, partition_by=partition_by)
        write_output(ledger, ledger_t, args.format)

        from pyspark.sql import functions as F

        # stats from the READ-BACK, never the live lineage — counting
        # the un-materialized frames would re-run the whole LSH/dedup
        # pipeline twice
        kept_rb = read_documents(spark, kept_t, args.format)
        ledger_rb = read_documents(spark, ledger_t, args.format)
        by_reason = {r["reject_reason"]: r["n"] for r in
                     ledger_rb.groupBy("reject_reason")
                     .agg(F.count(F.lit(1)).alias("n")).collect()}
        n_kept = kept_rb.count()
        stats = {
            "n_kept": n_kept,
            "rejected": by_reason,
            # no-silent-caps: buckets whose candidates were chain-bounded.
            # The audit frame reads the PERSISTED banded signatures
            # (dedup.py populates audit["persisted"]), so this count does
            # not re-run the cleaning lineage after the outputs are
            # already written (ADVICE r3).
            "hot_buckets": (audit["hot_buckets"].count()
                            if "hot_buckets" in audit else 0),
        }
        if pii_cols:  # redaction you can't count is redaction you
            row = kept_rb.agg(*[F.sum(c).alias(c)   # can't verify
                                for c in pii_cols]).first()
            stats["pii_redacted"] = {c: int(row[c] or 0) for c in pii_cols}
        if args.split:
            stats["splits"] = {r["split"]: r["n"] for r in
                               kept_rb.groupBy("split")
                               .agg(F.count(F.lit(1)).alias("n")).collect()}
        for cached in audit.get("persisted", ()):
            cached.unpersist()
        print(json.dumps(stats))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
