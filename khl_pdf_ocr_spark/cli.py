"""Job entry point — the batch twin of the reference's query API.

The reference exposes ``GET /extract?season&uid&mode=all|refs|goalies|
words[&debug]`` (``app.py:376-419``); at pipeline scale the same surface
is a ``spark-submit`` job over the whole table:

    spark-submit --py-files khl_pdf_ocr_spark.zip -m khl_pdf_ocr_spark.cli \
        --input  /data/docs            # parquet dir or iceberg table name
        --output /data/extracted \
        --mode all                     # all | words | refs | gk | goalies
        --resume                       # manifest-checkpointed bucketed run

Per-row failures become error-envelope rows (never task failures),
matching the reference's 4xx/5xx envelopes.
"""

from __future__ import annotations

import argparse
import json
import sys

from khl_pdf_ocr_spark.pipeline import run_extraction, run_resumable
from khl_pdf_ocr_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preflight", action="store_true",
                    help="liveness/capability probe (the batch twin of the "
                         "reference's GET /health) and exit")
    ap.add_argument("--input", required=False)
    ap.add_argument("--output", required=False)
    ap.add_argument("--mode", default="all",
                    choices=["all", "words", "refs", "gk", "goalies"])
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg", "warc", "cdx"],
                    help="warc: extract straight from raw crawl "
                         "archives (*.warc / *.warc.gz) — the ingest "
                         "front door, no staging table needed; "
                         "cdx: --input is CDXJ index files and only "
                         "the selected records' gzip members are "
                         "range-read from the archives")
    ap.add_argument("--cdx-where", default=None, metavar="SQL",
                    help="with --format cdx: predicate over the "
                         "index columns (urlkey, cdx_ts, url, "
                         "status, mime, digest, offset, length, "
                         "filename), e.g. \"status = 200 AND mime "
                         "= 'text/html'\" — filtering happens on "
                         "the index, before any archive byte is read")
    ap.add_argument("--cdx-base", default=None, metavar="DIR",
                    help="directory for relative archive filenames "
                         "in the index (Common Crawl indexes store "
                         "crawl-relative paths)")
    ap.add_argument("--resume", action="store_true",
                    help="bucketed run with checkpointed manifests")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--salt", action="store_true",
                    help="explicit size-bucket salted repartition before the "
                         "extract map (for heavy-tailed per-byte cost)")
    ap.add_argument("--ocr", action="store_true",
                    help="run the two-phase OCR fallback on the failed subset "
                         "(requires PyMuPDF + Pillow + tesseract; the batch "
                         "twin of the reference's fallback, app.py:240,311)")
    ap.add_argument("--debug", action="store_true",
                    help="thread the reference's debug=1 flag: adds a "
                         "debug_json column and _debug in result_json")
    ap.add_argument("--signals", default=None, metavar="PATH",
                    help="write the ingest-signals side table (url, "
                         "license, noindex, canonical_of) to PATH "
                         "before extraction — the per-page policy "
                         "declarations read while the raw html is in "
                         "hand; clean_cli joins them later by url "
                         "(--allow-licenses / --canonical-col) without "
                         "ever rescanning html")
    ap.add_argument("--outlinks", default=None, metavar="PATH",
                    help="write the (src, dst) hyperlink edge side "
                         "table to PATH before extraction — the "
                         "WAT-sidecar analogue; feeds "
                         "links.host_link_graph + graph.pagerank "
                         "without ever rescanning the crawl")
    ap.add_argument("--outlinks-text", action="store_true",
                    help="with --outlinks: also record each link's "
                         "anchor text (the WAT link-text field; feeds "
                         "links.anchor_text_profile).  Counts only "
                         "well-formed <a>...</a> elements")
    ap.add_argument("--target-file-mb", type=int, default=None,
                    metavar="MB",
                    help="compact the extraction output to ~MB parquet "
                         "files after the metrics pass (sources."
                         "writers.compact_parquet; no-op when the "
                         "layout is already healthy)")
    ap.add_argument("--robots-rules", default=None, metavar="PATH",
                    help="parquet rule table from operators.robots."
                         "parse_robots_rules (built from the crawl's "
                         "own /robots.txt records): drop RFC 9309 "
                         "Disallow'd urls pre-kernel; count lands in "
                         "stats as robots_dropped")
    ap.add_argument("--robots-agent", default="*",
                    help="with --robots-rules: the user-agent token "
                         "whose rule group applies (default '*')")
    ap.add_argument("--honor-noindex", action="store_true",
                    help="drop pages declaring <meta name=robots "
                         "... noindex> before extraction (publisher "
                         "opt-out compliance); with --signals the "
                         "dropped count lands in stats as "
                         "noindex_dropped")
    ap.add_argument("--page-metadata", default=None, metavar="PATH",
                    help="write the page-metadata side table (url, "
                         "title, og_title, pub_date, pub_date_parsed, "
                         "byline — operators.metadata.page_metadata) "
                         "before extraction: best-effort declarations "
                         "read while the raw html is in hand")
    ap.add_argument("--diff-against", default=None, metavar="PATH",
                    help="previous crawl's documents parquet: extract "
                         "ONLY urls whose newest content is added or "
                         "changed vs that snapshot (snapshots."
                         "crawl_diff; unchanged recaptures skip the "
                         "kernel — their output already exists); "
                         "per-status counts land in stats as "
                         "crawl_diff")
    ap.add_argument("--diff-out", default=None, metavar="PATH",
                    help="with --diff-against: persist the full (url, "
                         "status, old_ts, new_ts) diff table — its "
                         "'removed' rows are the corpus-maintenance "
                         "work list")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    spark = get_spark("khl-extract", cpus=args.cpus)
    try:
        if args.preflight:
            from khl_pdf_ocr_spark.pipeline import preflight

            res = preflight(spark)
            print(json.dumps(res))
            return 0 if res["ok"] else 1
        if not (args.input and args.output):
            ap.error("--input and --output are required unless --preflight")
        if args.resume and (args.ocr or args.debug):
            # never silently drop a correctness-relevant flag
            ap.error("--resume does not support --ocr/--debug; run the "
                     "resumable text-layer pass first, then a plain run "
                     "with --ocr/--debug over the failed subset")
        if args.resume and (args.signals or args.honor_noindex
                            or args.outlinks or args.robots_rules
                            or args.diff_against or args.page_metadata):
            ap.error("--resume does not support --signals/"
                     "--honor-noindex/--outlinks/--robots-rules/"
                     "--diff-against/--page-metadata; run the side "
                     "tables / policy gates in a plain run (or a "
                     "dedicated pass) first")
        if args.diff_out and not args.diff_against:
            ap.error("--diff-out requires --diff-against")
        if args.robots_agent != "*" and not args.robots_rules:
            ap.error("--robots-agent requires --robots-rules")
        if args.outlinks_text and not args.outlinks:
            ap.error("--outlinks-text requires --outlinks")
        if args.target_file_mb is not None and args.target_file_mb < 1:
            ap.error("--target-file-mb must be >= 1")
        ocr_stage = None
        if args.ocr:
            from khl_pdf_ocr_spark.operators.ocr_stage import (HAS_OCR_ENGINE,
                                                               make_ocr_stage)

            if HAS_OCR_ENGINE:
                # debug threads through BOTH phases (matching schemas)
                ocr_stage = make_ocr_stage(mode=args.mode, debug=args.debug)
            else:  # graceful degradation, like the reference (app.py:76-77)
                print(json.dumps({"warning": "ocr_engine_missing",
                                  "detail": "PyMuPDF/Pillow/tesseract not "
                                            "installed; running text-layer "
                                            "only"}), file=sys.stderr)
        reader_opts = None
        if args.format == "cdx":
            reader_opts = {"cdx_where": args.cdx_where,
                           "cdx_base": args.cdx_base}
        elif args.cdx_where or args.cdx_base:
            ap.error("--cdx-where/--cdx-base require --format cdx")
        if args.resume:
            stats = run_resumable(spark, args.input, args.output,
                                  n_buckets=args.buckets, mode=args.mode,
                                  input_format=args.format,
                                  reader_opts=reader_opts)
        else:
            _, stats = run_extraction(spark, args.input, args.output,
                                      mode=args.mode, salt=args.salt,
                                      num_partitions=args.partitions,
                                      input_format=args.format,
                                      reader_opts=reader_opts,
                                      debug=args.debug, ocr_stage=ocr_stage,
                                      honor_noindex=args.honor_noindex,
                                      signals_path=args.signals,
                                      outlinks_path=args.outlinks,
                                      outlinks_text=args.outlinks_text,
                                      target_file_mb=args.target_file_mb,
                                      robots_rules_path=args.robots_rules,
                                      robots_agent=args.robots_agent,
                                      diff_against=args.diff_against,
                                      diff_out=args.diff_out,
                                      metadata_path=args.page_metadata)
        print(json.dumps(stats))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
