#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN for measurement —
this file carries the extra per-operator isolation runs the guide §1.4
asks for: warm noop-sink medians, same session shape as bench.py, one
JSON line per target so before/after pairs are same-methodology).

Usage:
    python bench_extra.py --targets gopher_repetition page_metadata
    python bench_extra.py --list
    python bench_extra.py --repeats 5 --targets ngram_exact_pairs

Every target times `frame.write.format("noop")` after one warm-up
pass, repeats N times (default 3) and reports the median + all
samples.  Nothing here is read by the driver; numbers are cited in
OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_targets(spark, qmap):
    """name -> lazy DataFrame factory (so un-requested targets cost
    nothing to skip)."""
    from pyspark.sql import functions as F

    import bench as benchmod
    from khl_pdf_ocr_spark.operators.domains import cap_per_domain
    from khl_pdf_ocr_spark.operators.licensing import page_signals
    from khl_pdf_ocr_spark.operators.links import (anchor_text_profile,
                                                   extract_outlinks)
    from khl_pdf_ocr_spark.operators.metadata import page_metadata
    from khl_pdf_ocr_spark.operators.paragraphs import paragraph_dedup
    from khl_pdf_ocr_spark.operators.prepare import (chunk_documents,
                                                     hash_split,
                                                     pack_sequences)
    from khl_pdf_ocr_spark.operators.repetition import \
        gopher_repetition_stats
    from khl_pdf_ocr_spark.operators.snapshots import (dedup_revisits,
                                                       revisit_stats)

    docs_path = benchmod.bench_corpus()
    docs_tbl = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    crawl = benchmod.prepare_corpus_cols(docs_tbl)
    raw = spark.read.parquet(docs_path)

    targets = {
        # --- prepare block (bench.py parity) ---
        "chunk_documents": lambda: chunk_documents(docs_tbl, max_tokens=128,
                                                   overlap=16),
        "chunk_pack_pipeline": lambda: pack_sequences(
            hash_split(chunk_documents(docs_tbl, max_tokens=128, overlap=16),
                       weights={"train": 0.98, "val": 0.02}),
            capacity=512, n_buckets=64),
        "paragraph_dedup": lambda: paragraph_dedup(crawl.drop("url")),
        "domain_cap": lambda: cap_per_domain(crawl, max_per_domain=24)[0],
        "gopher_repetition": lambda: gopher_repetition_stats(crawl),
        "ngram_exact_pairs": lambda: (
            qmap["doc_text_near_dup_pairs"](spark, SF_DIR)
            .filter(F.col("kind") == "ngram")),
        "page_signals": lambda: page_signals(raw),
        "extract_outlinks": lambda: extract_outlinks(raw),
        "anchor_text_profile": lambda: anchor_text_profile(
            extract_outlinks(raw, with_text=True)),
        "page_metadata": lambda: page_metadata(raw),
        "revisit_stats": lambda: revisit_stats(raw),
        "dedup_revisits": lambda: dedup_revisits(raw),
    }

    # --- headline queries (bench.py parity; noop sink instead of
    # collect/count so per-query isolation times computation only) ---
    for name in benchmod.HEADLINE:
        if name == "extract_pipeline":
            continue
        if name == "doc_minhash_lsh_pairs":
            targets[name] = lambda: (
                qmap["doc_text_near_dup_pairs"](spark, SF_DIR)
                .filter(F.col("kind") == "minhash"))
        else:
            targets[name] = (lambda nm: lambda: qmap[nm](spark, SF_DIR))(name)

    def _extract_noop():
        from khl_pdf_ocr_spark.operators.extract import extract_documents
        return extract_documents(spark.read.parquet(docs_path))

    targets["extract_pipeline_noop"] = _extract_noop
    return targets


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--targets", nargs="*", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--cpus", type=int, default=CPUS)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from khl_pdf_ocr_spark.session import get_spark

    spark = get_spark("bench-extra", cpus=args.cpus,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "6291456",
                                  "spark.sql.files.openCostInBytes": "1048576"})
    qmap = entrymod.queries()
    targets = build_targets(spark, qmap)
    if args.list:
        print("\n".join(sorted(targets)))
        return

    names = args.targets or sorted(targets)
    out = {}
    for name in names:
        frame = targets[name]()
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        frame.write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(args.repeats):
            t0 = time.time()
            frame.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"median": sorted(samples)[len(samples) // 2],
                     "samples": samples}
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": args.cpus,
                      "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
