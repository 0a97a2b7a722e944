"""Shard-building job — the last mile from a cleaned corpus to
model-ready training shards.

    spark-submit --py-files khl_pdf_ocr_spark.zip \
        khl_pdf_ocr_spark/shard_cli.py \
        --input  /corpora/main/kept \
        --output /corpora/main/shards \
        --max-tokens 2048 --overlap 128 --capacity 8192 \
        --split train=0.98,val=0.01,test=0.01

Pipeline (each stage an existing operator):

    chunk_documents     token-bounded overlapping windows (array exprs)
    hash_split          deterministic split by PARENT doc id — all
                        chunks of a doc land in one split (no
                        train/val leak through overlapping chunks)
    pack_sequences      per-split first-fit-decreasing packing into
                        ``--capacity``-token packs (bucket-then-pack)
    write               parquet partitioned by split; one row per
                        chunk with its pack assignment

Stats line reports rows, packs, and the mean pack fill rate per split —
padding waste is the number this job exists to minimize, so it is
measured, not assumed.
"""

from __future__ import annotations

import argparse
import json
import sys

from khl_pdf_ocr_spark.operators.prepare import (chunk_documents, hash_split,
                                                 pack_sequences)
from khl_pdf_ocr_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--max-tokens", type=int, default=2048)
    ap.add_argument("--overlap", type=int, default=128)
    ap.add_argument("--capacity", type=int, default=8192)
    ap.add_argument("--split", default="train=0.98,val=0.01,test=0.01")
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)
    if args.capacity < args.max_tokens:
        ap.error(f"--capacity ({args.capacity}) must be >= --max-tokens "
                 f"({args.max_tokens}): a full chunk must fit one pack")

    from pyspark.sql import functions as F

    weights = {}
    for part in args.split.split(","):
        name, w = part.split("=")
        weights[name.strip()] = float(w)

    spark = get_spark("khl-shard", cpus=args.cpus)
    try:
        docs = spark.read.parquet(args.input)
        chunks = chunk_documents(docs, text_col=args.text_col,
                                 id_col=args.id_col,
                                 max_tokens=args.max_tokens,
                                 overlap=args.overlap)
        split = hash_split(chunks, id_col=args.id_col, weights=weights,
                           seed=args.seed)
        # pack WITHIN each split: a pack must never mix train and val
        # rows, so each split packs in its own pass; the split index is
        # folded into the high bits so pack ids stay GLOBALLY unique
        # (per-split passes reuse the same bucket space — ids < 2^40,
        # offset stride 2^44)
        packed = None
        for idx, name in enumerate(sorted(weights)):
            part = (pack_sequences(split.filter(F.col("split") == name),
                                   len_col="n_tokens",
                                   capacity=args.capacity,
                                   bucket_col=args.id_col)
                    .withColumn("pack_id",
                                F.col("pack_id") + F.lit(idx << 44)))
            packed = part if packed is None else packed.unionByName(part)

        out = args.output.rstrip("/")
        packed.write.mode("overwrite").partitionBy("split").parquet(out)

        rb = spark.read.parquet(out)
        fill = (rb.groupBy("split", "pack_id")
                .agg(F.sum("n_tokens").alias("load"))
                .groupBy("split")
                .agg(F.count(F.lit(1)).alias("n_packs"),
                     (F.avg("load") / F.lit(float(args.capacity))
                      ).alias("fill_rate")))
        stats = {
            "n_chunks": rb.count(),
            "splits": {r["split"]: {"n_packs": r["n_packs"],
                                    "fill_rate": round(r["fill_rate"], 4)}
                       for r in fill.collect()},
            "capacity": args.capacity,
        }
        print(json.dumps(stats))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
