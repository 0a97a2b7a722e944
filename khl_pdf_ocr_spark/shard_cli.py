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
                                                 pack_sequences,
                                                 parse_split_weights)
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
    ap.add_argument("--bpe-merges", default=None, metavar="PATH",
                    help="merge table from bpe.save_merges: re-count "
                         "every chunk in BPE PIECES and pack on that "
                         "(--capacity then means model tokens, not "
                         "whitespace words — whitespace undercounts by "
                         "pieces_per_word, so a whitespace-packed shard "
                         "overflows the context window at train time)")
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)
    if args.capacity < args.max_tokens:
        ap.error(f"--capacity ({args.capacity}) must be >= --max-tokens "
                 f"({args.max_tokens}): a full chunk must fit one pack")
    if args.overlap >= args.max_tokens:
        ap.error(f"--overlap ({args.overlap}) must be < --max-tokens "
                 f"({args.max_tokens}) or the chunk stride is "
                 "non-positive")

    from pyspark.sql import functions as F

    try:
        weights = parse_split_weights(args.split)
    except ValueError as e:
        ap.error(str(e))

    spark = get_spark("khl-shard", cpus=args.cpus)
    try:
        docs = spark.read.parquet(args.input)
        chunks = chunk_documents(docs, text_col=args.text_col,
                                 id_col=args.id_col,
                                 max_tokens=args.max_tokens,
                                 overlap=args.overlap)
        len_col = "n_tokens"
        if args.bpe_merges:
            from khl_pdf_ocr_spark.operators.bpe import (
                load_merges, with_bpe_piece_counts)

            chunks = with_bpe_piece_counts(
                chunks, load_merges(spark, args.bpe_merges),
                text_col="chunk_text")
            len_col = "n_pieces"
        split = hash_split(chunks, id_col=args.id_col, weights=weights,
                           seed=args.seed)
        # pack WITHIN each split via group_cols: a pack never mixes
        # train and val rows, and the whole dataset packs in ONE
        # grouped job (a per-split filter loop would re-run the
        # chunking lineage once per split — r4 review).  pack_id is
        # unique within a split; the pack key is (split, pack_id), and
        # the output is partitioned by split accordingly.
        #
        # persist first: pack_sequences derives its corpus-scaled
        # n_buckets from one count() — without the persist that action
        # and the packing job would each run the chunking lineage
        split = split.persist()
        audit: dict = {}
        packed = pack_sequences(split, len_col=len_col,
                                capacity=args.capacity,
                                bucket_col=args.id_col,
                                group_cols=("split",), audit=audit)

        out = args.output.rstrip("/")
        packed.write.mode("overwrite").partitionBy("split").parquet(out)
        split.unpersist()

        rb = spark.read.parquet(out)
        fill = (rb.groupBy("split", "pack_id")
                .agg(F.sum(len_col).alias("load"))
                .groupBy("split")
                .agg(F.count(F.lit(1)).alias("n_packs"),
                     (F.avg("load") / F.lit(float(args.capacity))
                      ).alias("fill_rate")))
        by_split = {r["split"]: {"n_packs": r["n_packs"],
                                 "fill_rate": round(r["fill_rate"], 4)}
                    for r in fill.collect()}
        # every REQUESTED split appears, even empty ones — a split that
        # produced nothing must show n_packs 0 in telemetry, not vanish
        # (no-silent-caps; r4 review)
        for name in weights:
            by_split.setdefault(name, {"n_packs": 0, "fill_rate": None})
        stats = {
            "n_chunks": rb.count(),
            "splits": by_split,
            "capacity": args.capacity,
            "len_col": len_col,   # what --capacity was denominated in
            # bucket telemetry: the corpus-scaled bucket count chosen
            # by pack_sequences (a ballooned bucket shows here, not
            # just in straggler task times)
            "n_buckets": audit.get("pack_n_buckets"),
        }
        print(json.dumps(stats))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
