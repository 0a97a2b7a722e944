"""Shard-building job — the last mile from a cleaned corpus to
model-ready training shards.

    spark-submit --py-files khl_pdf_ocr_spark.zip \
        khl_pdf_ocr_spark/shard_cli.py \
        --input  /corpora/main/kept \
        --output /corpora/main/shards \
        --max-tokens 2048 --overlap 128 --capacity 8192 \
        --split train=0.98,val=0.01,test=0.01

Pipeline (each stage an existing operator):

    mixture_sample      optional per-source token-budget selection
                        (--mixture + --token-budget): the Pile/LLaMA
                        mixture-weights stage, applied to whole
                        documents BEFORE chunking so a doc is either in
                        or out of the assembled corpus
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
    ap.add_argument("--emit-token-ids", action="store_true",
                    help="with --bpe-merges and --bpe-vocab: write each "
                         "chunk's BPE token ids (array<int>) into the "
                         "shard rows — model-ready ids, not strings.  "
                         "One encode pass serves both the ids and the "
                         "piece counts packing is denominated in")
    ap.add_argument("--bpe-vocab", default=None, metavar="PATH",
                    help="vocabulary table from bpe.save_vocab "
                         "(piece -> id), required by --emit-token-ids")
    ap.add_argument("--mixture", default=None, metavar="SPEC",
                    help="per-source mixture weights 'wiki=4,web=2,"
                         "code=1' (same name=weight format as --split; "
                         "weights are normalised).  With "
                         "--token-budget, selects each source's "
                         "deterministic hash-order document prefix up "
                         "to floor(budget*w/total) whitespace tokens "
                         "before chunking; sources not named are "
                         "dropped")
    ap.add_argument("--token-budget", type=int, default=None,
                    help="total whitespace-token budget the --mixture "
                         "weights divide (pre-chunking, raw-document "
                         "tokens — NOT BPE pieces even with "
                         "--bpe-merges)")
    ap.add_argument("--mixture-temperature", type=float, default=None,
                    metavar="T",
                    help="derive the mixture weights from the corpus's "
                         "OWN per-source token shares raised to 1/T "
                         "(XLM-R/mT5 temperature sampling: T=1 keeps "
                         "natural proportions, larger T flattens "
                         "toward uniform).  Requires --token-budget; "
                         "mutually exclusive with --mixture; the "
                         "derived weights are printed in stats")
    ap.add_argument("--source-col", default="source",
                    help="column naming each document's source for "
                         "--mixture / --mixture-temperature")
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
    if args.emit_token_ids and not (args.bpe_merges and args.bpe_vocab):
        ap.error("--emit-token-ids requires both --bpe-merges and "
                 "--bpe-vocab (ids are defined by the trained merge "
                 "table plus its vocabulary numbering)")
    if args.bpe_vocab and not args.emit_token_ids:
        ap.error("--bpe-vocab only makes sense with --emit-token-ids")
    if args.mixture is not None and args.mixture_temperature is not None:
        ap.error("--mixture and --mixture-temperature are mutually "
                 "exclusive (explicit weights vs derived weights)")
    wants_mix = (args.mixture is not None
                 or args.mixture_temperature is not None)
    if wants_mix != (args.token_budget is not None):
        ap.error("--mixture/--mixture-temperature and --token-budget "
                 "go together")
    mix_weights = None
    if wants_mix:
        try:
            if args.mixture is not None:
                mix_weights = parse_split_weights(args.mixture)
            elif not args.mixture_temperature > 0:
                raise ValueError(f"--mixture-temperature must be > 0, "
                                 f"got {args.mixture_temperature}")
            if args.token_budget < 1:
                raise ValueError(f"--token-budget must be >= 1, "
                                 f"got {args.token_budget}")
        except ValueError as e:
            ap.error(str(e))

    spark = get_spark("khl-shard", cpus=args.cpus)
    mix_persisted = None
    try:
        docs = spark.read.parquet(args.input)
        mix_stats = None
        if wants_mix:
            from khl_pdf_ocr_spark.functions.text import token_count
            from khl_pdf_ocr_spark.operators.mixture import (
                mixture_sample, temperature_weights)

            counted = docs.withColumn(
                "_mix_tok",
                F.coalesce(token_count(F.col(args.text_col)), F.lit(0)))
            if mix_weights is None:
                # derived from the corpus itself — one source-sized
                # action over the same counted column the sampler uses
                mix_weights = temperature_weights(
                    counted, temperature=args.mixture_temperature,
                    token_col="_mix_tok", source_col=args.source_col)
            kept, stats = mixture_sample(
                counted, mix_weights, args.token_budget,
                token_col="_mix_tok", source_col=args.source_col,
                id_col=args.id_col, seed=args.seed)
            # stats shares the kept lineage and chunking re-reads it —
            # persist once, feed both (the split.persist precedent)
            mix_persisted = kept.persist()
            mix_stats = {
                r[args.source_col]: {
                    "budget_tokens": r["budget_tokens"],
                    "avail_docs": r["avail_docs"],
                    "avail_tokens": r["avail_tokens"],
                    "kept_docs": r["kept_docs"],
                    "kept_tokens": r["kept_tokens"],
                    "epochs_needed": r["epochs_needed"],
                } for r in stats.collect()}
            docs = mix_persisted.drop("_mix_tok")
        chunks = chunk_documents(docs, text_col=args.text_col,
                                 id_col=args.id_col,
                                 max_tokens=args.max_tokens,
                                 overlap=args.overlap)
        len_col = "n_tokens"
        if args.bpe_merges:
            from khl_pdf_ocr_spark.operators.bpe import (
                bpe_encode, load_merges, load_vocab,
                with_bpe_piece_counts)

            merges = load_merges(spark, args.bpe_merges)
            if args.emit_token_ids:
                # one encode pass yields both the ids the trainer
                # consumes and the piece counts packing is sized by
                chunks = bpe_encode(chunks, merges,
                                    load_vocab(spark, args.bpe_vocab),
                                    text_col="chunk_text")
                chunks = chunks.withColumn(
                    "n_pieces", F.size("token_ids").cast("long"))
            else:
                chunks = with_bpe_piece_counts(chunks, merges,
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
        if mix_stats is not None:
            stats["mixture"] = mix_stats
            if args.mixture_temperature is not None:
                stats["mixture_temperature"] = {
                    "T": args.mixture_temperature,
                    "weights": {s: round(w, 6)
                                for s, w in mix_weights.items()}}
        print(json.dumps(stats))
        return 0
    finally:
        if mix_persisted is not None:
            mix_persisted.unpersist()
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
