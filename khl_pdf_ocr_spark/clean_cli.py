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
    ap.add_argument("--policy", default="pairs",
                    choices=["pairs", "components", "components_best"],
                    help="near-dup survivor rule: drop pair id_b / keep "
                         "min id per cluster / keep the highest-quality "
                         "member per cluster")
    ap.add_argument("--url-col", default=None,
                    help="dedup on the canonical url first (stage 0); "
                         "drops land as url_dup in the ledger")
    ap.add_argument("--canonical-col", default=None, metavar="COL",
                    help="with --url-col: a rel=canonical column "
                         "tagged at ingest (cli --signals / "
                         "licensing.canonical_link); where non-NULL "
                         "it replaces the fetch url as the stage-0 "
                         "dedup key, so variant urls declaring one "
                         "target collapse onto it")
    ap.add_argument("--decontaminate-against", default=None,
                    help="parquet path of an eval set (text column): "
                         "drop docs sharing any 13-gram with it "
                         "(contaminated ledger reason)")
    ap.add_argument("--decontaminate-fuzzy", type=float, default=None,
                    metavar="JACCARD",
                    help="with --decontaminate-against: ALSO drop docs "
                         "whose MinHash shingle-Jaccard with any eval "
                         "doc reaches this threshold (paraphrase net; "
                         "contaminated_fuzzy ledger reason)")
    ap.add_argument("--c4-rules", action="store_true",
                    help="apply the C4 heuristics (Raffel et al. 2020): "
                         "keep only lines ending in terminal "
                         "punctuation with >=5 words and no "
                         "'javascript'; drop pages with '{', 'lorem "
                         "ipsum', or <3 surviving sentences "
                         "(c4_* ledger reasons; line counts in stats)")
    ap.add_argument("--badwords", default=None, metavar="FILE",
                    help="C4's bad-words page drop (Raffel et al. "
                         "2020 §2.2): FILE has one lowercase word per "
                         "line ('#' comments); pages containing any "
                         "listed WHOLE token drop with ledger reason "
                         "c4_badwords (word-level match — substrings "
                         "never trigger)")
    ap.add_argument("--gopher-rules", action="store_true",
                    help="apply the Gopher document-quality rules (Rae "
                         "et al. 2021 A1.1 thresholds: word count/"
                         "length, symbol ratio, bullet/ellipsis lines, "
                         "alpha words, stop-word hits; gopher_* ledger "
                         "reasons — combine with --repetition for the "
                         "full Gopher gate)")
    ap.add_argument("--repetition", action="store_true",
                    help="append the light 2-measure repetition filter "
                         "(rep_lines/rep_2gram ledger reasons)")
    ap.add_argument("--gopher-repetition", action="store_true",
                    help="append the FULL Gopher repetition table (Rae "
                         "et al. 2021 Table A1: dup line/paragraph "
                         "occurrence+char fractions, top 2-4-gram char "
                         "fractions, dup 5-10-gram char fractions, "
                         "published thresholds; rep_* ledger reasons "
                         "name the first failing measure)")
    ap.add_argument("--max-dup-line-fraction", type=float, default=0.3)
    ap.add_argument("--max-top-2gram-fraction", type=float, default=0.2)
    ap.add_argument("--quality-lm", default=None, metavar="train|PATH",
                    help="append the CCNet-style unigram-LM quality "
                         "stage: 'train' fits the LM on this batch; a "
                         "path loads a persisted (token, logprob) "
                         "parquet.  Drops land as lm_quality")
    ap.add_argument("--lm-order", type=int, default=1, choices=[1, 2],
                    help="LM order for --quality-lm: 1 = unigram, 2 = "
                         "interpolated bigram (word-order-sensitive; "
                         "'train' fits both tables, a PATH loads "
                         "<PATH>/unigram + <PATH>/bigram)")
    ap.add_argument("--lm-tails", default="0.05,0.95", metavar="LO,HI",
                    help="batch quantiles of avg_logprob to keep "
                         "between (CCNet keeps the middle; both tails "
                         "are junk)")
    ap.add_argument("--lm-cutoffs", default=None, metavar="LO,HI",
                    help="absolute avg_logprob bounds instead of batch "
                         "quantiles ('none' for an open side, e.g. "
                         "'-9.5,none') — the increment shape: frozen "
                         "cutoffs from a reference batch, fully lazy")
    ap.add_argument("--save-lm", default=None,
                    help="with --quality-lm train: persist the trained "
                         "(token, logprob) LM parquet here for reuse "
                         "by later increments")
    ap.add_argument("--zlib-bounds", default=None, metavar="LO,HI",
                    help="keep docs whose zlib compression ratio "
                         "(compressed/raw utf-8 bytes) lies in "
                         "[LO,HI] ('none' for an open side, e.g. "
                         "'0.1,none') — the model-free two-tailed "
                         "quality gate: boilerplate compresses far "
                         "below prose, glyph soup sits near 1; drops "
                         "ledger as zlib_ratio")
    ap.add_argument("--quality-classifier", default=None,
                    metavar="train|PATH",
                    help="model-based quality stage (GPT-3 Appendix-A "
                         "style): 'train' fits a hashed-feature "
                         "logistic classifier on --clf-positives (the "
                         "curated seed corpus) vs this batch as "
                         "negatives; a PATH loads a saved model.  "
                         "Requires exactly one of --clf-threshold / "
                         "--clf-pareto; drops land as clf_quality")
    ap.add_argument("--clf-positives", default=None, metavar="PARQUET",
                    help="curated seed-corpus parquet (same text "
                         "column name) — required with "
                         "--quality-classifier train")
    ap.add_argument("--clf-negatives", default=None, metavar="PARQUET",
                    help="with --quality-classifier train: explicit "
                         "negative-class parquet (a curated junk "
                         "sample) instead of the default — this raw "
                         "batch itself.  The batch default is the "
                         "GPT-3 recipe and assumes seed-like docs are "
                         "a small minority of the batch; on a small or "
                         "already-clean batch the label noise "
                         "dominates, so pass explicit negatives")
    ap.add_argument("--clf-threshold", type=float, default=None,
                    help="hard gate: keep docs with classifier score "
                         ">= this (LLaMA-style)")
    ap.add_argument("--clf-pareto", type=float, default=None,
                    metavar="ALPHA",
                    help="GPT-3 Pareto lottery instead of a hard gate: "
                         "keep iff a deterministic Lomax(ALPHA) draw "
                         "exceeds 1 - score (keeps tail diversity; "
                         "the paper uses ALPHA=9)")
    ap.add_argument("--dsir-target", default=None, metavar="PARQUET",
                    help="DSIR importance resampling (Xie 2023): fit "
                         "hashed-n-gram models on this target corpus "
                         "and on the cleaned batch, keep the docs "
                         "whose Gumbel-perturbed log importance ratio "
                         "ranks highest.  Requires exactly one of "
                         "--dsir-keep / --dsir-threshold; drops land "
                         "as reason 'dsir'")
    ap.add_argument("--dsir-keep", type=int, default=None, metavar="K",
                    help="keep the top-K docs by DSIR key (driver-side "
                         "O(K) top-k merge — use --dsir-threshold for "
                         "corpus-scale K)")
    ap.add_argument("--dsir-threshold", type=float, default=None,
                    help="keep docs with DSIR key >= this (fully "
                         "distributed; use the equals form "
                         "--dsir-threshold=-2.5 for negative values)")
    ap.add_argument("--dsir-no-gumbel", action="store_true",
                    help="plain top-k/threshold on the log ratio "
                         "(the paper's argmax variant) instead of "
                         "Gumbel-perturbed sampling")
    ap.add_argument("--save-dsir", default=None, metavar="PATH",
                    help="persist the fitted (target, raw) DSIR model "
                         "pair here for frozen reuse by later "
                         "increments (increment_cli --dsir-model)")
    ap.add_argument("--save-clf", default=None,
                    help="with --quality-classifier train: persist the "
                         "fitted model here for reuse by later "
                         "increments")
    ap.add_argument("--block-domains", default=None, metavar="FILE",
                    help="newline-delimited registrable-domain "
                         "blocklist ('#' comments): docs from listed "
                         "domains drop FIRST, before any text work "
                         "(blocked_domain ledger reason; requires "
                         "--url-col)")
    ap.add_argument("--allow-licenses", default=None, metavar="LIST",
                    help="comma list of license tags to KEEP (e.g. "
                         "'cc-by,cc-by-sa,cc0') — docs whose "
                         "--license-col is not listed drop before any "
                         "text work (license ledger reason; tag at "
                         "ingest with operators.licensing."
                         "with_license_tag while the html is in hand)")
    ap.add_argument("--license-col", default="license",
                    help="column carrying the license tag (default "
                         "'license')")
    ap.add_argument("--keep-untagged", action="store_true",
                    help="with --allow-licenses: keep docs with a NULL "
                         "tag (default drops them — no declaration is "
                         "not a grant)")
    ap.add_argument("--max-docs-per-domain", type=int, default=None,
                    metavar="N",
                    help="keep at most N docs per registrable domain "
                         "(deterministic hash lottery; requires "
                         "--url-col; drops land as domain_cap)")
    ap.add_argument("--host-ranks", default=None, metavar="PATH",
                    help="parquet (host, rank) table from "
                         "graph.host_pagerank over the --outlinks "
                         "ingest sidecar — the link-graph quality "
                         "prior; requires --url-col and "
                         "--min-host-rank")
    ap.add_argument("--min-host-rank", type=float, default=None,
                    metavar="X",
                    help="with --host-ranks: drop docs whose domain "
                         "ranks below X (low_host_rank ledger reason); "
                         "unranked domains are KEPT unless "
                         "--drop-unranked")
    ap.add_argument("--drop-unranked", action="store_true",
                    help="with --host-ranks: also drop docs whose "
                         "domain has no rank row")
    ap.add_argument("--dedup-paragraphs", action="store_true",
                    help="CCNet paragraph-level dedup on the kept text: "
                         "every non-first occurrence of a normalized "
                         "paragraph corpus-wide is removed in place "
                         "(counts land in run stats)")
    ap.add_argument("--para-min-chars", type=int, default=1,
                    help="paragraphs whose normalized form is shorter "
                         "than this are exempt from --dedup-paragraphs "
                         "(blank lines are always exempt)")
    ap.add_argument("--strip-repeated-spans", action="store_true",
                    help="remove exact repeated substrings from the "
                         "kept text (Lee et al. ExactSubstr: any "
                         "--span-k-token window occurring more than "
                         "once corpus-wide; tokens-removed counts land "
                         "in run stats)")
    ap.add_argument("--span-k", type=int, default=50,
                    help="window length in tokens for "
                         "--strip-repeated-spans (Lee et al. use 50)")
    ap.add_argument("--fix-unicode", action="store_true",
                    help="ftfy-style mojibake repair + NFC normalize + "
                         "control-char strip on the text column, applied "
                         "FIRST (before LM training and every filter — "
                         "mojibake'd twins must hash like their clean "
                         "selves); fixed-row count lands in run stats")
    ap.add_argument("--redact-pii", action="store_true",
                    help="replace email/IPv4/phone matches in the kept "
                         "text (counts land in run stats)")
    ap.add_argument("--split", default=None,
                    help="deterministic split assignment, e.g. "
                         "'train=0.98,val=0.01,test=0.01'; kept output "
                         "gains a split column and is partitioned by it")
    ap.add_argument("--lm-tiers", action="store_true",
                    help="with --quality-lm: add a CCNet-style lm_tier "
                         "column (head/middle/tail by avg_logprob) to "
                         "the kept output; boundaries from the batch "
                         "quantiles at --lm-tier-fractions, or frozen "
                         "--lm-tier-cutoffs; per-tier counts + cutoffs "
                         "land in run stats")
    ap.add_argument("--lm-tier-fractions", default="0.333,0.667",
                    metavar="LO,HI",
                    help="batch quantiles of avg_logprob that bound the "
                         "tiers (default terciles)")
    ap.add_argument("--lm-tier-cutoffs", default=None, metavar="LO,HI",
                    help="absolute avg_logprob tier boundaries instead "
                         "of batch quantiles (reproducible across "
                         "batches; use the equals form for negative "
                         "values: --lm-tier-cutoffs=-8.1,-6.9)")
    ap.add_argument("--datacard", default=None, metavar="PATH",
                    help="write a training-data card (JSON: composition "
                         "by source/lang/split, token totals + length "
                         "quantiles, filter funnel, top domains) "
                         "aggregated from the written outputs")
    ap.add_argument("--target-file-mb", type=int, default=None,
                    metavar="MB",
                    help="compact the written outputs to ~MB parquet "
                         "files (sources.writers.compact_parquet — "
                         "decides from true on-disk sizes, no-op when "
                         "the layout is already healthy); parquet "
                         "format only — iceberg tables size files "
                         "natively via write.target-file-size-bytes")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)
    if args.target_file_mb is not None and args.format == "iceberg":
        ap.error("--target-file-mb is the parquet-path knob; set the "
                 "write.target-file-size-bytes table property for "
                 "iceberg outputs")
    if args.target_file_mb is not None and args.target_file_mb < 1:
        ap.error("--target-file-mb must be >= 1")

    from khl_pdf_ocr_spark.operators.prepare import parse_float_bounds

    def parse_bounds(spec: str) -> tuple[float | None, float | None]:
        try:  # shared spec parser (prepare.parse_float_bounds) so the
            return parse_float_bounds(spec)  # sibling CLIs can't drift
        except ValueError as e:
            ap.error(str(e))

    # parse BEFORE the JVM starts (the --split convention): a bad spec
    # is a usage error, not a mid-job traceback
    zlib_bounds = parse_bounds(args.zlib_bounds) if args.zlib_bounds else None

    lm_tails = lm_cutoffs = None
    if args.quality_lm:
        if args.lm_cutoffs:
            lm_cutoffs = parse_bounds(args.lm_cutoffs)
        else:
            lm_tails = parse_bounds(args.lm_tails)
            if None in lm_tails or not 0 <= lm_tails[0] < lm_tails[1] <= 1:
                ap.error(f"--lm-tails must be quantiles with LO < HI, "
                         f"got {args.lm_tails!r}")
    elif args.save_lm or args.lm_cutoffs:
        ap.error("--save-lm/--lm-cutoffs require --quality-lm")
    if args.save_lm and args.quality_lm != "train":
        ap.error("--save-lm only applies to --quality-lm train")
    tier_fractions = tier_cutoffs = None
    if args.lm_tiers:
        if not args.quality_lm:
            ap.error("--lm-tiers requires --quality-lm (tiers are "
                     "defined by the LM score)")
        if args.lm_tier_cutoffs:
            tier_cutoffs = parse_bounds(args.lm_tier_cutoffs)
            if None in tier_cutoffs or tier_cutoffs[0] > tier_cutoffs[1]:
                ap.error(f"--lm-tier-cutoffs must be LO,HI with "
                         f"LO <= HI, got {args.lm_tier_cutoffs!r}")
        else:
            tier_fractions = parse_bounds(args.lm_tier_fractions)
            if (None in tier_fractions
                    or not 0 < tier_fractions[0] < tier_fractions[1] < 1):
                ap.error(f"--lm-tier-fractions must be quantiles with "
                         f"0 < LO < HI < 1, "
                         f"got {args.lm_tier_fractions!r}")
    elif args.lm_tier_cutoffs:
        ap.error("--lm-tier-cutoffs requires --lm-tiers")
    if args.keep_untagged and not args.allow_licenses:
        ap.error("--keep-untagged requires --allow-licenses")
    if args.quality_classifier:
        if (args.clf_threshold is None) == (args.clf_pareto is None):
            ap.error("--quality-classifier requires exactly one of "
                     "--clf-threshold / --clf-pareto")
        if args.quality_classifier == "train" and not args.clf_positives:
            ap.error("--quality-classifier train requires "
                     "--clf-positives (the curated seed corpus)")
        if args.quality_classifier != "train" and (args.clf_positives
                                                   or args.clf_negatives):
            ap.error("--clf-positives/--clf-negatives only apply to "
                     "--quality-classifier train")
    elif (args.clf_positives or args.clf_negatives or args.save_clf
          or args.clf_threshold is not None or args.clf_pareto is not None):
        ap.error("--clf-* flags require --quality-classifier")
    if args.save_clf and args.quality_classifier != "train":
        ap.error("--save-clf only applies to --quality-classifier train")
    if args.dsir_target:
        if (args.dsir_keep is None) == (args.dsir_threshold is None):
            ap.error("--dsir-target requires exactly one of "
                     "--dsir-keep / --dsir-threshold")
        if args.dsir_keep is not None and args.dsir_keep < 1:
            ap.error(f"--dsir-keep must be >= 1, got {args.dsir_keep}")
    elif (args.dsir_keep is not None or args.dsir_threshold is not None
          or args.dsir_no_gumbel or args.save_dsir):
        ap.error("--dsir-*/--save-dsir flags require --dsir-target")
    if args.canonical_col and not args.url_col:
        ap.error("--canonical-col requires --url-col (it refines the "
                 "stage-0 url-dedup key)")
    if args.max_docs_per_domain is not None and not args.url_col:
        ap.error("--max-docs-per-domain requires --url-col (the domain "
                 "is derived from the url column)")
    if args.block_domains and not args.url_col:
        ap.error("--block-domains requires --url-col (the domain is "
                 "derived from the url column)")
    if bool(args.host_ranks) != (args.min_host_rank is not None):
        ap.error("--host-ranks and --min-host-rank go together")
    if args.host_ranks and not args.url_col:
        ap.error("--host-ranks requires --url-col (the domain is "
                 "derived from the url column)")
    if args.drop_unranked and not args.host_ranks:
        ap.error("--drop-unranked requires --host-ranks")
    if args.decontaminate_fuzzy is not None:
        if not args.decontaminate_against:
            ap.error("--decontaminate-fuzzy requires "
                     "--decontaminate-against (the eval set to match)")
        if not 0.0 < args.decontaminate_fuzzy <= 1.0:
            ap.error(f"--decontaminate-fuzzy must be in (0, 1], got "
                     f"{args.decontaminate_fuzzy}")
    split_weights = None
    if args.split:
        from khl_pdf_ocr_spark.operators.prepare import parse_split_weights

        try:  # clean usage error BEFORE the JVM starts (r4 ADVICE)
            split_weights = parse_split_weights(args.split)
        except ValueError as e:
            ap.error(str(e))

    spark = get_spark("khl-clean", cpus=args.cpus)
    try:
        docs = read_documents(spark, args.input, args.format)
        audit: dict = {}
        blocked_ledger = None
        if args.block_domains:
            from khl_pdf_ocr_spark.operators.domains import \
                filter_blocked_domains

            with open(args.block_domains) as fh:
                doms = [ln.strip() for ln in fh
                        if ln.strip() and not ln.startswith("#")]
            # cheapest filter first: listed domains drop before any
            # text work (also before LM training below — a blocklisted
            # spam farm must not shape the quality model)
            docs, blocked_ledger = filter_blocked_domains(
                docs, doms, url_col=args.url_col, id_col=args.id_col)
        hostrank_ledger = None
        if args.host_ranks:
            from khl_pdf_ocr_spark.operators.domains import \
                filter_by_host_rank

            # same cheapest-first rule: a link-graph-condemned domain
            # must not shape the LM / classifier below either
            docs, hostrank_ledger = filter_by_host_rank(
                docs, spark.read.parquet(args.host_ranks),
                min_rank=args.min_host_rank, url_col=args.url_col,
                id_col=args.id_col,
                keep_unranked=not args.drop_unranked)
        license_ledger = None
        if args.allow_licenses:
            from khl_pdf_ocr_spark.operators.licensing import \
                filter_by_license

            # same cheapest-first rule as the blocklist: a
            # wrongly-licensed page must not shape the LM either
            try:
                docs, license_ledger = filter_by_license(
                    docs, args.allow_licenses.split(","),
                    license_col=args.license_col, id_col=args.id_col,
                    keep_untagged=args.keep_untagged)
            except ValueError as e:
                ap.error(str(e))
        if args.fix_unicode:
            from pyspark.sql import functions as F0

            from khl_pdf_ocr_spark.operators.unicodefix import fix_unicode

            # normalization precedes EVERYTHING text-shaped: the LM
            # below must train on fixed text, and dedup fingerprints
            # must see a mojibake'd twin as its clean self
            docs = (fix_unicode(docs, text_col=args.text_col,
                                out_col="_text_fixed")
                    .withColumn("unicode_fixed",
                                ~F0.col("_text_fixed")
                                .eqNullSafe(F0.col(args.text_col)))
                    .drop(args.text_col)
                    .withColumnRenamed("_text_fixed", args.text_col))
        benchmark = (spark.read.parquet(args.decontaminate_against)
                     if args.decontaminate_against else None)
        lm = None
        if args.quality_lm == "train":
            from khl_pdf_ocr_spark.operators.textstats import (
                save_lm, train_bigram_lm, train_unigram_lm)

            # trained on the raw batch (the honest self-referential
            # stand-in for CCNet's reference-corpus KenLM); the frames
            # are localCheckpoint'ed inside the trainers — tiny and
            # lineage-free, safe to reuse across the stats actions
            lm = (train_bigram_lm(docs, text_col=args.text_col)
                  if args.lm_order == 2
                  else train_unigram_lm(docs, text_col=args.text_col))
            if args.save_lm:
                save_lm(lm, args.save_lm)
        elif args.quality_lm:
            from khl_pdf_ocr_spark.operators.textstats import load_lm

            lm = load_lm(spark, args.quality_lm, order=args.lm_order)
        clf = None
        if args.quality_classifier == "train":
            from khl_pdf_ocr_spark.operators.quality_model import (
                save_classifier, train_quality_classifier)

            # the GPT-3 recipe: positives = the curated seed corpus,
            # negatives = the raw (post-blocklist) batch itself unless
            # an explicit junk sample is given
            positives = spark.read.parquet(args.clf_positives)
            negatives = (spark.read.parquet(args.clf_negatives)
                         if args.clf_negatives else docs)
            clf = train_quality_classifier(positives, negatives,
                                           text_col=args.text_col)
            if args.save_clf:
                save_classifier(clf, args.save_clf)
        elif args.quality_classifier:
            from khl_pdf_ocr_spark.operators.quality_model import \
                load_classifier

            clf = load_classifier(spark, args.quality_classifier)
        kept, ledger = clean_corpus(
            docs, text_col=args.text_col, id_col=args.id_col,
            allowed_langs=tuple(args.langs), min_quality=args.min_quality,
            near_dup_threshold=args.near_dup_threshold,
            near_dup_policy=args.policy, url_col=args.url_col,
            declared_canonical_col=args.canonical_col,
            zlib_bounds=zlib_bounds,
            benchmark=benchmark,
            benchmark_fuzzy_threshold=args.decontaminate_fuzzy, lm=lm,
            **({"lm_tails": lm_tails} if lm_tails else {}),
            lm_cutoffs=lm_cutoffs, audit=audit)
        if blocked_ledger is not None:
            ledger = ledger.unionByName(blocked_ledger)
        if hostrank_ledger is not None:
            ledger = ledger.unionByName(hostrank_ledger)
        if license_ledger is not None:
            ledger = ledger.unionByName(license_ledger)

        if args.c4_rules:
            from khl_pdf_ocr_spark.operators.prepare import c4_filters

            # first of the post-clean text stages: later filters
            # (repetition, spans, PII) judge the line-scrubbed text
            kept, c4_ledger = c4_filters(kept, text_col=args.text_col,
                                         id_col=args.id_col)
            ledger = ledger.unionByName(c4_ledger)
        if args.badwords:
            from khl_pdf_ocr_spark.operators.prepare import \
                c4_badwords_filter

            with open(args.badwords) as fh:
                bw = [ln.strip() for ln in fh
                      if ln.strip() and not ln.startswith("#")]
            try:
                kept, bw_ledger = c4_badwords_filter(
                    kept, words=bw, text_col=args.text_col,
                    id_col=args.id_col)
            except ValueError as e:
                ap.error(str(e))
            ledger = ledger.unionByName(bw_ledger)
        if args.gopher_rules:
            from khl_pdf_ocr_spark.operators.prepare import \
                gopher_quality_filter

            kept, gq_ledger = gopher_quality_filter(
                kept, text_col=args.text_col, id_col=args.id_col)
            ledger = ledger.unionByName(gq_ledger)
        if args.gopher_repetition:
            from khl_pdf_ocr_spark.operators.repetition import \
                gopher_repetition_filter

            # the quality rules' 50-word floor runs first when both
            # flags are on — the n-gram measures presuppose it
            kept, grep_ledger = gopher_repetition_filter(
                kept, text_col=args.text_col, id_col=args.id_col)
            ledger = ledger.unionByName(grep_ledger)
        if clf is not None:
            from khl_pdf_ocr_spark.operators.quality_model import \
                classifier_quality_filter

            # last of the quality gates, before domain caps and the
            # text-rewriting stages: the classifier judges the doc as
            # the rule-based gates let it through, and capped/sampled
            # docs never pay the scoring pass twice
            kept, clf_ledger = classifier_quality_filter(
                kept, clf, text_col=args.text_col, id_col=args.id_col,
                threshold=args.clf_threshold,
                pareto_alpha=args.clf_pareto)
            ledger = ledger.unionByName(clf_ledger)
        if args.repetition:
            from khl_pdf_ocr_spark.operators.prepare import repetition_filter

            kept, rep_ledger = repetition_filter(
                kept, text_col=args.text_col, id_col=args.id_col,
                max_dup_line_fraction=args.max_dup_line_fraction,
                max_top_2gram_fraction=args.max_top_2gram_fraction)
            ledger = ledger.unionByName(rep_ledger)
        if args.max_docs_per_domain is not None:
            from khl_pdf_ocr_spark.operators.domains import cap_per_domain

            # after the quality stages (cap survivors, not junk),
            # before the text-rewriting stages (no paragraph/span work
            # for docs about to be sampled out)
            kept, cap_ledger = cap_per_domain(
                kept, max_per_domain=args.max_docs_per_domain,
                url_col=args.url_col, id_col=args.id_col, audit=audit)
            ledger = ledger.unionByName(cap_ledger)
        if args.dsir_target:
            from khl_pdf_ocr_spark.operators.dsir import (
                dsir_logratio_scores, dsir_select, fit_hashed_ngram_model)

            # LAST of the doc-dropping stages: DSIR picks the final
            # training set (top-K by distribution match to the target),
            # so an earlier filter dropping a selected doc would
            # silently shrink K.  The later stages only rewrite text.
            # q̂ is fitted on the batch AS THE GATES LEFT IT — the
            # importance ratio describes what selection actually
            # chooses among, not the pre-filter raw crawl.  Fit +
            # score + select each read `kept` — persist once.
            kept = kept.persist()
            audit.setdefault("persisted", []).append(kept)
            target = read_documents(spark, args.dsir_target, "parquet")
            t_model = fit_hashed_ngram_model(target,
                                             text_col=args.text_col)
            r_model = fit_hashed_ngram_model(kept, text_col=args.text_col)
            if args.save_dsir:
                from khl_pdf_ocr_spark.operators.dsir import \
                    save_dsir_model

                save_dsir_model(t_model, r_model, args.save_dsir)
            scores = dsir_logratio_scores(kept, t_model, r_model,
                                          text_col=args.text_col,
                                          id_col=args.id_col)
            kept, dsir_ledger = dsir_select(
                kept, scores, k=args.dsir_keep or 1, id_col=args.id_col,
                gumbel=not args.dsir_no_gumbel,
                threshold=args.dsir_threshold)
            ledger = ledger.unionByName(dsir_ledger)
        if args.dedup_paragraphs:
            from khl_pdf_ocr_spark.operators.paragraphs import \
                paragraph_dedup

            # paragraph winners are elected on the corpus as deduped so
            # far; runs BEFORE span-stripping (coarse to fine: a whole
            # repeated paragraph should land in the paragraph counters,
            # not be shredded into token spans first)
            kept = kept.persist()
            audit.setdefault("persisted", []).append(kept)
            # audit= also persists the occurrence table inside the
            # operator (it feeds winner election AND join-back)
            kept = paragraph_dedup(kept, text_col=args.text_col,
                                   id_col=args.id_col,
                                   min_chars=args.para_min_chars,
                                   audit=audit)
        if args.strip_repeated_spans:
            from khl_pdf_ocr_spark.operators.substring import \
                strip_repeated_spans

            # the span pass reads the kept frame TWICE (window scan +
            # join back) — persist so the upstream dedup lineage runs
            # once, not twice (the lm_tails precedent; unpersisted via
            # audit after stats)
            kept = kept.persist()
            audit.setdefault("persisted", []).append(kept)
            # strip IN PLACE, before PII redaction: span membership is
            # defined on the corpus text as deduped, and a span removed
            # here can't leak half-redacted fragments later
            kept = (strip_repeated_spans(kept, k=args.span_k,
                                         text_col=args.text_col,
                                         id_col=args.id_col)
                    .drop(args.text_col)
                    .withColumnRenamed("text_deduped", args.text_col))
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
        if args.lm_tiers:
            from khl_pdf_ocr_spark.operators.textstats import \
                append_lm_tiers

            # tiers score the FINAL text (post span-strip/redaction);
            # the shared helper owns the persist discipline (post-join
            # cache only when deriving quantiles — r5 review) and both
            # CLIs' tier semantics
            kept = append_lm_tiers(kept, lm, order=args.lm_order,
                                   text_col=args.text_col,
                                   id_col=args.id_col,
                                   cutoffs=tier_cutoffs,
                                   fractions=tier_fractions,
                                   audit=audit)
        partition_by: tuple = ()
        if split_weights:
            from khl_pdf_ocr_spark.operators.prepare import hash_split

            kept = hash_split(kept, id_col=args.id_col,
                              weights=split_weights)
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
        # pipeline twice.  A PARTITIONED write of an EMPTY frame emits
        # no data files at all (only _SUCCESS), and a bare parquet read
        # of that directory cannot infer a schema — so an all-rejected
        # corpus under --split crashed the stats read-back (r6 find).
        # Supplying the writer frame's schema reads identically when
        # files exist and yields the empty frame when none do.
        if args.format == "parquet" and partition_by:
            kept_rb = spark.read.schema(kept.schema).parquet(kept_t)
        else:
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
        if args.dsir_target:
            stats["dsir"] = {
                "mode": ("threshold" if args.dsir_threshold is not None
                         else "top_k"),
                "gumbel": not args.dsir_no_gumbel,
                **({"keep": args.dsir_keep}
                   if args.dsir_keep is not None
                   else {"threshold": args.dsir_threshold}),
            }
        if "lm_cutoffs" in audit:
            stats["lm_cutoffs"] = list(audit["lm_cutoffs"])
        if args.lm_tiers:
            from khl_pdf_ocr_spark.operators.textstats import \
                lm_tier_stats

            stats["lm_tiers"] = lm_tier_stats(kept_rb)
            stats["lm_tier_cutoffs"] = audit.get("lm_tier_cutoffs")
        if "hot_domains" in audit:
            # no-silent-caps: how many domains actually hit the cap
            # (reads the persisted tagged frame, not the live lineage)
            stats["domains_over_cap"] = audit["hot_domains"].count()
        if args.c4_rules:
            row = kept_rb.agg(
                F.sum("n_lines_removed").alias("l"),
                F.sum((F.col("n_lines_removed") > 0).cast("long"))
                .alias("d")).first()
            stats["c4_rules"] = {
                "lines_removed": int(row["l"] or 0),
                "docs_affected": int(row["d"] or 0)}
        if args.dedup_paragraphs:
            row = kept_rb.agg(
                F.sum("n_paras_removed").alias("p"),
                F.sum((F.col("n_paras_removed") > 0).cast("long"))
                .alias("d")).first()
            stats["paragraph_dedup"] = {
                "min_chars": args.para_min_chars,
                "paras_removed": int(row["p"] or 0),
                "docs_affected": int(row["d"] or 0)}
        if args.strip_repeated_spans:
            row = kept_rb.agg(
                F.sum("n_tokens_removed").alias("t"),
                F.sum((F.col("n_tokens_removed") > 0).cast("long"))
                .alias("d")).first()
            stats["repeated_spans"] = {
                "span_k": args.span_k,
                "tokens_removed": int(row["t"] or 0),
                "docs_affected": int(row["d"] or 0)}
        if pii_cols:  # redaction you can't count is redaction you
            row = kept_rb.agg(*[F.sum(c).alias(c)   # can't verify
                                for c in pii_cols]).first()
            stats["pii_redacted"] = {c: int(row[c] or 0) for c in pii_cols}
        if args.fix_unicode:
            stats["unicode_fixed"] = int(kept_rb.agg(
                F.sum(F.col("unicode_fixed").cast("long"))).first()[0] or 0)
        if args.split:
            stats["splits"] = {r["split"]: r["n"] for r in
                               kept_rb.groupBy("split")
                               .agg(F.count(F.lit(1)).alias("n")).collect()}
        if args.datacard:
            from khl_pdf_ocr_spark.datacard import build_datacard

            # aggregated from the READ-BACK outputs (the stats rule):
            # the card describes what was actually written
            card = build_datacard(
                kept_rb, ledger_rb, text_col=args.text_col,
                source_col="source", lang_col="lang",
                split_col="split" if args.split else None,
                url_col=args.url_col,
                extra_dims=(("lm_tier",) if args.lm_tiers else ())
                + ((args.license_col,) if args.allow_licenses else ()))
            with open(args.datacard, "w") as fh:
                json.dump(card, fh, indent=2, sort_keys=True)
            stats["datacard"] = args.datacard
        if args.target_file_mb is not None:
            # LAST, after every stat/card was materialized from the
            # read-backs: compaction swaps the files those lazy frames
            # point at, so nothing may evaluate kept_rb/ledger_rb
            # after this point
            from khl_pdf_ocr_spark.sources.writers import compact_parquet

            stats["file_layout"] = {
                "kept": compact_parquet(
                    spark, kept_t, target_mb=args.target_file_mb,
                    partition_by=("split",) if split_weights else ()),
                "ledger": compact_parquet(
                    spark, ledger_t, target_mb=args.target_file_mb),
            }
        for cached in audit.get("persisted", ()):
            cached.unpersist()
        print(json.dumps(stats))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
