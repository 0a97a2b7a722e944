"""Daily-increment ingestion job — the incremental twin of clean_cli.

    spark-submit --py-files khl_pdf_ocr_spark.zip \
        khl_pdf_ocr_spark/increment_cli.py \
        --input  /crawl/2026-08-17        # today's new batch
        --state  /corpora/main/_state     # fingerprint + signature stores
        --output /corpora/main/2026-08-17

Pipeline per increment (every stage is an existing operator):

    clean_corpus(batch)                   lang/quality + batch-internal
                                          exact+near dedup (+ optional
                                          url stage, frozen-cutoff
                                          unigram-LM quality stage, and
                                          eval-set decontamination)
    exact_dedup_incremental(·, state)     drop exact copies of anything
                                          EVER kept (exact_dup_history)
    minhash_lsh_incremental(·, state,     drop near-dups of anything
        include_batch_pairs=False)        ever kept (near_dup_history;
                                          the batch self-join already
                                          ran inside clean_corpus)
    cap_per_domain_incremental(·, state)  [--max-docs-per-domain N] keep
                                          at most N docs per domain
                                          CORPUS-WIDE (<state>/domains
                                          running-count store)
    paragraph_dedup_incremental(·, state) [--dedup-paragraphs] strip any
                                          paragraph EVER kept from the
                                          surviving docs' text in place
                                          (<state>/paragraphs hash store)
    write kept rows → <output>/kept, full ledger → <output>/ledger,
    and the KEPT docs' fingerprints + signatures → the state stores.

Idempotent reruns (the property a scheduler retry needs): both stores
are PARTITIONED BY ``increment_id`` (default: the input path's
basename, stable across retries).  A run (a) EXCLUDES its own
increment's partitions from the history probe — so a retry never
rejects the day's docs against the half-written state of the crashed
attempt — and (b) commits its state with a dynamic partition
overwrite, swapping exactly its own partitions and touching no other
increment's.  A crash anywhere simply reruns — including the one
half-present-state shape a crash can legitimately create: a FIRST run
that died between the two store writes leaves one store whose only
partition is this increment's, which the rerun self-heals (it holds no
other history to protect).  Any other half-present state — a lone
store carrying foreign increments — fails fast: probing one store but
not the other would silently re-admit history duplicates.

The state stores describe exactly the kept corpus: fingerprints are
recomputed over the surviving rows and signatures are the persisted
batch signatures semi-joined to survivors.  Document ids must be
globally unique across increments (crawl ids are).

History text is never read: both probes run against the KB-per-million
-doc stores, so increment cost is O(new batch), not O(corpus) — the
property that makes daily ingestion of a 10^12-doc corpus feasible.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

from khl_pdf_ocr_spark.corpus import clean_corpus
from khl_pdf_ocr_spark.functions import text as X
from khl_pdf_ocr_spark.operators.dedup import (exact_dedup_incremental,
                                               minhash_lsh_incremental,
                                               minhash_signatures)
from khl_pdf_ocr_spark.session import get_spark
from khl_pdf_ocr_spark.sources.readers import read_documents


def main(argv: list[str] | None = None, spark=None) -> int:
    """``spark=None`` (the CLI path) creates and stops its own session;
    passing a session runs the same pipeline on it and leaves it
    running — the embedding hook bench.py's increment-scaling mode
    uses to time repeated increments without JVM churn."""
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--state", required=True,
                    help="state directory: <state>/fingerprints, "
                         "<state>/signatures, plus <state>/domains "
                         "(--max-docs-per-domain) and "
                         "<state>/paragraphs (--dedup-paragraphs) "
                         "(created on first run; partitioned by "
                         "increment_id)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--increment-id", default=None,
                    help="stable id of this increment (default: input "
                         "basename) — reruns with the same id are "
                         "idempotent")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--langs", nargs="+", default=["en", "ru"])
    ap.add_argument("--min-quality", type=float, default=0.4)
    ap.add_argument("--near-dup-threshold", type=float, default=0.8)
    ap.add_argument("--policy", default="pairs",
                    choices=["pairs", "components", "components_best"],
                    help="batch-internal near-dup survivor rule (the "
                         "history probe is unaffected: anything "
                         "matching history drops regardless)")
    ap.add_argument("--url-col", default=None)
    ap.add_argument("--canonical-col", default=None, metavar="COL",
                    help="with --url-col: a rel=canonical column tagged "
                         "at ingest (cli --signals); where non-NULL it "
                         "replaces the fetch url as the stage-0 dedup "
                         "key (mirrors clean_cli --canonical-col)")
    ap.add_argument("--quality-lm", default=None, metavar="PATH",
                    help="persisted (token, logprob) LM parquet: append "
                         "the unigram-LM quality stage with FROZEN "
                         "absolute cutoffs (--lm-cutoffs, required).  "
                         "Increments never use batch quantiles — the "
                         "accept band must not drift with daily batch "
                         "composition")
    ap.add_argument("--lm-cutoffs", default=None, metavar="LO,HI",
                    help="absolute avg_logprob bounds ('none' for an "
                         "open side); required with --quality-lm")
    ap.add_argument("--lm-order", type=int, default=1, choices=[1, 2],
                    help="LM order for --quality-lm: 1 = unigram "
                         "(PATH is one parquet), 2 = interpolated "
                         "bigram (PATH holds <PATH>/unigram + "
                         "<PATH>/bigram, as written by clean_cli "
                         "--lm-order 2 --save-lm)")
    ap.add_argument("--quality-classifier", default=None, metavar="PATH",
                    help="persisted quality-classifier model (as written "
                         "by clean_cli --quality-classifier train "
                         "--save-clf): append the model-based quality "
                         "gate with a FROZEN model.  Increments never "
                         "train — the decision boundary must not drift "
                         "with daily batch composition.  Requires "
                         "exactly one of --clf-threshold / --clf-pareto")
    ap.add_argument("--clf-threshold", type=float, default=None,
                    help="hard gate: keep docs with classifier score "
                         ">= this")
    ap.add_argument("--clf-pareto", type=float, default=None,
                    metavar="ALPHA",
                    help="GPT-3 Pareto lottery instead of a hard gate "
                         "(deterministic per doc id)")
    ap.add_argument("--dsir-model", default=None, metavar="PATH",
                    help="persisted DSIR model pair (as written by "
                         "clean_cli --dsir-target ... --save-dsir): "
                         "append the importance-resampling gate with "
                         "FROZEN models and a FROZEN absolute "
                         "threshold (--dsir-threshold, required).  "
                         "Increments never fit q̂ on the day's batch "
                         "and never top-k — the selection boundary "
                         "must not drift with daily composition")
    ap.add_argument("--dsir-threshold", type=float, default=None,
                    help="keep docs with DSIR key >= this (use the "
                         "equals form --dsir-threshold=-2.5 for "
                         "negative values); required with --dsir-model")
    ap.add_argument("--dsir-no-gumbel", action="store_true",
                    help="gate on the plain log ratio instead of the "
                         "Gumbel-perturbed key")
    ap.add_argument("--decontaminate-against", default=None,
                    help="parquet path of an eval set (text column): "
                         "drop batch docs sharing any 13-gram with it")
    ap.add_argument("--block-domains", default=None, metavar="FILE",
                    help="newline-delimited registrable-domain "
                         "blocklist: batch docs from listed domains "
                         "drop before any text work (requires "
                         "--url-col)")
    ap.add_argument("--host-ranks", default=None, metavar="PATH",
                    help="parquet (host, rank) table from "
                         "graph.host_pagerank — the link-graph quality "
                         "prior, FROZEN from a reference batch (like "
                         "--lm-tier-cutoffs); requires --url-col and "
                         "--min-host-rank")
    ap.add_argument("--min-host-rank", type=float, default=None,
                    metavar="X",
                    help="with --host-ranks: drop batch docs whose "
                         "domain ranks below X (low_host_rank ledger "
                         "reason); unranked domains kept unless "
                         "--drop-unranked")
    ap.add_argument("--drop-unranked", action="store_true",
                    help="with --host-ranks: also drop docs whose "
                         "domain has no rank row")
    ap.add_argument("--allow-licenses", default=None, metavar="LIST",
                    help="comma list of license tags to KEEP (column "
                         "tagged at ingest via operators.licensing."
                         "with_license_tag); non-listed docs drop "
                         "before any text work (license ledger reason)")
    ap.add_argument("--license-col", default="license",
                    help="column carrying the license tag")
    ap.add_argument("--keep-untagged", action="store_true",
                    help="with --allow-licenses: keep NULL-tag docs")
    ap.add_argument("--gopher-rules", action="store_true",
                    help="apply the Gopher document-quality rules to "
                         "the batch (gopher_* ledger reasons)")
    ap.add_argument("--gopher-repetition", action="store_true",
                    help="apply the full Gopher repetition table (Rae "
                         "et al. 2021 Table A1) to the batch, before "
                         "the history probes (rep_* ledger reasons)")
    ap.add_argument("--c4-rules", action="store_true",
                    help="apply the C4 line/page heuristics to the "
                         "batch BEFORE the history probes (fingerprints "
                         "in the store describe scrubbed text, so "
                         "today's batch must be scrubbed the same way)")
    ap.add_argument("--badwords", default=None, metavar="FILE",
                    help="C4 bad-words page drop on the batch (one "
                         "lowercase word per line, '#' comments; "
                         "whole-token match, c4_badwords ledger "
                         "reason — mirrors clean_cli --badwords)")
    ap.add_argument("--decontaminate-fuzzy", type=float, default=None,
                    metavar="JACCARD",
                    help="with --decontaminate-against: ALSO drop batch "
                         "docs whose MinHash shingle-Jaccard with any "
                         "eval doc reaches this threshold "
                         "(contaminated_fuzzy ledger reason)")
    ap.add_argument("--max-docs-per-domain", type=int, default=None,
                    metavar="N",
                    help="corpus-wide cap of N kept docs per registrable "
                         "domain, enforced across increments via the "
                         "<state>/domains running-count store (requires "
                         "--url-col; drops land as domain_cap)")
    ap.add_argument("--dedup-paragraphs", action="store_true",
                    help="CCNet paragraph-level dedup against the "
                         "<state>/paragraphs hash store: any paragraph "
                         "ever kept is removed in place from today's "
                         "batch (history wins); surviving fresh "
                         "paragraphs append to the store")
    ap.add_argument("--para-min-chars", type=int, default=1,
                    help="paragraphs whose normalized form is shorter "
                         "than this are exempt from --dedup-paragraphs")
    ap.add_argument("--lm-tiers", action="store_true",
                    help="with --quality-lm: add the CCNet lm_tier "
                         "column (head/middle/tail) to kept output "
                         "using FROZEN --lm-tier-cutoffs — per-batch "
                         "quantiles would make tiers mean different "
                         "things on different days")
    ap.add_argument("--lm-tier-cutoffs", default=None, metavar="LO,HI",
                    help="absolute avg_logprob tier boundaries (from "
                         "the reference batch's clean_cli stats line; "
                         "equals form for negative values)")
    ap.add_argument("--datacard", default=None, metavar="PATH",
                    help="write this increment's training-data card "
                         "(JSON) aggregated from the written outputs")
    ap.add_argument("--target-file-mb", type=int, default=None,
                    metavar="MB",
                    help="compact this increment's outputs AND the "
                         "persisted state stores to ~MB parquet files "
                         "(daily increments accumulate one small file "
                         "per store per day; compaction merges within "
                         "increment_id partition dirs, preserving the "
                         "idempotent-rerun partition layout).  No-op "
                         "when layouts are already healthy")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)
    if args.target_file_mb is not None and args.target_file_mb < 1:
        ap.error("--target-file-mb must be >= 1")

    lm_cutoffs = None
    if args.quality_lm:
        if not args.lm_cutoffs:
            ap.error("--quality-lm requires --lm-cutoffs (frozen "
                     "absolute bounds; train + quantiles belong to "
                     "clean_cli on a reference batch)")
        from khl_pdf_ocr_spark.operators.prepare import parse_float_bounds

        try:  # shared spec parser — clean_cli uses the same one
            lm_cutoffs = parse_float_bounds(args.lm_cutoffs)
        except ValueError as e:
            ap.error(str(e))
    elif args.lm_cutoffs:
        ap.error("--lm-cutoffs requires --quality-lm")
    tier_cutoffs = None
    if args.lm_tiers:
        if not (args.quality_lm and args.lm_tier_cutoffs):
            ap.error("--lm-tiers requires --quality-lm and frozen "
                     "--lm-tier-cutoffs here (batch quantiles belong "
                     "to clean_cli on a reference batch)")
        from khl_pdf_ocr_spark.operators.prepare import parse_float_bounds

        try:
            tier_cutoffs = parse_float_bounds(args.lm_tier_cutoffs)
        except ValueError as e:
            ap.error(str(e))
        if None in tier_cutoffs or tier_cutoffs[0] > tier_cutoffs[1]:
            ap.error(f"--lm-tier-cutoffs must be LO,HI with LO <= HI, "
                     f"got {args.lm_tier_cutoffs!r}")
    elif args.lm_tier_cutoffs:
        ap.error("--lm-tier-cutoffs requires --lm-tiers")
    if args.quality_classifier:
        if args.quality_classifier == "train":
            ap.error("--quality-classifier takes a persisted model PATH "
                     "here; training belongs to clean_cli on a "
                     "reference batch")
        if (args.clf_threshold is None) == (args.clf_pareto is None):
            ap.error("--quality-classifier requires exactly one of "
                     "--clf-threshold / --clf-pareto")
    elif args.clf_threshold is not None or args.clf_pareto is not None:
        ap.error("--clf-threshold/--clf-pareto require "
                 "--quality-classifier")
    if args.dsir_model:
        if args.dsir_threshold is None:
            ap.error("--dsir-model requires --dsir-threshold (a frozen "
                     "absolute cut; increments never top-k)")
    elif args.dsir_threshold is not None or args.dsir_no_gumbel:
        ap.error("--dsir-threshold/--dsir-no-gumbel require "
                 "--dsir-model")
    if args.canonical_col and not args.url_col:
        ap.error("--canonical-col requires --url-col (it refines the "
                 "stage-0 url-dedup key)")
    if args.max_docs_per_domain is not None and not args.url_col:
        ap.error("--max-docs-per-domain requires --url-col (the domain "
                 "is derived from the url column)")
    if args.keep_untagged and not args.allow_licenses:
        ap.error("--keep-untagged requires --allow-licenses")
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

    from pyspark.sql import functions as F

    inc_id = args.increment_id or re.sub(
        r"[^A-Za-z0-9._-]", "_",
        os.path.basename(args.input.rstrip("/"))) or "increment"

    owns_spark = spark is None
    if owns_spark:
        spark = get_spark("khl-increment", cpus=args.cpus)
    try:
        fp_store = os.path.join(args.state, "fingerprints")
        sig_store = os.path.join(args.state, "signatures")
        have_fp, have_sig = _exists(spark, fp_store), _exists(spark, sig_store)
        first_run = not have_fp
        if have_fp != have_sig:
            # half-present state: USUALLY a corrupted/foreign directory
            # (probing one store but not the other would silently let
            # near-dups of history back in) — but a first run that
            # crashed between the two store writes leaves exactly this
            # shape.  That one case is provably safe to self-heal: if
            # the lone store holds ONLY this increment's partition,
            # there is no other history to protect, and this rerun's
            # dynamic partition overwrite replaces the half-written
            # partition wholesale.  Anything else stays fail-fast.
            present = fp_store if have_fp else sig_store
            parts = _increment_partitions(spark, present)
            # EXACTLY this increment's partition — an empty set means a
            # foreign NON-partitioned dataset squatting at the store
            # path (a crashed attempt always leaves its own partition
            # dir), and writing into it would interleave partition dirs
            # among flat files (r5 review)
            if parts == {inc_id}:
                first_run = True  # crashed first attempt → clean redo
            else:
                raise SystemExit(
                    f"inconsistent state at {args.state!r}: "
                    f"fingerprints {'present' if have_fp else 'MISSING'}, "
                    f"signatures {'present' if have_sig else 'MISSING'}, "
                    f"with foreign increments {sorted(parts - {inc_id})} "
                    "— restore both stores or point --state at a fresh "
                    "directory")

        batch = read_documents(spark, args.input)
        audit_clean: dict = {}
        blocked_ledger = None
        if args.block_domains:
            from khl_pdf_ocr_spark.operators.domains import \
                filter_blocked_domains

            with open(args.block_domains) as fh:
                doms = [ln.strip() for ln in fh
                        if ln.strip() and not ln.startswith("#")]
            batch, blocked_ledger = filter_blocked_domains(
                batch, doms, url_col=args.url_col, id_col=args.id_col)
        hostrank_ledger = None
        if args.host_ranks:
            from khl_pdf_ocr_spark.operators.domains import \
                filter_by_host_rank

            batch, hostrank_ledger = filter_by_host_rank(
                batch, spark.read.parquet(args.host_ranks),
                min_rank=args.min_host_rank, url_col=args.url_col,
                id_col=args.id_col,
                keep_unranked=not args.drop_unranked)
        license_ledger = None
        if args.allow_licenses:
            from khl_pdf_ocr_spark.operators.licensing import \
                filter_by_license

            try:
                batch, license_ledger = filter_by_license(
                    batch, args.allow_licenses.split(","),
                    license_col=args.license_col, id_col=args.id_col,
                    keep_untagged=args.keep_untagged)
            except ValueError as e:
                ap.error(str(e))
        lm = None
        if args.quality_lm:
            from khl_pdf_ocr_spark.operators.textstats import load_lm

            lm = load_lm(spark, args.quality_lm, order=args.lm_order)
        benchmark = (spark.read.parquet(args.decontaminate_against)
                     if args.decontaminate_against else None)
        # frozen lm_cutoffs keep the LM stage fully lazy inside
        # clean_corpus — no quantile action, no extra persist, so the
        # increment's one-pass shape is preserved
        kept1, ledger = clean_corpus(
            batch, text_col=args.text_col, id_col=args.id_col,
            allowed_langs=tuple(args.langs), min_quality=args.min_quality,
            near_dup_threshold=args.near_dup_threshold,
            near_dup_policy=args.policy,
            url_col=args.url_col,
            declared_canonical_col=args.canonical_col,
            lm=lm, lm_cutoffs=lm_cutoffs,
            benchmark=benchmark,
            benchmark_fuzzy_threshold=args.decontaminate_fuzzy,
            audit=audit_clean)

        if blocked_ledger is not None:
            ledger = ledger.unionByName(blocked_ledger)
        if hostrank_ledger is not None:
            ledger = ledger.unionByName(hostrank_ledger)
        if license_ledger is not None:
            ledger = ledger.unionByName(license_ledger)
        if args.c4_rules:
            from khl_pdf_ocr_spark.operators.prepare import c4_filters

            # BEFORE the history probes: the store's fingerprints
            # describe scrubbed text, so the batch must be scrubbed
            # identically or yesterday's page re-enters with its nav
            # junk counted as novelty
            kept1, c4_ledger = c4_filters(kept1, text_col=args.text_col,
                                          id_col=args.id_col)
            ledger = ledger.unionByName(c4_ledger)
        if args.badwords:
            from khl_pdf_ocr_spark.operators.prepare import \
                c4_badwords_filter

            with open(args.badwords) as fh:
                bw = [ln.strip() for ln in fh
                      if ln.strip() and not ln.startswith("#")]
            try:
                kept1, bw_ledger = c4_badwords_filter(
                    kept1, words=bw, text_col=args.text_col,
                    id_col=args.id_col)
            except ValueError as e:
                ap.error(str(e))
            ledger = ledger.unionByName(bw_ledger)
        if args.gopher_rules:
            from khl_pdf_ocr_spark.operators.prepare import \
                gopher_quality_filter

            kept1, gq_ledger = gopher_quality_filter(
                kept1, text_col=args.text_col, id_col=args.id_col)
            ledger = ledger.unionByName(gq_ledger)
        if args.gopher_repetition:
            from khl_pdf_ocr_spark.operators.repetition import \
                gopher_repetition_filter

            # stateless per-doc measures — safe before the history
            # probes, and a repetitive doc must never enter the stores
            kept1, grep_ledger = gopher_repetition_filter(
                kept1, text_col=args.text_col, id_col=args.id_col)
            ledger = ledger.unionByName(grep_ledger)
        if args.quality_classifier:
            from khl_pdf_ocr_spark.operators.quality_model import (
                classifier_quality_filter, load_classifier)

            # frozen model, before the history probes: a doc the
            # classifier rejects must never enter the state stores
            clf = load_classifier(spark, args.quality_classifier)
            kept1, clf_ledger = classifier_quality_filter(
                kept1, clf, text_col=args.text_col, id_col=args.id_col,
                threshold=args.clf_threshold,
                pareto_alpha=args.clf_pareto)
            ledger = ledger.unionByName(clf_ledger)
        if args.dsir_model:
            from khl_pdf_ocr_spark.operators.dsir import (
                dsir_logratio_scores, dsir_select, load_dsir_model)

            # frozen models + frozen absolute threshold, before the
            # history probes (a doc DSIR rejects must never enter the
            # state stores); with both models frozen the gate is a
            # stateless per-doc score-vs-cut filter — O(batch), zero
            # history reads.  Scoring + the semi/anti split each read
            # the batch — persist (released via audit_clean)
            kept1 = kept1.persist()
            audit_clean.setdefault("persisted", []).append(kept1)
            t_model, r_model, dsir_kw = load_dsir_model(
                spark, args.dsir_model)
            dsir_scores = dsir_logratio_scores(
                kept1, t_model, r_model, text_col=args.text_col,
                id_col=args.id_col, **dsir_kw)
            kept1, dsir_ledger = dsir_select(
                kept1, dsir_scores, k=1, id_col=args.id_col,
                gumbel=not args.dsir_no_gumbel,
                threshold=args.dsir_threshold)
            ledger = ledger.unionByName(dsir_ledger)

        audit_inc: dict = {}
        if first_run:
            kept = kept1
            new_sigs = None
        else:
            # exclude THIS increment's own partitions: a rerun after a
            # crashed attempt must not reject the day against the
            # half-written state it wrote itself
            seen_fp = (spark.read.parquet(fp_store)
                       .filter(F.col("increment_id") != inc_id))
            kept2, _fps, hist_exact = exact_dedup_incremental(
                kept1, seen_fp, text_col=args.text_col, id_col=args.id_col)
            # kept1 is already batch-deduped → only history rows remain
            ledger = ledger.unionByName(
                hist_exact.filter(F.col("reject_reason")
                                  == "exact_dup_history"))

            seen_sigs = (spark.read.parquet(sig_store)
                         .filter(F.col("increment_id") != inc_id))
            # batch self-pairs already handled by clean_corpus at the
            # same threshold — only the history half runs (r4 review)
            pairs, new_sigs = minhash_lsh_incremental(
                kept2, seen_sigs, text_col=args.text_col,
                id_col=args.id_col,
                verify_threshold=args.near_dup_threshold,
                audit=audit_inc, include_batch_pairs=False)
            hist_drop = (pairs.select(F.col("id_a").alias(args.id_col))
                         .distinct())
            ledger = ledger.unionByName(
                hist_drop.select(F.col(args.id_col).alias("id"),
                                 F.lit("near_dup_history")
                                 .alias("reject_reason")))
            # no broadcast hint: hist_drop is history-derived and
            # unbounded (a re-crawl day can near-match most of the
            # batch); AQE picks the strategy (r4 review)
            kept = kept2.join(hist_drop, args.id_col, "left_anti")

        dom_store = os.path.join(args.state, "domains")
        new_dom_counts = None
        if args.max_docs_per_domain is not None:
            from khl_pdf_ocr_spark.operators.domains import \
                cap_per_domain_incremental

            # each domain's budget = cap minus what prior increments
            # kept; own-increment partitions excluded like every store
            seen_counts = None
            if _exists(spark, dom_store):
                seen_counts = (spark.read.parquet(dom_store)
                               .filter(F.col("increment_id") != inc_id)
                               .select("domain", "n_docs"))
            kept, cap_ledger, new_dom_counts = cap_per_domain_incremental(
                kept, seen_counts,
                max_per_domain=args.max_docs_per_domain,
                url_col=args.url_col, id_col=args.id_col,
                audit=audit_inc)
            ledger = ledger.unionByName(cap_ledger)

        para_store = os.path.join(args.state, "paragraphs")
        new_para_h = None
        if args.dedup_paragraphs:
            from khl_pdf_ocr_spark.operators.paragraphs import \
                paragraph_dedup_incremental

            # the paragraph store manages itself: absent means the flag
            # was just enabled — today runs batch-only and seeds it.
            # Own-increment partitions are excluded like the other two
            # stores, so a crashed-attempt rerun stays idempotent.
            seen_h = None
            if _exists(spark, para_store):
                seen_h = (spark.read.parquet(para_store)
                          .filter(F.col("increment_id") != inc_id)
                          .select("h"))
            # runs AFTER the doc-level history drops (no paragraph work
            # for docs about to be rejected wholesale)
            kept, new_para_h = paragraph_dedup_incremental(
                kept, seen_h, text_col=args.text_col,
                id_col=args.id_col, min_chars=args.para_min_chars,
                audit=audit_inc)

        if args.lm_tiers:
            from khl_pdf_ocr_spark.operators.textstats import \
                append_lm_tiers

            # frozen cutoffs keep this fully lazy (no quantile action,
            # no cache): one scoring join + a projection on the way to
            # the write — the shared helper owns both CLIs' semantics
            kept = append_lm_tiers(kept, lm, order=args.lm_order,
                                   text_col=args.text_col,
                                   id_col=args.id_col,
                                   cutoffs=tier_cutoffs,
                                   audit=audit_inc)

        base = args.output.rstrip("/")
        kept.write.mode("overwrite").parquet(f"{base}/kept")
        ledger.write.mode("overwrite").parquet(f"{base}/ledger")

        # ALL audit/ledger counts BEFORE any state write: appending to
        # a store fires recacheByPath, invalidating every cached frame
        # whose lineage reads it — a post-append count would silently
        # recompute against the mutated store (r4 review; same class as
        # the localCheckpoint'ed state appends below)
        kept_rb = spark.read.parquet(f"{base}/kept")
        ledger_rb = spark.read.parquet(f"{base}/ledger")
        stats = {
            "first_run": first_run,
            "increment_id": inc_id,
            "n_kept": kept_rb.count(),
            "rejected": {r["reject_reason"]: r["n"] for r in
                         ledger_rb.groupBy("reject_reason")
                         .agg(F.count(F.lit(1)).alias("n")).collect()},
            # no-silent-caps: the batch-clean stage and the history
            # probe audit SEPARATELY (one shared dict would let the
            # second write clobber the first)
            "hot_buckets": (audit_clean["hot_buckets"].count()
                            if "hot_buckets" in audit_clean else 0),
            "hot_history_buckets": (
                audit_inc["hot_history_buckets"].count()
                if "hot_history_buckets" in audit_inc else 0),
        }
        if new_dom_counts is not None:
            # store delta materialized BEFORE the caches release / any
            # state write (recacheByPath rule, same as below)
            dom_append = (new_dom_counts
                          .withColumn("increment_id", F.lit(inc_id))
                          .localCheckpoint())
        if new_para_h is not None:
            row = kept_rb.agg(
                F.sum("n_paras_removed").alias("p"),
                F.sum((F.col("n_paras_removed") > 0).cast("long"))
                .alias("d")).first()
            stats["paragraph_dedup"] = {
                "min_chars": args.para_min_chars,
                "paras_removed": int(row["p"] or 0),
                "docs_affected": int(row["d"] or 0)}
            # materialize the store delta BEFORE the occurrence cache is
            # released below (and before any state write mutates paths
            # its lineage reads — the recacheByPath rule)
            para_append = (new_para_h
                           .withColumn("increment_id", F.lit(inc_id))
                           .localCheckpoint())
        for aud in (audit_clean, audit_inc):
            for cached in aud.get("persisted", ()):
                cached.unpersist()

        # state commit: localCheckpoint severs lineage from the stores
        # (see recacheByPath note above), then a dynamic partition
        # overwrite swaps exactly THIS increment's partitions — rerun-
        # idempotent, other increments untouched
        fp_append = (kept_rb.select(X.fingerprint(F.col(args.text_col))
                                    .alias("fingerprint"))
                     .filter(F.col("fingerprint").isNotNull())
                     .withColumn("increment_id", F.lit(inc_id))
                     .localCheckpoint())
        if new_sigs is not None:
            keep_ids = kept_rb.select(F.col(args.id_col).alias("id"))
            sig_append = (new_sigs.join(keep_ids, "id", "left_semi")
                          .withColumn("increment_id", F.lit(inc_id))
                          .localCheckpoint())
            new_sigs.unpersist()
        else:
            sig_append = (minhash_signatures(kept_rb,
                                             text_col=args.text_col,
                                             id_col=args.id_col)
                          .withColumn("increment_id", F.lit(inc_id))
                          .localCheckpoint())
        targets = [(fp_append, fp_store), (sig_append, sig_store)]
        if new_dom_counts is not None:
            targets.append((dom_append, dom_store))
        if new_para_h is not None:
            targets.append((para_append, para_store))
        for frame, store in targets:
            (frame.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("increment_id").parquet(store))

        # a store can legitimately be empty after a zero-kept day (the
        # dynamic overwrite wrote no partition dirs) — report 0, don't
        # die inferring a schema from no files
        def _store_count(path, distinct_col=None):
            if not _exists(spark, path):
                return 0
            frame = spark.read.parquet(path)
            if distinct_col is not None:
                frame = frame.select(distinct_col).distinct()
            return frame.count()

        if args.lm_tiers:
            from khl_pdf_ocr_spark.operators.textstats import \
                lm_tier_stats

            stats["lm_tiers"] = lm_tier_stats(kept_rb)
            # same telemetry shape as clean_cli — a script freezing
            # boundaries from a reference batch's stats line must read
            # one shape from both jobs (r5 review)
            stats["lm_tier_cutoffs"] = audit_inc.get("lm_tier_cutoffs")
        if args.datacard:
            from khl_pdf_ocr_spark.datacard import build_datacard

            card = build_datacard(
                kept_rb, ledger_rb, text_col=args.text_col,
                source_col="source", lang_col="lang",
                url_col=args.url_col,
                extra_dims=("lm_tier",) if args.lm_tiers else ())
            with open(args.datacard, "w") as fh:
                json.dump(card, fh, indent=2, sort_keys=True)
            stats["datacard"] = args.datacard
        stats["state_fingerprints"] = _store_count(fp_store)
        stats["state_signatures"] = _store_count(sig_store)
        if new_para_h is not None:
            stats["state_paragraphs"] = _store_count(para_store)
        if new_dom_counts is not None:
            stats["state_domains"] = _store_count(dom_store, "domain")
        if args.target_file_mb is not None:
            # LAST, after every stat was materialized from the
            # read-backs (compaction swaps the files their lazy plans
            # point at).  Stores compact WITHIN increment_id partition
            # dirs — the dynamic-overwrite rerun contract (partitions
            # = increments) survives because the dirs do.
            from khl_pdf_ocr_spark.sources.writers import compact_parquet

            layout = {
                "kept": compact_parquet(spark, f"{base}/kept",
                                        target_mb=args.target_file_mb),
                "ledger": compact_parquet(spark, f"{base}/ledger",
                                          target_mb=args.target_file_mb),
            }
            for frame, store in targets:
                layout[os.path.basename(store)] = compact_parquet(
                    spark, store, target_mb=args.target_file_mb,
                    partition_by=("increment_id",))
            stats["file_layout"] = layout
        print(json.dumps(stats))
        return 0
    finally:
        if owns_spark:
            spark.stop()


def _increment_partitions(spark, store: str) -> set[str]:
    """increment_id partition values present in a store directory
    (Hadoop-FS listing, so hdfs:///s3a:// work too; values are
    URL-unescaped the way Spark escapes partition dir names)."""
    from urllib.parse import unquote

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(store)
    fs = p.getFileSystem(conf)
    out: set[str] = set()
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("increment_id="):
            out.add(unquote(name.split("=", 1)[1]))
    return out


def _exists(spark, path: str) -> bool:
    """Hadoop-FS probe: the path exists AND holds at least one data
    entry (not just _SUCCESS).  A day whose every document was rejected
    performs a ZERO-row dynamic partition overwrite, which creates the
    store directory with no partition dirs — such a store carries no
    history and must read as absent, or the next increment's probe
    read dies on UNABLE_TO_INFER_SCHEMA (r5 review-drive find)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return False
    return any(not st.getPath().getName().startswith(("_", "."))
               for st in fs.listStatus(p))


if __name__ == "__main__":
    sys.exit(main())
