#!/usr/bin/env python
"""Benchmark harness.

Default mode (what the driver runs): headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` plus the extraction pipeline over the
deterministic bench corpus; prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "extraction": {"n_docs": N, "docs_per_sec": R}}

``--scaling`` mode: runs the SAME extraction job at two parallelism
levels (local[N/4] and local[N]) on identical input — the sandbox
stand-in for N vs 4N executors — and reports throughput at both plus
efficiency = (T_small / T_big) / 4.  Results land in BENCH.md.

``--extract-only --cpus K`` is the child mode used by --scaling (each
parallelism level gets a fresh JVM, so nothing is warm-shared).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "48000"))
SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "48000"))
BENCH_SEED = 7
BENCH_CORPUS_DIR = os.path.join(REPO, ".bench_cache", f"corpus_{BENCH_DOCS}_{BENCH_SEED}")

HEADLINE = [
    "q1_pricing_summary", "orders_topk_metrics", "q5_nation_revenue",
    "scan_filter_project", "top_spenders_window", "events_sessionize",
    # r5 session-4 rotation: events_hourly_rollup now rides inside
    # time_rollups (kind-tagged union with the monthly orders trend)
    "time_rollups", "doc_fingerprint_dedup", "doc_text_analytics",
    # r5 session-4 rotation: emb_cosine_topk's exact brute-force scan
    # now rides inside emb_ann_topk (its 'exact' method branch, below);
    # the freed embedding slot
    # benches the SemDeDup pipeline (cells -> pairs -> components ->
    # survivor election) instead
    # r5 session-5: the driver-window query is now the kind-tagged
    # union doc_text_near_dup_pairs (minhash + the source-blocked exact
    # n-gram Jaccard pass).  The HEADLINE row stays the MINHASH SCALE
    # PATH — benched as the union filtered to kind='minhash', which
    # Catalyst prunes back to the identical pre-union plan (verified
    # via optimizedPlan: the ngram branch folds away under the literal
    # filter), so the row remains comparable across rounds.  The exact
    # n-gram branch is a deliberate within-block quadratic verify
    # (C(250,2) x 192 blocks at sf0.1 — ~3.5 s warm, 2/3 of the whole
    # headline) that would bury every other row's signal; it is timed
    # separately below under prepare["ngram_exact_pairs"], not hidden.
    "doc_minhash_lsh_pairs", "emb_semdedup", "doc_bm25_topk",
    # persisted-ANN path.  NOTE the index build is NOT in either column:
    # it runs (once, then disk-cached in .ann_cache) while the query is
    # CONSTRUCTED, before timing starts — deliberately, because build-
    # once-query-many is the contract; both columns time the partition-
    # pruned query itself.  r5 consolidation: the slot now runs BOTH
    # persisted-index probes (LSH + IVF, method-tagged union) — ~2x the
    # work of the pre-r5 emb_ann_lsh_topk row it replaces
    "emb_ann_topk",
]


def bench_corpus(n_docs: int = BENCH_DOCS) -> str:
    from khl_pdf_ocr_spark.fixtures.gen import write_tables

    out = os.path.join(REPO, ".bench_cache", f"corpus_{n_docs}_{BENCH_SEED}")
    docs, _ = write_tables(out, n_docs, BENCH_SEED, goldens=False)
    return docs


def run_extraction_job(spark, docs_path: str, out_dir: str, *,
                       salt_partitions: int | None = None) -> dict:
    """One extraction pass: scan → (optional salt shuffle) → kernel → write.

    Default is NO payload shuffle: `files.maxPartitionBytes` already
    yields byte-balanced scan splits, and text-layer extraction cost is
    ~linear in bytes, so equal-byte tasks are cost-balanced without
    moving the corpus (see operators/partitioning.py for when salting
    IS worth its shuffle: heavy-tailed doc-type cost, OCR second pass).
    """
    from khl_pdf_ocr_spark.operators.extract import extract_documents
    from khl_pdf_ocr_spark.operators.partitioning import repartition_for_extraction

    docs = spark.read.parquet(docs_path)
    if salt_partitions:
        docs = repartition_for_extraction(docs, salt_partitions)
    t0 = time.time()
    extract_documents(docs).write.mode("overwrite").parquet(out_dir)
    elapsed = time.time() - t0
    n = spark.read.parquet(out_dir).count()
    return {"n_docs": n, "elapsed_s": round(elapsed, 3),
            "docs_per_sec": round(n / elapsed, 2)}


def median_extraction(spark, docs_path: str, out_base: str, runs: int = 3) -> dict:
    """Median of N fresh-dir runs (writeback stalls make single runs noisy)."""
    results = []
    for i in range(runs):
        results.append(run_extraction_job(spark, docs_path, f"{out_base}_r{i}"))
    results.sort(key=lambda r: r["elapsed_s"])
    return results[len(results) // 2]


def run_extraction_compute_only(spark, docs_path: str) -> dict:
    """The same extraction job with the parquet write swapped for the
    noop sink — isolates kernel+scan cost from disk writeback, the
    variable the r3 VERDICT asked to pin down (write-inclusive runs
    ranged 4.0k-17.0k docs/s across rounds on this host's shared disk)."""
    from khl_pdf_ocr_spark.operators.extract import extract_documents

    docs = spark.read.parquet(docs_path)
    n = docs.count()
    t0 = time.time()
    extract_documents(docs).write.format("noop").mode("overwrite").save()
    elapsed = time.time() - t0
    return {"n_docs": n, "elapsed_s": round(elapsed, 3),
            "docs_per_sec": round(n / elapsed, 2)}


def isolate(cpus: int) -> dict:
    """Same-hour A/B (r3 VERDICT #1): write-inclusive vs compute-only
    extraction + an unchanged control query, one JSON line.  Run with
    the machine otherwise idle; compare against BENCH.md §1/§3."""
    import __spark_entry__ as entrymod
    from khl_pdf_ocr_spark.session import get_spark

    docs_path = bench_corpus()
    spark = get_spark(f"bench-isolate-{cpus}", cpus=cpus,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "6291456",
                                  "spark.sql.files.openCostInBytes": "1048576"})
    out: dict = {"cpus": cpus, "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                    time.gmtime())}
    # control: unchanged-since-r1 codegen aggregate (cold then warm)
    q1 = entrymod.queries()["q1_pricing_summary"](spark, SF_DIR)
    t0 = time.time(); q1.collect(); out["q1_cold_s"] = round(time.time() - t0, 3)
    t0 = time.time(); q1.collect(); out["q1_warm_s"] = round(time.time() - t0, 3)
    # warm-up extraction pass, then interleaved A/B medians (3 each)
    base = os.path.join(REPO, ".bench_cache", "iso")
    run_extraction_job(spark, docs_path, base + "_warmup")
    writes, computes = [], []
    for i in range(3):
        writes.append(run_extraction_job(spark, docs_path, f"{base}_w{i}"))
        computes.append(run_extraction_compute_only(spark, docs_path))
    writes.sort(key=lambda r: r["elapsed_s"])
    computes.sort(key=lambda r: r["elapsed_s"])
    out["write_inclusive"] = writes[1]
    out["compute_only"] = computes[1]
    out["write_all_runs"] = [r["docs_per_sec"] for r in writes]
    out["compute_all_runs"] = [r["docs_per_sec"] for r in computes]
    spark.stop()
    return out


def extract_only(cpus: int) -> None:
    from khl_pdf_ocr_spark.session import get_spark

    docs_path = bench_corpus(SCALING_DOCS)
    # FIXED split size at both parallelism levels — the scaling gate
    # compares the IDENTICAL job; only the core count differs.  (A
    # per-core split-sizing variant measured a faster small-N baseline
    # but a weaker comparison: the jobs were no longer identical.)
    spark = get_spark(f"bench-extract-{cpus}", cpus=cpus,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "16777216"})
    out_base = os.path.join(REPO, ".bench_cache", f"out_{cpus}")
    # warm-up pass (JVM + python worker fork amortization), then measured
    run_extraction_job(spark, docs_path, out_base + "_warm")
    if os.environ.get("SPARK_GRAFT_COMPUTE_ONLY") == "1":
        # the same-hour attribution pair the §2 sub-gate entries use:
        # swap the parquet write for the noop sink so the shared-disk
        # writeback band drops out of the comparison
        runs = sorted((run_extraction_compute_only(spark, docs_path)
                       for _ in range(3)), key=lambda r: r["elapsed_s"])
        res = runs[1]
        # a compute-only number recorded as write-inclusive is a 2-4x
        # distortion (r5 review) — the JSON must say which it is
        res["compute_only"] = True
    else:
        res = median_extraction(spark, docs_path, out_base)
    res["cpus"] = cpus
    print(json.dumps(res))
    spark.stop()


def increment_only(cpus: int) -> None:
    """Child mode for ``--scaling --job increment``: the steady-state
    daily-ingest shape.  Days 1-2 of a deterministic 3-day split of
    the sf documents table bootstrap the state stores (untimed); day 3
    — clean_corpus + history exact/near-dup probes against two days of
    persisted state + output/state writes — is the measured unit.
    Reruns of the same increment are idempotent (dynamic partition
    overwrite; the probe excludes the run's own partitions), so the
    repeated timings do identical work: warm-up once, median of 3.
    """
    import contextlib
    import io
    import shutil

    from pyspark.sql import functions as F

    from khl_pdf_ocr_spark import increment_cli
    from khl_pdf_ocr_spark.session import get_spark

    spark = get_spark(f"bench-increment-{cpus}", cpus=cpus,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "16777216"})
    base = os.path.join(REPO, ".bench_cache", f"inc_{cpus}")
    shutil.rmtree(base, ignore_errors=True)
    # the raw sf documents table is small (5k rows at sf0.1) — at that
    # size fixed driver/scheduling overhead dominates the ~40-stage
    # increment job and the gate would measure the scheduler, not the
    # work.  Replicate xK with distinct ids and a per-copy text suffix:
    # the copies are NEAR-dups (jaccard ~0.98), and because the day
    # split hashes the offset ids, copies of one doc land in DIFFERENT
    # days — so day 3 genuinely exercises the steady-state history
    # near-dup path against two days of persisted signatures.
    K = int(os.environ.get("SPARK_GRAFT_INC_REPLICATE", "16"))
    # cache key carries BOTH the sf and the replicate factor — keying
    # on K alone silently reused stale day tables after an SF_DIR
    # change (r5 review)
    sf_tag = os.path.basename(SF_DIR.rstrip("/"))
    days_dir = os.path.join(REPO, ".bench_cache", f"inc_days_{sf_tag}_x{K}")
    if not os.path.exists(os.path.join(days_dir, "_done")):
        raw = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        other = [c for c in raw.columns if c not in ("doc_id", "text")]
        docs = None
        for k in range(K):
            rep = raw.select(
                (F.col("doc_id") + F.lit(k * 1_000_000_000)).alias("doc_id"),
                F.concat(F.col("text"),
                         F.lit(f" rep {k} marker {k * 7919}")).alias("text"),
                *other)
            docs = rep if docs is None else docs.unionByName(rep)
        for d in range(3):
            (docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == d)
             .write.mode("overwrite")
             .parquet(os.path.join(days_dir, f"day{d}")))
        open(os.path.join(days_dir, "_done"), "w").close()

    state = os.path.join(base, "state")

    def run_day(d: int, suffix: str = "") -> None:
        with contextlib.redirect_stdout(io.StringIO()):
            rc = increment_cli.main(
                ["--input", os.path.join(days_dir, f"day{d}"),
                 "--state", state,
                 "--output", os.path.join(base, f"out{d}{suffix}"),
                 "--langs", "en", "ru", "other", "--min-quality", "0.1"],
                spark=spark)
        assert rc == 0

    run_day(0)
    run_day(1)
    run_day(2, "_warm")          # warm-up of the measured day
    n3 = spark.read.parquet(os.path.join(days_dir, "day2")).count()
    times = []
    for i in range(3):
        t0 = time.time()
        run_day(2, f"_m{i}")
        times.append(round(time.time() - t0, 3))
    med = sorted(times)[1]
    print(json.dumps({"cpus": cpus, "n_docs": n3, "elapsed_s": med,
                      "docs_per_sec": round(n3 / med, 1),
                      "all_runs": times}))
    spark.stop()


def prepare_corpus_cols(docs):
    """The constructed web-crawl shape shared by the main bench's
    prepare block and the --job prepare scaling gate (ONE recipe — a
    drifted copy already shipped a degenerate gate once, r5 review):
    corpus-wide banner + own text + 7 footer variants, and urls whose
    REGISTRABLE domain varies (``site{N}.com``).  A ``.example.com``
    subdomain scheme would collapse every doc into the single eTLD+1
    'example.com' and the domain-cap stage would measure one giant
    serial rank window instead of 1000 balanced domains."""
    from pyspark.sql import functions as F

    text = F.concat_ws(
        "\n", F.lit("Accept cookies to continue reading."),
        F.col("text"),
        F.concat(F.lit("Footer variant "),
                 (F.col("doc_id") % 7).cast("string")))
    url = F.concat(F.lit("https://site"),
                   (F.col("doc_id") % 1000).cast("string"),
                   F.lit(".com/p"), F.col("doc_id").cast("string"))
    return docs.select("doc_id", text.alias("text"), url.alias("url"))


def _replicated_prep_docs(spark, K: int):
    """The shared scaling corpus: sf documents replicated xK with the
    constructed banner/footer/url crawl columns (disk-cached per K)."""
    from pyspark.sql import functions as F

    sf_tag = os.path.basename(SF_DIR.rstrip("/"))
    # v2: the v1 cache carried single-registrable-domain urls (r5 review)
    docs_dir = os.path.join(REPO, ".bench_cache",
                            f"prep_docs_v2_{sf_tag}_x{K}")
    if not os.path.exists(os.path.join(docs_dir, "_done")):
        raw = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        docs = None
        for k in range(K):
            rep = raw.select(
                (F.col("doc_id") + F.lit(k * 1_000_000_000)).alias("doc_id"),
                F.concat(F.col("text"),
                         F.lit(f" rep {k} marker {k * 7919}")).alias("text"))
            docs = rep if docs is None else docs.unionByName(rep)
        prepare_corpus_cols(docs).write.mode("overwrite") \
            .parquet(os.path.join(docs_dir, "docs"))
        open(os.path.join(docs_dir, "_done"), "w").close()
    return spark.read.parquet(os.path.join(docs_dir, "docs"))


def repetition_only(cpus: int) -> None:
    """Child mode for ``--scaling --job repetition``: the full Gopher
    repetition table (the newest shuffle-heavy prepare operator) over
    the shared replicated crawl corpus.  x64 (320k docs): the 13-measure
    query carries a ~3-6 s per-run DRIVER-side constant (Catalyst
    planning of the 9-way tagged explode + window plan, measured at
    3.1-3.6 s on a 1-row input), so the corpus must be big enough that
    the data-parallel term dominates — x16 runs finish in ~18 s on 16
    cores and the constant alone caps efficiency at ~0.75."""
    from khl_pdf_ocr_spark.operators.repetition import \
        gopher_repetition_stats
    from khl_pdf_ocr_spark.session import get_spark

    # the replicated corpus snappy-compresses ~24x (repeated text), so
    # size-based split packing underestimates tokenize work per byte:
    # 16 MB splits give ONE task wave on 16 cores and the slowest task
    # sets the stage time.  2 MB splits (+ scaled-down openCost, the
    # r4 §4.15 pairing) give ~4 waves — granular enough to balance.
    spark = get_spark(f"bench-repetition-{cpus}", cpus=cpus,
                      extra_conf={"spark.sql.files.maxPartitionBytes":
                                  "2097152",
                                  "spark.sql.files.openCostInBytes":
                                  "262144"})
    K = int(os.environ.get("SPARK_GRAFT_REP_REPLICATE", "64"))
    tbl = _replicated_prep_docs(spark, K).select("doc_id", "text")
    n = tbl.count()

    def run_chain():
        gopher_repetition_stats(tbl).write.format("noop") \
            .mode("overwrite").save()

    run_chain()                                    # warm-up
    times = []
    for _ in range(3):
        t0 = time.time()
        run_chain()
        times.append(round(time.time() - t0, 3))
    med = sorted(times)[1]
    print(json.dumps({"cpus": cpus, "n_docs": n, "elapsed_s": med,
                      "docs_per_sec": round(n / med, 1),
                      "all_runs": times}))
    spark.stop()


def prepare_only(cpus: int) -> None:
    """Child mode for ``--scaling --job prepare``: the corpus-balancing
    chain (domain caps → paragraph dedup, the clean_cli order) over the
    sf documents table replicated x16 with the constructed
    banner/footer/url columns — replicas share the banner and footer
    paragraphs (removed corpus-wide) and keep their own marked text
    paragraph, so winner election, the over-cap rank window, and
    reassembly all do real work.  Same fixed-split discipline as the
    extraction gate: the job is IDENTICAL at both core counts.
    """
    from pyspark.sql import functions as F

    from khl_pdf_ocr_spark.operators.domains import cap_per_domain
    from khl_pdf_ocr_spark.operators.paragraphs import paragraph_dedup
    from khl_pdf_ocr_spark.session import get_spark

    spark = get_spark(f"bench-prepare-{cpus}", cpus=cpus,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "16777216"})
    # small corpora are overhead-bound (the increment job's Amdahl
    # pattern, BENCH.md §2.1): measured 0.50 at x16, 0.52 at x64, 0.84
    # at x256 on the real 1000-domain workload — default to x256 so
    # the gate measures the chain, not the scheduler; the env var lets
    # a quick probe run cheaply
    K = int(os.environ.get("SPARK_GRAFT_PREP_REPLICATE", "256"))
    tbl = _replicated_prep_docs(spark, K)
    n = tbl.count()

    def run_chain():
        kept, _ = cap_per_domain(tbl, max_per_domain=24)
        paragraph_dedup(kept).write.format("noop").mode("overwrite").save()

    run_chain()                                    # warm-up
    times = []
    for _ in range(3):
        t0 = time.time()
        run_chain()
        times.append(round(time.time() - t0, 3))
    med = sorted(times)[1]
    print(json.dumps({"cpus": cpus, "n_docs": n, "elapsed_s": med,
                      "docs_per_sec": round(n / med, 1),
                      "all_runs": times}))
    spark.stop()


def scaling(cpus_big: int, job: str = "extract") -> dict:
    cpus_small = max(1, cpus_big // 4)
    flag = {"extract": "--extract-only",
            "increment": "--increment-only",
            "prepare": "--prepare-only",
            "repetition": "--repetition-only"}[job]
    results = {}
    for c in (cpus_small, cpus_big):
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            flag, "--cpus", str(c)],
                           capture_output=True, text=True, cwd=REPO, check=True)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[c] = json.loads(line)
    t_small = results[cpus_small]["docs_per_sec"]
    t_big = results[cpus_big]["docs_per_sec"]
    eff = round(t_big / (4.0 * t_small), 4)
    out = {"job": job, "cpus_small": cpus_small, "cpus_big": cpus_big,
           "docs_per_sec_small": t_small, "docs_per_sec_big": t_big,
           "speedup": round(t_big / t_small, 3), "efficiency": eff,
           "n_docs": results[cpus_big]["n_docs"]}
    if results[cpus_big].get("compute_only"):
        out["compute_only"] = True
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--isolate", action="store_true",
                    help="same-hour write vs compute-only A/B + control "
                         "query (r3 VERDICT #1)")
    ap.add_argument("--extract-only", action="store_true")
    ap.add_argument("--increment-only", action="store_true")
    ap.add_argument("--prepare-only", action="store_true")
    ap.add_argument("--repetition-only", action="store_true")
    ap.add_argument("--job", default="extract",
                    choices=["extract", "increment", "prepare",
                             "repetition"],
                    help="which job --scaling measures: the extraction "
                         "pipeline, the steady-state daily increment "
                         "(day 3 against two days of persisted state), "
                         "or the corpus-balancing chain (domain caps + "
                         "paragraph dedup)")
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--scaling-big", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_SCALING_BIG", "16")),
                    help="4N core count for --scaling (N = this // 4); default "
                         "16 keeps both levels in the flat-frequency regime "
                         "(BENCH.md §2)")
    args = ap.parse_args()

    if args.extract_only:
        extract_only(args.cpus)
        return

    if args.increment_only:
        increment_only(args.cpus)
        return

    if args.prepare_only:
        prepare_only(args.cpus)
        return

    if args.repetition_only:
        repetition_only(args.cpus)
        return

    if args.scaling:
        print(json.dumps(scaling(args.scaling_big, args.job)))
        return

    if args.isolate:
        print(json.dumps(isolate(args.cpus)))
        return

    import __spark_entry__ as entrymod
    from khl_pdf_ocr_spark.session import get_spark

    docs_path = bench_corpus()
    # fine scan splits for the local corpus (128 MB default would give
    # ~3 tasks for a ~300 MB corpus → idle cores).  openCostInBytes must
    # drop with maxPartitionBytes: the default 4 MB open-cost padding
    # packed the corpus into 23 splits on 32 cores (9 idle); 6 MB + 1 MB
    # yields 32 — interleaved A/B measured +15% (BENCH.md §4.15)
    spark = get_spark("bench", cpus=args.cpus,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "6291456",
                                  "spark.sql.files.openCostInBytes": "1048576"})
    qmap = entrymod.queries()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        if name == "doc_minhash_lsh_pairs":
            # the minhash branch of the union query (see HEADLINE note)
            from pyspark.sql import functions as F
            df = (qmap["doc_text_near_dup_pairs"](spark, SF_DIR)
                  .filter(F.col("kind") == "minhash"))
        else:
            df = qmap[name](spark, SF_DIR)
        action = (df.count if name in ("doc_fingerprint_dedup",
                                       "scan_filter_project") else df.collect)
        t0 = time.time()  # cold: first execution (plan compile + scan)
        action()
        cold[name] = round(time.time() - t0, 3)
        t0 = time.time()  # warm: repeat on hot JVM/OS caches
        action()
        timings[name] = round(time.time() - t0, 3)

    # training-data preparation stages over the sf0.1 documents table
    # (48k docs): measured, not assumed — these run alongside the
    # driver-verified queries but are not part of the 50-query window
    from pyspark.sql import functions as F

    from khl_pdf_ocr_spark.operators.domains import cap_per_domain
    from khl_pdf_ocr_spark.operators.paragraphs import paragraph_dedup
    from khl_pdf_ocr_spark.operators.prepare import (chunk_documents,
                                                     hash_split,
                                                     pack_sequences)
    from khl_pdf_ocr_spark.operators.repetition import \
        gopher_repetition_stats

    docs_tbl = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    prepare: dict[str, float] = {}
    chunks = chunk_documents(docs_tbl, max_tokens=128, overlap=16)
    # the parquet docs are single-paragraph / url-less: construct the
    # web-crawl shape deterministically (shared recipe with the --job
    # prepare gate — 1000 REGISTRABLE domains, 48 docs each, cap 24)
    crawl = prepare_corpus_cols(docs_tbl)
    for name, frame in (
            ("chunk_documents", chunks),
            ("chunk_pack_pipeline",
             pack_sequences(hash_split(chunks, weights={"train": 0.98,
                                                        "val": 0.02}),
                            capacity=512, n_buckets=64)),
            ("paragraph_dedup", paragraph_dedup(crawl.drop("url"))),
            ("domain_cap", cap_per_domain(crawl, max_per_domain=24)[0]),
            # full Table A1 stats (r5 session 4) — the 9-way gram
            # explode is the cost to watch at scale
            ("gopher_repetition", gopher_repetition_stats(crawl)),
            # the exact n-gram verify branch of doc_text_near_dup_pairs
            # (within-block quadratic by design; headline carries the
            # minhash scale path — see the HEADLINE note)
            ("ngram_exact_pairs",
             qmap["doc_text_near_dup_pairs"](spark, SF_DIR)
             .filter(F.col("kind") == "ngram")),
    ):
        frame.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        frame.write.format("noop").mode("overwrite").save()
        prepare[name] = round(time.time() - t0, 3)

    # ingest-side passes over the raw-crawl bench corpus (url+html):
    # the staged/gated signals projection of BENCH §4.21 and the
    # outlinks sidecar (anchor extraction + per-href resolution) —
    # warm noop-sink times
    from khl_pdf_ocr_spark.operators.licensing import page_signals
    from khl_pdf_ocr_spark.operators.links import (anchor_text_profile,
                                                   extract_outlinks)

    from khl_pdf_ocr_spark.operators.metadata import page_metadata
    from khl_pdf_ocr_spark.operators.snapshots import (dedup_revisits,
                                                       revisit_stats)

    raw = spark.read.parquet(docs_path)
    for name, frame in (("page_signals", page_signals(raw)),
                        ("extract_outlinks", extract_outlinks(raw)),
                        # with_text variant + per-target aggregation
                        # (r5 session 6) — the WAT link-text pass
                        ("anchor_text_profile", anchor_text_profile(
                            extract_outlinks(raw, with_text=True))),
                        # r5 session-6 ingest passes: the metadata
                        # sidecar projection and the crawl-snapshot
                        # aggregates (url-keyed max_by/min_by — the
                        # revisit-policy cost at ingest)
                        ("page_metadata", page_metadata(raw)),
                        ("revisit_stats", revisit_stats(raw)),
                        ("dedup_revisits", dedup_revisits(raw))):
        frame.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        frame.write.format("noop").mode("overwrite").save()
        prepare[name] = round(time.time() - t0, 3)

    # sharded Bloom store over the 48k documents' fingerprints
    # (r5 session 6): build = one (shard, positions) shuffle into
    # per-shard numpy; probe = cogroup against the checkpointed store
    from khl_pdf_ocr_spark.functions import text as XT
    from khl_pdf_ocr_spark.operators.bloom import (bloom_probe,
                                                   build_bloom_store)

    fps = docs_tbl.select(XT.fingerprint(F.col("text")).alias("fingerprint"))
    bloom_kw = dict(n_shards=64, expected_per_shard=2_000, fpp=0.01)
    build_bloom_store(fps, **bloom_kw).write.format("noop") \
        .mode("overwrite").save()  # warm
    t0 = time.time()
    store = build_bloom_store(fps, **bloom_kw).localCheckpoint()
    prepare["bloom_build"] = round(time.time() - t0, 3)
    probe = bloom_probe(fps, store)
    probe.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.time()
    probe.write.format("noop").mode("overwrite").save()
    prepare["bloom_probe"] = round(time.time() - t0, 3)

    ext_out = os.path.join(REPO, ".bench_cache", "out_main")
    ext_cold = run_extraction_job(spark, docs_path, ext_out + "_cold")
    cold["extract_pipeline"] = ext_cold["elapsed_s"]
    ext = median_extraction(spark, docs_path, ext_out)
    timings["extract_pipeline"] = ext["elapsed_s"]

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "headline query wall time (sec) + extraction docs/sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "value_cold": round(sum(cold.values()), 3),
        "sf": sf,
        "extraction": ext,
        "extraction_cold": ext_cold,
        "prepare": prepare,
        "cpus": args.cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
