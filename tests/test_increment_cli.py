"""Two-day increment e2e: the daily-ingestion CLI keeps the state
stores describing exactly the kept corpus and rejects history
duplicates without re-reading any history text."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun light "
        "and the birds sing in the tall green trees beside the house")
NOVEL = ("a completely different long document about glaciers and the "
         "slow drift of the continental plates over many of the years "
         "with the usual english words the a of and to in for quality")


def _run(inp, state, out):
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", inp, "--state", state, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.6", "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=REPO)
    assert p.returncode == 0, p.stderr[-3000:]
    return json.loads([ln for ln in p.stdout.splitlines()
                       if ln.startswith("{")][-1])


def test_two_day_increment(spark, tmp_path):
    state = str(tmp_path / "state")

    day1 = str(tmp_path / "day1")
    spark.createDataFrame(
        [(0, BASE, "s"), (1, NOVEL, "s")],
        ["doc_id", "text", "source"]).write.parquet(day1)
    s1 = _run(day1, state, str(tmp_path / "out1"))
    assert s1["first_run"] is True
    assert s1["n_kept"] == 2
    assert s1["state_fingerprints"] == 2 and s1["state_signatures"] == 2

    day2 = str(tmp_path / "day2")
    spark.createDataFrame(
        [(100, NOVEL, "s"),                               # exact hist dup
         # near-hist dup of BASE — nothing else BASE-like in the batch,
         # so the BATCH near-dup stage can't claim it first
         (101, BASE + " with a small appended tail", "s"),
         (102, "fresh text about gardening tools and the seasonal "
               "planting schedule for the temperate climates of the "
               "north with the usual english words in it today", "s"),
         (103, "fresh text about gardening tools and the seasonal "
               "planting schedule for the temperate climates of the "
               "north with the usual english words in it today", "s")],
        ["doc_id", "text", "source"]).write.parquet(day2)
    s2 = _run(day2, state, str(tmp_path / "out2"))
    assert s2["first_run"] is False
    assert s2["n_kept"] == 1                              # only one gardening doc
    assert s2["rejected"].get("exact_dup_history") == 1   # doc 100
    assert s2["rejected"].get("near_dup_history") == 1    # doc 101
    assert s2["rejected"].get("exact_dup") == 1           # doc 103 in-batch
    # state grew by exactly the kept docs
    assert s2["state_fingerprints"] == 3
    assert s2["state_signatures"] == 3

    kept2 = {r["doc_id"] for r in
             spark.read.parquet(str(tmp_path / "out2" / "kept")).collect()}
    assert kept2 == {102}

    # day 3: an exact copy of day 2's kept doc is now history
    day3 = str(tmp_path / "day3")
    spark.createDataFrame(
        [(200, "fresh text about gardening tools and the seasonal "
               "planting schedule for the temperate climates of the "
               "north with the usual english words in it today", "s")],
        ["doc_id", "text", "source"]).write.parquet(day3)
    s3 = _run(day3, state, str(tmp_path / "out3"))
    assert s3["n_kept"] == 0
    assert s3["rejected"].get("exact_dup_history") == 1
    assert s3["state_fingerprints"] == 3                  # unchanged


def test_increment_rerun_is_idempotent(spark, tmp_path):
    """A scheduler retry of the SAME increment must reproduce the same
    kept set and leave the state stores unchanged — the run excludes
    its own increment's partitions from the probe and commits state
    with a dynamic partition overwrite (r4 review: a naive append made
    a rerun reject the whole day against its own fingerprints and
    overwrite the kept output with zero rows)."""
    state = str(tmp_path / "state")
    day1 = str(tmp_path / "day1")
    spark.createDataFrame(
        [(0, BASE, "s"), (1, NOVEL, "s")],
        ["doc_id", "text", "source"]).write.parquet(day1)
    _run(day1, state, str(tmp_path / "out1"))

    day2 = str(tmp_path / "day2")
    spark.createDataFrame(
        [(100, NOVEL, "s"),                        # exact hist dup
         (102, "fresh text about gardening tools and the seasonal "
               "planting schedule for the temperate climates of the "
               "north with the usual english words in it today", "s")],
        ["doc_id", "text", "source"]).write.parquet(day2)
    s_first = _run(day2, state, str(tmp_path / "out2"))
    s_retry = _run(day2, state, str(tmp_path / "out2"))  # same increment

    assert s_retry["n_kept"] == s_first["n_kept"] == 1
    assert s_retry["rejected"] == s_first["rejected"] \
        == {"exact_dup_history": 1}
    assert s_retry["state_fingerprints"] == s_first["state_fingerprints"] == 3
    assert s_retry["state_signatures"] == s_first["state_signatures"] == 3
    kept = {r["doc_id"] for r in
            spark.read.parquet(str(tmp_path / "out2" / "kept")).collect()}
    assert kept == {102}


def test_crashed_first_run_self_heals(spark, tmp_path):
    """A first run that crashed between the fingerprints write and the
    signatures write leaves one store whose only partition is this
    increment's — the rerun must self-heal (no other history exists to
    protect), ending with both stores consistent (r4 ADVICE)."""
    state = str(tmp_path / "state")
    day1 = str(tmp_path / "day1")
    spark.createDataFrame(
        [(0, BASE, "s"), (1, NOVEL, "s")],
        ["doc_id", "text", "source"]).write.parquet(day1)

    # simulate the crash: fingerprints written for THIS increment only,
    # signatures never written
    from pyspark.sql import functions as F

    from khl_pdf_ocr_spark.functions.text import fingerprint
    (spark.read.parquet(day1)
     .select(fingerprint(F.col("text")).alias("fingerprint"))
     .withColumn("increment_id", F.lit("day1"))
     .write.partitionBy("increment_id")
     .parquet(os.path.join(state, "fingerprints")))

    s1 = _run(day1, state, str(tmp_path / "out1"))
    assert s1["first_run"] is True          # treated as a clean first run
    assert s1["n_kept"] == 2                # nothing rejected against self
    assert s1["state_fingerprints"] == 2 and s1["state_signatures"] == 2

    # and the healed state behaves as real history on day 2
    day2 = str(tmp_path / "day2")
    spark.createDataFrame([(100, NOVEL, "s")],
                          ["doc_id", "text", "source"]).write.parquet(day2)
    s2 = _run(day2, state, str(tmp_path / "out2"))
    assert s2["rejected"].get("exact_dup_history") == 1


def test_half_present_foreign_state_fails_fast(spark, tmp_path):
    """A lone store carrying a FOREIGN increment's partition is real
    corruption — the run must fail fast, not silently probe one store
    (which would re-admit near-dups of history)."""
    state = str(tmp_path / "state")
    day2 = str(tmp_path / "day2")
    spark.createDataFrame([(100, NOVEL, "s")],
                          ["doc_id", "text", "source"]).write.parquet(day2)

    from pyspark.sql import functions as F

    from khl_pdf_ocr_spark.functions.text import fingerprint
    (spark.createDataFrame([(0, BASE)], ["doc_id", "text"])
     .select(fingerprint(F.col("text")).alias("fingerprint"))
     .withColumn("increment_id", F.lit("some_other_day"))
     .write.partitionBy("increment_id")
     .parquet(os.path.join(state, "fingerprints")))

    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", day2, "--state", state,
         "--output", str(tmp_path / "out2"),
         "--langs", "en", "--min-quality", "0.1", "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=REPO)
    assert p.returncode != 0
    assert "inconsistent state" in p.stderr
    assert "some_other_day" in p.stderr


def test_increment_quality_lm_and_decontamination(spark, tmp_path):
    """The increment CLI composes the frozen-cutoff LM quality stage
    and eval-set decontamination into the daily job: a gibberish doc
    lands as lm_quality (scored against a PERSISTED reference-batch
    LM with absolute cutoffs — no quantiles, so the accept band can't
    drift with batch composition) and an eval-overlapping doc as
    contaminated; quantile mode is rejected at argparse time."""
    import json as _json

    from pyspark.sql import functions as F  # noqa: F401

    from khl_pdf_ocr_spark.operators.textstats import train_unigram_lm

    # reference LM trained on a fluent corpus, persisted
    themes = ["weather", "garden", "river", "market", "harbor"]
    ref_rows = [(i, f"the {t} report tells of the calm and pleasant "
                    f"days with many people walking and talking about "
                    f"the {t} while the children play near the {t}", "s")
                for i, t in enumerate(themes * 6)]
    ref = spark.createDataFrame(ref_rows, ["doc_id", "text", "source"])
    lm_path = str(tmp_path / "lm")
    train_unigram_lm(ref).write.parquet(lm_path)

    # the eval sentence reuses the REFERENCE vocabulary in a fresh
    # order: it must be flagged by 13-gram overlap, not starve on OOV
    # tokens and fall to the LM stage first (stage order: lm before
    # decontamination).  Measured scores: fluent -3.25, eval-overlap
    # -3.57, gibberish -4.28 -> cutoff -3.9 separates cleanly.
    bench_q = ("the children play near the harbor while the people are "
               "walking about the calm days of the market and the river "
               "report tells of more pleasant days")
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame([(0, bench_q)], ["qid", "text"]) \
        .write.parquet(bench_path)

    day = str(tmp_path / "day1")
    spark.createDataFrame(
        [(0, ref_rows[0][1] + " and one fresh tail", "s"),   # fluent: kept
         (1, "the zq9kvx of wjp3nn and vv7zzt the qq2bnm of xx8plw "
             "and rr4jjd the mm6ttk of hh1ggf and ss5ccv", "s"),  # gibberish
         (2, "fans often wonder and " + bench_q + " every spring", "s")],
        ["doc_id", "text", "source"]).write.parquet(day)

    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", day, "--state", str(tmp_path / "state"),
         "--output", str(tmp_path / "out1"),
         "--langs", "en", "--min-quality", "0.1",
         "--quality-lm", lm_path, "--lm-cutoffs=-3.9,none",
         "--decontaminate-against", bench_path, "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=REPO)
    assert p.returncode == 0, p.stderr[-3000:]
    stats = _json.loads([ln for ln in p.stdout.splitlines()
                         if ln.startswith("{")][-1])
    assert stats["rejected"].get("lm_quality") == 1
    assert stats["rejected"].get("contaminated") == 1
    assert stats["n_kept"] == 1
    # state describes exactly the kept corpus — rejected docs must not
    # enter the fingerprint/signature stores
    assert stats["state_fingerprints"] == 1
    assert stats["state_signatures"] == 1

    # quantile mode is a clean usage error on the increment path
    p2 = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", day, "--state", str(tmp_path / "state2"),
         "--output", str(tmp_path / "out2"),
         "--quality-lm", lm_path, "--cpus", "4"],
        capture_output=True, text=True, timeout=120, cwd=REPO)
    assert p2.returncode == 2
    assert "requires --lm-cutoffs" in p2.stderr


def test_increment_quality_lm_bigram(spark, tmp_path):
    """--lm-order 2 on the increment path: the persisted bigram pair
    (as written by clean_cli --lm-order 2 --save-lm) scores the day's
    batch with frozen cutoffs; gibberish drops as lm_quality, fluent
    text survives."""
    import json as _json

    from khl_pdf_ocr_spark.operators.textstats import (
        bigram_logprob_scores, train_bigram_lm)

    themes = ["weather", "garden", "river", "market", "harbor"]
    ref_rows = [(i, f"the {t} report tells of the calm and pleasant "
                    f"days with many people walking and talking about "
                    f"the {t} while the children play near the {t}", "s")
                for i, t in enumerate(themes * 6)]
    ref = spark.createDataFrame(ref_rows, ["doc_id", "text", "source"])
    uni, bi = train_bigram_lm(ref)
    lm_path = str(tmp_path / "lm2")
    uni.write.parquet(f"{lm_path}/unigram")
    bi.write.parquet(f"{lm_path}/bigram")

    day_rows = [
        (0, ref_rows[0][1] + " and one fresh tail", "s"),      # fluent
        (1, "the zq9kvx of wjp3nn and vv7zzt the qq2bnm of xx8plw "
            "and rr4jjd the mm6ttk of hh1ggf and ss5ccv", "s")]  # gibberish
    day_df = spark.createDataFrame(day_rows, ["doc_id", "text", "source"])
    day = str(tmp_path / "day1")
    day_df.write.parquet(day)

    # frozen cutoff = midpoint of the two docs' bigram scores, measured
    # with the same operator the CLI uses (robust to LM retuning)
    scores = {r["doc_id"]: r["avg_logprob"]
              for r in bigram_logprob_scores(day_df, uni, bi).collect()}
    assert scores[0] > scores[1]  # fluent beats gibberish under order 2
    cutoff = (scores[0] + scores[1]) / 2.0

    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", day, "--state", str(tmp_path / "state"),
         "--output", str(tmp_path / "out1"),
         "--langs", "en", "--min-quality", "0.1",
         "--quality-lm", lm_path, "--lm-order", "2",
         f"--lm-cutoffs={cutoff!r},none", "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=REPO)
    assert p.returncode == 0, p.stderr[-3000:]
    stats = _json.loads([ln for ln in p.stdout.splitlines()
                         if ln.startswith("{")][-1])
    assert stats["rejected"].get("lm_quality") == 1
    assert stats["n_kept"] == 1
    assert stats["state_fingerprints"] == 1


def test_increment_dedup_paragraphs_two_days(spark, tmp_path):
    """--dedup-paragraphs across increments: day 1 seeds the paragraph
    store; day 2's reuse of a day-1 paragraph (inside an otherwise-new
    doc that survives doc-level dedup) is stripped IN PLACE, the store
    accumulates only fresh paragraphs, and a rerun of day 2 is
    idempotent."""
    state = str(tmp_path / "state")
    banner = ("please accept our cookie policy before you continue "
              "reading any of the pages on this site today")

    def run(inp, out):
        p = subprocess.run(
            [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
             "--input", inp, "--state", state, "--output", out,
             "--langs", "en", "--min-quality", "0.1",
             "--near-dup-threshold", "0.6",
             "--dedup-paragraphs", "--cpus", "4"],
            capture_output=True, text=True, timeout=420, cwd=REPO)
        assert p.returncode == 0, p.stderr[-3000:]
        return json.loads([ln for ln in p.stdout.splitlines()
                           if ln.startswith("{")][-1])

    day1 = str(tmp_path / "day1")
    spark.createDataFrame(
        [(0, f"{banner}\n{BASE}", "s")],
        ["doc_id", "text", "source"]).write.parquet(day1)
    s1 = run(day1, str(tmp_path / "out1"))
    assert s1["n_kept"] == 1
    assert s1["paragraph_dedup"]["paras_removed"] == 0
    assert s1["state_paragraphs"] == 2          # banner + BASE

    day2 = str(tmp_path / "day2")
    spark.createDataFrame(
        [(100, f"{banner}\n{NOVEL}", "s")],
        ["doc_id", "text", "source"]).write.parquet(day2)
    s2 = run(day2, str(tmp_path / "out2"))
    assert s2["n_kept"] == 1                     # doc survives doc-level
    assert s2["paragraph_dedup"] == {"min_chars": 1,
                                     "paras_removed": 1,
                                     "docs_affected": 1}
    kept2 = spark.read.parquet(str(tmp_path / "out2" / "kept")).collect()
    assert kept2[0]["text"] == NOVEL             # banner stripped in place
    assert s2["state_paragraphs"] == 3           # + NOVEL only

    # rerun of day 2: same output, store unchanged (partition swap)
    s2r = run(day2, str(tmp_path / "out2r"))
    assert s2r["paragraph_dedup"]["paras_removed"] == 1
    assert s2r["state_paragraphs"] == 3


def test_increment_domain_cap_two_days(spark, tmp_path):
    """--max-docs-per-domain across increments: day 1 kept docs charge
    the domain's budget in <state>/domains, day 2 only gets the
    remainder, and a rerun of day 2 is idempotent."""
    state = str(tmp_path / "state")
    body = ("a perfectly ordinary english document about the %s with "
            "many of the usual words in it and the number %d here")

    def run(inp, out):
        p = subprocess.run(
            [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
             "--input", inp, "--state", state, "--output", out,
             "--langs", "en", "--min-quality", "0.1",
             "--near-dup-threshold", "0.99", "--url-col", "url",
             "--max-docs-per-domain", "3", "--cpus", "4"],
            capture_output=True, text=True, timeout=420, cwd=REPO)
        assert p.returncode == 0, p.stderr[-3000:]
        return json.loads([ln for ln in p.stdout.splitlines()
                           if ln.startswith("{")][-1])

    day1 = str(tmp_path / "day1")
    spark.createDataFrame(
        [(i, body % ("weather", i), "s",
          f"https://caps.example.com/d1-{i}") for i in range(2)],
        ["doc_id", "text", "source", "url"]).write.parquet(day1)
    s1 = run(day1, str(tmp_path / "out1"))
    assert s1["n_kept"] == 2
    assert s1["rejected"].get("domain_cap") is None
    assert s1["state_domains"] == 1

    day2 = str(tmp_path / "day2")
    spark.createDataFrame(
        [(100 + i, body % ("harbor", 100 + i), "s",
          f"https://caps.example.com/d2-{i}") for i in range(3)],
        ["doc_id", "text", "source", "url"]).write.parquet(day2)
    s2 = run(day2, str(tmp_path / "out2"))
    assert s2["n_kept"] == 1                       # 3 - 2 already kept
    assert s2["rejected"].get("domain_cap") == 2
    assert s2["state_domains"] == 1

    s2r = run(day2, str(tmp_path / "out2r"))       # idempotent rerun
    assert s2r["n_kept"] == 1
    assert s2r["rejected"].get("domain_cap") == 2


def test_increment_decontaminate_fuzzy_requires_eval_set(tmp_path):
    """--decontaminate-fuzzy without --decontaminate-against is a clean
    usage error before the JVM starts (the stage itself is the shared
    clean_corpus path, e2e-covered on clean_cli)."""
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", str(tmp_path / "x"), "--state", str(tmp_path / "s"),
         "--output", str(tmp_path / "o"),
         "--decontaminate-fuzzy", "0.5", "--cpus", "2"],
        capture_output=True, text=True, timeout=120, cwd=REPO)
    assert p.returncode == 2
    assert "requires" in p.stderr and "decontaminate-against" in p.stderr
    assert "Traceback" not in p.stderr


def test_zero_kept_day_leaves_usable_state(spark, tmp_path):
    """A day whose every document is rejected performs a ZERO-row state
    write (no partition dirs): stats must report 0 instead of dying on
    schema inference, and the NEXT day must treat the empty store as
    no-history and succeed (r5 review-drive find)."""
    state = str(tmp_path / "state")
    day1 = str(tmp_path / "day1")
    spark.createDataFrame(
        [(0, "zz qq ww", "s")],      # rejected by lang
        ["doc_id", "text", "source"]).write.parquet(day1)
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", day1, "--state", state,
         "--output", str(tmp_path / "out1"),
         "--langs", "en", "--min-quality", "0.1", "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=REPO)
    assert p.returncode == 0, p.stderr[-3000:]
    s1 = json.loads([ln for ln in p.stdout.splitlines()
                     if ln.startswith("{")][-1])
    assert s1["n_kept"] == 0
    assert s1["state_fingerprints"] == 0
    assert s1["state_signatures"] == 0

    day2 = str(tmp_path / "day2")
    spark.createDataFrame(
        [(1, BASE, "s")], ["doc_id", "text", "source"]).write.parquet(day2)
    p2 = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", day2, "--state", state,
         "--output", str(tmp_path / "out2"),
         "--langs", "en", "--min-quality", "0.1", "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=REPO)
    assert p2.returncode == 0, p2.stderr[-3000:]
    s2 = json.loads([ln for ln in p2.stdout.splitlines()
                     if ln.startswith("{")][-1])
    assert s2["n_kept"] == 1
    assert s2["state_fingerprints"] == 1


def test_flat_foreign_store_fails_fast(spark, tmp_path):
    """A lone store holding a NON-partitioned foreign dataset (no
    increment_id= dirs) must fail fast — self-healing it would
    interleave partition dirs among flat files (r5 review narrowed the
    self-heal to parts == {this increment} exactly)."""
    state = str(tmp_path / "state")
    day = str(tmp_path / "day")
    spark.createDataFrame([(100, NOVEL, "s")],
                          ["doc_id", "text", "source"]).write.parquet(day)
    # flat parquet squatting at the fingerprints path
    spark.createDataFrame([("deadbeef",)], ["fingerprint"]) \
        .write.parquet(os.path.join(state, "fingerprints"))

    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", day, "--state", state,
         "--output", str(tmp_path / "out"),
         "--langs", "en", "--min-quality", "0.1", "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=REPO)
    assert p.returncode != 0
    assert "inconsistent state" in p.stderr


def test_increment_cli_canonical_col_mirror(spark, tmp_path):
    """--canonical-col mirrors clean_cli: fetch-url variants declaring
    one rel=canonical target collapse in stage-0; flag pairing errors
    loudly without --url-col."""
    import json
    import os
    import subprocess
    import sys

    base = ("the quick brown fox jumps over the lazy dog and it was a "
            "good day for all of them in the field near the old house")
    rows = [
        (0, base + " alpha", "https://m.ex.com/s", "https://ex.com/s"),
        (1, base + " beta beta", "https://ex.com/s?ref=x", "https://ex.com/s"),
        (2, base + " gamma gamma gamma", "https://ex.com/other", None),
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, url string, canonical_of string"
    ).write.parquet(inp)
    out, state = str(tmp_path / "inc"), str(tmp_path / "state")
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", inp, "--state", state, "--output", out,
         "--increment-id", "d1", "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95",
         "--url-col", "url", "--canonical-col", "canonical_of",
         "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=cwd)
    assert p.returncode == 0, p.stderr[-3000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["rejected"].get("url_dup") == 1
    kept = spark.read.parquet(f"{out}/kept")
    assert {r["doc_id"] for r in kept.collect()} == {0, 2}

    r = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", inp, "--state", str(tmp_path / "s2"),
         "--output", str(tmp_path / "o2"), "--increment-id", "d1",
         "--canonical-col", "canonical_of"],
        capture_output=True, text=True, timeout=120, cwd=cwd)
    assert r.returncode == 2 and "url-col" in r.stderr
