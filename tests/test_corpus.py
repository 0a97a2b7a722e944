"""corpus.clean_corpus: every row is kept or landed in the ledger with
the right reject reason; no row is lost or double-counted."""

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.corpus import clean_corpus

GOOD_EN = ("the quick brown fox jumps over the lazy dog and then the fox "
           "runs back to the forest for a while as the day goes on with many "
           "more of the same words to keep the quality score high enough "
           "for the filter to pass it through to the cleaned corpus today")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, GOOD_EN, "s"),
        (1, GOOD_EN, "s"),                          # exact dup of 0
        (2, GOOD_EN + " extra tail words here", "s"),  # near dup of 0
        (3, "1234 5678 9999 0000", "s"),            # digit junk → fails lang gate first
        (4, "hola mundo esto es otro idioma sin palabras inglesas comunes "
            "aqui nada coincide con la lista", "s"),   # non-en/ru → lang reject
        (5, "совершенно другой русский текст про горы и ледники который "
            "достаточно длинный и естественный чтобы пройти фильтры " * 3, "s"),
        # passes lang (≥3 EN stopwords) but digit/punct spam sinks quality
        (6, "the fox and dog in " + "11, 22; 33! " * 8, "s"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_clean_corpus_partition(spark, corpus):
    kept, ledger = clean_corpus(corpus, min_quality=0.4, near_dup_threshold=0.6)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    reasons = {r["id"]: r["reject_reason"] for r in ledger.collect()}

    assert kept_ids == {0, 5}
    assert reasons[1] == "exact_dup"
    assert reasons[2] == "near_dup"
    assert reasons[3] == "lang"      # reject_reason = FIRST failing gate
    assert reasons[4] == "lang"
    assert reasons[6] == "quality"
    # conservation: every input row is exactly one of kept/rejected
    assert kept_ids.isdisjoint(reasons)
    assert kept_ids | set(reasons) == {0, 1, 2, 3, 4, 5, 6}


def test_clean_corpus_keeps_original_columns(spark, corpus):
    kept, _ = clean_corpus(corpus, min_quality=0.4)
    assert set(kept.columns) == {"doc_id", "text", "source"}


def test_clean_corpus_droplist_antijoin_not_force_broadcast(spark, corpus):
    """The near-dup drop list is corpus-derived and unbounded (a
    re-crawl batch can near-dup most of itself), so it must NOT carry
    a broadcast hint (r5 — the r4 decontamination rule applied to the
    dedup stage).  AQE still broadcasts it at runtime when it is
    actually small: after execution the final adaptive plan shows the
    broadcast, while the logical plan carries no ResolvedHint."""
    kept, _ = clean_corpus(corpus)
    logical = kept._jdf.queryExecution().optimizedPlan().toString()
    # a surviving F.broadcast hint prints as 'rightHint=(strategy=
    # broadcast)' on the Join node in the OPTIMIZED plan (ResolvedHint
    # nodes themselves are eliminated earlier — asserting on those is
    # vacuous; r5 review, verified empirically)
    assert "strategy=broadcast" not in logical, logical[-2000:]
    kept.collect()   # let AQE finalize
    final = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final, final[-2000:]


def test_clean_corpus_null_text_lands_in_ledger(spark):
    df = spark.createDataFrame(
        [(0, None, "s"),
         (1, "the fox and the dog in the sun for a long while as days go on "
             "and on with many more of the same words to stay high quality "
             "through the filter today and tomorrow and beyond", "s")],
        "doc_id long, text string, source string")
    kept, ledger = clean_corpus(df, allowed_langs=("en", "ru", "other"))
    reasons = {r["id"]: r["reject_reason"] for r in ledger.collect()}
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert reasons.get(0) == "quality"   # NULL text must not vanish
    assert kept_ids == {1}


def test_clean_corpus_components_best_keeps_highest_quality(spark):
    """components_best keeps the cleanest member of a near-dup cluster
    (here: the copy without the punctuation soup), not the min id."""
    base = ("the quick brown fox jumps over the lazy dog while the old "
            "cat watches from the warm windowsill in the afternoon sun "
            "and the birds sing in the tall green trees beside a house")
    df = spark.createDataFrame(
        [(1, base + " alpha !!!!!!!!!!!! ;;;;;;;;;;;; !!!!!!!!!!!!", "s"),
         (2, base + " bravo", "s"),                     # cleanest copy
         (3, base + " charlie !!!!!!!!!! ;;;;;;;;;;", "s"),
         (4, "a completely different document about cooking pasta with "
             "garlic and olive oil in a large pan over medium heat", "s")],
        ["doc_id", "text", "source"])
    kept, ledger = clean_corpus(df, allowed_langs=("en",),
                                min_quality=0.1, near_dup_threshold=0.5,
                                near_dup_policy="components_best")
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids == {2, 4}          # quality wins over min id
    reasons = {r["id"]: r["reject_reason"] for r in ledger.collect()}
    assert reasons == {1: "near_dup", 3: "near_dup"}
    # min-id policy on the same corpus keeps doc 1 — the contrast
    kept_min, _ = clean_corpus(df, allowed_langs=("en",),
                               min_quality=0.1, near_dup_threshold=0.5,
                               near_dup_policy="components")
    assert {r["doc_id"] for r in kept_min.collect()} == {1, 4}


def test_clean_corpus_fuzzy_shares_signature_pass(spark):
    """benchmark_fuzzy_threshold reuses ONE minhash pass: the shared
    (id, sig) frame is persisted via the audit dict, the fuzzy stage
    drops the paraphrase, kept/ledger stay disjoint, and a missing
    benchmark fails fast."""
    import pytest as _pytest

    bench_q = ("the quick brown fox jumps over the lazy dog while the "
               "old cat watches from the warm windowsill in the pale "
               "afternoon sun and the small birds sing in the tall "
               "green trees beside the quiet house near the river")
    toks = bench_q.split()
    edited = list(toks)
    for i in range(0, len(edited), 12):
        edited[i] = "EDIT%d" % i
    df = spark.createDataFrame(
        [(1, " ".join(edited), "s"),
         (2, "a completely clean document about cooking pasta with "
             "garlic and olive oil in a large pan over medium heat", "s")],
        ["doc_id", "text", "source"])
    benchmark = spark.createDataFrame([(0, bench_q)], ["qid", "text"])
    audit: dict = {}
    kept, ledger = clean_corpus(df, allowed_langs=("en",),
                                min_quality=0.1, benchmark=benchmark,
                                benchmark_fuzzy_threshold=0.5,
                                audit=audit)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    reasons = {r["id"]: r["reject_reason"] for r in ledger.collect()}
    assert kept_ids == {2}
    assert reasons == {1: "contaminated_fuzzy"}
    assert kept_ids.isdisjoint(reasons)
    assert len(audit.get("persisted", ())) >= 1   # the shared sigs
    for cached in audit.get("persisted", ()):
        cached.unpersist()
    with _pytest.raises(ValueError):
        clean_corpus(df, benchmark_fuzzy_threshold=0.5)


def test_clean_corpus_url_dedup_stage(spark):
    """url_col: canonical-url variants collapse BEFORE any text work,
    and the drop lands in the ledger as url_dup."""
    long_a = ("a long enough english document with the usual words of the "
              "quick brown fox and the lazy dog in it for quality " * 2)
    long_b = ("another completely different long document about glaciers "
              "and the slow drift of the plates over many of the years " * 2)
    rows = [
        (0, "https://Example.com/story?utm_source=x", long_a),
        (1, "https://example.com/story/", long_a + " tail tail tail"),
        (2, "https://example.com/other", long_b),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    kept, ledger = clean_corpus(df, allowed_langs=("en", "ru", "other"),
                                min_quality=0.0, near_dup_threshold=0.99,
                                url_col="url")
    assert {r["doc_id"] for r in kept.collect()} == {0, 2}
    assert {(r["id"], r["reject_reason"]) for r in ledger.collect()} \
        == {(1, "url_dup")}


def test_clean_corpus_null_urls_bypass_url_dedup(spark):
    """Rows with NULL/empty urls must NOT collapse into one keeper —
    they bypass stage 0 entirely."""
    long_a = ("the quick brown fox and the lazy dog with many usual "
              "english words in a long enough body of text " * 3)
    rows = [(0, None, long_a + " zero"),
            (1, None, long_a + " one one"),
            (2, "", long_a + " two two two")]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    kept, ledger = clean_corpus(df, allowed_langs=("en", "ru", "other"),
                                min_quality=0.0, near_dup_threshold=0.999,
                                url_col="url")
    assert {r["doc_id"] for r in kept.collect()} == {0, 1, 2}
    assert ledger.filter("reject_reason = 'url_dup'").count() == 0


def test_clean_cli_end_to_end(spark, tmp_path):
    """The cleaning CLI: kept/ledger outputs + the hot-bucket audit in
    its one-line JSON stats (no-silent-caps in run telemetry)."""
    import json
    import os
    import subprocess
    import sys

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest with all of its friends today")
    rows = [(0, base, "s"), (1, base, "s"),
            (2, "tiny", "s"),
            (3, "ещё один документ на русском языке про хоккей и арену "
                "с длинным текстом и разными словами внутри матча", "s")]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "text", "source"]) \
         .write.parquet(inp)

    out = str(tmp_path / "cleaned")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "ru", "--min-quality", "0.1",
         "--near-dup-threshold", "0.5", "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["n_kept"] >= 1
    assert stats["rejected"].get("exact_dup", 0) == 1  # doc 1 dropped
    assert "hot_buckets" in stats  # the audit is part of run stats
    kept_ids = {r["doc_id"] for r in
                spark.read.parquet(f"{out}/kept").collect()}
    ledger = {(r["id"], r["reject_reason"]) for r in
              spark.read.parquet(f"{out}/ledger").collect()}
    assert 0 in kept_ids and (1, "exact_dup") in ledger
    # every input row is accounted for exactly once (kept ∪ ledger)
    assert len(kept_ids) + len(ledger) == 4


def test_clean_cli_prepare_stages(spark, tmp_path):
    """--repetition / --redact-pii / --split wire the prepare operators
    into the product CLI: repetition drops ledger with their reasons,
    kept text is scrubbed in place with audited counts, and the kept
    output is partitioned by a deterministic split column."""
    import json
    import os
    import subprocess
    import sys

    good = ("a perfectly normal english document with plenty of varied "
            "words about the weather the seasons and the garden it also "
            "mentions the mail address bob@example.com for contact")
    rows = [(i, good + f" variant {i} with extra words {i*7}", "s")
            for i in range(8)]
    # must survive the lang ('the' x4 -> en) and quality stages so it
    # reaches the repetition filter; 'buy the' is 4/15 2-grams > 0.2
    rows.append((100, "buy the spam now buy the spam now buy the spam "
                      "now buy the spam now", "s"))
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "text", "source"]) \
         .write.parquet(inp)

    out = str(tmp_path / "cleaned")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95", "--cpus", "4",
         "--repetition", "--redact-pii",
         "--split", "train=0.75,val=0.25"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    # the spam doc fell to a repetition reason
    assert stats["rejected"].get("rep_2gram", 0) \
        + stats["rejected"].get("rep_lines", 0) >= 1
    # redaction counted AND applied in place
    assert stats["pii_redacted"]["n_pii_email"] >= 1
    kept = spark.read.parquet(f"{out}/kept")
    assert kept.filter(kept["text"].contains("bob@example.com")).count() == 0
    assert kept.filter(kept["text"].contains("<EMAIL>")).count() >= 1
    # split column materialized via partitioned layout, stats reported
    assert set(stats["splits"]) <= {"train", "val"}
    assert sum(stats["splits"].values()) == stats["n_kept"]
    assert "split" in kept.columns


def test_clean_corpus_decontaminates_last(spark):
    """benchmark= runs decontamination as the final stage; overlapping
    docs land in the ledger as 'contaminated' and every input row is
    still accounted for exactly once."""
    from khl_pdf_ocr_spark.corpus import clean_corpus

    bench_q = ("which team won the gagarin cup final in the khl playoff "
               "season and who scored the winning goal in overtime then")
    rows = [(0, "the quick brown fox jumps over the lazy dog and then runs "
                "far away into the deep green forest with all of its friends",
             "s"),
            (1, "fans often wonder " + bench_q + " every single spring", "s"),
            (2, "tiny", "s")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    benchmark = spark.createDataFrame([(0, bench_q)], ["qid", "text"])
    kept, ledger = clean_corpus(docs, allowed_langs=("en",),
                                min_quality=0.1, benchmark=benchmark)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    reasons = {r["id"]: r["reject_reason"] for r in ledger.collect()}
    assert kept_ids == {0}
    assert reasons[1] == "contaminated"
    assert len(kept_ids) + len(reasons) == 3


def _lm_corpus(spark):
    """30 fluent docs sharing a common vocabulary, one rare-token
    gibberish doc (passes the lang gate via embedded stopwords), one
    ultra-common-token boilerplate doc — the two tails of the
    avg_logprob distribution under a batch-trained unigram LM."""
    themes = ["weather", "garden", "river", "market", "season", "harbor",
              "meadow", "valley", "orchard", "village"]
    rows = []
    for i in range(30):
        t = themes[i % len(themes)]
        rows.append((i, f"the {t} report number {i} tells of the calm "
                        f"and pleasant days in the {t} with many people "
                        f"walking and talking about the {t} while the "
                        f"children play in the open air near the {t}",
                     "s"))
    rows.append((100, "the zq9kvx of wjp3nn and vv7zzt the qq2bnm of "
                      "xx8plw and rr4jjd the mm6ttk of hh1ggf and ss5ccv "
                      "the kk3rrn of pp7mmx and tt2vvb the gg8hhj of "
                      "nn4ssw and bb6ddq", "s"))       # rare-token tail
    rows.append((101, "the of and to the of and to the of and to the of "
                      "and to the of and to the of and to the of and to "
                      "the of and to the of and to the of and to", "s"))
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_clean_corpus_lm_quality_tails(spark):
    """lm= appends the CCNet-style stage: batch-quantile cutoffs keep
    the MIDDLE of the avg_logprob distribution — the rare-token
    gibberish (bottom tail) and the stopword-soup boilerplate (top
    tail) both land in the ledger as lm_quality; conservation holds."""
    from khl_pdf_ocr_spark.operators.textstats import train_unigram_lm

    docs = _lm_corpus(spark)
    lm = train_unigram_lm(docs)
    audit: dict = {}
    kept, ledger = clean_corpus(docs, allowed_langs=("en",),
                                min_quality=0.1, near_dup_threshold=0.95,
                                lm=lm, lm_tails=(0.1, 0.9), audit=audit)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    reasons = {r["id"]: r["reject_reason"] for r in ledger.collect()}
    assert reasons.get(100) == "lm_quality"   # gibberish: bottom tail
    assert reasons.get(101) == "lm_quality"   # boilerplate: top tail
    assert len(kept_ids) >= 20                # the middle survives
    assert kept_ids | set(reasons) == {r["doc_id"]
                                       for r in docs.select("doc_id").collect()}
    assert kept_ids.isdisjoint(reasons)
    lo, hi = audit["lm_cutoffs"]
    # the 30 template docs share one avg_logprob value, so both
    # quantiles may legitimately coincide on it — the middle band
    # collapses to a point and still keeps the fluent docs
    assert lo <= hi and lo is not None and hi is not None
    for cached in audit.get("persisted", ()):
        cached.unpersist()


def test_clean_corpus_lm_cutoffs_lazy(spark):
    """Absolute lm_cutoffs keep the pipeline fully lazy (no persist, no
    quantile action) — the frozen-cutoff increment shape; one-sided
    None bounds are honored."""
    from khl_pdf_ocr_spark.operators.textstats import train_unigram_lm

    docs = _lm_corpus(spark)
    lm = train_unigram_lm(docs)
    audit: dict = {}
    # only the BOTTOM tail bounded: boilerplate survives, gibberish dies
    # baseline: which frames does the pipeline persist WITHOUT the LM
    # stage (the minhash audit registers banded signatures either way)
    base_audit: dict = {}
    clean_corpus(docs, allowed_langs=("en",), min_quality=0.1,
                 near_dup_threshold=0.95, audit=base_audit)
    kept, ledger = clean_corpus(docs, allowed_langs=("en",),
                                min_quality=0.1, near_dup_threshold=0.95,
                                lm=lm, lm_cutoffs=(-4.0, None), audit=audit)
    # absolute cutoffs add NO persist beyond the dedup stage's own —
    # the LM stage stayed fully lazy (no quantile action)
    assert len(audit.get("persisted", ())) \
        == len(base_audit.get("persisted", ()))
    reasons = {r["id"]: r["reject_reason"] for r in ledger.collect()}
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert reasons.get(100) == "lm_quality"
    assert 101 in kept_ids
    assert audit["lm_cutoffs"] == (-4.0, None)


def test_clean_cli_quality_lm(spark, tmp_path):
    """--quality-lm train: the LM trains on the batch, both tails drop
    as lm_quality in stats, cutoffs are reported, and --save-lm
    persists a (token, logprob) parquet reusable via --quality-lm PATH
    + --lm-cutoffs with identical drops (the increment shape)."""
    import json
    import os
    import subprocess
    import sys

    inp = str(tmp_path / "docs")
    _lm_corpus(spark).write.parquet(inp)
    out = str(tmp_path / "cleaned")
    lm_path = str(tmp_path / "lm")
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95", "--cpus", "4",
         "--quality-lm", "train", "--lm-tails", "0.1,0.9",
         "--save-lm", lm_path],
        capture_output=True, text=True, timeout=300, cwd=cwd)
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["rejected"].get("lm_quality", 0) >= 2
    lo, hi = stats["lm_cutoffs"]
    assert lo <= hi  # template docs share one value; band may be a point
    ledger = {(r["id"], r["reject_reason"]) for r in
              spark.read.parquet(f"{out}/ledger").collect()}
    assert (100, "lm_quality") in ledger and (101, "lm_quality") in ledger
    lm = spark.read.parquet(lm_path)
    assert set(lm.columns) == {"token", "logprob"}
    assert lm.count() > 10

    # second run: persisted LM + frozen absolute cutoffs (lazy path)
    out2 = str(tmp_path / "cleaned2")
    p2 = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out2,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95", "--cpus", "4",
         "--quality-lm", lm_path, f"--lm-cutoffs={lo!r},{hi!r}"],
        capture_output=True, text=True, timeout=300, cwd=cwd)
    assert p2.returncode == 0, p2.stderr[-2000:]
    stats2 = json.loads([ln for ln in p2.stdout.splitlines()
                         if ln.startswith("{")][-1])
    assert stats2["rejected"].get("lm_quality", 0) \
        == stats["rejected"]["lm_quality"]
    assert stats2["lm_cutoffs"] == [lo, hi]


def test_clean_cli_quality_lm_bigram(spark, tmp_path):
    """--lm-order 2: the interpolated-bigram stage trains on the batch,
    drops both tails, persists <PATH>/unigram + <PATH>/bigram, and a
    second run loading that pair with frozen cutoffs reproduces the
    drops (the increment shape for the order-2 model)."""
    import json
    import os
    import subprocess
    import sys

    inp = str(tmp_path / "docs")
    _lm_corpus(spark).write.parquet(inp)
    out = str(tmp_path / "cleaned")
    lm_path = str(tmp_path / "lm2")
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95", "--cpus", "4",
         "--quality-lm", "train", "--lm-order", "2",
         "--lm-tails", "0.1,0.9", "--save-lm", lm_path],
        capture_output=True, text=True, timeout=300, cwd=cwd)
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["rejected"].get("lm_quality", 0) >= 2
    lo, hi = stats["lm_cutoffs"]
    assert lo <= hi
    ledger = {(r["id"], r["reject_reason"]) for r in
              spark.read.parquet(f"{out}/ledger").collect()}
    assert (100, "lm_quality") in ledger and (101, "lm_quality") in ledger
    uni = spark.read.parquet(f"{lm_path}/unigram")
    bi = spark.read.parquet(f"{lm_path}/bigram")
    assert set(uni.columns) == {"token", "logprob"}
    assert set(bi.columns) == {"token", "next", "logprob"}
    assert bi.count() > 10

    # second run: persisted LM pair + frozen absolute cutoffs
    out2 = str(tmp_path / "cleaned2")
    p2 = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out2,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95", "--cpus", "4",
         "--quality-lm", lm_path, "--lm-order", "2",
         f"--lm-cutoffs={lo!r},{hi!r}"],
        capture_output=True, text=True, timeout=300, cwd=cwd)
    assert p2.returncode == 0, p2.stderr[-2000:]
    stats2 = json.loads([ln for ln in p2.stdout.splitlines()
                         if ln.startswith("{")][-1])
    assert stats2["rejected"].get("lm_quality", 0) \
        == stats["rejected"]["lm_quality"]


def test_clean_cli_decontaminate_fuzzy(spark, tmp_path):
    """--decontaminate-fuzzy composes with the exact stage: a verbatim
    leak drops as contaminated, a paraphrase (every 12th token edited —
    no surviving 13-gram) drops as contaminated_fuzzy, clean docs
    survive; the flag without --decontaminate-against is a usage
    error."""
    import json
    import os
    import subprocess
    import sys

    bench_q = ("the quick brown fox jumps over the lazy dog while the "
               "old cat watches from the warm windowsill in the pale "
               "afternoon sun and the small birds sing in the tall "
               "green trees beside the quiet house near the river")
    toks = bench_q.split()
    edited = list(toks)
    for i in range(0, len(edited), 12):
        edited[i] = "EDIT%d" % i
    rows = [(1, "students ask " + bench_q + " in class", "s"),
            (2, " ".join(edited), "s"),
            (3, "a completely clean document about cooking pasta with "
                "garlic and olive oil in a large pan over medium heat",
             "s")]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "text", "source"]) \
         .write.parquet(inp)
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame([(0, bench_q)], ["qid", "text"]) \
        .write.parquet(bench_path)
    out = str(tmp_path / "cleaned")
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95",
         "--decontaminate-against", bench_path,
         "--decontaminate-fuzzy", "0.5", "--cpus", "4"],
        capture_output=True, text=True, timeout=300, cwd=cwd)
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["rejected"].get("contaminated") == 1
    assert stats["rejected"].get("contaminated_fuzzy") == 1
    assert stats["n_kept"] == 1

    p2 = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", str(tmp_path / "x"),
         "--decontaminate-fuzzy", "0.5", "--cpus", "2"],
        capture_output=True, text=True, timeout=120, cwd=cwd)
    assert p2.returncode == 2
    assert "requires" in p2.stderr and "decontaminate-against" in p2.stderr


def test_clean_cli_bad_split_spec_usage_error(tmp_path):
    """A malformed --split surfaces as a clean argparse usage error
    (exit 2), not a raw ValueError traceback (r4 ADVICE)."""
    import os
    import subprocess
    import sys

    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", str(tmp_path / "x"), "--output", str(tmp_path / "y"),
         "--split", "train=0.9,train=0.1", "--cpus", "2"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 2
    assert "duplicate split name" in p.stderr
    assert "Traceback" not in p.stderr


def test_clean_corpus_lm_stage_survives_empty_batch(spark):
    """Quantile cutoffs on a batch where NOTHING survives upstream:
    approxQuantile returns [] — the stage must no-op (unbounded
    cutoffs) instead of crashing after the expensive pipeline already
    ran (r5 review).  Every row still lands in the ledger."""
    from khl_pdf_ocr_spark.operators.textstats import train_unigram_lm

    docs = _lm_corpus(spark)
    lm = train_unigram_lm(docs)
    audit: dict = {}
    kept, ledger = clean_corpus(docs, allowed_langs=("xx",),  # rejects all
                                min_quality=0.1, lm=lm,
                                lm_tails=(0.1, 0.9), audit=audit)
    assert kept.count() == 0
    assert ledger.filter("reject_reason = 'lang'").count() == 32
    assert audit["lm_cutoffs"] == (None, None)
    for cached in audit.get("persisted", ()):
        cached.unpersist()


def test_clean_cli_c4_rules(spark, tmp_path):
    """--c4-rules wires the C4 heuristics into the product CLI: nav
    junk lines scrubbed in place, brace/lorem pages dropped with c4_*
    reasons, counts in stats."""
    import json
    import os
    import subprocess
    import sys

    good = ("The quick brown fox jumps over the lazy dog every day.\n"
            "Menu Home About\n"
            "It was a bright cold day in April and the clocks struck.\n"
            "The old cat watched from the warm windowsill so quietly!")
    rows = [(1, good, "s"),
            (2, "The page template has a { brace in the middle and the "
                "text of the page keeps going on and on after it.", "s"),
            (3, "The first fine sentence stands entirely on its own.\n"
                "The second fine sentence stands entirely on its own.\n"
                "The third fine sentence stands entirely on its own.", "s")]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "text", "source"]) \
         .write.parquet(inp)
    out = str(tmp_path / "cleaned")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95", "--c4-rules", "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["rejected"].get("c4_brace") == 1
    assert stats["c4_rules"] == {"lines_removed": 1, "docs_affected": 1}
    kept = {r["doc_id"]: r for r in
            spark.read.parquet(f"{out}/kept").collect()}
    assert set(kept) == {1, 3}
    assert "Menu Home About" not in kept[1]["text"]
    assert kept[1]["n_lines_removed"] == 1


def test_clean_cli_block_domains_and_gopher_rules(spark, tmp_path):
    """--block-domains drops listed registrable domains before any text
    work; --gopher-rules applies the Rae et al. thresholds; both ledger
    reasons land in stats; missing --url-col is a usage error."""
    import json
    import os
    import subprocess
    import sys

    fluent = ("the quick brown fox jumps over the lazy dog and it is "
              "known that many of the animals have been seen with the "
              "birds near the river while the people walk to the town "
              "and back again every day of the long warm summer season "
              "to be sure of the light ") * 2
    rows = [(1, fluent, "s", "https://good.example.org/a"),
            (2, fluent + " extra tail words here", "s",
             "https://spam.farm.spamco.net/b"),          # blocked eTLD+1
            (3, "\n".join(["the quick brown fox jumps over the lazy dog "
                           "and that is to be seen with many of the "
                           "birds here ..."] * 10), "s",
             "https://good.example.org/c")]       # gopher_ellipsis_lines
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "text", "source", "url"]) \
         .write.parquet(inp)
    bl = tmp_path / "blocklist.txt"
    bl.write_text("# adult/spam list\nspamco.net\n\n")
    out = str(tmp_path / "cleaned")
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95", "--url-col", "url",
         "--block-domains", str(bl), "--gopher-rules", "--cpus", "4"],
        capture_output=True, text=True, timeout=300, cwd=cwd)
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["rejected"].get("blocked_domain") == 1
    assert stats["rejected"].get("gopher_ellipsis_lines") == 1
    assert stats["n_kept"] == 1
    kept = spark.read.parquet(f"{out}/kept").collect()
    assert kept[0]["doc_id"] == 1

    p2 = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", str(tmp_path / "x"),
         "--block-domains", str(bl), "--cpus", "2"],
        capture_output=True, text=True, timeout=120, cwd=cwd)
    assert p2.returncode == 2
    assert "requires --url-col" in p2.stderr


def test_clean_cli_dedup_paragraphs(spark, tmp_path):
    """--dedup-paragraphs wires the CCNet paragraph dedup into the
    product CLI: a cookie banner shared by two kept docs survives only
    in the first, in place, with audited counts."""
    import json
    import os
    import subprocess
    import sys

    banner = "Accept our cookies to continue reading this site today."
    rows = [(0, f"{banner}\nthe quick brown fox jumps over the lazy dog "
                f"again today with friends", "s"),
            (1, f"{banner}\nit is the case that many of the words we see "
                f"here are the ones that fill this second document", "s"),
            (2, "a completely distinct document about the weather and "
                "the sea with many simple words in it", "s")]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "text", "source"]) \
         .write.parquet(inp)

    out = str(tmp_path / "cleaned")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95",
         "--dedup-paragraphs", "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["paragraph_dedup"] == {"min_chars": 1,
                                        "paras_removed": 1,
                                        "docs_affected": 1}
    kept = {r["doc_id"]: r for r in
            spark.read.parquet(f"{out}/kept").collect()}
    assert set(kept) == {0, 1, 2}
    assert kept[0]["text"].startswith(banner)      # first occurrence kept
    assert banner not in kept[1]["text"]           # removed in place
    assert kept[1]["text"].startswith("it is the case")
    assert kept[1]["n_paras_removed"] == 1
    assert kept[2]["n_paras_removed"] == 0


def test_clean_cli_strip_repeated_spans(spark, tmp_path):
    """--strip-repeated-spans wires the ExactSubstr operator into the
    product CLI: two otherwise-different kept docs sharing a 12-token
    run lose exactly that run, in place, with audited counts."""
    import json
    import os
    import subprocess
    import sys

    shared = ("alpha bravo charlie delta echo foxtrot golf hotel india "
              "juliet kilo lima")
    rows = [(0, f"{shared} and the quick brown fox jumps over the lazy "
                f"dog again today with friends", "s"),
            (1, f"it is the case that many of the words we see here are "
                f"the ones that fill this document before the borrowed "
                f"boilerplate arrives {shared}", "s"),
            (2, "a completely distinct document about the weather and "
                "the sea with many simple words in it", "s")]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "text", "source"]) \
         .write.parquet(inp)

    out = str(tmp_path / "cleaned")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95",
         "--strip-repeated-spans", "--span-k", "12", "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["repeated_spans"] == {"span_k": 12,
                                       "tokens_removed": 24,
                                       "docs_affected": 2}
    kept = {r["doc_id"]: r for r in
            spark.read.parquet(f"{out}/kept").collect()}
    assert set(kept) == {0, 1, 2}
    assert "alpha" not in kept[0]["text"]          # span stripped in place
    assert kept[0]["text"].startswith("and the quick brown fox")
    assert "alpha" not in kept[1]["text"]
    assert kept[2]["text"].startswith("a completely distinct")
    assert kept[2]["n_tokens_removed"] == 0


def test_clean_corpus_declared_canonical_collapses_variants(spark):
    """declared_canonical_col: fetch-url variants that DECLARE one
    rel=canonical target collapse onto it, even when their fetch urls
    normalize differently; NULL declarations fall back to the fetch
    url; the refinement requires url_col."""
    long_a = ("a long enough english document with the usual words of the "
              "quick brown fox and the lazy dog in it for quality " * 2)
    long_b = ("another completely different long document about glaciers "
              "and the slow drift of the plates over many of the years " * 2)
    rows = [
        # 0 and 1: different fetch urls, same declared canonical
        (0, "https://m.example.com/story", "https://example.com/story",
         long_a),
        (1, "https://example.com/story?ref=feed", "https://example.com/story",
         long_a + " tail tail"),
        # 2: declares nothing -> fetch url is the key
        (2, "https://example.com/other", None, long_b),
        # 3: declared canonical that ITSELF normalizes to 2's url
        (3, "https://example.com/other?fbclid=zzz", "https://Example.com/other/",
         long_b + " more words"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, canonical_of string, text string")
    kept, ledger = clean_corpus(df, allowed_langs=("en", "ru", "other"),
                                min_quality=0.0, near_dup_threshold=0.99,
                                url_col="url",
                                declared_canonical_col="canonical_of")
    assert {r["doc_id"] for r in kept.collect()} == {0, 2}
    assert {(r["id"], r["reject_reason"]) for r in ledger.collect()} \
        == {(1, "url_dup"), (3, "url_dup")}

    with pytest.raises(ValueError, match="requires url_col"):
        clean_corpus(df, declared_canonical_col="canonical_of")


def test_clean_corpus_zlib_band(spark):
    """zlib_bounds drops both compression-ratio tails with the
    zlib_ratio reason; in-band prose survives."""
    import hashlib
    import zlib as _z

    from khl_pdf_ocr_spark.corpus import clean_corpus

    words = ("referee confirmed final score video review coaches "
             "accepted decision protest press conference period "
             "goaltender penalty overtime shootout attendance").split()
    prose = " ".join(words[hashlib.sha256(str(i).encode()).digest()[0]
                           % len(words)] for i in range(300))
    boiler = "accept all cookies to continue reading this site " * 30
    h, seed = b"", b"q"
    while len(h) < 1200:
        seed = hashlib.sha256(seed).digest()
        h += seed
    soup = "w " + h[:1200].decode("latin-1")  # leading token for lang
    rows = [(0, prose, "s"), (1, boiler, "s"), (2, soup, "s")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])

    # sanity: the planted ratios straddle the band
    rb = len(_z.compress(boiler.encode(), 6)) / len(boiler.encode())
    rs = len(_z.compress(soup.encode("utf-8"), 6)) / len(soup.encode("utf-8"))
    assert rb < 0.1 < 0.65 < rs

    kept, ledger = clean_corpus(
        docs, allowed_langs=("en", "ru", "other"), min_quality=0.0,
        near_dup_threshold=0.99, zlib_bounds=(0.1, 0.65))
    assert {r["doc_id"] for r in kept.collect()} == {0}
    led = {r["id"]: r["reject_reason"] for r in ledger.collect()}
    assert led == {1: "zlib_ratio", 2: "zlib_ratio"}


def test_clean_cli_zlib_bounds_flag(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest with all of its friends today")
    rows = [(0, base, "s"),
            (1, "this is the best offer of the day for you " * 30,
             "s")]                                   # boilerplate tail
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "text", "source"]) \
         .write.parquet(inp)
    out = str(tmp_path / "cleaned")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--zlib-bounds", "0.12,0.9", "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["rejected"].get("zlib_ratio", 0) == 1
    assert stats["n_kept"] == 1
    # bad spec = usage error before the JVM, not a traceback
    p2 = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out + "2",
         "--zlib-bounds", "nope", "--cpus", "4"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p2.returncode == 2
    assert "Traceback" not in p2.stderr
