"""Model-based quality classifier (operators/quality_model.py).

Oracle strategy: the ml pipeline is not SQL-expressible, so the tests
verify (a) the scoring path EXACTLY against an independent numpy
recompute — hashed term counts via ``HashingTF.indexOf`` dotted with the
trained coefficients through a Python sigmoid; (b) the Pareto lottery
against its closed-form keep probability ``(2 - s)^-alpha`` and the
determinism/monotonicity contracts; (c) end-to-end separation on a
planted separable corpus; (d) the save/load roundtrip."""

from __future__ import annotations

import math

import pytest

from khl_pdf_ocr_spark.operators.quality_model import (
    classifier_quality_filter, load_classifier, save_classifier,
    score_quality_classifier, train_quality_classifier)

SEED_WORDS = ["the", "history", "of", "science", "describes", "careful",
              "measurement", "and", "reasoned", "argument", "in", "clear",
              "prose", "with", "sources"]
SPAM_WORDS = ["click", "here", "buy", "cheap", "pills", "winner", "casino",
              "free", "offer", "now", "xxx", "deal", "prize", "claim"]


def _doc(words, i, n=24):
    # deterministic pseudo-text: rotate through the vocabulary so docs
    # differ but stay inside their class distribution
    return " ".join(words[(i + j) % len(words)] for j in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    pos = spark.createDataFrame(
        [(f"p{i}", _doc(SEED_WORDS, i)) for i in range(60)],
        "doc_id string, text string")
    neg = spark.createDataFrame(
        [(f"n{i}", _doc(SPAM_WORDS, i)) for i in range(60)],
        "doc_id string, text string")
    return pos, neg


@pytest.fixture(scope="module")
def model(corpus):
    pos, neg = corpus
    # small feature space keeps the test fast; collisions are fine —
    # the oracle recomputes with the same width
    return train_quality_classifier(pos, neg, num_features=1 << 12)


def test_separates_held_out_docs(spark, model):
    held = spark.createDataFrame(
        [(f"hp{i}", _doc(SEED_WORDS, 100 + i)) for i in range(10)]
        + [(f"hn{i}", _doc(SPAM_WORDS, 100 + i)) for i in range(10)],
        "doc_id string, text string")
    rows = score_quality_classifier(held, model).collect()
    pos_scores = [r.clf_score for r in rows if r.doc_id.startswith("hp")]
    neg_scores = [r.clf_score for r in rows if r.doc_id.startswith("hn")]
    assert min(pos_scores) > 0.9
    assert max(neg_scores) < 0.1


def test_score_matches_numpy_recompute(spark, model):
    """Independent scoring oracle: hashed counts (via indexOf) dotted
    with the trained coefficients through a Python sigmoid must equal
    the pipeline's probability output to float precision."""
    import numpy as np

    docs = [(f"d{i}", _doc(SEED_WORDS if i % 2 else SPAM_WORDS, i, n=10))
            for i in range(20)] + [("dempty", ""), ("dnull", None)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r.doc_id: r.clf_score
           for r in score_quality_classifier(df, model).collect()}

    htf, lr = model.stages[1], model.stages[2]
    coef = np.array(lr.coefficients.toArray())
    b = float(lr.intercept)
    for doc_id, text in docs:
        counts: dict[int, float] = {}
        for tok in (text or "").lower().split():
            idx = htf.indexOf(tok)
            counts[idx] = counts.get(idx, 0.0) + 1.0
        z = b + sum(coef[i] * c for i, c in counts.items())
        want = 1.0 / (1.0 + math.exp(-z))
        assert got[doc_id] == pytest.approx(want, abs=1e-9), doc_id


def test_score_adapts_text_col_name(spark, model):
    df = spark.createDataFrame([("a", _doc(SEED_WORDS, 3))],
                               "doc_id string, body string")
    row = score_quality_classifier(df, model, text_col="body").collect()[0]
    assert row.clf_score > 0.9
    assert set(df.columns + ["clf_score"]) == \
        set(score_quality_classifier(df, model, text_col="body").columns)


def test_threshold_filter_and_ledger(spark, corpus, model):
    pos, neg = corpus
    df = pos.unionByName(neg)
    kept, ledger = classifier_quality_filter(
        df, model, threshold=0.5)
    kept_ids = {r.doc_id for r in kept.collect()}
    led = ledger.collect()
    assert kept_ids == {f"p{i}" for i in range(60)}
    assert {r.id for r in led} == {f"n{i}" for i in range(60)}
    assert {r.reject_reason for r in led} == {"clf_quality"}
    assert kept.columns == df.columns  # score column dropped


def test_pareto_keep_rate_matches_closed_form(spark, model):
    """With a constant score s the lottery keeps each id independently
    with probability (2-s)^-alpha; over 4000 ids the empirical rate
    must sit within a few points of the analytic value."""
    # score is constant because every doc is the same seed-like text
    text = _doc(SEED_WORDS, 0)
    df = spark.createDataFrame([(f"id{i}", text) for i in range(4000)],
                               "doc_id string, text string")
    s = score_quality_classifier(df.limit(1), model).collect()[0].clf_score
    alpha = 9.0
    kept, _ = classifier_quality_filter(df, model, pareto_alpha=alpha)
    rate = kept.count() / 4000.0
    want = (2.0 - s) ** -alpha
    assert rate == pytest.approx(want, abs=0.03)


def test_pareto_deterministic_and_monotone(spark, corpus, model):
    pos, neg = corpus
    df = pos.unionByName(neg)
    k1, _ = classifier_quality_filter(df, model, pareto_alpha=9.0)
    k2, _ = classifier_quality_filter(df.repartition(13), model,
                                      pareto_alpha=9.0)
    ids1 = {r.doc_id for r in k1.collect()}
    assert ids1 == {r.doc_id for r in k2.collect()}  # repartition-stable

    # per-id monotonicity: the same ids with a HIGHER score can only
    # gain members — swap every spam text for seed text and re-run
    upgraded = df.selectExpr("doc_id", f"'{_doc(SEED_WORDS, 1)}' as text")
    k3, _ = classifier_quality_filter(upgraded, model, pareto_alpha=9.0)
    assert ids1 <= {r.doc_id for r in k3.collect()}


def test_exactly_one_rule_required(spark, corpus, model):
    pos, _ = corpus
    with pytest.raises(ValueError, match="exactly one"):
        classifier_quality_filter(pos, model)
    with pytest.raises(ValueError, match="exactly one"):
        classifier_quality_filter(pos, model, threshold=0.5,
                                  pareto_alpha=9.0)
    with pytest.raises(ValueError, match="pareto_alpha must be > 0"):
        classifier_quality_filter(pos, model, pareto_alpha=0.0)


def _batch_rows():
    """4 fluent docs + 12 spam docs, every one stopword-rich enough to
    survive the lang/quality gates (the planted-CLI-doc rule) and
    mutually distinct enough to survive dedup — the stage under test
    must be the one that drops them."""
    # the good docs REUSE the seed-corpus vocabulary (weather/garden/
    # river/market): a hashed-feature classifier scores resemblance to
    # the seed distribution, so seed-like batch docs must share its
    # tokens, not just its tone (the LM-test reference-vocab rule)
    themes = ["weather", "garden", "river", "market"]
    good = [(i, f"the {t} report number {i} tells of the calm and "
                f"pleasant days in the {t} with many people walking and "
                f"talking about the {t} while children play near the {t}")
            for i, t in enumerate(themes)]
    spam = [(100 + i, f"buy the cheap pills number {i} now and click "
                      f"here to win the casino prize {i} with the free "
                      f"offer and the deal for you to claim the winner "
                      f"bonus {i} today")
            for i in range(12)]
    return good + spam


def test_clean_cli_quality_classifier(spark, tmp_path):
    """--quality-classifier train: the classifier fits on the seed
    corpus vs the batch, the hard threshold drops the spam docs as
    clf_quality, and --save-clf persists a model reusable via
    --quality-classifier PATH with identical drops (the increment
    shape)."""
    import json
    import os
    import subprocess
    import sys

    themes = ["weather", "garden", "river", "market", "season"]
    seed = spark.createDataFrame(
        [(1000 + i, f"the {themes[i % 5]} report number {i} tells of "
                    f"the calm and pleasant days in the {themes[i % 5]} "
                    f"with many people walking and talking near the "
                    f"{themes[(i + 1) % 5]}")
         for i in range(30)], ["doc_id", "text"])
    seed_path = str(tmp_path / "seed")
    seed.write.parquet(seed_path)
    # explicit curated negatives: a junk sample in the spam vocabulary
    # but disjoint from the batch docs (on a 16-doc batch the default
    # batch-as-negatives labels the 4 seed-like docs negative and a
    # linear model separates them perfectly — the label noise the
    # GPT-3 recipe absorbs only at crawl scale)
    junk = spark.createDataFrame(
        [(2000 + i, f"click the deal now to buy the cheap offer {i} and "
                    f"win the free casino prize with the winner bonus "
                    f"for you to claim the pills today number {i}")
         for i in range(30)], ["doc_id", "text"])
    junk_path = str(tmp_path / "junk")
    junk.write.parquet(junk_path)
    inp = str(tmp_path / "docs")
    spark.createDataFrame(_batch_rows(), ["doc_id", "text"]) \
        .write.parquet(inp)
    out = str(tmp_path / "cleaned")
    clf_path = str(tmp_path / "clf")
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95", "--cpus", "4",
         "--quality-classifier", "train", "--clf-positives", seed_path,
         "--clf-negatives", junk_path,
         "--clf-threshold", "0.5", "--save-clf", clf_path],
        capture_output=True, text=True, timeout=300, cwd=cwd)
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["rejected"].get("clf_quality", 0) == 12
    assert stats["n_kept"] == 4
    ledger = {(r["id"], r["reject_reason"]) for r in
              spark.read.parquet(f"{out}/ledger").collect()}
    assert all((100 + i, "clf_quality") in ledger for i in range(12))

    # second run: the persisted model (no --clf-positives, no retrain)
    out2 = str(tmp_path / "cleaned2")
    p2 = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out2,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95", "--cpus", "4",
         "--quality-classifier", clf_path, "--clf-threshold", "0.5"],
        capture_output=True, text=True, timeout=300, cwd=cwd)
    assert p2.returncode == 0, p2.stderr[-2000:]
    stats2 = json.loads([ln for ln in p2.stdout.splitlines()
                         if ln.startswith("{")][-1])
    assert stats2["rejected"].get("clf_quality", 0) == 12
    assert stats2["n_kept"] == 4


def test_clean_cli_clf_flag_validation(tmp_path):
    """The --clf-* surface fails fast (exit 2, usage text, no JVM)."""
    import os
    import subprocess
    import sys

    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(extra):
        return subprocess.run(
            [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
             "--input", "x", "--output", "y"] + extra,
            capture_output=True, text=True, timeout=60, cwd=cwd)

    p = run(["--clf-threshold", "0.5"])
    assert p.returncode == 2 and "--quality-classifier" in p.stderr
    p = run(["--quality-classifier", "train"])
    assert p.returncode == 2 and "exactly one" in p.stderr
    p = run(["--quality-classifier", "train", "--clf-threshold", "0.5",
             "--clf-pareto", "9"])
    assert p.returncode == 2 and "exactly one" in p.stderr
    p = run(["--quality-classifier", "train", "--clf-threshold", "0.5"])
    assert p.returncode == 2 and "--clf-positives" in p.stderr
    p = run(["--quality-classifier", "somepath", "--clf-threshold", "0.5",
             "--save-clf", "m"])
    assert p.returncode == 2 and "--save-clf" in p.stderr
    for proc in (p,):
        assert "Traceback" not in proc.stderr


def test_increment_cli_frozen_classifier(spark, model, tmp_path):
    """The increment CLI applies a FROZEN persisted model before the
    history probes (spam never enters the state stores); 'train' and
    unpaired --clf-* flags are clean usage errors."""
    import json
    import os
    import subprocess
    import sys

    clf_path = str(tmp_path / "clf")
    save_classifier(model, clf_path)
    day = str(tmp_path / "day1")
    spark.createDataFrame(
        [(0, _doc(SEED_WORDS, 5) + " with the people walking and "
             "talking about the calm days", "s"),
         (1, "buy the cheap pills now and click here to win the casino "
             "prize with the free offer and the deal for you to claim "
             "the winner bonus today", "s")],
        ["doc_id", "text", "source"]).write.parquet(day)
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", day, "--state", str(tmp_path / "state"),
         "--output", str(tmp_path / "out1"),
         "--langs", "en", "--min-quality", "0.1",
         "--quality-classifier", clf_path, "--clf-threshold", "0.5",
         "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=cwd)
    assert p.returncode == 0, p.stderr[-3000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["rejected"].get("clf_quality") == 1
    assert stats["n_kept"] == 1
    # the rejected spam doc must not enter the state stores
    assert stats["state_fingerprints"] == 1
    assert stats["state_signatures"] == 1

    def run_err(extra):
        return subprocess.run(
            [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
             "--input", day, "--state", str(tmp_path / "s2"),
             "--output", str(tmp_path / "o2")] + extra,
            capture_output=True, text=True, timeout=120, cwd=cwd)

    p2 = run_err(["--quality-classifier", "train",
                  "--clf-threshold", "0.5"])
    assert p2.returncode == 2 and "training belongs to clean_cli" \
        in p2.stderr
    p3 = run_err(["--quality-classifier", clf_path])
    assert p3.returncode == 2 and "exactly one" in p3.stderr
    p4 = run_err(["--clf-pareto", "9"])
    assert p4.returncode == 2 and "require" in p4.stderr


def test_save_load_roundtrip(spark, corpus, model, tmp_path):
    pos, neg = corpus
    path = str(tmp_path / "clf")
    save_classifier(model, path)
    save_classifier(model, path)  # overwrite must not raise
    loaded = load_classifier(spark, path)
    df = pos.unionByName(neg)
    before = {r.doc_id: r.clf_score
              for r in score_quality_classifier(df, model).collect()}
    after = {r.doc_id: r.clf_score
             for r in score_quality_classifier(df, loaded).collect()}
    assert before == after
