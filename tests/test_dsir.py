"""DSIR importance resampling (operators/dsir.py): full pure-Python
oracle over the SQL-reproducible hash, selection behavior, threshold
mode, edge docs, determinism, validation."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.dedup import sql_token_hash
from khl_pdf_ocr_spark.operators.dsir import (dsir_logratio_scores,
                                              dsir_select,
                                              fit_hashed_ngram_model,
                                              hashed_ngram_buckets,
                                              py_gumbel)

M, ALPHA, ORDERS = 64, 1.0, (1, 2)

# deterministic two-dialect corpora: "target" prose vocabulary vs
# "rawish" boilerplate vocabulary, no RNG
_T_WORDS = ["river", "stone", "meadow", "light", "winter", "song"]
_R_WORDS = ["click", "buy", "offer", "deal", "subscribe", "now"]


def _doc(words, i, n=12):
    return " ".join(words[(i * 5 + j) % len(words)] for j in range(n))


def _target_rows():
    return [(i, _doc(_T_WORDS, i)) for i in range(30)]


def _raw_rows():
    # ids 0..19 target-like, 20..39 raw-like
    return ([(i, _doc(_T_WORDS, i + 3)) for i in range(20)]
            + [(i, _doc(_R_WORDS, i)) for i in range(20, 40)])


# --- pure-Python replica --------------------------------------------------

def _norm(t):
    t = re.sub(r"[.,!?;:]", "", (t or "").lower())
    return re.sub(r"\s+", " ", t).strip()


def _poly(s):
    h = 0
    for ch in s:
        h = (h * 131 + ord(ch)) % 2147483647
    return h


def _buckets(text):
    toks = [t for t in _norm(text).split(" ") if t]
    grams = list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_poly(g) % M for g in grams]


def _fit(rows):
    counts = {}
    total = 0
    for _i, t in rows:
        for b in _buckets(t):
            counts[b] = counts.get(b, 0) + 1
            total += 1
    denom = total + ALPHA * M
    return {b: math.log((counts.get(b, 0) + ALPHA) / denom)
            for b in range(M)}


def _scores(rows, pt, pr):
    out = {}
    for i, t in rows:
        bs = _buckets(t)
        out[i] = (len(bs),
                  sum(sorted(pt[b] - pr[b] for b in bs)) if bs else None)
    return out


def _spark_models(spark):
    tgt = spark.createDataFrame(_target_rows(), "doc_id long, text string")
    raw = spark.createDataFrame(_raw_rows(), "doc_id long, text string")
    kw = dict(num_buckets=M, orders=ORDERS, alpha=ALPHA,
              ngram_hash=sql_token_hash)
    return (raw, fit_hashed_ngram_model(tgt, **kw),
            fit_hashed_ngram_model(raw, **kw))


def test_scores_match_pure_python_oracle(spark):
    raw, mt, mr = _spark_models(spark)
    got = {r.doc_id: (r.n_ngrams, r.dsir_logratio)
           for r in dsir_logratio_scores(
               raw, mt, mr, num_buckets=M, orders=ORDERS,
               ngram_hash=sql_token_hash,
               deterministic_fold=True).collect()}
    want = _scores(_raw_rows(), _fit(_target_rows()), _fit(_raw_rows()))
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-6), i


def test_selection_separates_dialects(spark):
    raw, mt, mr = _spark_models(spark)
    scores = dsir_logratio_scores(raw, mt, mr, num_buckets=M,
                                  orders=ORDERS, ngram_hash=sql_token_hash)
    kept, dropped = dsir_select(raw, scores, k=20, gumbel=False)
    ids = {r.doc_id for r in kept.collect()}
    # plain top-20 must be exactly the target-like half
    assert ids == set(range(20))
    assert {r.id for r in dropped.collect()} == set(range(20, 40))


def test_gumbel_selection_matches_python_topk(spark):
    raw, mt, mr = _spark_models(spark)
    scores = dsir_logratio_scores(raw, mt, mr, num_buckets=M,
                                  orders=ORDERS, ngram_hash=sql_token_hash)
    kept, _ = dsir_select(raw, scores, k=15, gumbel=True, seed=13)
    py = _scores(_raw_rows(), _fit(_target_rows()), _fit(_raw_rows()))
    keys = sorted(((py[i][1] + py_gumbel(i, 13)), i) for i in py
                  if py[i][1] is not None)
    want = {i for _k, i in keys[-15:]}
    assert {r.doc_id for r in kept.collect()} == want


def test_threshold_mode_equals_topk(spark):
    raw, mt, mr = _spark_models(spark)
    scores = dsir_logratio_scores(raw, mt, mr, num_buckets=M,
                                  orders=ORDERS, ngram_hash=sql_token_hash)
    py = _scores(_raw_rows(), _fit(_target_rows()), _fit(_raw_rows()))
    # replicate the operator's 6-dp half-up rounding of the score
    # before adding the noise, then cut at the midpoint between the
    # 15th and 16th keys (Gumbel gaps are O(0.1) — robust)
    keys = sorted(math.floor((py[i][1]) * 1e6 + 0.5) / 1e6
                  + py_gumbel(i, 13) for i in py)
    cut = (keys[-15] + keys[-16]) / 2.0
    kept_t, _ = dsir_select(raw, scores, k=1, gumbel=True, seed=13,
                            threshold=cut)
    kept_k, _ = dsir_select(raw, scores, k=15, gumbel=True, seed=13)
    assert ({r.doc_id for r in kept_t.collect()}
            == {r.doc_id for r in kept_k.collect()})


def test_empty_and_null_docs_never_selected(spark):
    rows = _raw_rows() + [(90, ""), (91, None), (92, " .,!? ")]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = spark.createDataFrame(_target_rows(), "doc_id long, text string")
    kw = dict(num_buckets=M, orders=ORDERS, ngram_hash=sql_token_hash)
    mt = fit_hashed_ngram_model(tgt, alpha=ALPHA, **kw)
    mr = fit_hashed_ngram_model(raw, alpha=ALPHA, **kw)
    scores = dsir_logratio_scores(raw, mt, mr, **kw)
    null_rows = {r.doc_id: r for r in scores.collect()
                 if r.doc_id >= 90}
    assert all(r.n_ngrams == 0 and r.dsir_logratio is None
               for r in null_rows.values())
    kept, dropped = dsir_select(raw, scores, k=100)
    assert {r.doc_id for r in kept.collect()} == {i for i, _t in _raw_rows()}
    assert {90, 91, 92} <= {r.id for r in dropped.collect()}


def test_default_hash_path_is_repartition_stable(spark):
    raw, _mt, _mr = _spark_models(spark)
    tgt = spark.createDataFrame(_target_rows(), "doc_id long, text string")
    kw = dict(num_buckets=M, orders=ORDERS)
    mt = fit_hashed_ngram_model(tgt, **kw)
    mr = fit_hashed_ngram_model(raw, **kw)
    s1 = dsir_logratio_scores(raw, mt, mr, **kw)
    s2 = dsir_logratio_scores(raw.repartition(7), mt, mr,
                              deterministic_fold=True, **kw)
    a, _ = dsir_select(raw, s1, k=12)
    b, _ = dsir_select(raw.repartition(5), s2, k=12)
    assert ({r.doc_id for r in a.collect()}
            == {r.doc_id for r in b.collect()})


def test_validation():
    with pytest.raises(ValueError, match="orders"):
        hashed_ngram_buckets(F.lit("x"), orders=(0,))
    with pytest.raises(ValueError, match="num_buckets"):
        hashed_ngram_buckets(F.lit("x"), num_buckets=1)


def test_validation_spark(spark):
    raw, mt, mr = _spark_models(spark)
    with pytest.raises(ValueError, match="alpha"):
        fit_hashed_ngram_model(raw, alpha=0.0, num_buckets=M)
    scores = dsir_logratio_scores(raw, mt, mr, num_buckets=M,
                                  orders=ORDERS, ngram_hash=sql_token_hash)
    with pytest.raises(ValueError, match="k must be"):
        dsir_select(raw, scores, k=0)


def test_scoring_join_broadcasts(spark):
    raw, mt, mr = _spark_models(spark)
    scores = dsir_logratio_scores(raw, mt, mr, num_buckets=M,
                                  orders=ORDERS, ngram_hash=sql_token_hash)
    plan = scores._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


# --- clean_cli stage ------------------------------------------------------

def _cli_batch_rows():
    """4 target-like docs + 12 boilerplate docs, all stopword-rich
    enough to survive the lang/quality gates and mutually distinct
    enough to survive dedup (the planted-CLI-doc rule)."""
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


def _run_clean_cli(extra, timeout=300):
    import os
    import subprocess
    import sys

    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli"] + extra,
        capture_output=True, text=True, timeout=timeout, cwd=cwd)


def test_clean_cli_dsir_topk_and_threshold(spark, tmp_path):
    """--dsir-target + --dsir-keep selects exactly K target-like docs
    (the boilerplate lands in the ledger as 'dsir'); the threshold
    mode at 0 makes the same cut without the top-k sort."""
    import json

    themes = ["weather", "garden", "river", "market", "season"]
    target = spark.createDataFrame(
        [(1000 + i, f"the {themes[i % 5]} report number {i} tells of "
                    f"the calm and pleasant days in the {themes[i % 5]} "
                    f"with many people walking and talking near the "
                    f"{themes[(i + 1) % 5]}")
         for i in range(30)], ["doc_id", "text"])
    tgt_path = str(tmp_path / "target")
    target.write.parquet(tgt_path)
    inp = str(tmp_path / "docs")
    spark.createDataFrame(_cli_batch_rows(), ["doc_id", "text"]) \
        .write.parquet(inp)

    out = str(tmp_path / "cleaned")
    p = _run_clean_cli(
        ["--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95", "--cpus", "4",
         "--dsir-target", tgt_path, "--dsir-keep", "4",
         "--dsir-no-gumbel"])
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["n_kept"] == 4
    assert stats["rejected"].get("dsir", 0) == 12
    assert stats["dsir"] == {"mode": "top_k", "gumbel": False, "keep": 4}
    kept_ids = {r["doc_id"] for r in
                spark.read.parquet(f"{out}/kept").collect()}
    assert kept_ids == {0, 1, 2, 3}
    ledger = {(r["id"], r["reject_reason"]) for r in
              spark.read.parquet(f"{out}/ledger").collect()}
    assert all((100 + i, "dsir") in ledger for i in range(12))

    # threshold mode: log-ratio > 0 iff target-like (the boilerplate
    # vocabulary is at the target model's smoothing floor)
    out2 = str(tmp_path / "cleaned2")
    p2 = _run_clean_cli(
        ["--input", inp, "--output", out2,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95", "--cpus", "4",
         "--dsir-target", tgt_path, "--dsir-threshold=0",
         "--dsir-no-gumbel"])
    assert p2.returncode == 0, p2.stderr[-2000:]
    stats2 = json.loads([ln for ln in p2.stdout.splitlines()
                         if ln.startswith("{")][-1])
    assert stats2["n_kept"] == 4
    assert stats2["rejected"].get("dsir", 0) == 12
    assert stats2["dsir"] == {"mode": "threshold", "gumbel": False,
                              "threshold": 0.0}
    assert {r["doc_id"] for r in
            spark.read.parquet(f"{out2}/kept").collect()} == {0, 1, 2, 3}


def test_clean_cli_dsir_flag_validation(tmp_path):
    """The --dsir-* surface fails fast (exit 2, usage text, no JVM)."""
    def run(extra):
        return _run_clean_cli(["--input", "x", "--output", "y"] + extra,
                              timeout=60)

    p = run(["--dsir-keep", "4"])
    assert p.returncode == 2 and "--dsir-target" in p.stderr
    p = run(["--dsir-no-gumbel"])
    assert p.returncode == 2 and "--dsir-target" in p.stderr
    p = run(["--dsir-target", "t"])
    assert p.returncode == 2 and "exactly one" in p.stderr
    p = run(["--dsir-target", "t", "--dsir-keep", "4",
             "--dsir-threshold=0"])
    assert p.returncode == 2 and "exactly one" in p.stderr
    p = run(["--dsir-target", "t", "--dsir-keep", "0"])
    assert p.returncode == 2 and ">= 1" in p.stderr


def test_save_load_roundtrip(spark, tmp_path):
    """save/load pins the feature-space parameters and reproduces the
    exact scores; overwrite must not raise (retried-run semantics)."""
    from khl_pdf_ocr_spark.operators.dsir import (load_dsir_model,
                                                  save_dsir_model)

    tgt = spark.createDataFrame(_target_rows(), "doc_id long, text string")
    raw = spark.createDataFrame(_raw_rows(), "doc_id long, text string")
    kw = dict(num_buckets=M, orders=ORDERS, seed=7)
    mt = fit_hashed_ngram_model(tgt, alpha=ALPHA, **kw)
    mr = fit_hashed_ngram_model(raw, alpha=ALPHA, **kw)
    path = str(tmp_path / "dsir")
    save_dsir_model(mt, mr, path, **kw)
    save_dsir_model(mt, mr, path, **kw)  # overwrite must not raise
    lt, lr, lkw = load_dsir_model(spark, path)
    assert lkw == {"num_buckets": M, "orders": ORDERS, "seed": 7}
    direct = {r.doc_id: r.dsir_logratio for r in
              dsir_logratio_scores(raw, mt, mr, **kw).collect()}
    loaded = {r.doc_id: r.dsir_logratio for r in
              dsir_logratio_scores(raw, lt, lr, **lkw).collect()}
    assert direct == loaded


def test_clean_cli_save_dsir_then_increment_frozen(spark, tmp_path):
    """clean_cli --save-dsir persists the fitted pair; increment_cli
    --dsir-model applies it FROZEN before the history probes (the
    rejected doc never enters the state stores); unpaired flags are
    clean usage errors."""
    import json
    import subprocess
    import sys
    import os

    themes = ["weather", "garden", "river", "market", "season"]
    target = spark.createDataFrame(
        [(1000 + i, f"the {themes[i % 5]} report number {i} tells of "
                    f"the calm and pleasant days in the {themes[i % 5]} "
                    f"with many people walking and talking near the "
                    f"{themes[(i + 1) % 5]}")
         for i in range(30)], ["doc_id", "text"])
    tgt_path = str(tmp_path / "target")
    target.write.parquet(tgt_path)
    inp = str(tmp_path / "docs")
    spark.createDataFrame(_cli_batch_rows(), ["doc_id", "text"]) \
        .write.parquet(inp)
    model_path = str(tmp_path / "dsir_model")
    p = _run_clean_cli(
        ["--input", inp, "--output", str(tmp_path / "cleaned"),
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95", "--cpus", "4",
         "--dsir-target", tgt_path, "--dsir-keep", "4",
         "--dsir-no-gumbel", "--save-dsir", model_path])
    assert p.returncode == 0, p.stderr[-2000:]
    assert os.path.isdir(f"{model_path}/target")
    assert os.path.isdir(f"{model_path}/raw")
    assert os.path.isdir(f"{model_path}/meta")

    day = str(tmp_path / "day1")
    spark.createDataFrame(
        [(0, "the garden report number 77 tells of the calm and "
             "pleasant days in the garden with many people walking and "
             "talking about the garden while children play there", "s"),
         (1, "buy the cheap pills number 77 now and click here to win "
             "the casino prize with the free offer and the deal for "
             "you to claim the winner bonus today", "s")],
        ["doc_id", "text", "source"]).write.parquet(day)
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p2 = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", day, "--state", str(tmp_path / "state"),
         "--output", str(tmp_path / "out1"),
         "--langs", "en", "--min-quality", "0.1",
         "--dsir-model", model_path, "--dsir-threshold=0",
         "--dsir-no-gumbel", "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=cwd)
    assert p2.returncode == 0, p2.stderr[-3000:]
    stats = json.loads([ln for ln in p2.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["rejected"].get("dsir") == 1
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

    p3 = run_err(["--dsir-model", model_path])
    assert p3.returncode == 2 and "--dsir-threshold" in p3.stderr
    p4 = run_err(["--dsir-threshold=0"])
    assert p4.returncode == 2 and "--dsir-model" in p4.stderr
    p5 = _run_clean_cli(["--input", "x", "--output", "y",
                         "--save-dsir", "m"], timeout=60)
    assert p5.returncode == 2 and "--dsir-target" in p5.stderr
    for proc in (p3, p4, p5):
        assert "Traceback" not in proc.stderr
