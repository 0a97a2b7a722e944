"""CCNet-style LM quality tiers (textstats.lm_tier_assign): tercile
assignment, per-group boundaries, frozen cutoffs, NULL handling, and
the clean_cli --lm-tiers surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.textstats import lm_tier_assign


def _scored(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, avg_logprob double")


def test_derived_terciles_are_monotone_and_audited(spark):
    rows = [(i, "en", float(-10 + i)) for i in range(9)]  # -10 .. -2
    audit: dict = {}
    out = {r["doc_id"]: r["lm_tier"]
           for r in lm_tier_assign(_scored(spark, rows),
                                   audit=audit).collect()}
    # monotone: every head score >= every middle >= every tail
    by_tier = {t: [s for (i, _, s) in rows if out[i] == t]
               for t in ("head", "middle", "tail")}
    assert by_tier["head"] and by_tier["middle"] and by_tier["tail"]
    assert min(by_tier["head"]) >= max(by_tier["middle"])
    assert min(by_tier["middle"]) >= max(by_tier["tail"])
    lo, hi = audit["lm_tier_cutoffs"]["_global"]
    assert lo <= hi
    # deterministic: same input, same assignment
    again = {r["doc_id"]: r["lm_tier"]
             for r in lm_tier_assign(_scored(spark, rows)).collect()}
    assert again == out


def test_frozen_cutoffs_exact_and_null_score(spark):
    rows = [(0, "en", -9.0), (1, "en", -7.0), (2, "en", -5.0),
            (3, "en", -7.0),                 # boundary: >= lo → middle
            (4, "en", None)]                 # unjudgeable, never "tail"
    audit: dict = {}
    out = {r["doc_id"]: r["lm_tier"]
           for r in lm_tier_assign(_scored(spark, rows),
                                   cutoffs=(-7.0, -5.0),
                                   audit=audit).collect()}
    assert out == {0: "tail", 1: "middle", 2: "head", 3: "middle",
                   4: None}
    assert audit["lm_tier_cutoffs"] == {"_global": [-7.0, -5.0]}


def test_per_group_boundaries(spark):
    # disjoint per-language score ranges: global terciles would dump
    # en entirely into head and ru into tail; per-group each language
    # fills all three tiers from its OWN distribution
    rows = ([(i, "en", float(-6 + i * 0.5)) for i in range(9)]
            + [(100 + i, "ru", float(-60 + i * 5)) for i in range(9)])
    audit: dict = {}
    out = {r["doc_id"]: r["lm_tier"]
           for r in lm_tier_assign(_scored(spark, rows), by="lang",
                                   audit=audit).collect()}
    for lang, ids in (("en", range(9)), ("ru", range(100, 109))):
        scores = {i: s for (i, lg, s) in rows if lg == lang}
        by_tier = {t: [scores[i] for i in ids if out[i] == t]
                   for t in ("head", "middle", "tail")}
        assert by_tier["head"] and by_tier["middle"] and by_tier["tail"], \
            (lang, by_tier)
        assert min(by_tier["head"]) >= max(by_tier["middle"])
        assert min(by_tier["middle"]) >= max(by_tier["tail"])
    assert set(audit["lm_tier_cutoffs"]) == {"en", "ru"}
    # group boundaries come from each group's own range
    assert audit["lm_tier_cutoffs"]["ru"][1] <= -20.0
    assert audit["lm_tier_cutoffs"]["en"][0] >= -6.0


def test_validation_errors(spark):
    df = _scored(spark, [(0, "en", -5.0)])
    with pytest.raises(ValueError, match="fractions"):
        lm_tier_assign(df, fractions=(0.7, 0.3))
    with pytest.raises(ValueError, match="lo <= hi"):
        lm_tier_assign(df, cutoffs=(-1.0, -2.0))
    allnull = _scored(spark, [(0, "en", None), (1, "en", None)])
    with pytest.raises(ValueError, match="no non-NULL"):
        lm_tier_assign(allnull)


def test_clean_cli_lm_tiers(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    # stopword-rich English docs with DIFFERENT vocabulary mixes so
    # avg_logprob does not collapse to a point (template docs share one
    # score and the terciles degenerate)
    common = ("the quick brown fox jumps over the lazy dog and it was "
              "a very good day for all of them in the field")
    rares = ["zymurgy", "quixotic", "phlogiston", "absquatulate",
             "borborygmus", "callipygian", "defenestrate", "eigenvalue",
             "floccinaucinihilipilification"]
    rows = [(i, common + " " + " ".join(rares[:i]), "s")
            for i in range(9)]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "text", "source"]) \
         .write.parquet(inp)

    out = str(tmp_path / "cleaned")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.05",
         "--quality-lm", "train", "--lm-tails", "0.0,1.0",
         "--lm-tiers", "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert sum(stats["lm_tiers"].values()) == stats["n_kept"]
    lo, hi = stats["lm_tier_cutoffs"]["_global"]
    assert lo <= hi
    kept = spark.read.parquet(f"{out}/kept")
    assert "lm_tier" in kept.columns
    assert kept.filter(F.col("lm_tier").isNull()).count() == 0
    # flag pairing: tiers without an LM is a usage error
    q = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", str(tmp_path / "x"),
         "--lm-tiers", "--cpus", "4"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert q.returncode == 2 and "quality-lm" in q.stderr


def test_increment_cli_frozen_tiers_and_datacard(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    from khl_pdf_ocr_spark.operators.textstats import (save_lm,
                                                       train_unigram_lm)

    common = ("the quick brown fox jumps over the lazy dog and it was "
              "a very good day for all of them in the field")
    rares = ["zymurgy", "quixotic", "phlogiston", "absquatulate",
             "borborygmus", "callipygian", "defenestrate", "eigenvalue"]
    rows = [(i, common + " " + " ".join(rares[:i]), "s")
            for i in range(8)]
    inp = str(tmp_path / "docs")
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    docs.write.parquet(inp)
    lmp = str(tmp_path / "lm")
    save_lm(train_unigram_lm(docs), lmp)

    out, state = str(tmp_path / "inc_out"), str(tmp_path / "state")
    cardp = str(tmp_path / "inc_card.json")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", inp, "--state", state, "--output", out,
         "--increment-id", "d1", "--langs", "en", "--min-quality", "0.1",
         "--quality-lm", lmp, "--lm-cutoffs=-99.0,none",
         "--lm-tiers", "--lm-tier-cutoffs=-3.9,-3.6",
         "--datacard", cardp, "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=repo)
    assert p.returncode == 0, p.stderr[-3000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["lm_tier_cutoffs"] == {"_global": [-3.9, -3.6]}
    assert sum(stats["lm_tiers"].values()) == stats["n_kept"] > 0
    kept = spark.read.parquet(f"{out}/kept")
    assert "lm_tier" in kept.columns
    card = json.load(open(cardp))
    assert card["totals"]["n_docs"] == stats["n_kept"]
    assert card["funnel"]["input_docs"] == 8
    assert stats["datacard"] == cardp

    # frozen discipline: tiers without cutoffs is a usage error here
    q = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", inp, "--state", state, "--output", str(tmp_path / "x"),
         "--quality-lm", lmp, "--lm-cutoffs=-99.0,none", "--lm-tiers",
         "--cpus", "4"],
        capture_output=True, text=True, timeout=120, cwd=repo)
    assert q.returncode == 2 and "lm-tier-cutoffs" in q.stderr
