"""Full Gopher repetition table (operators/repetition.py) vs an
independent pure-Python oracle, plus filter/ledger, edge cases, and a
long-doc stress run."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.repetition import (
    GOPHER_REPETITION_THRESHOLDS, gopher_repetition_filter,
    gopher_repetition_stats)

# Java \s — NOT Python's unicode-aware \s (NBSP must behave the same
# in oracle and engine)
_WS = r"[ \t\n\x0b\f\r]+"


def py_repetition_stats(text: str | None) -> dict:
    """Independent recomputation of all 13 measures."""
    text = text or ""
    def jtrim(e):  # the engine's explicit \s-class strip (Java set)
        return re.sub(rf"^(?:{_WS})|(?:{_WS})$", "", e)

    toks = [t for t in re.split(_WS, text) if t]
    lines = [e for e in (jtrim(x) for x in text.split("\n")) if e]
    paras = [e for e in (jtrim(x)
                         for x in re.split(r"\n[ \t\r]*\n", text)) if e]

    def dup(els):
        c = Counter(els)
        d = sum(v - 1 for v in c.values())
        dc = sum((v - 1) * len(k) for k, v in c.items())
        tot, totc = len(els), sum(len(e) for e in els)
        return (d / tot if tot else 0.0, dc / totc if totc else 0.0)

    out = {}
    out["dup_line_fraction"], out["dup_line_char_fraction"] = dup(lines)
    out["dup_para_fraction"], out["dup_para_char_fraction"] = dup(paras)
    tc = sum(len(t) for t in toks)
    for n in (2, 3, 4):
        grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        key = f"top_{n}gram_char_fraction"
        if not grams or tc == 0:
            out[key] = 0.0
            continue
        c = Counter(grams)
        cnt, gl = max((v, sum(len(w) for w in k)) for k, v in c.items())
        out[key] = cnt * gl / tc
    for n in range(5, 11):
        grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        key = f"dup_{n}gram_char_fraction"
        c = Counter(grams)
        covered: set[int] = set()
        for i, g in enumerate(grams):
            if c[g] >= 2:
                covered.update(range(i, i + n))
        out[key] = (sum(len(toks[p]) for p in covered) / tc
                    if tc else 0.0)
    return out


DOCS = [
    (1, "alpha beta gamma delta\nalpha beta gamma delta\nunique line"),
    (2, ("one two " * 30).strip()),           # overlapping top-grams > 1.0
    (3, None),
    (4, ""),
    (5, "   \n\t\n  "),                        # whitespace only
    (6, "para one text\n\npara two text\n \npara one text"),  # blank-line
    (7, "a b c d e f g h i j a b c d e f g h i j tail words here"),
    (8, "singleline without any newline but with with doubled tokens"),
    (9, "x\n" * 40),                           # 40 identical lines
    (10, "wordy " + " ".join(f"tok{i}" for i in range(120))),  # clean long
    (11, "mixed nbsp separated tokens stay joined"),  # NBSP: Java
    (12, "start " + " ".join(f"w{i % 9}" for i in range(90)) + " end"),
    (13, "\tweird pad\t\n\tweird pad  \nclean tail line"),  # tab trim
]


@pytest.fixture(scope="module")
def stats(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = gopher_repetition_stats(df).collect()
    assert len(rows) == len(DOCS)
    return {r["doc_id"]: r.asDict() for r in rows}


@pytest.mark.parametrize("doc_id,text", DOCS)
def test_matches_python_oracle(stats, doc_id, text):
    want = py_repetition_stats(text)
    got = stats[doc_id]
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12, abs=1e-15), \
            f"doc {doc_id} {k}: spark={got[k]} oracle={v}"


def test_filter_reasons_follow_table_order(spark):
    # doc failing BOTH dup-line and a gram rule reports the dup-line
    # reason (first in Table A1); a gram-only failure reports its own
    df = spark.createDataFrame(
        [(1, "a b c d\na b c d\na b c d\nz z z z z z z z z"),
         (2, ("p q r s t u v w x y " * 4) + "closing distinct words"),
         (3, "fine document with completely distinct tokens " +
             " ".join(f"u{i}" for i in range(60)))],
        "doc_id long, text string")
    kept, ledger = gopher_repetition_filter(df)
    led = {r["id"]: r["reject_reason"] for r in ledger.collect()}
    assert led[1] == "rep_dup_line"
    assert led[2].startswith("rep_")
    assert 3 not in led
    assert [r["doc_id"] for r in kept.collect()] == [3]
    # conservation: every doc in exactly one side
    assert kept.count() + ledger.count() == 3


def test_filter_threshold_override_and_unknown_key(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"v{i}" for i in range(80)))],
        "doc_id long, text string")
    kept, ledger = gopher_repetition_filter(
        df, thresholds={"top_2gram_char_fraction": 0.0})
    assert kept.count() == 0
    assert [r["reject_reason"] for r in ledger.collect()] == \
        ["rep_top_2gram"]
    with pytest.raises(ValueError, match="unknown repetition measures"):
        gopher_repetition_filter(df, thresholds={"nope": 0.5})


def test_null_and_empty_rows_survive_everywhere(stats):
    for doc_id in (3, 4, 5):
        assert all(v == 0.0 for k, v in stats[doc_id].items()
                   if k != "doc_id")


def test_published_thresholds_pinned():
    assert GOPHER_REPETITION_THRESHOLDS["dup_line_fraction"] == 0.30
    assert GOPHER_REPETITION_THRESHOLDS["dup_para_char_fraction"] == 0.20
    assert GOPHER_REPETITION_THRESHOLDS["top_4gram_char_fraction"] == 0.16
    assert GOPHER_REPETITION_THRESHOLDS["dup_10gram_char_fraction"] == 0.10
    assert len(GOPHER_REPETITION_THRESHOLDS) == 13


def test_repartition_stability(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = {r["doc_id"]: r.asDict()
         for r in gopher_repetition_stats(df.repartition(7)).collect()}
    b = {r["doc_id"]: r.asDict()
         for r in gopher_repetition_stats(df.coalesce(1)).collect()}
    assert a == b


def test_long_repetitive_doc_completes_linear(spark):
    # the adversarial shape for both cost classes: one 60k-token doc
    # that is a single token repeated (every n-gram identical — the
    # hottest possible (id, n, hash) group) plus 10k identical lines.
    # An O(grams × dups) implementation does ~3.6e9 comparisons here
    # and times out; the linear path finishes in seconds.
    text = "\n".join("spam spam spam spam spam spam" for _ in range(10_000))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = gopher_repetition_stats(df).collect()[0]
    assert row["dup_line_fraction"] == pytest.approx(1 - 1 / 10_000)
    assert row["dup_5gram_char_fraction"] == 1.0
    assert row["top_2gram_char_fraction"] > 0.9


def test_repetition_stats_plan_is_shuffle_free(spark):
    # the whole Table A1 computation is per-document state, and since
    # the per-row sorted-neighbor rewrite (BENCH §4.23) the plan must
    # stay a pure projection pipeline: no Generate (the old gram
    # explode), no Exchange (the old window count / groupBy-pivot /
    # join back), no Window, no Join — row count in == row count out,
    # zero bytes shuffled at any corpus size
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = gopher_repetition_stats(df)._jdf.queryExecution() \
        .executedPlan().toString()
    for op in ("Generate", "Exchange", "Window", "Join"):
        assert op not in plan, f"unexpected {op} in plan:\n{plan[:800]}"


def _run_cli(module, extra, timeout=300):
    import os
    import subprocess
    import sys

    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.run(
        [sys.executable, "-m", module] + extra,
        capture_output=True, text=True, timeout=timeout, cwd=cwd)


def test_clean_cli_gopher_repetition(spark, tmp_path):
    """--gopher-repetition drops the repetitive doc with a rep_*
    reason and keeps the fluent one; increment_cli mirrors the flag
    and the dropped doc never enters the state stores."""
    import json

    # stopword-rich (survives lang/quality) but flagrantly repetitive:
    # the same paragraph pasted four times over blank lines
    para = ("the morning train to the city was late again and the "
            "people on the platform were talking about the weather")
    bad = "\n\n".join([para] * 4)
    good = ("the afternoon service ran on time and the crowd thinned "
            "as the sun settled over the houses while the vendors "
            "packed their stalls and the children walked home with "
            "their parents talking about the day behind them")
    inp = str(tmp_path / "docs")
    spark.createDataFrame([(0, bad, "s"), (1, good, "s")],
                          ["doc_id", "text", "source"]).write.parquet(inp)

    out = str(tmp_path / "cleaned")
    p = _run_cli("khl_pdf_ocr_spark.clean_cli",
                 ["--input", inp, "--output", out,
                  "--langs", "en", "--min-quality", "0.1",
                  "--near-dup-threshold", "0.99", "--cpus", "4",
                  "--gopher-repetition"])
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["n_kept"] == 1
    rep_reasons = {k: v for k, v in stats["rejected"].items()
                   if k.startswith("rep_")}
    assert sum(rep_reasons.values()) == 1, stats["rejected"]
    # each pasted paragraph is one line, so the dup-LINE rule (first
    # in Table A1) claims the doc before dup-para can
    assert next(iter(rep_reasons)) == "rep_dup_line"

    p2 = _run_cli("khl_pdf_ocr_spark.increment_cli",
                  ["--input", inp, "--state", str(tmp_path / "state"),
                   "--output", str(tmp_path / "inc"),
                   "--langs", "en", "--min-quality", "0.1",
                   "--gopher-repetition", "--cpus", "4"], timeout=420)
    assert p2.returncode == 0, p2.stderr[-3000:]
    stats2 = json.loads([ln for ln in p2.stdout.splitlines()
                         if ln.startswith("{")][-1])
    assert stats2["rejected"].get("rep_dup_line") == 1
    assert stats2["n_kept"] == 1
    assert stats2["state_fingerprints"] == 1
