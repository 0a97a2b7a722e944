"""Token-budget mixture sampling (operators/mixture.py): pure-Python
XXH64 oracle equality, exact-vs-bucketed path agreement, budget edge
cases, repartition stability, stats, validation."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions.xxh import xxhash64_long_int
from khl_pdf_ocr_spark.operators.mixture import (mixture_budgets,
                                                 mixture_sample)

WEIGHTS = {"wiki": 4.0, "web": 2.0, "code": 1.0}
SEED = 7


def _corpus(spark):
    """120 docs over 4 sources (one unnamed in WEIGHTS), with zero and
    NULL token counts sprinkled in — deterministic, no RNG."""
    rows = []
    for i in range(120):
        src = ("wiki", "web", "code", "junk")[i % 4]
        if i % 17 == 0:
            tok = None
        elif i % 11 == 0:
            tok = 0
        else:
            tok = 5 + (i * 13) % 90
        rows.append((i, src, tok))
    return rows, spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens int")


def _py_kept(rows, weights, budget, seed=SEED):
    budgets = mixture_budgets(weights, budget)
    by_src = defaultdict(list)
    for i, s, t in rows:
        if s in weights:
            by_src[s].append((xxhash64_long_int(i, seed), i,
                              0 if t is None else t))
    kept = set()
    for s, lst in by_src.items():
        lst.sort()
        cum = 0
        for _h, i, t in lst:
            cum += t
            if cum <= budgets[s]:
                kept.add(i)
    return kept


def test_matches_pure_python_oracle(spark):
    rows, df = _corpus(spark)
    for budget in (40, 300, 1200, 5000):
        kept, _ = mixture_sample(df, WEIGHTS, budget, seed=SEED,
                                 bucket_bits=4)
        got = {r.doc_id for r in kept.collect()}
        assert got == _py_kept(rows, WEIGHTS, budget), f"budget={budget}"


def test_exact_and_bucketed_agree(spark):
    rows, df = _corpus(spark)
    exact, _ = mixture_sample(df, WEIGHTS, 700, seed=SEED, exact=True)
    want = {r.doc_id for r in exact.collect()}
    for bits in (1, 3, 6, 12):
        bucketed, _ = mixture_sample(df, WEIGHTS, 700, seed=SEED,
                                     bucket_bits=bits)
        assert {r.doc_id for r in bucketed.collect()} == want, f"bits={bits}"


def test_budget_exceeds_available_keeps_all_with_epochs(spark):
    rows, df = _corpus(spark)
    kept, stats = mixture_sample(df, {"wiki": 1.0}, 10**9, seed=SEED)
    n_wiki = sum(1 for _, s, _t in rows if s == "wiki")
    assert kept.count() == n_wiki
    srow = stats.collect()[0]
    assert srow.kept_docs == n_wiki
    assert srow.avail_tokens == srow.kept_tokens
    assert srow.epochs_needed > 1.0  # under-sized source → repeat signal


def test_repartition_stability(spark):
    rows, df = _corpus(spark)
    a, _ = mixture_sample(df, WEIGHTS, 500, seed=SEED)
    b, _ = mixture_sample(df.repartition(7), WEIGHTS, 500, seed=SEED)
    assert ({r.doc_id for r in a.collect()}
            == {r.doc_id for r in b.collect()})


def test_unnamed_sources_dropped(spark):
    rows, df = _corpus(spark)
    kept, stats = mixture_sample(df, WEIGHTS, 10**9, seed=SEED)
    assert {r.source for r in kept.collect()} == set(WEIGHTS)
    assert {r.source for r in stats.collect()} == set(WEIGHTS)


def test_prefix_rule_is_strict(spark):
    # hand-traced single source: hash order of ids 0..4 under seed 7,
    # tokens chosen so the budget is crossed mid-way — everything after
    # the crossing is dropped even if it would individually fit
    ids = list(range(5))
    order = sorted(ids, key=lambda i: (xxhash64_long_int(i, SEED), i))
    toks = {order[0]: 10, order[1]: 50, order[2]: 1, order[3]: 1,
            order[4]: 1}
    df = spark.createDataFrame(
        [(i, "s", toks[i]) for i in ids],
        "doc_id long, source string, n_tokens int")
    kept, _ = mixture_sample(df, {"s": 1.0}, 12, seed=SEED)
    # prefix: 10 fits (cum 10), 50 crosses (cum 60) → only order[0]
    assert {r.doc_id for r in kept.collect()} == {order[0]}


def test_stats_row_values(spark):
    rows, df = _corpus(spark)
    budget = 300
    kept, stats = mixture_sample(df, WEIGHTS, budget, seed=SEED)
    budgets = mixture_budgets(WEIGHTS, budget)
    got = {r.source: r for r in stats.collect()}
    kept_ids = _py_kept(rows, WEIGHTS, budget)
    for s in WEIGHTS:
        sr = [(i, t or 0) for i, src, t in rows if src == s]
        krows = [(i, t) for i, t in sr if i in kept_ids]
        assert got[s].budget_tokens == budgets[s]
        assert got[s].avail_docs == len(sr)
        assert got[s].avail_tokens == sum(t for _, t in sr)
        assert got[s].kept_docs == len(krows)
        assert got[s].kept_tokens == sum(t for _, t in krows)


def test_validation_errors(spark):
    rows, df = _corpus(spark)
    with pytest.raises(ValueError, match="at least one source"):
        mixture_budgets({}, 100)
    with pytest.raises(ValueError, match="must be > 0"):
        mixture_budgets({"a": 0.0}, 100)
    with pytest.raises(ValueError, match="token_budget"):
        mixture_budgets({"a": 1.0}, 0)
    with pytest.raises(ValueError, match="bucket_bits"):
        mixture_sample(df, WEIGHTS, 100, bucket_bits=0)


def test_no_cartesian_in_plan(spark):
    _, df = _corpus(spark)
    kept, _ = mixture_sample(df, WEIGHTS, 500, seed=SEED)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_shard_cli_mixture_stage(spark, tmp_path):
    """--mixture/--token-budget select each source's hash-prefix before
    chunking: shard output contains exactly the oracle-kept docs, and
    the stats line carries the per-source mixture telemetry."""
    import json
    import os
    import subprocess
    import sys

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(4 + (i * 7) % 30)),
             ("wiki", "web", "junk")[i % 3]) for i in range(45)]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, source string") \
         .write.parquet(inp)
    out = str(tmp_path / "shards")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.shard_cli",
         "--input", inp, "--output", out,
         "--max-tokens", "16", "--overlap", "4", "--capacity", "64",
         "--split", "train=0.9,val=0.1",
         "--mixture", "wiki=3,web=1", "--token-budget", "160",
         "--seed", "17", "--cpus", "2"],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-3000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    mix = stats["mixture"]
    assert set(mix) == {"wiki", "web"}
    want = _py_kept([(i, s, len(t.split())) for i, t, s in rows],
                    {"wiki": 3.0, "web": 1.0}, 160, seed=17)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == want
    for s in mix.values():
        assert s["kept_tokens"] <= s["budget_tokens"] \
            or s["epochs_needed"] == 1.0
    assert (sum(s["kept_docs"] for s in mix.values()) == len(want)
            and all(s["avail_docs"] == 15 for s in mix.values()))


def test_shard_cli_mixture_usage_errors(tmp_path):
    import os
    import subprocess
    import sys

    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for extra in (["--mixture", "a=1"],
                  ["--token-budget", "100"],
                  ["--mixture", "a=1,a=2", "--token-budget", "100"],
                  ["--mixture", "a=1", "--token-budget", "0"]):
        p = subprocess.run(
            [sys.executable, "-m", "khl_pdf_ocr_spark.shard_cli",
             "--input", "/nonexistent", "--output", str(tmp_path / "o"),
             *extra],
            capture_output=True, text=True, timeout=120, cwd=cwd)
        assert p.returncode == 2, (extra, p.stderr[-500:])
        assert "Traceback" not in p.stderr, extra


def test_temperature_weights_math(spark):
    from khl_pdf_ocr_spark.operators.mixture import temperature_weights

    rows, df = _corpus(spark)
    totals = defaultdict(int)
    for _i, s, t in rows:
        totals[s] += t or 0
    grand = sum(totals.values())
    for T in (1.0, 2.0, 100.0):
        w = temperature_weights(df, temperature=T)
        assert set(w) == set(totals)  # all four sources have tokens
        for s in w:
            assert w[s] == pytest.approx((totals[s] / grand) ** (1 / T),
                                         rel=1e-12)
    # T=1 is proportional to the natural shares; huge T ~ uniform
    w1 = temperature_weights(df, temperature=1.0)
    r = {s: w1[s] / (totals[s] / grand) for s in w1}
    assert max(r.values()) == pytest.approx(min(r.values()), rel=1e-12)
    whuge = temperature_weights(df, temperature=1e9)
    assert max(whuge.values()) == pytest.approx(min(whuge.values()),
                                                rel=1e-6)


def test_temperature_weights_validation(spark):
    from khl_pdf_ocr_spark.operators.mixture import temperature_weights

    _rows, df = _corpus(spark)
    with pytest.raises(ValueError, match="temperature"):
        temperature_weights(df, temperature=0.0)
    zero = spark.createDataFrame(
        [(1, "a", 0), (2, "b", None)],
        "doc_id long, source string, n_tokens int")
    with pytest.raises(ValueError, match="positive token count"):
        temperature_weights(zero, temperature=2.0)
    # a zero-token source silently drops, the rest survive
    mixed = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 0)],
        "doc_id long, source string, n_tokens int")
    assert set(temperature_weights(mixed, temperature=2.0)) == {"a"}


def test_shard_cli_mixture_temperature(spark, tmp_path):
    """--mixture-temperature derives the weights from the corpus's own
    source sizes; the kept set equals the python oracle run with those
    derived weights, and stats disclose T + weights."""
    import json
    import os
    import subprocess
    import sys

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(4 + (i * 7) % 30)),
             ("wiki", "web", "junk")[i % 3]) for i in range(45)]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, source string") \
         .write.parquet(inp)
    out = str(tmp_path / "shards")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.shard_cli",
         "--input", inp, "--output", out,
         "--max-tokens", "16", "--overlap", "4", "--capacity", "64",
         "--split", "train=1.0",
         "--mixture-temperature", "2.0", "--token-budget", "160",
         "--seed", "17", "--cpus", "2"],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-3000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    mt = stats["mixture_temperature"]
    assert mt["T"] == 2.0 and set(mt["weights"]) == {"wiki", "web", "junk"}
    totals = defaultdict(int)
    for i, t, s in rows:
        totals[s] += len(t.split())
    grand = sum(totals.values())
    for s, w in mt["weights"].items():
        assert w == pytest.approx((totals[s] / grand) ** 0.5, abs=5e-7)
    want = _py_kept([(i, s, len(t.split())) for i, t, s in rows],
                    {s: (n / grand) ** 0.5 for s, n in totals.items()},
                    160, seed=17)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == want
    # flag pairing errors stay clean usage errors
    for extra in (["--mixture", "a=1", "--mixture-temperature", "2",
                   "--token-budget", "10"],
                  ["--mixture-temperature", "2"],
                  ["--mixture-temperature", "0", "--token-budget", "10"]):
        p2 = subprocess.run(
            [sys.executable, "-m", "khl_pdf_ocr_spark.shard_cli",
             "--input", "/nonexistent", "--output", str(tmp_path / "o2"),
             *extra],
            capture_output=True, text=True, timeout=120,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert p2.returncode == 2, (extra, p2.stderr[-500:])
        assert "Traceback" not in p2.stderr, extra
