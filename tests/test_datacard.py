"""Training-data card (datacard.py): composition/totals/funnel math
against a DuckDB recomputation, the no-silent-caps truncation flags,
and the clean_cli --datacard surface."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.datacard import build_datacard


@pytest.fixture()
def corpus(spark, tmp_path):
    rows = [
        (0, "alpha beta gamma delta", "wiki", "en",
         "https://en.wikipedia.org/wiki/A"),
        (1, "one two three", "wiki", "en",
         "https://de.wikipedia.org/wiki/B"),
        (2, "один два три четыре пять", "web", "ru",
         "http://news.example.co.uk/x"),
        (3, None, "web", None, None),
        (4, "   ", "web", "en", "https://blog.example.co.uk/y"),
        (5, "a b c d e f g h", "code", "en",
         "https://en.wikipedia.org/wiki/C"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, "
              "url string")
    path = str(tmp_path / "docs")
    df.write.parquet(path)
    return spark.read.parquet(path), path


def test_totals_and_composition_match_duckdb(corpus):
    df, path = corpus
    card = build_datacard(df, source_col="source", lang_col="lang",
                          url_col="url")
    want = duckdb.sql(f"""
        SELECT count(*) AS n_docs,
               sum(CASE WHEN text IS NULL THEN NULL
                        WHEN length(trim(text)) = 0 THEN 0
                        ELSE length(regexp_split_to_array(trim(text),
                                                          '\\s+')) END)
                   AS n_tokens,
               sum(coalesce(length(text), 0)) AS n_chars
        FROM read_parquet('{path}/*.parquet')
    """).fetchone()
    assert card["totals"]["n_docs"] == want[0] == 6
    assert card["totals"]["n_tokens"] == want[1] == 4 + 3 + 5 + 0 + 8
    assert card["totals"]["n_chars"] == want[2]
    comp = card["composition"]
    assert comp["source"]["groups"] == {
        "wiki": {"docs": 2, "tokens": 7},
        "web": {"docs": 3, "tokens": 5},
        "code": {"docs": 1, "tokens": 8}}
    assert comp["source"]["truncated"] is False
    # NULL dims land under "(null)", never silently vanish
    assert comp["lang"]["groups"]["(null)"] == {"docs": 1, "tokens": 0}
    # quantiles: GK sketch is exact at this size; NULL-token doc skipped
    q = card["totals"]["token_quantiles"]
    assert q["p50"] in (3, 4) and q["p10"] >= 0 and q["p99"] == 8
    # top registrable domains: wikipedia.org unifies en./de. subdomains,
    # example.co.uk unifies news./blog. (two-level suffix)
    assert card["top_domains"]["wikipedia.org"] == 3
    assert card["top_domains"]["example.co.uk"] == 2
    assert "(null)" not in card["top_domains"]  # NULL url → '' host key


def test_breakdown_truncation_flag(corpus, spark):
    df, _ = corpus
    card = build_datacard(df, source_col="source", max_groups=2)
    comp = card["composition"]["source"]
    assert comp["truncated"] is True
    assert len(comp["groups"]) == 2
    # top-by-docs kept: web (3), wiki (2); code dropped but flagged
    assert set(comp["groups"]) == {"web", "wiki"}


def test_funnel_exact_input_even_when_truncated(corpus, spark):
    df, _ = corpus
    ledger = spark.createDataFrame(
        [(10, "lang"), (11, "lang"), (12, "exact_dup"), (13, "quality")],
        "id long, reject_reason string")
    card = build_datacard(df, ledger)
    f = card["funnel"]
    assert f["input_docs"] == 10 and f["kept_docs"] == 6
    assert f["kept_share"] == 0.6
    assert f["rejected"]["lang"] == {"docs": 2, "share_of_input": 0.2}
    assert f["truncated"] is False
    # truncated reason list: input_docs stays EXACT (one count, not a
    # sum of the shown rows)
    card2 = build_datacard(df, ledger, max_groups=1)
    f2 = card2["funnel"]
    assert f2["truncated"] is True
    assert list(f2["rejected"]) == ["lang"]
    assert f2["input_docs"] == 10


def test_absent_dim_columns_are_skipped(corpus):
    df, _ = corpus
    card = build_datacard(df.select("doc_id", "text"),
                          source_col="source", lang_col="lang",
                          split_col="split", url_col="url")
    assert "composition" not in card
    assert "top_domains" not in card
    assert "funnel" not in card
    assert card["totals"]["n_docs"] == 6


def test_clean_cli_writes_datacard(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest with all of its friends today")
    rows = [(0, base, "s", "https://a.example.com/1"),
            (1, base, "s", "https://b.example.com/2"),
            (2, "tiny", "s", "https://c.example.com/3"),
            (3, "ещё один документ на русском языке про хоккей и арену "
                "с длинным текстом и разными словами внутри матча", "t",
             "https://d.example.org/4")]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "text", "source", "url"]) \
         .write.parquet(inp)

    out = str(tmp_path / "cleaned")
    cardp = str(tmp_path / "card.json")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "ru", "--min-quality", "0.1",
         "--near-dup-threshold", "0.5", "--split", "train=0.5,val=0.5",
         "--url-col", "url", "--datacard", cardp, "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["datacard"] == cardp
    card = json.load(open(cardp))
    # the card describes the WRITTEN outputs: kept + rejected == input
    assert card["totals"]["n_docs"] == stats["n_kept"]
    assert card["funnel"]["input_docs"] == 4
    assert card["funnel"]["kept_docs"] == stats["n_kept"]
    assert sum(v["docs"] for v in card["funnel"]["rejected"].values()) \
        == sum(stats["rejected"].values())
    assert "split" in card["composition"]
    assert sum(g["docs"] for g in
               card["composition"]["split"]["groups"].values()) \
        == stats["n_kept"]
    assert "example.com" in card["top_domains"] \
        or "example.org" in card["top_domains"]


def test_extra_dims_composition(corpus, spark):
    df, _ = corpus
    tagged = df.withColumn(
        "lm_tier", F.when(F.col("doc_id") < 3, "head").otherwise("tail"))
    card = build_datacard(tagged, extra_dims=("lm_tier", "absent_col"))
    groups = card["composition"]["lm_tier"]["groups"]
    assert groups["head"]["docs"] == 3 and groups["tail"]["docs"] == 3
    assert "absent_col" not in card["composition"]


def test_null_reject_reason_serializes(corpus, spark):
    import json

    df, _ = corpus
    ledger = spark.createDataFrame(
        [(1, "lang"), (2, None)], "id long, reject_reason string")
    card = build_datacard(df, ledger)
    assert card["funnel"]["rejected"]["(null)"]["docs"] == 1
    json.dumps(card, sort_keys=True)   # must not TypeError on None key
