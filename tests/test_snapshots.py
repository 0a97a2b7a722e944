"""URL revisit / crawl-snapshot operators (operators/snapshots.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.snapshots import (crawl_diff,
                                                   dedup_revisits,
                                                   latest_snapshot,
                                                   revisit_stats)
from khl_pdf_ocr_spark.plans.inspect import count_exchanges, physical_plan

COLS = ["url", "warc_ts", "html", "lang"]


def _crawl(spark, rows):
    return spark.createDataFrame(rows, COLS)


@pytest.fixture()
def corpus(spark):
    # url A: 3 captures, content changes at ts 30
    # url B: 2 byte-identical recaptures
    # url C: single capture
    return _crawl(spark, [
        ("A", 10, b"a-v1", "en"),
        ("A", 20, b"a-v1", "en"),
        ("A", 30, b"a-v2", "en"),
        ("B", 11, b"b-v1", "ru"),
        ("B", 25, b"b-v1", "ru"),
        ("C", 12, b"c-v1", "en"),
    ])


def test_latest_snapshot_keeps_newest_per_url(corpus):
    out = {r["url"]: r for r in latest_snapshot(corpus).collect()}
    assert set(out) == {"A", "B", "C"}
    assert (out["A"]["warc_ts"], bytes(out["A"]["html"])) == (30, b"a-v2")
    assert (out["B"]["warc_ts"], bytes(out["B"]["html"])) == (25, b"b-v1")
    assert out["C"]["warc_ts"] == 12
    assert latest_snapshot(corpus).columns == COLS  # schema-preserving


def test_latest_snapshot_tie_break_deterministic(spark):
    df = _crawl(spark, [("A", 10, b"x", "en"), ("A", 10, b"y", "ru")])
    out = latest_snapshot(df, tie_cols=["lang"]).collect()
    assert len(out) == 1 and out[0]["lang"] == "ru"  # max over (ts, lang)


def test_dedup_revisits_collapses_identical_keeps_changes(corpus):
    out = dedup_revisits(corpus).orderBy("url", "warc_ts").collect()
    rows = [(r["url"], r["warc_ts"], bytes(r["html"]), r["n_dup_captures"])
            for r in out]
    assert rows == [
        ("A", 10, b"a-v1", 2),  # ts-20 identical recapture collapsed
        ("A", 30, b"a-v2", 1),  # genuine change survives
        ("B", 11, b"b-v1", 2),  # earliest capture wins
        ("C", 12, b"c-v1", 1),
    ]


def test_revisit_stats_profile(corpus):
    out = {r["url"]: r for r in revisit_stats(corpus).collect()}
    a, b, c = out["A"], out["B"], out["C"]
    assert (a["n_captures"], a["n_versions"], a["changed"]) == (3, 2, True)
    assert (a["first_ts"], a["last_ts"]) == (10, 30)
    assert (b["n_captures"], b["n_versions"], b["changed"]) == (2, 1, False)
    assert (c["n_captures"], c["n_versions"], c["changed"]) == (1, 1, False)


def test_crawl_diff_all_four_statuses(spark):
    old = _crawl(spark, [
        ("gone", 1, b"g", "en"),
        ("same", 2, b"s", "en"),
        ("edit", 3, b"before", "en"),
        ("edit", 4, b"after", "en"),   # old side newest = b"after"
    ])
    new = _crawl(spark, [
        ("same", 9, b"s", "en"),
        ("edit", 9, b"after2", "en"),
        ("born", 9, b"n", "en"),
    ])
    out = {r["url"]: r for r in crawl_diff(old, new).collect()}
    assert out["gone"]["status"] == "removed"
    assert out["same"]["status"] == "unchanged"
    assert out["edit"]["status"] == "changed"
    assert out["born"]["status"] == "added"
    assert out["gone"]["new_ts"] is None
    assert out["born"]["old_ts"] is None
    assert (out["edit"]["old_ts"], out["edit"]["new_ts"]) == (4, 9)


def test_crawl_diff_compares_newest_capture_only(spark):
    # old newest content == new newest content, even though an OLDER
    # old capture differs -> unchanged
    old = _crawl(spark, [("u", 1, b"v1", "en"), ("u", 5, b"v2", "en")])
    new = _crawl(spark, [("u", 9, b"v2", "en")])
    assert crawl_diff(old, new).collect()[0]["status"] == "unchanged"


def test_single_exchange_no_sort(corpus):
    # the scale contract: ONE hash shuffle, aggregate-based (map-side
    # partial), never a row_number window sort
    for df in (latest_snapshot(corpus), dedup_revisits(corpus),
               revisit_stats(corpus, approx=True)):
        assert count_exchanges(df) == 1, physical_plan(df)
        assert "Window" not in physical_plan(df)
    # exact distinct is Spark's two-phase expansion: (url, h) then url
    assert count_exchanges(revisit_stats(corpus)) == 2


def test_approx_stats_match_exact_here(corpus):
    exact = {r["url"]: r for r in revisit_stats(corpus).collect()}
    approx = {r["url"]: r for r in
              revisit_stats(corpus, approx=True).collect()}
    for u in exact:
        assert approx[u]["n_versions"] == exact[u]["n_versions"]
        assert approx[u]["changed"] == exact[u]["changed"]


def test_revisit_stats_never_shuffles_payload(corpus):
    # payload bytes are hashed before the exchange: no `html` column
    # appears in the post-shuffle aggregate output
    plan = physical_plan(revisit_stats(corpus))
    assert "xxhash64" in plan
    assert "html" not in plan.split("Exchange")[0], plan


def test_duckdb_parity_on_constructed_corpus(spark):
    # the driver-window construction in miniature: derive a revisit
    # corpus deterministically, then compare the full per-url profile
    # (+ the latest/dedup row sets) against an independent DuckDB
    # recomputation over the identical construction
    n = 240
    base = spark.range(n).select(
        F.concat(F.lit("https://s"), (F.col("id") % 80).cast("string"),
                 F.lit(".example.com/p")).alias("url"),
        (F.lit(1_600_000_000) + F.col("id") * 60).alias("warc_ts"),
        F.encode(
            F.when(F.col("id") % 3 == 2,
                   F.concat(F.lit("changed-"), F.col("id").cast("string")))
            .otherwise(F.concat(F.lit("stable-"),
                                (F.col("id") % 80).cast("string"))),
            "UTF-8").alias("html"),
        F.when(F.col("id") % 2 == 0, F.lit("en")).otherwise(F.lit("ru"))
        .alias("lang"))

    stats = (revisit_stats(base)
             .select("url", "n_captures", "n_versions", "first_ts",
                     "last_ts", "changed")
             .orderBy("url").collect())
    latest = (latest_snapshot(base)
              .select("url", "warc_ts",
                      F.decode("html", "UTF-8").alias("content"))
              .orderBy("url").collect())
    deduped = (dedup_revisits(base)
               .select("url", "warc_ts",
                       F.decode("html", "UTF-8").alias("content"),
                       "n_dup_captures")
               .orderBy("url", "warc_ts").collect())

    con = duckdb.connect()
    con.execute("""
        CREATE VIEW crawl AS
        SELECT 'https://s' || (i % 80) || '.example.com/p' AS url,
               1600000000 + i * 60 AS warc_ts,
               CASE WHEN i % 3 = 2 THEN 'changed-' || i
                    ELSE 'stable-' || (i % 80) END AS content
        FROM (SELECT unnest(range(240)) AS i)
    """)
    o_stats = con.execute("""
        SELECT url, count(*) AS n_captures,
               count(DISTINCT content) AS n_versions,
               min(warc_ts) AS first_ts, max(warc_ts) AS last_ts,
               count(DISTINCT content) > 1 AS changed
        FROM crawl GROUP BY url ORDER BY url
    """).fetchall()
    assert [tuple(r) for r in stats] == o_stats

    o_latest = con.execute("""
        SELECT url, max_by(warc_ts, warc_ts) AS warc_ts,
               max_by(content, warc_ts) AS content
        FROM crawl GROUP BY url ORDER BY url
    """).fetchall()
    assert [tuple(r) for r in latest] == o_latest

    o_dedup = con.execute("""
        SELECT url, min(warc_ts) AS warc_ts, content,
               count(*) AS n_dup_captures
        FROM crawl GROUP BY url, content ORDER BY url, warc_ts
    """).fetchall()
    assert [tuple(r) for r in deduped] == o_dedup
