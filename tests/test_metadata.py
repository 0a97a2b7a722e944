"""Page-metadata sidecar (operators/metadata.py)."""

import datetime

import duckdb
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.metadata import page_metadata
from khl_pdf_ocr_spark.plans.inspect import count_exchanges


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8") if h is not None else None)
         for u, h in rows], "url string, html binary")


def test_fields_extracted(spark):
    df = _pages(spark, [
        ("a", "<html><head><title> Hello \n World </title>"
              '<meta property="og:title" content="OG Hello">'
              '<meta property="article:published_time" '
              'content="2024-03-05T10:00:00Z">'
              '<meta name="author" content="Jane Doe"></head></html>'),
        ("b", '<META CONTENT="Rev Order" PROPERTY="og:title">'
              '<meta name="date" content="2023-12-31">'),
        ("c", "<time datetime='2022-01-02T08:00:00'>Jan 2</time>"),
        ("d", "<p>no metadata at all</p>"),
        ("e", None),
    ])
    out = {r["url"]: r for r in page_metadata(df).collect()}
    a = out["a"]
    assert a["title"] == "Hello World"          # squashed whitespace
    assert a["og_title"] == "OG Hello"
    assert a["pub_date"] == "2024-03-05T10:00:00Z"
    assert a["pub_date_parsed"] == datetime.date(2024, 3, 5)
    assert a["byline"] == "Jane Doe"
    b = out["b"]
    assert b["og_title"] == "Rev Order"          # content-first order
    assert b["pub_date"] == "2023-12-31"
    assert b["pub_date_parsed"] == datetime.date(2023, 12, 31)
    c = out["c"]
    assert c["pub_date"] == "2022-01-02T08:00:00"  # <time> fallback
    assert c["pub_date_parsed"] == datetime.date(2022, 1, 2)
    for f in ("title", "og_title", "pub_date", "pub_date_parsed", "byline"):
        assert out["d"][f] is None
        assert out["e"][f] is None


def test_garbage_date_never_errors(spark):
    df = _pages(spark, [
        ("x", '<meta name="date" content="sometime last week">')])
    r = page_metadata(df).collect()[0]
    assert r["pub_date"] == "sometime last week"
    assert r["pub_date_parsed"] is None          # try_to_date, no ANSI error


def test_priority_order(spark):
    # article:published_time beats name=date beats <time>
    df = _pages(spark, [
        ("x", '<meta property="article:published_time" content="2024-01-01">'
              '<meta name="date" content="2020-01-01">'
              "<time datetime='2010-01-01'>old</time>")])
    assert page_metadata(df).collect()[0]["pub_date"] == "2024-01-01"


def test_pure_projection_no_shuffle(spark):
    df = _pages(spark, [("a", "<title>t</title>")])
    out = page_metadata(df)
    assert count_exchanges(out) == 0


def test_duckdb_parity(spark):
    # the snapshots-test pattern: both engines run their OWN regex
    # extraction over the same constructed pages
    n = 60
    pages = spark.range(n).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.encode(F.concat(
            F.lit("<html><title>Doc "), F.col("id").cast("string"),
            F.lit("</title><meta property=\"og:title\" content=\"T"),
            F.col("id").cast("string"),
            F.lit("\"><meta name=\"date\" content=\"2024-01-"),
            F.lpad((F.col("id") % 28 + 1).cast("string"), 2, "0"),
            F.lit("\"></html>")), "UTF-8").alias("html"))
    got = sorted((r["url"], r["title"], r["og_title"], r["pub_date"],
                  str(r["pub_date_parsed"]))
                 for r in page_metadata(pages).collect())
    want = sorted(duckdb.sql("""
        WITH pages AS (
          SELECT 'u' || i AS url,
                 '<html><title>Doc ' || i || '</title>'
                 || '<meta property="og:title" content="T' || i || '">'
                 || '<meta name="date" content="2024-01-'
                 || lpad((i % 28 + 1)::VARCHAR, 2, '0') || '"></html>'
                   AS html
          FROM (SELECT unnest(range(60)) AS i)
        )
        SELECT url,
               regexp_extract(html, '<title[^>]*>(.*?)</title>', 1) AS title,
               regexp_extract(html,
                 'property="og:title" content="([^"]*)"', 1) AS og_title,
               regexp_extract(html,
                 'name="date" content="([^"]*)"', 1) AS pub_date,
               CAST(regexp_extract(html,
                 'name="date" content="([^"]*)"', 1) AS DATE)::VARCHAR
                   AS pub_date_parsed
        FROM pages
    """).fetchall())
    assert got == want


def test_embedded_apostrophes_and_quotes(spark):
    # quote-specific content patterns: an apostrophe inside a
    # double-quoted value (and vice versa) must not truncate
    df = _pages(spark, [
        ("a", '<meta name="author" content="O\'Brien">'),
        ("b", "<meta name='author' content='Jane \"JD\" Doe'>"),
        ("c", '<meta property="og:title" content="It\'s a Test">'),
    ])
    out = {r["url"]: r for r in page_metadata(df).collect()}
    assert out["a"]["byline"] == "O'Brien"
    assert out["b"]["byline"] == 'Jane "JD" Doe'
    assert out["c"]["og_title"] == "It's a Test"


def test_quoted_gate_equals_bare_gate(spark):
    # r6: _meta's pregate moved from bare tokens ('date') to the four
    # quoted-value needles.  The gate must be a NECESSARY condition of
    # the regex — adversarial corpus: near-miss tokens (datetime,
    # updated, JSON "datePublished"), whitespace around '=', mismatched
    # quotes, either attribute order, either content quote style.
    rows = [
        ("g1", '<meta name="date" content="2024-01-02">'),
        ("g2", "<meta name='date' content='2024-02-03'>"),
        ("g3", '<meta content="2024-03-04" name="date">'),
        ("g4", '<meta name = "date" content="2024-04-05">'),   # ws around =
        ("g5", '<meta name="date\' content="2024-05-06">'),    # mismatched
        ("g6", '<meta name="author" content="A. Writer">'),
        ("n1", '<time datetime="2024-06-07">x</time>'),        # datetime only
        ("n2", "<p>updated yesterday, date unknown</p>"),      # bare tokens
        ("n3", '<script>{"datePublished":"2024-07-08"}</script>'),
        ("n4", '<meta name="dates" content="plural">'),
        ("n5", None),
    ]
    df = _pages(spark, rows)
    out = {r["url"]: r for r in page_metadata(df).collect()}
    # pages whose regex should hit still hit…
    assert out["g1"]["pub_date"] == "2024-01-02"
    assert out["g2"]["pub_date"] == "2024-02-03"
    assert out["g3"]["pub_date"] == "2024-03-04"
    assert out["g4"]["pub_date"] == "2024-04-05"
    assert out["g5"]["pub_date"] == "2024-05-06"
    assert out["g6"]["byline"] == "A. Writer"
    # …near-miss tokens fall to the <time> fallback / NULL as before
    assert out["n1"]["pub_date"] == "2024-06-07"   # via <time>, not meta
    assert out["n2"]["pub_date"] is None
    assert out["n3"]["pub_date"] is None
    assert out["n4"]["pub_date"] is None
    assert out["n4"]["byline"] is None
