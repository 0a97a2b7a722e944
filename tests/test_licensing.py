"""License-aware corpus construction (operators/licensing.py): tag
detection, the allow-list filter's NULL policy, and the clean_cli
--allow-licenses surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.licensing import (filter_by_license,
                                                   license_tag,
                                                   with_license_tag)

PAGES = [
    (0, b'<a rel="license" href="https://creativecommons.org/'
        b'licenses/by/4.0/">CC BY</a>', "cc-by"),
    (1, b'<a href="http://creativecommons.org/licenses/by-nc-nd/3.0/">'
        b'x</a>', "cc-by-nc-nd"),
    (2, b'<a rel=license href="https://example.com/terms">terms</a>',
     "other-license"),
    (3, b'<a href="https://creativecommons.org/publicdomain/zero/1.0/">'
        b'CC0</a>', "cc0"),
    (4, b'<a href="https://CREATIVECOMMONS.ORG/publicdomain/mark/1.0/">'
        b'PD</a>', "public-domain-mark"),
    (5, b"<html><body>all rights reserved</body></html>", None),
    (6, None, None),
]


def test_license_tag_detection(spark):
    df = spark.createDataFrame([(i, h) for i, h, _ in PAGES],
                               "doc_id long, html binary")
    got = {r["doc_id"]: r["license"]
           for r in with_license_tag(df).collect()}
    assert got == {i: want for i, _, want in PAGES}


def test_filter_by_license_policies(spark):
    df = spark.createDataFrame(
        [(0, "cc-by"), (1, "cc-by-nc-nd"), (2, None), (3, "cc0")],
        "doc_id long, license string")
    kept, ledger = filter_by_license(df, ("cc-by", "cc0"))
    assert {r["doc_id"] for r in kept.collect()} == {0, 3}
    led = {(r["id"], r["reject_reason"]) for r in ledger.collect()}
    assert led == {(1, "license"), (2, "license")}   # NULL drops

    kept2, ledger2 = filter_by_license(df, ("cc-by", "cc0"),
                                       keep_untagged=True)
    assert {r["doc_id"] for r in kept2.collect()} == {0, 2, 3}
    assert {r["id"] for r in ledger2.collect()} == {1}
    # conservation under both policies
    assert kept.count() + ledger.count() == 4
    assert kept2.count() + ledger2.count() == 4

    with pytest.raises(ValueError, match="empty"):
        filter_by_license(df, ("", "  "))


def test_clean_cli_allow_licenses(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    base = ("the quick brown fox jumps over the lazy dog and it was a "
            "good day for all of them in the field near the old house")
    html = {
        "cc-by": b'<a href="https://creativecommons.org/licenses/by/4.0/">l</a>',
        "cc0": b'<a href="https://creativecommons.org/publicdomain/zero/1.0/">l</a>',
        "cc-by-nc": b'<a href="https://creativecommons.org/licenses/by-nc/4.0/">l</a>',
        None: b"<p>no declaration</p>",
    }
    rows = [(i, base + f" extra {i}", "s", h)
            for i, h in enumerate(html.values())]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, html binary")
    inp = str(tmp_path / "docs")
    # tag at ingest, while the html is in hand (the operator's contract)
    with_license_tag(docs).drop("html").write.parquet(inp)

    out = str(tmp_path / "cleaned")
    cardp = str(tmp_path / "card.json")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95",
         "--allow-licenses", "cc-by,cc0",
         "--datacard", cardp, "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    # cc-by-nc and the untagged page drop; cc-by + cc0 survive cleaning
    assert stats["rejected"].get("license") == 2
    assert stats["n_kept"] == 2
    kept = spark.read.parquet(f"{out}/kept")
    assert {r["license"] for r in kept.collect()} == {"cc-by", "cc0"}
    card = json.load(open(cardp))
    assert set(card["composition"]["license"]["groups"]) \
        == {"cc-by", "cc0"}
    assert card["funnel"]["rejected"]["license"]["docs"] == 2

    # --keep-untagged flips the NULL policy
    q = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", str(tmp_path / "c2"),
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95",
         "--allow-licenses", "cc-by,cc0", "--keep-untagged",
         "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert q.returncode == 0, q.stderr[-2000:]
    qs = json.loads([ln for ln in q.stdout.splitlines()
                     if ln.startswith("{")][-1])
    assert qs["rejected"].get("license") == 1 and qs["n_kept"] == 3
    # flag pairing
    r = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", str(tmp_path / "c3"),
         "--keep-untagged"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 2 and "allow-licenses" in r.stderr


def test_robots_noindex_detection_and_filter(spark):
    from khl_pdf_ocr_spark.operators.licensing import (filter_noindex,
                                                       robots_noindex)

    rows = [
        (0, b'<meta name="robots" content="noindex, nofollow">'),
        (1, b"<meta name=robots content=noindex>"),
        (2, b'<META NAME="ROBOTS" CONTENT="NOINDEX">'),
        (3, b'<meta content="noindex" name="robots">'),   # reversed
        (4, b'<meta name="robots" content="index, follow">'),
        (5, b'<meta name="viewport" content="noindex-lookalike">'),
        (6, b"<p>no meta at all</p>"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {r["doc_id"]: r["f"]
           for r in df.select("doc_id",
                              robots_noindex(F.col("html")).alias("f"))
           .collect()}
    assert got == {0: True, 1: True, 2: True, 3: True,
                   4: False, 5: False, 6: False, 7: None}
    kept, ledger = filter_noindex(df)
    assert {r["doc_id"] for r in kept.collect()} == {4, 5, 6, 7}
    assert {(r["id"], r["reject_reason"]) for r in ledger.collect()} \
        == {(i, "robots_noindex") for i in (0, 1, 2, 3)}


def test_increment_cli_allow_licenses(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    base = ("the quick brown fox jumps over the lazy dog and it was a "
            "good day for all of them in the field near the old house")
    rows = [(0, base + " alpha", "cc-by"), (1, base + " beta", "cc-by-nc"),
            (2, base + " gamma", None), (3, base + " delta", "cc0")]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, license string") \
        .write.parquet(inp)
    out, state = str(tmp_path / "inc"), str(tmp_path / "state")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", inp, "--state", state, "--output", out,
         "--increment-id", "d1", "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95",
         "--allow-licenses", "cc-by,cc0", "--cpus", "4"],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-3000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["rejected"].get("license") == 2
    assert stats["n_kept"] == 2
    kept = spark.read.parquet(f"{out}/kept")
    assert {r["license"] for r in kept.collect()} == {"cc-by", "cc0"}


def test_canonical_link_extraction_and_resolution(spark):
    from khl_pdf_ocr_spark.operators.licensing import canonical_link

    U = "https://example.com/a/b/page.html?x=1"
    rows = [
        # absolute href, rel-first / href-first, quoting variants
        (0, b'<link rel="canonical" href="https://example.com/real">', U,
         "https://example.com/real"),
        (1, b"<link href='HTTP://other.com/p' rel=canonical>", U,
         "HTTP://other.com/p"),
        (2, b"<LINK REL=CANONICAL HREF=https://up.example/x>", U,
         "https://up.example/x"),
        # scheme-relative, root-relative, query-only, bare-relative
        (3, b'<link rel="canonical" href="//cdn.example.com/c">', U,
         "https://cdn.example.com/c"),
        (4, b'<link rel="canonical" href="/root/p">', U,
         "https://example.com/root/p"),
        (5, b'<link rel="canonical" href="?page=1">', U,
         "https://example.com/a/b/page.html?page=1"),
        (6, b'<link rel="canonical" href="sibling.html">', U,
         "https://example.com/a/b/sibling.html"),
        # &amp; entity decoded; other tags' hrefs never match
        (7, b'<link rel="stylesheet" href="a.css">'
            b'<link rel="canonical" href="/p?a=1&amp;b=2">', U,
         "https://example.com/p?a=1&b=2"),
        # non-fetchable scheme, no declaration, NULL html
        (8, b'<link rel="canonical" href="javascript:void(0)">', U, None),
        (9, b"<p>nothing declared</p>", U, None),
        (10, None, U, None),
        # relative href on an unparseable page url -> NULL, never garbage
        (11, b'<link rel="canonical" href="x.html">', "not a url", None),
        # rel token must be exactly 'canonical'
        (12, b'<link rel="canonicalish" href="https://e.com/x">', U, None),
    ]
    df = spark.createDataFrame([(i, h, u) for i, h, u, _ in rows],
                               "doc_id long, html binary, url string")
    got = {r["doc_id"]: r["c"]
           for r in df.select("doc_id",
                              canonical_link(F.col("html"),
                                             F.col("url")).alias("c"))
           .collect()}
    assert got == {i: want for i, _, _, want in rows}


def test_page_signals_one_projection(spark):
    from khl_pdf_ocr_spark.operators.licensing import page_signals

    rows = [
        ("https://a.com/p",
         b'<link rel="canonical" href="https://a.com/real">'
         b'<a rel="license" href="https://creativecommons.org/licenses/by/4.0/">l</a>'),
        ("https://b.com/q",
         b'<meta name="robots" content="noindex">'),
        ("https://c.com/r", None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary") \
        .withColumn("zz_unused_col", F.lit("pruned"))
    sig = page_signals(df)
    assert sig.columns == ["url", "license", "noindex", "canonical_of"]
    got = {r["url"]: (r["license"], r["noindex"], r["canonical_of"])
           for r in sig.collect()}
    assert got["https://a.com/p"] == ("cc-by", False, "https://a.com/real")
    assert got["https://b.com/q"] == (None, True, None)
    assert got["https://c.com/r"] == (None, None, None)
    # the projection reads only (url, html): every other input column
    # is pruned at the scan
    plan = sig._jdf.queryExecution().optimizedPlan().toString()
    assert "zz_unused_col" not in plan


def test_extract_cli_signals_and_honor_noindex(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    html_ok = (b"<html><body><p>" +
               " ".join(f"word{i} of the body" for i in range(40)).encode() +
               b"</p><div><a href='/x'>nav</a></div></body></html>")
    html_no = b'<meta name="robots" content="noindex">' + html_ok
    rows = [
        ("https://keep.example/a", html_ok),
        ("https://drop.example/b", html_no),
        ("https://null.example/c", None),
    ]
    docs = spark.createDataFrame(rows, "url string, html binary") \
        .withColumn("warc_ts", F.current_timestamp()) \
        .withColumn("text", F.lit(None).cast("string")) \
        .withColumn("lang", F.lit("en"))
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)

    out = str(tmp_path / "out")
    sig = str(tmp_path / "signals")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.cli",
         "--input", inp, "--output", out,
         "--signals", sig, "--honor-noindex", "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["noindex_dropped"] == 1
    assert stats["signals_path"] == sig
    # signals table is the COMPLETE audit (dropped page included)
    sigdf = spark.read.parquet(sig)
    got = {r["url"]: r["noindex"] for r in sigdf.collect()}
    assert got == {"https://keep.example/a": False,
                   "https://drop.example/b": True,
                   "https://null.example/c": None}
    # the extraction output excludes the opted-out page
    urls = {r["url"]
            for r in spark.read.parquet(f"{out}/data").collect()}
    assert "https://drop.example/b" not in urls
    assert "https://keep.example/a" in urls

    # flag pairing: --resume rejects the signal flags loudly
    r = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.cli",
         "--input", inp, "--output", str(tmp_path / "o2"),
         "--resume", "--honor-noindex"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 2 and "honor-noindex" in r.stderr


def test_page_signals_equals_standalone_signals(spark):
    """The staged/gated fast path in page_signals must be output-
    identical to the three standalone signal expressions — the
    equivalence gate for the BENCH §4.21 rewrite."""
    from khl_pdf_ocr_spark.operators.licensing import (canonical_link,
                                                       license_tag,
                                                       page_signals,
                                                       robots_noindex)

    rows = [
        ("u0", b'<a rel="license" href="https://creativecommons.org/licenses/by/4.0/">x</a>'),
        ("u1", b'<a href="http://creativecommons.org/licenses/by-nc-nd/3.0/">x</a>'),
        ("u2", b'<a rel=license href="https://example.com/terms">terms</a>'),
        ("u3", b'<a href="https://creativecommons.org/publicdomain/zero/1.0/">x</a>'),
        ("u4", b'<a href="https://CREATIVECOMMONS.ORG/publicdomain/mark/1.0/">x</a>'),
        # contains the CC host but no extractable code -> falls through
        # to the rel=license branch
        ("u5", b'see creativecommons.org/ and <a rel="license" href="/t">t</a>'),
        ("u6", b"plain text mentioning license words but no rel link"),
        ("u7", None),
        ("u8", b'<meta name="robots" content="noindex">'),
        ("u9", b'<meta content="noindex" name="robots">'),
        ("u10", b"noindex mentioned in prose, not a meta tag"),
        ("u11", b'<link rel="canonical" href="https://ex.com/real">'),
        ("u12", b'<LINK REL=CANONICAL HREF=/abs>'),
        ("u13", b"the word canonical without a link tag"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    fast = {r["url"]: (r["license"], r["noindex"], r["canonical_of"])
            for r in page_signals(df).collect()}
    ref = {r["url"]: (r["license"], r["noindex"], r["canonical_of"])
           for r in df.select(
               "url",
               license_tag(F.col("html")).alias("license"),
               robots_noindex(F.col("html")).alias("noindex"),
               canonical_link(F.col("html"), F.col("url"))
               .alias("canonical_of")).collect()}
    assert fast == ref
    assert ref["u5"] == ("other-license", False, None)
    assert ref["u10"][1] is False and ref["u13"][2] is None
