"""Out-link extraction + host link graph (operators/links.py).

Oracle discipline: expected edge sets are hand-resolved per RFC 3986
(the pytest-level model used when no driver-query slot is available —
the 50-slot window is locked; see tests/test_urls.py for the fuzz
cross-check of the shared resolution helpers).
"""

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.links import (extract_outlinks,
                                               host_link_graph)

pytestmark = pytest.mark.usefixtures("spark")


def _edges(spark, rows, **kw):
    df = spark.createDataFrame(rows, "url string, html binary")
    return {(r["src"], r["dst"])
            for r in extract_outlinks(df, **kw).collect()}


def test_resolution_forms(spark):
    html = b"""<html><body>
      <a href="https://other.example.org/abs">absolute</a>
      <A HREF='//cdn.example.net/x.html'>scheme-relative</A>
      <a href=/root-rel>bare root-relative</a>
      <a href="sub/page.html">directory-relative</a>
      <a href="?page=2">query-only</a>
      <a href="mailto:x@example.com">mail</a>
      <a href="javascript:void(0)">js</a>
      <a href="#frag">fragment-only</a>
      <a href="/dup">first</a>
      <a href="/dup">second (deduped)</a>
      <a href="/a&amp;b">entity</a>
    </body></html>"""
    got = _edges(spark, [("https://example.com/dir/page.html", html)])
    assert got == {
        ("https://example.com/dir/page.html", "https://other.example.org/abs"),
        ("https://example.com/dir/page.html", "https://cdn.example.net/x.html"),
        ("https://example.com/dir/page.html", "https://example.com/root-rel"),
        ("https://example.com/dir/page.html",
         "https://example.com/dir/sub/page.html"),
        ("https://example.com/dir/page.html",
         "https://example.com/dir/page.html?page=2"),
        ("https://example.com/dir/page.html", "https://example.com/dup"),
        ("https://example.com/dir/page.html", "https://example.com/a&b"),
    }
    # fragment-only href resolves to the page itself -> dropped as self


def test_self_null_and_non_anchor(spark):
    html = (b'<a href="https://me.example.com/p">self</a>'
            b'<link rel="stylesheet" href="/style.css">'
            b'<img src="/i.png"><script src="/s.js"></script>'
            b'<a href="https://me.example.com/p#sec">self-after-defrag</a>')
    rows = [("https://me.example.com/p", html),
            ("https://null.example.com/", None)]
    assert _edges(spark, rows) == set()
    kept = _edges(spark, rows, drop_self=False)
    assert kept == {("https://me.example.com/p",
                     "https://me.example.com/p")}


def test_link_cap_bounds_page_work(spark):
    html = "".join(f'<a href="/p{i}">x</a>' for i in range(50)).encode()
    got = _edges(spark, [("https://cap.example.com/", html)],
                 max_links_per_page=10)
    assert got == {("https://cap.example.com/",
                    f"https://cap.example.com/p{i}") for i in range(10)}
    with pytest.raises(ValueError, match="max_links_per_page"):
        extract_outlinks(
            spark.createDataFrame([], "url string, html binary"),
            max_links_per_page=0)


def test_relative_href_on_non_http_page_dropped(spark):
    got = _edges(spark, [("ftp://files.example.com/dir/",
                          b'<a href="rel.html">r</a>'
                          b'<a href="https://abs.example.org/">a</a>')])
    assert got == {("ftp://files.example.com/dir/",
                    "https://abs.example.org/")}


def test_host_link_graph(spark):
    edges = spark.createDataFrame(
        [("https://a.example.com/1", "https://b.example.org/x"),
         ("https://www.a.example.com/2", "https://b.example.org/y"),
         ("https://a.example.com/3", "https://sub.a.example.com/4"),
         ("https://a.example.com/5", "not a url")],
        "src string, dst string")
    got = {(r["src"], r["dst"]) for r in host_link_graph(edges).collect()}
    assert got == {("example.com", "example.org")}


def test_outlinks_feed_pagerank(spark):
    from khl_pdf_ocr_spark.operators.graph import pagerank

    def page(host, links):
        body = "".join(f'<a href="{u}">l</a>' for u in links).encode()
        return (f"https://{host}/", body)

    rows = [page("a.com", ["https://b.com/", "https://c.com/"]),
            page("b.com", ["https://c.com/"]),
            page("c.com", ["https://a.com/"])]
    df = spark.createDataFrame(rows, "url string, html binary")
    hedges = host_link_graph(extract_outlinks(df))
    # pagerank wants long node ids: index the hosts deterministically
    hosts = sorted(r["h"] for r in
                   hedges.select(F.col("src").alias("h"))
                   .union(hedges.select("dst")).distinct().collect())
    nid = {h: i for i, h in enumerate(hosts)}
    lut = F.create_map(*[x for h, i in nid.items()
                         for x in (F.lit(h), F.lit(i))])
    e = hedges.select(lut[F.col("src")].cast("long").alias("src"),
                      lut[F.col("dst")].cast("long").alias("dst"))
    n = spark.createDataFrame([(i,) for i in nid.values()], "node long")
    ranks = {r["node"]: r["rank"]
             for r in pagerank(n, e, n_iter=10, id_col="node").collect()}
    assert len(ranks) == 3 and abs(sum(ranks.values()) - 1.0) < 1e-6
    # c.com has two in-links (a and b) -> highest rank
    assert ranks[nid["c.com"]] == max(ranks.values())


def test_outlinks_plan_shape(spark):
    # one pruned projection + Generate, no Exchange; the generator's
    # output list must not carry the html or the href array (the
    # chunk_documents generator-carry lesson)
    df = spark.createDataFrame(
        [("https://p.example.com/", b'<a href="/x">x</a>')],
        "url string, html binary")
    plan = extract_outlinks(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    gen = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert gen
    tail = gen[0].rsplit("], ", 1)[-1]
    assert "_hrefs" not in tail and "html" not in tail


def test_extract_cli_outlinks_sidecar(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    rows = [
        ("https://a.example.com/page",
         b'<p>body text here</p><a href="/next">n</a>'
         b'<a href="https://b.example.org/far">f</a>'),
        ("https://c.example.net/", None),
    ]
    docs = spark.createDataFrame(rows, "url string, html binary") \
        .withColumn("warc_ts", F.current_timestamp()) \
        .withColumn("text", F.lit(None).cast("string")) \
        .withColumn("lang", F.lit("en"))
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)

    out = str(tmp_path / "out")
    links = str(tmp_path / "links")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.cli",
         "--input", inp, "--output", out,
         "--outlinks", links, "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["outlinks_path"] == links
    assert stats["outlinks_edges"] == 2
    got = {(r["src"], r["dst"])
           for r in spark.read.parquet(links).collect()}
    assert got == {
        ("https://a.example.com/page", "https://a.example.com/next"),
        ("https://a.example.com/page", "https://b.example.org/far"),
    }

    r = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.cli",
         "--input", inp, "--output", str(tmp_path / "o2"),
         "--resume", "--outlinks", links],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 2 and "outlinks" in r.stderr


def _tedges(spark, rows, **kw):
    df = spark.createDataFrame(rows, "url string, html binary")
    return {(r["src"], r["dst"], r["anchor"])
            for r in extract_outlinks(df, with_text=True, **kw).collect()}


def test_outlinks_with_text_truth_table(spark):
    html = (b'<a href="https://o.example.org/a"> Spark  <b>Guide</b> </a>'
            b"<A HREF='/r'>r&amp;d &lt;x&gt;</A>"
            b'<a href="/img"><img src="/i.png"></a>'
            b'<a href="/two">first text</a>'
            b'<a href="/two">second text</a>'
            b'<a href="/two">first text</a>'
            b'<a href="/unclosed">no closing tag'
            b'<a href="mailto:x@example.com">mail</a>')
    got = _tedges(spark, [("https://p.example.com/d/", html)])
    p = "https://p.example.com"
    assert got == {
        # nested tag stripped, whitespace collapsed, trimmed
        (f"{p}/d/", "https://o.example.org/a", "Spark Guide"),
        # entities decoded; uppercase attrs fine
        (f"{p}/d/", f"{p}/r", "r&d <x>"),
        # image-only anchor -> empty text kept
        (f"{p}/d/", f"{p}/img", ""),
        # same dst under two texts -> both rows; exact repeat deduped.
        # the trailing unclosed <a> swallows up to the NEXT </a>, so
        # "/unclosed" resolves with the mail anchor's text (lazy match
        # boundary) and the mailto href never matches — the documented
        # well-formed-elements trade of with_text mode
        (f"{p}/d/", f"{p}/two", "first text"),
        (f"{p}/d/", f"{p}/two", "second text"),
        (f"{p}/d/", f"{p}/unclosed", "no closing tag mail"),
    }


def test_outlinks_with_text_truncates(spark):
    html = ('<a href="/t">' + "word " * 100 + "</a>").encode()
    got = _tedges(spark, [("https://p.example.com/", html)],
                  max_anchor_chars=10)
    ((_, _, anchor),) = got
    assert anchor == ("word " * 100).strip()[:10]


def test_outlinks_with_text_plan_shape(spark):
    # the generator's output must carry only the (dst, anchor) struct —
    # never html, the href array, or the text array (generator-carry)
    df = spark.createDataFrame(
        [("https://p.example.com/", b'<a href="/x">x</a>')],
        "url string, html binary")
    plan = extract_outlinks(df, with_text=True)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    gen = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert gen
    tail = gen[0].rsplit("], ", 1)[-1]
    for carried in ("_hrefs", "_texts", "_ms", "html"):
        assert carried not in tail


def test_anchor_text_profile(spark):
    from khl_pdf_ocr_spark.operators.links import anchor_text_profile

    edges = spark.createDataFrame(
        [("s1", "https://t.example.com/", "Apache Spark"),
         ("s2", "https://t.example.com/", "Apache Spark"),
         ("s3", "https://t.example.com/", "spark docs"),
         ("s3", "https://t.example.com/", "Apache Spark"),  # s3 twice
         ("s4", "https://t.example.com/", ""),              # image anchor
         # tie on count=1 -> lexicographically smallest text wins
         ("s1", "https://u.example.com/", "beta"),
         ("s2", "https://u.example.com/", "alpha"),
         # only empty texts -> NULL top_anchor, n_texts 0
         ("s1", "https://v.example.com/", ""),
         ("s2", "https://v.example.com/", None)],
        "src string, dst string, anchor string")
    got = {r["dst"]: r.asDict()
           for r in anchor_text_profile(edges).collect()}
    t = got["https://t.example.com/"]
    assert (t["n_refs"], t["n_srcs"], t["n_texts"]) == (5, 4, 2)
    assert (t["top_anchor"], t["top_anchor_refs"]) == ("Apache Spark", 3)
    u = got["https://u.example.com/"]
    assert (u["top_anchor"], u["top_anchor_refs"]) == ("alpha", 1)
    assert (u["n_refs"], u["n_srcs"], u["n_texts"]) == (2, 2, 2)
    v = got["https://v.example.com/"]
    assert v["top_anchor"] is None
    assert (v["n_refs"], v["n_srcs"], v["n_texts"],
            v["top_anchor_refs"]) == (2, 2, 0, 0)


def test_with_text_single_scan_parity(spark):
    # r6: with_text extracts the full match once (group 0) and pulls
    # groups 1/2 per element from the short matched substring.  Parity
    # oracle = the r5 two-full-page-scan form, on adversarial html:
    # wrapped tags, uppercase attrs, entities, unclosed anchors whose
    # lazy boundary swallows following anchors, bare hrefs, block-level
    # link cards, whitespace-heavy attributes.
    from khl_pdf_ocr_spark.operators.links import (_A_HREF_TEXT_RE,
                                                   _clean_anchor,
                                                   extract_outlinks)
    from khl_pdf_ocr_spark.functions.urls import resolve_href, url_parts

    html = (b'<a href="https://o.example.org/a"> A <b>B</b> </a>'
            b"<A\n  HREF = '/wrapped'\n  class='x'> wrapped\ntag </A>"
            b'<a href=/bare>bare</a>'
            b'<a href="/unclosed">u1 <a href="/u2">u2</a>'
            b'<a href="/x" title="a>b">odd quote</a>'
            b'<a href="/y"></a  >'
            b'plain text <a href="#frag">frag only</a>')
    rows = [("https://p.example.com/dir/page", html),
            ("https://p.example.com/", b"no anchors at all"),
            ("https://p.example.com/n", None)]
    df = spark.createDataFrame(
        [(u, h) for u, h in rows], "url string, html binary")

    got = {tuple(r) for r in extract_outlinks(df, with_text=True).collect()}

    # reference: the r5 two-scan construction, verbatim
    pat = _A_HREF_TEXT_RE
    u, s = F.col("url"), F.col("html").cast("string")
    staged = df.select(
        u.alias("src"),
        F.slice(F.regexp_extract_all(s, F.lit(pat), 1), 1, 1000).alias("_hrefs"),
        F.slice(F.regexp_extract_all(s, F.lit(pat), 2), 1, 1000).alias("_texts"),
        url_parts(u).alias("_up"))
    resolved = F.transform(
        F.col("_hrefs"),
        lambda h: resolve_href(
            F.regexp_replace(F.replace(h, F.lit("&amp;"), F.lit("&")),
                             r"#.*$", ""), F.col("_up")))
    cleaned = F.transform(F.col("_texts"), lambda t: _clean_anchor(t, 200))
    pairs = F.array_distinct(F.filter(
        F.arrays_zip(resolved.alias("dst"), cleaned.alias("anchor")),
        lambda p: p["dst"].isNotNull() & (p["dst"] != "")))
    want = {tuple(r) for r in
            (staged.select("src", F.explode(pairs).alias("_p"))
             .select("src", F.col("_p.dst").alias("dst"),
                     F.col("_p.anchor").alias("anchor"))
             .filter(F.col("dst") != F.col("src"))).collect()}
    assert got == want and got  # non-empty and identical
