"""URL canonicalization vs an independent Python urllib model."""

from __future__ import annotations

import random
import re
from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions.urls import TRACKING_PARAM_RE, canonical_url

_TRACK = re.compile(TRACKING_PARAM_RE.replace("=", "(=|$)"))


def _model(u: str) -> str:
    """Reference canonicalizer built on urllib — an implementation the
    Spark expression shares no code with."""
    u = u.split("#", 1)[0]
    if "://" not in u:
        return u
    s = urlsplit(u)
    scheme = s.scheme.lower()
    host = s.netloc.lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    if scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path = s.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    params = [p for p in s.query.split("&")
              if p and not _TRACK.match(p.lower())]
    q = "&".join(sorted(params))
    return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")


CASES = [
    "HTTP://Example.COM:80/a/b/?x=2&utm_source=news&a=1#frag",
    "https://example.com:443/",
    "https://example.com",
    "https://example.com/path/",
    "https://example.com/path//",
    "http://example.com/?",
    "http://example.com/?utm_campaign=x",
    "http://example.com/?b=2&a=1&a=0",
    "https://EXAMPLE.com/Path/Is/CaseSensitive",
    "http://example.com:8080/keep-port",
    "ftp://example.com:80/no-default-for-ftp",
    "not a url at all#tail",
    "https://example.com/a?fbclid=abc&gclid=1&keep=yes",
    "http://example.com/a?x=%20%2F&y=+",
]


def test_canonical_url_matches_urllib_model(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)],
                               ["i", "u"])
    got = {r["i"]: r["c"] for r in
           df.select("i", canonical_url(F.col("u")).alias("c")).collect()}
    for i, c in enumerate(CASES):
        assert got[i] == _model(c), (c, got[i], _model(c))


def test_canonical_url_fuzz(spark):
    rng = random.Random(13)
    hosts = ["Example.com", "SUB.site.ORG:80", "x.io:443", "y.net:8443"]
    paths = ["", "/", "/a", "/a/b/", "/A/B", "/p%20q/"]
    qs = ["", "?a=1", "?b=2&a=1", "?utm_source=z&a=1", "?a=1&a=0&fbclid=q",
          "?gclid=1", "?z="]
    frs = ["", "#f", "#a/b?c=1"]
    cases = []
    for _ in range(250):
        cases.append(rng.choice(["http", "https", "HTTP", "Https"]) + "://"
                     + rng.choice(hosts) + rng.choice(paths)
                     + rng.choice(qs) + rng.choice(frs))
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               ["i", "u"])
    got = {r["i"]: r["c"] for r in
           df.select("i", canonical_url(F.col("u")).alias("c")).collect()}
    bad = [(c, got[i], _model(c)) for i, c in enumerate(cases)
           if got[i] != _model(c)]
    assert not bad, bad[:3]


def test_canonical_url_collapses_dup_variants(spark):
    variants = [
        "https://news.example.com/story/42?utm_source=tw",
        "HTTPS://NEWS.example.com:443/story/42",
        "https://news.example.com/story/42/",
        "https://news.example.com/story/42#comments",
    ]
    df = spark.createDataFrame([(v,) for v in variants], ["u"])
    n = df.select(canonical_url(F.col("u")).alias("c")) \
          .distinct().count()
    assert n == 1
