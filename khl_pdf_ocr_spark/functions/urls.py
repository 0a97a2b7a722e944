"""URL canonicalization — the dedup key normalizer of a web-crawl
pipeline (the same url may appear with tracking params, default ports,
case-shifted hosts, fragments...).

Pure built-in expressions (single JVM projection, no UDF):

1. lowercase scheme + host;
2. drop the fragment (``#...``);
3. drop default ports (``:80`` http, ``:443`` https);
4. strip tracking query parameters (``utm_*``, ``fbclid``, ``gclid``);
5. SORT the surviving query parameters (param order is not identity);
6. drop a trailing ``/`` on the path (but keep a bare ``/`` root);
7. empty query/``?`` dropped entirely.

Semantics are cross-checked against a Python ``urllib``-based model on
a seeded fuzz corpus in tests/test_urls.py — the pytest-level oracle
discipline used when no driver-query slot is available.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonical_url", "TRACKING_PARAM_RE"]

# tracking params dropped during canonicalization (lowercased names)
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid)="


def canonical_url(col: Column) -> Column:
    """Canonical form of an absolute http(s) URL column.

    Non-URL strings (no ``://``) pass through with only fragment
    stripping — garbage in, stable garbage out, never a NULL surprise
    in the dedup key.
    """
    no_frag = F.regexp_replace(col, r"#.*$", "")

    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    pathq = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))

    host = F.lower(hostport)
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")) \
        .when(scheme == "https", F.regexp_replace(host, r":443$", "")) \
        .otherwise(host)

    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.when(pathq.contains("?"),
                   F.regexp_replace(pathq, r"^[^?]*\?", "")).otherwise(F.lit(""))

    # path: collapse a trailing slash (but keep the bare root "/")
    path = F.when(path == "", F.lit("/")) \
        .otherwise(F.regexp_replace(path, r"(.)/$", "$1"))

    # query: split on &, drop empties + tracking params, sort, rejoin
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0)
        & ~F.lower(p).rlike(TRACKING_PARAM_RE)
        & ~F.lower(p).rlike(TRACKING_PARAM_RE.replace("=", "$")))
    sorted_q = F.concat_ws("&", F.sort_array(params))

    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(F.length(sorted_q) > 0,
               F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")))
    return F.when(scheme == "", no_frag).otherwise(canon)
