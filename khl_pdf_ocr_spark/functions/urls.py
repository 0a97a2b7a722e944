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

__all__ = ["canonical_url", "url_host", "registered_domain",
           "url_parts", "resolve_href",
           "TRACKING_PARAM_RE", "SECOND_LEVEL_SUFFIXES"]

# tracking params dropped during canonicalization (lowercased names)
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid)="

# Common two-level public suffixes for the registered-domain HEURISTIC
# below.  This is deliberately a small disclosed list, not a vendored
# copy of the full Mozilla Public Suffix List: the long tail of exotic
# suffixes mis-groups a negligible corpus fraction, and callers with a
# PSL on hand can pass their own set.
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tr", "com.ar", "co.za", "com.sg", "com.hk",
)


def url_host(col: Column) -> Column:
    """Lowercased host of an absolute URL, userinfo and port stripped —
    the grouping key for per-site aggregation.  Non-URL strings (no
    ``://``) yield an empty string (stable garbage, never NULL — and
    the domain-cap operators EXEMPT the empty pseudo-domain so
    unparseable urls are never collectively capped)."""
    rest = F.regexp_replace(col, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    has_scheme = col.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    # drop userinfo ('user:pass@') — [^/?#]* cannot cross the authority
    # boundary, so this only strips inside the authority component
    no_user = F.regexp_replace(rest, r"^[^/?#]*@", "")
    host = F.lower(F.regexp_extract(no_user, r"^([^/?#:]*)", 1))
    return F.when(has_scheme, host).otherwise(F.lit(""))


def registered_domain(col: Column,
                      second_level: tuple[str, ...] = SECOND_LEVEL_SUFFIXES
                      ) -> Column:
    """Registrable domain (eTLD+1 heuristic) of a URL column — the unit
    web corpora balance on (one site = one publisher, whatever its
    subdomain layout).

    Heuristic: the last TWO host labels, or the last THREE when the
    last two are a known two-level public suffix
    (``SECOND_LEVEL_SUFFIXES``); IPv4 hosts and one-label hosts pass
    through whole.  Pure built-in expressions — one JVM projection, no
    UDF, no shuffle.
    """
    host = url_host(col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    last3 = F.concat_ws(".", F.slice(labels, F.greatest(n - 2, F.lit(1)), 3))
    is_ip = host.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    return (F.when(is_ip | (n <= 2), host)
            .when(last2.isin(*second_level), last3)
            .otherwise(last2))


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


def url_parts(url: Column) -> Column:
    """``struct(scheme, origin, path, dir, ok)`` of a fetch URL — the
    pre-computed pieces href resolution needs, staged ONCE per page so
    per-href resolution (``resolve_href``) is attribute reads, not
    re-parsing the page url per link.

    ``path`` excludes query/fragment; ``dir`` is the path through its
    last ``/`` (a bare-origin url has directory ``/``); ``ok`` is True
    for http(s) pages — the only ones relative hrefs can resolve
    against."""
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    origin = F.concat(scheme, F.lit("://"), F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    pdir = F.when(path.rlike("/"),
                  F.regexp_replace(path, r"[^/]*$", "")) \
            .otherwise(F.lit("/"))
    return F.struct(scheme.alias("scheme"), origin.alias("origin"),
                    path.alias("path"), pdir.alias("dir"),
                    scheme.isin("http", "https").alias("ok"))


def resolve_href(href: Column, parts: Column) -> Column:
    """RFC-3986-lite resolution of an in-page href against
    ``url_parts(page_url)`` — shared by ``licensing.canonical_link``
    (one declared link per page) and ``links.extract_outlinks`` (every
    anchor on the page, bound inside a ``transform`` lambda).

    Absolute ``http(s)://`` hrefs pass through; scheme-relative
    ``//host/...`` takes the page's scheme; root-relative ``/path``
    and query-only ``?q`` join the page's origin/path; any other
    relative href joins the page's directory.  Non-fetchable schemes
    (``javascript:``, ``data:``, ``mailto:`` …), empty hrefs, and
    unresolvable cases (relative href on a non-http(s) page url)
    yield NULL.  Dot-segments (``../``) are NOT resolved — the
    downstream ``canonical_url`` normalizer treats them textually."""
    null = F.lit(None).cast("string")
    is_abs = href.rlike(r"^[Hh][Tt][Tt][Pp][Ss]?://")
    has_other_scheme = href.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:")
    return (F.when(href == "", null)
            .when(is_abs, href)
            .when(has_other_scheme, null)
            .when(~parts["ok"], null)
            .when(href.startswith("//"),
                  F.concat(parts["scheme"], F.lit(":"), href))
            .when(href.startswith("/"), F.concat(parts["origin"], href))
            .when(href.startswith("?"),
                  F.concat(parts["origin"],
                           F.when(parts["path"] == "", F.lit("/"))
                            .otherwise(parts["path"]), href))
            .otherwise(F.concat(parts["origin"], parts["dir"], href)))
