"""Ingest policy signals — the machine-readable declarations a page
makes about itself, read while the raw html is still in hand: license
links (openly-licensed corpus construction), ``robots noindex``
opt-outs (publisher exclusion compliance), and ``rel=canonical``
declarations (the page's own statement of which URL is the real one —
the strongest duplicate signal the web offers, ahead of any text
hashing).

The reference service has no corpus surface; this belongs to the
large-scale training-data layer around the extraction kernel.  All
detection here is the web's machine-readable convention, not NLP:

* Creative Commons pages declare themselves with a link to
  ``creativecommons.org/licenses/<code>/<version>/`` (usually
  ``rel="license"`` — RFC 8288's registered relation), public-domain
  dedications with ``/publicdomain/zero|mark/``;
* ``<meta name="robots" content="... noindex ...">`` (RFC 9309's meta
  twin) opts the page out of indexing;
* ``<link rel="canonical" href=...>`` (RFC 6596) names the canonical
  URL of the content — mirrors, tracking-parameter variants, and
  pagination twins all point at one target.

Every signal is one regex pass over the html column, pure JVM
expression — zero Python, zero shuffle; the resulting low-cardinality
(or join-key) columns then feed ordinary filters, dedup stages and the
data card.  ``page_signals`` bundles all of them into the one
column-pruned projection an ingest job writes next to its output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["license_tag", "with_license_tag", "filter_by_license",
           "robots_noindex", "filter_noindex",
           "canonical_link", "with_declared_canonical", "page_signals"]

# creativecommons.org/licenses/by-sa/4.0/ → by-sa;
# creativecommons.org/publicdomain/zero/1.0/ → zero; /mark/ → mark
_CC_RE = r'creativecommons\.org/(?:licenses|publicdomain)/([a-z][a-z-]*)'


def _license_expr(s: Column, html: Column) -> Column:
    """License tag over a pre-lowered string ``s`` (see ``license_tag``
    for semantics).  Performance shape, measured at 48k docs / 685 MB
    html (BENCH §4.21): every regex hides behind a cheap ``contains``
    gate (UTF8String scan — no regex, no String conversion), and the
    CC code is extracted ONCE through a ``transform``-bind (a when
    chain comparing ``regexp_extract`` three times re-runs the regex
    up to three times per row: codegen subexpression elimination
    skips CONDITIONAL subtrees by design, so the sharing must be
    structural — the lambda variable binds the one evaluated copy)."""
    cc_case = F.get(F.transform(
        F.array(F.regexp_extract(s, _CC_RE, 1)),
        lambda x: (F.when(x == "zero", "cc0")
                   .when(x == "mark", "public-domain-mark")
                   .when(x != "", F.concat(F.lit("cc-"), x)))), 0)
    tag = F.coalesce(
        F.when(F.contains(s, F.lit("creativecommons.org/")), cc_case),
        F.when(F.contains(s, F.lit("license"))
               & s.rlike(r"""rel\s*=\s*["']?license"""), "other-license"))
    return F.when(html.isNull(), F.lit(None).cast("string")).otherwise(tag)


def license_tag(html: Column) -> Column:
    """The license tag expression: ``cc-by``, ``cc-by-sa``, …, ``cc0``
    (CC zero dedication), ``public-domain-mark``, ``other-license``
    (a ``rel="license"`` link that is not Creative Commons), or NULL
    when the page declares nothing.  NULL input stays NULL; binary
    html casts through string (charset subtleties don't matter — the
    needle is pure ASCII)."""
    return _license_expr(F.lower(html.cast("string")), html)


def with_license_tag(df: DataFrame, *, html_col: str = "html",
                     out_col: str = "license") -> DataFrame:
    """Append the license tag column — run this at INGEST time, while
    the raw html is still in hand: the extraction output keeps only
    the extracted text, so a licensing decision made later has nothing
    to detect from."""
    return df.withColumn(out_col, license_tag(F.col(html_col)))


def filter_by_license(df: DataFrame, allowed, *,
                      license_col: str = "license",
                      id_col: str = "doc_id",
                      keep_untagged: bool = False
                      ) -> tuple[DataFrame, DataFrame]:
    """Keep documents whose tag is in ``allowed`` (e.g. ``("cc-by",
    "cc-by-sa", "cc0")``); everything else rejects with
    ``reject_reason='license'`` (the ``clean_corpus`` ledger contract).

    ``keep_untagged`` decides the NULL-tag policy explicitly — an
    openly-licensed corpus drops untagged pages (the default: no
    declaration is not a grant), a filter that merely excludes
    known-bad licenses keeps them.  A literal isin over a
    low-cardinality column: one projection, zero shuffles, fully
    pushdown-eligible.
    """
    allowed = sorted({a.strip().lower() for a in allowed if a.strip()})
    if not allowed:
        raise ValueError("allowed license list is empty — pass the "
                         "tags to keep (e.g. cc-by, cc0)")
    c = F.col(license_col)
    ok = c.isin(allowed)
    if keep_untagged:
        ok = ok | c.isNull()
    kept = df.filter(ok)
    ledger = (df.filter(~F.coalesce(ok, F.lit(False)))
              .select(F.col(id_col).alias("id"),
                      F.lit("license").alias("reject_reason")))
    return kept, ledger


# <meta name="robots" content="... noindex ..."> — attribute order and
# quoting vary in the wild, so match name= and noindex anywhere inside
# one meta tag (content= values are comma/space lists)
_NOINDEX_RE = (r"<meta\s+[^>]*name\s*=\s*[\"']?robots[\"']?[^>]*"
               r"noindex")
_NOINDEX_RE_REV = (r"<meta\s+[^>]*noindex[^>]*"
                   r"name\s*=\s*[\"']?robots[\"']?")


def _noindex_expr(s: Column, html: Column) -> Column:
    """Noindex flag over a pre-lowered string ``s`` — the two
    attribute-order regexes only run on pages whose bytes contain the
    literal ``noindex`` at all (cheap ``contains`` gate; a page
    lacking the substring cannot match either regex)."""
    return (F.when(html.isNull(), F.lit(None).cast("boolean"))
            .otherwise(F.when(F.contains(s, F.lit("noindex")),
                              s.rlike(_NOINDEX_RE) | s.rlike(_NOINDEX_RE_REV))
                       .otherwise(F.lit(False))))


def robots_noindex(html: Column) -> Column:
    """True when the page opts out of indexing via
    ``<meta name="robots" content="noindex">`` (either attribute
    order) — the machine-readable publisher signal a compliant web
    corpus honors at ingest, exactly like the license tag.  NULL html
    stays NULL."""
    return _noindex_expr(F.lower(html.cast("string")), html)


def filter_noindex(df: DataFrame, *, html_col: str = "html",
                   id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """Drop pages that declare ``noindex`` (ledger reason
    ``robots_noindex``); NULL html (no page to inspect) passes
    through.  One projection filter, zero shuffles — run at ingest,
    with the html in hand."""
    flag = robots_noindex(F.col(html_col))
    kept = df.filter(~F.coalesce(flag, F.lit(False)))
    ledger = (df.filter(F.coalesce(flag, F.lit(False)))
              .select(F.col(id_col).alias("id"),
                      F.lit("robots_noindex").alias("reject_reason")))
    return kept, ledger


# <link rel="canonical" href="..."> — attribute order varies, quoting
# varies; (?is) = case-insensitive + dot-matches-newline (a <link> tag
# can wrap).  href value captured up to quote/whitespace/'>' so both
# quoted and bare forms parse.
_CANON_RE = (r"""(?is)<link\b[^>]*\brel\s*=\s*["']?canonical\b[^>]*"""
             r"""\bhref\s*=\s*["']?([^"'\s>]+)""")
_CANON_RE_REV = (r"""(?is)<link\b[^>]*\bhref\s*=\s*["']?([^"'\s>]+)"""
                 r"""["']?[^>]*\brel\s*=\s*["']?canonical\b""")


def canonical_link(html: Column, url: Column) -> Column:
    """The page's declared canonical URL (``<link rel="canonical">``,
    RFC 6596), resolved against the fetch ``url`` — or NULL when the
    page declares nothing usable.

    Resolution covers the forms that occur in practice: absolute
    ``http(s)://`` hrefs pass through; scheme-relative ``//host/...``
    takes the page's scheme; root-relative ``/path`` and query-only
    ``?q`` join the page's origin/path; any other relative href joins
    the page's directory.  Non-fetchable schemes (``javascript:``,
    ``data:``, ``mailto:`` …) and unresolvable cases (relative href on
    an unparseable page url) yield NULL — a garbage declaration must
    never become a dedup key.  ``&amp;`` (the one entity routinely
    present inside href attributes) is decoded; dot-segments
    (``../``) are NOT resolved — the downstream ``canonical_url``
    normalizer treats them textually, and a self-referential
    declaration (the overwhelmingly common case) never contains them.

    Pure JVM expressions: one projection, zero Python, zero shuffle.
    """
    from khl_pdf_ocr_spark.functions.urls import resolve_href, url_parts

    s = html.cast("string")
    href = F.regexp_extract(s, _CANON_RE, 1)
    href = F.when(href == "", F.regexp_extract(s, _CANON_RE_REV, 1)) \
            .otherwise(href)
    href = F.replace(href, F.lit("&amp;"), F.lit("&"))
    resolved = resolve_href(href, url_parts(url))
    return F.when(html.isNull() | (href == ""),
                  F.lit(None).cast("string")).otherwise(resolved)


def with_declared_canonical(df: DataFrame, *, html_col: str = "html",
                            url_col: str = "url",
                            out_col: str = "canonical_of") -> DataFrame:
    """Append the resolved declared-canonical column — run at INGEST
    time, while the raw html is in hand (the extraction output keeps
    only extracted text).  Downstream, ``clean_corpus(...,
    declared_canonical_col=...)`` folds it into URL dedup so variant
    urls of one declared page collapse."""
    return df.withColumn(out_col,
                         canonical_link(F.col(html_col), F.col(url_col)))


def page_signals(df: DataFrame, *, html_col: str = "html",
                 url_col: str = "url") -> DataFrame:
    """The ingest-signals side table: ``(url, license, noindex,
    canonical_of)`` in ONE column-pruned JVM pass over the raw crawl
    (only ``url`` and ``html`` are read — every other column is
    pruned at the scan).  An ingest job writes this next to its
    extraction output; the cleaning job then joins what it needs on
    ``url`` without ever touching html again.

    The lowered html is STAGED once in its own projection and shared
    by every signal (Catalyst keeps the stage rather than inlining a
    multiply-referenced expensive alias), and each regex hides behind
    a ``contains`` gate — 3.2× over naive per-signal expressions at
    48k docs / 685 MB html (BENCH §4.21).  Output is pinned identical
    to the three standalone expressions by
    ``test_page_signals_equals_standalone_signals``."""
    u, h = F.col(url_col), F.col(html_col)
    staged = df.select(u.alias("url"), h.alias("_h"),
                       F.lower(h.cast("string")).alias("_s"))
    s, h2, u2 = F.col("_s"), F.col("_h"), F.col("url")
    canonical = F.when(F.contains(s, F.lit("canonical")),
                       canonical_link(h2, u2)) \
                 .otherwise(F.lit(None).cast("string"))
    return staged.select(
        "url",
        _license_expr(s, h2).alias("license"),
        _noindex_expr(s, h2).alias("noindex"),
        canonical.alias("canonical_of"))
