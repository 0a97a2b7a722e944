"""License-aware corpus construction — detect machine-readable license
declarations in page HTML and filter/compose on them (the stage behind
openly-licensed corpora: a training set that must be CC-BY-only has to
tag licenses at ingest and carry the tag through every later filter).

The reference service has no licensing surface; this belongs to the
large-scale training-data layer around the extraction kernel.

Detection is the web's machine-readable convention, not NLP: Creative
Commons pages declare themselves with a link to
``creativecommons.org/licenses/<code>/<version>/`` (usually
``rel="license"`` — RFC 8288's registered relation), public-domain
dedications with ``/publicdomain/zero|mark/``.  One lowercased regex
pass over the html column, pure JVM expression — zero Python, zero
shuffle; the tag is then an ordinary low-cardinality column for
filters and the data card.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["license_tag", "with_license_tag", "filter_by_license",
           "robots_noindex", "filter_noindex"]

# creativecommons.org/licenses/by-sa/4.0/ → by-sa;
# creativecommons.org/publicdomain/zero/1.0/ → zero; /mark/ → mark
_CC_RE = r'creativecommons\.org/(?:licenses|publicdomain)/([a-z][a-z-]*)'


def license_tag(html: Column) -> Column:
    """The license tag expression: ``cc-by``, ``cc-by-sa``, …, ``cc0``
    (CC zero dedication), ``public-domain-mark``, ``other-license``
    (a ``rel="license"`` link that is not Creative Commons), or NULL
    when the page declares nothing.  NULL input stays NULL; binary
    html casts through string (charset subtleties don't matter — the
    needle is pure ASCII)."""
    s = F.lower(html.cast("string"))
    cc = F.regexp_extract(s, _CC_RE, 1)
    return (F.when(html.isNull(), F.lit(None).cast("string"))
            .when(cc == "zero", "cc0")
            .when(cc == "mark", "public-domain-mark")
            .when(cc != "", F.concat(F.lit("cc-"), cc))
            .when(s.rlike(r"""rel\s*=\s*["']?license"""), "other-license"))


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


def robots_noindex(html: Column) -> Column:
    """True when the page opts out of indexing via
    ``<meta name="robots" content="noindex">`` (either attribute
    order) — the machine-readable publisher signal a compliant web
    corpus honors at ingest, exactly like the license tag.  NULL html
    stays NULL."""
    s = F.lower(html.cast("string"))
    return (F.when(html.isNull(), F.lit(None).cast("boolean"))
            .otherwise(s.rlike(_NOINDEX_RE) | s.rlike(_NOINDEX_RE_REV)))


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
