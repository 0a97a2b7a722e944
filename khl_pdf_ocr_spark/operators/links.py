"""Real hyperlink extraction from crawled HTML — the edge source for
the link-graph operators.

The reference is a single-document extractor (app.py:376-419) with no
notion of a corpus or its link structure; Common-Crawl-scale pipelines
extract the out-links of every page (the WAT sidecar files of Common
Crawl are exactly this) to build the host graph that quality priors
like PageRank / harmonic centrality run on.  ``graph.pagerank``
previously ran only on ``graph.synthetic_link_graph``; this module
supplies the real edges: ``extract_outlinks`` (page url × anchor
hrefs → resolved absolute URL edges) and ``host_link_graph`` (URL
edges → distinct registrable-domain edges).

Scale shape (the 100 TB story):

* ``extract_outlinks`` is ONE projection over (url, html) — every
  other column pruned at the scan — followed by one explode of an
  ARRAY OF RESOLVED STRINGS (built, deduplicated, and bounded before
  the ``Generate``, so the html and the href array never cross it —
  the ``chunk_documents`` generator-carry lesson).  Zero shuffles,
  zero Python.
* Per-page work is BOUNDED: at most ``max_links_per_page`` hrefs are
  resolved (link-farm pages carry 10^4+ anchors; an unbounded
  transform would make one spam page a straggler).  The cap is a
  disclosed recall trade documented per Gopher/refinedweb practice,
  not a silent truncation — callers needing exact out-degree stats
  raise it.
* The page-url pieces (``functions.urls.url_parts``) are staged once
  per page and read per href; the href regex runs once per page
  (``regexp_extract_all``), not once per link.
* ``host_link_graph``'s ``distinct`` is the module's only shuffle —
  keyed by the (short) host-pair row, map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions.urls import (registered_domain,
                                              resolve_href, url_parts)

__all__ = ["extract_outlinks", "host_link_graph"]

# anchor href values, both quoted and bare ((?is): attributes may be
# uppercase and a long <a ...> tag can wrap lines); value captured up
# to quote/whitespace/'>' — the canonical_link attribute-grammar
# precedent (licensing.py)
_A_HREF_RE = r"""(?is)<a\b[^>]*\bhref\s*=\s*["']?([^"'\s>]+)"""


def extract_outlinks(df: DataFrame, *, url_col: str = "url",
                     html_col: str = "html",
                     max_links_per_page: int = 1000,
                     drop_self: bool = True) -> DataFrame:
    """One row per (page, distinct resolved out-link): ``(src, dst)``.

    ``src`` is the fetch url; ``dst`` is the anchor href resolved
    against it (``functions.urls.resolve_href`` — absolute pass-through,
    scheme-/root-/directory-relative joins; ``javascript:``/``mailto:``
    and friends dropped), fragment stripped, ``&amp;`` decoded,
    de-duplicated within the page.  ``drop_self`` removes trivial
    self-references (``dst == src``).  NULL html yields no rows.

    Only ``<a href=...>`` anchors count — ``<link>``/``<script>``/
    ``<img>`` references are resources, not hyperlinks (the WAT
    convention).
    """
    if max_links_per_page < 1:
        raise ValueError(f"max_links_per_page must be >= 1, got "
                         f"{max_links_per_page}")
    u = F.col(url_col)
    s = F.col(html_col).cast("string")
    hrefs = F.slice(F.regexp_extract_all(s, F.lit(_A_HREF_RE), 1),
                    1, max_links_per_page)
    staged = df.select(u.alias("src"), hrefs.alias("_hrefs"),
                       url_parts(u).alias("_up"))
    # fragment stripped BEFORE resolution: a fragment-only href
    # ("#section") is intra-page navigation, not a hyperlink — it
    # empties out and drops, instead of mis-resolving against the
    # page directory
    resolved = F.transform(
        F.col("_hrefs"),
        lambda h: resolve_href(
            F.regexp_replace(F.replace(h, F.lit("&amp;"), F.lit("&")),
                             r"#.*$", ""),
            F.col("_up")))
    dsts = F.array_distinct(F.filter(
        resolved, lambda d: d.isNotNull() & (d != "")))
    out = (staged.select("src", F.explode(dsts).alias("dst")))
    if drop_self:
        out = out.filter(F.col("dst") != F.col("src"))
    return out


def host_link_graph(edges: DataFrame, *, src_col: str = "src",
                    dst_col: str = "dst") -> DataFrame:
    """URL-level edges → distinct registrable-domain edges
    ``(src, dst)``, intra-domain links and unparseable hosts dropped —
    the input ``graph.pagerank`` ranks on (one site = one publisher,
    the ``domains.cap_per_domain`` grouping discipline).

    One ``distinct`` shuffle over two short host strings per edge."""
    sd = registered_domain(F.col(src_col))
    dd = registered_domain(F.col(dst_col))
    return (edges.select(sd.alias("src"), dd.alias("dst"))
            .filter((F.col("src") != "") & (F.col("dst") != "")
                    & (F.col("src") != F.col("dst")))
            .distinct())
