"""Real hyperlink extraction from crawled HTML — the edge source for
the link-graph operators.

The reference is a single-document extractor (app.py:376-419) with no
notion of a corpus or its link structure; Common-Crawl-scale pipelines
extract the out-links of every page (the WAT sidecar files of Common
Crawl are exactly this) to build the host graph that quality priors
like PageRank / harmonic centrality run on.  ``graph.pagerank``
previously ran only on ``graph.synthetic_link_graph``; this module
supplies the real edges: ``extract_outlinks`` (page url × anchor
hrefs → resolved absolute URL edges; ``with_text=True`` adds the
link's inner text — the WAT link-text field), ``anchor_text_profile``
(per-target aggregation of how the web describes each url — the
anchor-text signal of Brin & Page 1998 §2.2), and ``host_link_graph``
(URL edges → distinct registrable-domain edges).

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

__all__ = ["extract_outlinks", "anchor_text_profile", "host_link_graph"]

# anchor href values, both quoted and bare ((?is): attributes may be
# uppercase and a long <a ...> tag can wrap lines); value captured up
# to quote/whitespace/'>' — the canonical_link attribute-grammar
# precedent (licensing.py)
_A_HREF_RE = r"""(?is)<a\b[^>]*\bhref\s*=\s*["']?([^"'\s>]+)"""

# href + inner text: same href grammar, then consume to the tag end and
# lazily capture up to the closing </a>.  This variant REQUIRES the
# closing tag (the text has no boundary without it), so an unclosed
# <a href=...> contributes no edge in with_text mode — the WAT-style
# trade: link text only exists for well-formed anchor ELEMENTS.
_A_HREF_TEXT_RE = (r"""(?is)<a\b[^>]*\bhref\s*=\s*["']?([^"'\s>]+)"""
                   r"""[^>]*>(.*?)</a\s*>""")


def _clean_anchor(t, max_chars: int):
    """Markup → display-ish text: strip nested tags, decode the five
    core entities (+ nbsp), collapse whitespace, trim, bound length.
    Pure codegen — one projection per element of the text array."""
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    for ent, ch in (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
                    ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.substring(F.trim(F.regexp_replace(t, r"\s+", " ")),
                       1, max_chars)


def extract_outlinks(df: DataFrame, *, url_col: str = "url",
                     html_col: str = "html",
                     max_links_per_page: int = 1000,
                     drop_self: bool = True,
                     with_text: bool = False,
                     max_anchor_chars: int = 200) -> DataFrame:
    """One row per (page, distinct resolved out-link): ``(src, dst)``
    — or ``(src, dst, anchor)`` when ``with_text=True``.

    ``src`` is the fetch url; ``dst`` is the anchor href resolved
    against it (``functions.urls.resolve_href`` — absolute pass-through,
    scheme-/root-/directory-relative joins; ``javascript:``/``mailto:``
    and friends dropped), fragment stripped, ``&amp;`` decoded,
    de-duplicated within the page.  ``drop_self`` removes trivial
    self-references (``dst == src``).  NULL html yields no rows.

    Only ``<a href=...>`` anchors count — ``<link>``/``<script>``/
    ``<img>`` references are resources, not hyperlinks (the WAT
    convention).

    ``with_text=True`` additionally captures each anchor's inner text
    (tags stripped, core entities decoded, whitespace collapsed, first
    ``max_anchor_chars`` chars) — the link-text signal WAT records
    carry, which ``anchor_text_profile`` aggregates per target.  In
    this mode only well-formed ``<a ...>text</a>`` ELEMENTS count (an
    unclosed tag gives the text no boundary), so the edge set may be a
    subset of the default mode's; per-page dedup is on the (dst,
    anchor) PAIR — the same target cited under two texts keeps both
    rows.  Image-only anchors keep an empty-string anchor.
    """
    if max_links_per_page < 1:
        raise ValueError(f"max_links_per_page must be >= 1, got "
                         f"{max_links_per_page}")
    u = F.col(url_col)
    s = F.col(html_col).cast("string")
    pat = _A_HREF_TEXT_RE if with_text else _A_HREF_RE
    if with_text:
        # ONE full-page scan (group 0), then per-element group
        # extraction over the short matched anchor substrings — the r5
        # form ran the same regex over the ENTIRE page twice (once per
        # capture group), doubling the dominant cost (guide §1.2
        # per-task work).  Re-matching inside a match reproduces its
        # groups exactly: the match starts the substring (leftmost),
        # `[^>]*` runs are bounded by the same '>'s, and the lazy
        # text group stops at the same first `</a\s*>` — all decided
        # within the match extent (test_with_text_single_scan_parity).
        ms = F.slice(F.regexp_extract_all(s, F.lit(pat), 0),
                     1, max_links_per_page)
        staged = df.select(u.alias("src"), ms.alias("_ms"),
                           url_parts(u).alias("_up"))
        hrefs = F.transform(F.col("_ms"),
                            lambda m: F.regexp_extract(m, pat, 1))
    else:
        hrefs = F.slice(F.regexp_extract_all(s, F.lit(pat), 1),
                        1, max_links_per_page)
        staged = df.select(u.alias("src"), hrefs.alias("_hrefs"),
                           url_parts(u).alias("_up"))
        hrefs = F.col("_hrefs")
    # fragment stripped BEFORE resolution: a fragment-only href
    # ("#section") is intra-page navigation, not a hyperlink — it
    # empties out and drops, instead of mis-resolving against the
    # page directory
    resolved = F.transform(
        hrefs,
        lambda h: resolve_href(
            F.regexp_replace(F.replace(h, F.lit("&amp;"), F.lit("&")),
                             r"#.*$", ""),
            F.col("_up")))
    if with_text:
        # pair BEFORE the explode (the chunk_documents generator-carry
        # rule): each generated element is one short (dst, anchor)
        # struct — html, match array, and text array never cross the
        # Generate
        cleaned = F.transform(
            F.col("_ms"),
            lambda m: _clean_anchor(F.regexp_extract(m, pat, 2),
                                    max_anchor_chars))
        pairs = F.array_distinct(F.filter(
            F.arrays_zip(resolved.alias("dst"), cleaned.alias("anchor")),
            lambda p: p["dst"].isNotNull() & (p["dst"] != "")))
        out = (staged.select("src", F.explode(pairs).alias("_p"))
               .select("src", F.col("_p.dst").alias("dst"),
                       F.col("_p.anchor").alias("anchor")))
    else:
        dsts = F.array_distinct(F.filter(
            resolved, lambda d: d.isNotNull() & (d != "")))
        out = (staged.select("src", F.explode(dsts).alias("dst")))
    if drop_self:
        out = out.filter(F.col("dst") != F.col("src"))
    return out


def anchor_text_profile(edges: DataFrame, *, dst_col: str = "dst",
                        src_col: str = "src",
                        anchor_col: str = "anchor") -> DataFrame:
    """Per-target anchor-text aggregation over ``extract_outlinks(...,
    with_text=True)`` edges: how the web DESCRIBES each url.

    Returns one row per ``dst``: ``n_refs`` (citing (src, anchor)
    rows), ``n_srcs`` (distinct citing pages), ``n_texts`` (distinct
    non-empty anchor texts), ``top_anchor`` (the most frequent
    non-empty text; ties broken by the lexicographically smallest —
    deterministic across partitionings), ``top_anchor_refs`` (its
    count).  Targets cited only by image/empty anchors keep
    ``n_texts=0`` and a NULL ``top_anchor``.

    The aggregated text is a classic web-corpus signal (search engines
    have ranked on it since Brin & Page 1998 §2.2; in training-data
    work it yields query/title-like descriptions for pages).

    Scale shape: one hash shuffle on ``dst`` for the base counts and
    one on ``(dst, anchor)`` for the text counts, whose winner election
    is a ``min_by`` over the (−cnt, anchor) struct — a map-side-partial
    aggregate, never a per-dst sort/window (r6; the snapshots
    ``max_by`` discipline).  Every shuffled row is (url, short-text,
    count) — the html never moves.
    """
    e = edges.select(F.col(dst_col).alias("dst"),
                     F.col(src_col).alias("src"),
                     F.coalesce(F.col(anchor_col), F.lit("")).alias("anchor"))
    base = e.groupBy("dst").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.countDistinct("src").alias("n_srcs"))
    texts = (e.filter(F.col("anchor") != "")
             .groupBy("dst", "anchor").agg(F.count(F.lit(1)).alias("cnt")))
    # top anchor via min_by over the (−cnt, anchor) struct — identical
    # winner to the r5 row_number window (most frequent, tie → lexico-
    # graphically smallest anchor) but as a map-side-partial aggregate:
    # no per-dst SORT inside the shuffle, no window machinery (r6;
    # guide §2.4 — the snapshots max_by/min_by discipline)
    prof = (texts.groupBy("dst")
            .agg(F.count(F.lit(1)).alias("n_texts"),
                 F.min_by(F.struct(F.col("anchor"), F.col("cnt")),
                          F.struct((-F.col("cnt")).alias("nc"),
                                   F.col("anchor").alias("a")))
                 .alias("_top"))
            .select("dst", "n_texts",
                    F.col("_top.anchor").alias("top_anchor"),
                    F.col("_top.cnt").alias("top_anchor_refs")))
    return (base.join(prof, "dst", "left")
            .select("dst", "n_refs", "n_srcs",
                    F.coalesce(F.col("n_texts"), F.lit(0)).alias("n_texts"),
                    "top_anchor",
                    F.coalesce(F.col("top_anchor_refs"), F.lit(0))
                    .alias("top_anchor_refs")))


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
