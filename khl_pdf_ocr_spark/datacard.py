"""Training-data card: the corpus-statistics artifact published with a
dataset release (Gebru et al. "Datasheets for Datasets"; the Pile /
FineWeb data cards) — composition by source/language/split, token
totals, document-length distribution, the filter funnel, and the top
registrable domains.

The reference service (``/root/reference/app.py``) exposes no
reporting surface; this is part of the large-scale training-data layer
that the pipeline adds around the extraction kernel.

Scale shape (the 100 TB contract):

- ONE corpus-scale projection — (token count, char count, dimension
  columns) — is persisted and every aggregation reads it, so the text
  column is tokenized exactly once however many breakdowns run.  The
  projection is ~tens of bytes per row.
- Every result that reaches the driver is bounded BY CONSTRUCTION:
  totals/quantiles are one aggregate row; per-dimension breakdowns are
  top-``max_groups`` by document count with a ``truncated`` flag when
  groups were dropped (no-silent-caps — a data card that quietly
  omitted a source would misrepresent the corpus); domains are
  top-``top_domains``.
- Quantiles use ``percentile_approx`` (GK sketch — the same
  mergeable-sketch answer as the events percentile queries), never a
  full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions.text import token_count
from khl_pdf_ocr_spark.functions.urls import registered_domain

__all__ = ["build_datacard"]

_QUANTILES = (0.1, 0.5, 0.9, 0.99)


def _breakdown(proj: DataFrame, dim: str, max_groups: int) -> dict:
    """Per-dimension composition: top-``max_groups`` groups by document
    count, with doc/token counts and shares.  NULL dimension values
    report under ``"(null)"``.  One groupBy over the persisted
    projection; the driver sees at most ``max_groups + 1`` rows."""
    rows = (proj.groupBy(F.coalesce(F.col(dim).cast("string"),
                                    F.lit("(null)")).alias("k"))
            .agg(F.count(F.lit(1)).alias("docs"),
                 F.sum("_tok").alias("toks"))
            .orderBy(F.desc("docs"), F.asc("k"))
            .limit(max_groups + 1).collect())
    truncated = len(rows) > max_groups
    rows = rows[:max_groups]
    return {
        "groups": {r["k"]: {"docs": int(r["docs"]),
                            "tokens": int(r["toks"] or 0)}
                   for r in rows},
        "truncated": truncated,
    }


def build_datacard(kept: DataFrame, ledger: DataFrame | None = None, *,
                   text_col: str = "text",
                   source_col: str | None = None,
                   lang_col: str | None = None,
                   split_col: str | None = None,
                   url_col: str | None = None,
                   extra_dims: tuple[str, ...] = (),
                   top_domains: int = 20,
                   max_groups: int = 100) -> dict:
    """Aggregate a cleaned corpus (and optionally its reject ledger)
    into a data-card dict — JSON-serializable, driver-bounded.

    ``kept`` is the cleaned corpus (typically the read-back output of
    ``clean_cli``); ``ledger`` the (id, reject_reason, ...) reject
    table the funnel is computed from.  Dimension columns that are
    ``None`` (or absent from ``kept``) are skipped, so the card adapts
    to whatever metadata the corpus carries.

    Returns::

        {"totals": {"n_docs", "n_tokens", "n_chars",
                    "token_quantiles": {"p10", "p50", "p90", "p99"}},
         "composition": {"source": {...}, "lang": {...}, "split": {...}},
         "top_domains": {"example.com": docs, ...},   # url_col given
         "funnel": {"input_docs", "kept_docs", "kept_share",
                    "rejected": {reason: {"docs", "share_of_input"}}}}
    """
    dims = {name: col for name, col in
            (("source", source_col), ("lang", lang_col),
             ("split", split_col),
             # extra low-cardinality columns (quality tiers, formats):
             # reported under their own name
             *((c, c) for c in extra_dims))
            if col is not None and col in kept.columns}
    cols = [token_count(F.col(text_col)).alias("_tok"),
            F.coalesce(F.length(text_col), F.lit(0)).alias("_chars"),
            *[F.col(c).alias(n) for n, c in dims.items()]]
    if url_col is not None and url_col in kept.columns:
        cols.append(registered_domain(F.col(url_col)).alias("_dom"))
    else:
        url_col = None
    proj = kept.select(*cols).persist()
    try:
        row = proj.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
            F.sum("_chars").alias("n_chars"),
            F.percentile_approx("_tok", list(_QUANTILES), 10_000)
            .alias("q")).first()
        qs = row["q"] or []
        card: dict = {
            "totals": {
                "n_docs": int(row["n_docs"]),
                "n_tokens": int(row["n_tokens"] or 0),
                "n_chars": int(row["n_chars"] or 0),
                "token_quantiles": {
                    f"p{int(q * 100)}": (int(v) if v is not None else None)
                    for q, v in zip(_QUANTILES, qs)},
            },
        }
        if dims:
            card["composition"] = {name: _breakdown(proj, name, max_groups)
                                   for name in dims}
        if url_col is not None:
            dom = (proj.groupBy("_dom")
                   .agg(F.count(F.lit(1)).alias("docs"))
                   .orderBy(F.desc("docs"), F.asc("_dom"))
                   .limit(top_domains).collect())
            card["top_domains"] = {r["_dom"]: int(r["docs"]) for r in dom}
        if ledger is not None:
            by_reason = (ledger.groupBy(
                F.coalesce(F.col("reject_reason"), F.lit("(null)"))
                .alias("reject_reason"))
                         .agg(F.count(F.lit(1)).alias("n"))
                         .orderBy(F.desc("n"), F.asc("reject_reason"))
                         .limit(max_groups + 1).collect())
            rej_trunc = len(by_reason) > max_groups
            by_reason = by_reason[:max_groups]
            # input_docs must stay exact even when the reason list is
            # truncated — one count(), not a sum of the shown rows
            n_rej = (sum(int(r["n"]) for r in by_reason)
                     if not rej_trunc else ledger.count())
            n_kept = card["totals"]["n_docs"]
            n_in = n_kept + n_rej
            card["funnel"] = {
                "input_docs": n_in,
                "kept_docs": n_kept,
                "kept_share": round(n_kept / n_in, 6) if n_in else None,
                "rejected": {
                    r["reject_reason"]: {
                        "docs": int(r["n"]),
                        "share_of_input": (round(int(r["n"]) / n_in, 6)
                                           if n_in else None)}
                    for r in by_reason},
                "truncated": rej_trunc,
            }
        return card
    finally:
        proj.unpersist()
