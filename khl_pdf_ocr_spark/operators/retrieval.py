"""Corpus-scale ranked retrieval — Okapi BM25 over the documents table
(Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework:
BM25 and Beyond"; idf in the Lucene +1 form so scores are never
negative).  A training-data pipeline uses this for retrieval-shaped
probes over the corpus it is building: pulling the documents most
similar to an eval set (retrieval-based decontamination triage),
auditing what a model would cite for a query, or building seed-corpus
candidates for the quality classifier.

No counterpart exists in the reference (`/root/reference/app.py` is a
single-document extractor); this is the lexical complement of the
embedding ANN operators (`similarity.py`/`ann_index.py`): exact sparse
scoring vs approximate dense search.

Scale design (100 TB):

* the query is TINY (a handful of terms) and the corpus is huge, so
  everything per-corpus-row stays a projection: tokenize → explode →
  ``isin(terms)`` filter (codegen'd literal hash set) BEFORE any
  aggregation — non-matching tokens never reach a shuffle;
* per-(doc, term) term frequencies = one map-side-combined ``groupBy``
  whose key space is ≤ |matching docs| × |terms|, not token count;
* document-frequency / corpus stats are ≤ |terms|+1 rows — broadcast
  back, never a corpus shuffle;
* top-k is ``orderBy(...).limit(k)`` = TakeOrderedAndProject (per
  partition heap + O(k) driver merge), never a global sort;
* zero Python anywhere — the whole plan is JVM expressions.

Tokenization is the engine-portable form used by the oracle-checked
queries: lowercase, split on ``[^a-z0-9]+`` (ASCII class — identical
semantics in Java regex and DuckDB RE2), empties dropped.

``deterministic=True`` folds each document's per-term contributions in
sorted order (the `textstats.deterministic_fold` / `doc_pagerank`
precedent) so a DuckDB ``list_reduce(list_sort(...))`` recomputation
is bit-identical; the default sums with ``F.sum`` partial aggregation
(skew-safe order-free production path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_scores", "bm25_topk"]

_TOKEN_SPLIT = "[^a-z0-9]+"


def _validate_terms(query_terms) -> list[str]:
    terms = [t for t in dict.fromkeys(query_terms)]  # dedup, keep order
    if not terms:
        raise ValueError("query_terms must be non-empty")
    import re

    for t in terms:
        if not re.fullmatch("[a-z0-9]+", t):
            raise ValueError(
                f"query term {t!r} must already be a normalized token "
                f"(lowercase [a-z0-9]+ — the tokenizer's alphabet)")
    return terms


def bm25_scores(df: DataFrame, query_terms, *, text_col: str = "text",
                id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
                deterministic: bool = False,
                audit: dict | None = None) -> DataFrame:
    """(id_col, score) for every document containing ≥1 query term.

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with
    idf(t) = ln(1 + (N−df+0.5)/(df+0.5)); N and avgdl count ALL
    documents with non-empty text (relevance-frame convention), not
    just matching ones.  Documents with no match simply don't appear —
    their score is identically 0, and materializing corpus-N zero rows
    would be the 100 TB mistake.

    The (doc, term) tf frame feeds BOTH the df-per-term agg and the
    scoring join, so it is persisted (else each consumer re-runs the
    corpus tokenize — the 3-scans-instead-of-2 trap); the handle lands
    in ``audit["persisted"]`` for the caller's unpersist discipline.
    """
    terms = _validate_terms(query_terms)
    toks = F.filter(F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT),
                    lambda x: x != "")
    base = (df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
            .where(F.size("_toks") > 0)
            .select("_id", F.size("_toks").alias("_dl"), "_toks"))

    # corpus stats: ONE tiny agg row, broadcast back (lazy, no collect)
    stats = base.agg(F.count(F.lit(1)).alias("_n"),
                     F.avg("_dl").alias("_avgdl"))

    # per-(doc, term) tf — filter to query terms BEFORE the shuffle
    tf = (base.select("_id", "_dl", F.explode("_toks").alias("_term"))
          .where(F.col("_term").isin(terms))
          .groupBy("_id", "_dl", "_term")
          .agg(F.count(F.lit(1)).cast("double").alias("_tf"))
          .persist())
    if audit is not None:
        audit.setdefault("persisted", []).append(tf)

    # document frequency per term: ≤ |terms| rows
    dfreq = tf.groupBy("_term").agg(F.count(F.lit(1)).alias("_df"))

    contrib = (tf.join(F.broadcast(dfreq), "_term")
               .join(F.broadcast(stats))
               .select(
                   "_id", "_term",
                   (F.log(F.lit(1.0)
                          + (F.col("_n") - F.col("_df") + F.lit(0.5))
                          / (F.col("_df") + F.lit(0.5)))
                    * (F.col("_tf") * F.lit(k1 + 1.0))
                    / (F.col("_tf")
                       + F.lit(k1) * (F.lit(1.0 - b)
                                      + F.lit(b) * F.col("_dl")
                                      / F.col("_avgdl")))).alias("_c")))
    if deterministic:
        # canonical fold order: sort (term, contrib) structs, then a
        # left fold — bit-identical to DuckDB list_reduce(list_sort())
        scored = (contrib.groupBy("_id")
                  .agg(F.sort_array(F.collect_list(
                      F.struct("_term", "_c"))).alias("_cs"))
                  .select("_id",
                          F.aggregate("_cs", F.lit(0.0),
                                      lambda a, s: a + s["_c"])
                          .alias("score")))
    else:
        scored = contrib.groupBy("_id").agg(F.sum("_c").alias("score"))
    return scored.select(F.col("_id").alias(id_col), "score")


def bm25_topk(df: DataFrame, query_terms, *, k: int = 10,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75,
              deterministic: bool = False) -> DataFrame:
    """Top-``k`` documents by BM25 score, deterministic tie-break on
    ``id_col`` ascending — TakeOrderedAndProject, never a global sort."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    scored = bm25_scores(df, query_terms, text_col=text_col,
                         id_col=id_col, k1=k1, b=b,
                         deterministic=deterministic)
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
