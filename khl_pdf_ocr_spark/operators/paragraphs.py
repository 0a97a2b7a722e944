"""CCNet-style paragraph-level deduplication.

The reference is a single-document extractor (app.py:376-419) and has no
corpus-level operator; this implements the primary dedup stage of
Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data" (LREC 2020): split every document into paragraphs,
hash each normalized paragraph, and keep only the FIRST occurrence of
each paragraph corpus-wide — the single most effective boilerplate
remover on web crawls (nav bars, cookie banners, footers repeat across
a site's every page; document-level dedup never sees them).

Deterministic winner rule: the occurrence with the smallest
``(doc_id, paragraph_index)`` survives — input-order-insensitive, so
any engine (the DuckDB oracle groups by the literal normalized
paragraph STRING, which also makes the xxhash64 collision assumption
checked rather than shared) reproduces the same output bit-for-bit.

Scale shape (the 100 TB story):

* Paragraph enumeration is **pre-hashed inside the generator element**
  (the ``chunk_documents`` lesson): each exploded row is a
  ``struct(idx int, h long)`` — paragraph text never crosses the
  Generate, and the occurrence table is ~16 bytes/paragraph.
* Winner election is ONE hash shuffle on the 8-byte paragraph hash
  (``groupBy(h).agg(min(struct(id, idx)))`` — min is map-side partial),
  plus one equi-join back on ``h``.  The repeated-hash set is
  corpus-derived and unbounded, so it is joined, never force-broadcast.
* Text reassembly slices the ORIGINAL paragraph array by the per-doc
  removed-index list (collected per doc), so no paragraph text is ever
  shuffled; kept indices come from ``array_except`` (hash-set build),
  making the rebuild O(paragraphs + removed) per document even when
  every paragraph of a long book is removed (stress-tested at 2x50k
  paragraphs).
* The incremental twin keeps a one-column ``(h)`` store of every
  paragraph ever kept — O(distinct paragraphs) state, history text
  never read; bucket the store by ``h`` at scale so the probe join
  co-locates (the same contract as the exact-substring window store).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions import text as X

__all__ = ["paragraph_dedup", "paragraph_dedup_incremental",
           "paragraph_occurrences"]


def _paras(text_col: str) -> Column:
    """Paragraphs = the exact ``\\n``-split of the raw text (single
    newline, no run-collapsing): reassembly with ``concat_ws('\\n')`` is
    then byte-identical whenever nothing was removed, and blank lines
    survive as empty paragraphs (exempt from dedup below)."""
    return F.split(F.col(text_col), "\n")


def paragraph_occurrences(df: DataFrame, *, text_col: str = "text",
                          id_col: str = "doc_id",
                          min_chars: int = 1) -> DataFrame:
    """(id, idx, h): every dedup-eligible paragraph occurrence with the
    xxhash64 of its normalized text (lowercase, punctuation stripped,
    whitespace collapsed — ``functions.text.normalized_text``, the same
    normalization as the document fingerprint).

    Paragraphs whose NORMALIZED form is shorter than ``min_chars`` are
    exempt (no row): blank lines and separator junk would otherwise all
    collide into one hash and be stripped from every document but the
    corpus-wide first.  NULL-text documents produce no rows.
    """
    # STAGED paragraph array (the winnowing lesson: a materialized
    # column reference keeps the lambda cheap and the plan legible),
    # then pre-hash inside the generator element: only struct<int,long>
    # rows leave the Generate.  2-arg transform lambda = (element,
    # index) on purpose; the CASE makes ineligible paragraphs NULL,
    # filtered after the explode (F.filter before explode would
    # renumber indices).
    base = (df.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("id"),
                    # normalization STAGED into its own array so it
                    # runs once per paragraph — referencing
                    # normalized_text(p) twice in the struct lambda
                    # below would run the lower+regex passes twice
                    # (no CSE in interpreted HOFs; r5 review)
                    F.transform(_paras(text_col),
                                lambda p: X.normalized_text(p))
                    .alias("_nps")))
    occ = F.transform(
        F.col("_nps"), lambda np_, i: F.struct(
            i.alias("idx"),
            F.when(F.length(np_) >= min_chars,
                   F.xxhash64(np_)).alias("h")))
    return (base.select("id", F.explode(occ).alias("_o"))
            .select("id", F.col("_o.idx").alias("idx"),
                    F.col("_o.h").alias("h"))
            .filter(F.col("h").isNotNull()))


def _rebuild(df: DataFrame, removed: DataFrame, *, text_col: str,
             id_col: str) -> DataFrame:
    """Left-join the per-doc sorted removed-index list back onto the
    ORIGINAL frame and slice the paragraph array — documents with no
    removals (the common case, including NULL text) keep their text
    column untouched, bit-for-bit."""
    rm = removed.groupBy("id").agg(
        F.sort_array(F.collect_list("idx")).alias("_rm"))
    out = (df.join(rm, F.col(id_col) == rm["id"], "left").drop(rm["id"])
           # STAGED array (no CSE in interpreted HOFs — an unstaged
           # F.get(split(text), i) inside the lambda below would re-run
           # the split PER ELEMENT, O(chars x paras) per doc)
           .withColumn("_pa", _paras(text_col)))
    # kept indices via array_except (hash-set lookup, O(paras+removed)
    # per doc — a membership filter with array_contains would be
    # O(paras x removed): quadratic on a long fully-duplicated doc,
    # the chunk_documents class of scale bug); array_except preserves
    # the left operand's order and indices are unique, so the slice
    # order is the original paragraph order
    kept_idx = F.array_except(
        F.sequence(F.lit(0), F.size("_pa") - 1), F.col("_rm"))
    new_text = F.when(F.col("_rm").isNull() | F.col(text_col).isNull(),
                      F.col(text_col)) \
        .otherwise(F.concat_ws("\n", F.transform(
            kept_idx, lambda i: F.get(F.col("_pa"), i))))
    n_paras = F.when(F.col(text_col).isNull(), F.lit(0)) \
        .otherwise(F.size("_pa"))
    return (out.withColumn("n_paras", n_paras)
            .withColumn("n_paras_removed",
                        F.coalesce(F.size("_rm"), F.lit(0)))
            .withColumn(text_col, new_text)
            .drop("_rm", "_pa"))


def paragraph_dedup(df: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_chars: int = 1,
                    audit: dict | None = None) -> DataFrame:
    """Remove every non-first occurrence of each paragraph corpus-wide
    (CCNet's hash-dedup stage).  Within-document repeats count: the
    second copy inside one document is removed too.

    Returns the input frame with ``text_col`` rewritten (surviving
    paragraphs joined by ``\\n``) plus ``n_paras`` and
    ``n_paras_removed`` counters; rows are never dropped — a document
    whose every eligible paragraph was seen elsewhere keeps its exempt
    paragraphs (or becomes empty), and downstream quality filters
    decide its fate.

    ``audit``: optional dict — when given, the narrow (id, idx, h)
    occurrence table is persisted (it feeds BOTH the winner election
    and the join-back, so without a cache the split+normalize+hash
    explode runs twice) and registered under ``audit["persisted"]``
    for the caller to unpersist after materializing the result.
    """
    occ = paragraph_occurrences(df, text_col=text_col, id_col=id_col,
                                min_chars=min_chars)
    if audit is not None:
        occ = occ.persist()
        audit.setdefault("persisted", []).append(occ)
    winners = occ.groupBy("h").agg(
        F.min(F.struct("id", "idx")).alias("_w"))
    removed = (occ.join(winners, "h")
               .filter((F.col("id") != F.col("_w.id"))
                       | (F.col("idx") != F.col("_w.idx")))
               .select("id", "idx"))
    return _rebuild(df, removed, text_col=text_col, id_col=id_col)


def paragraph_dedup_incremental(df: DataFrame, seen: DataFrame | None, *,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                min_chars: int = 1,
                                audit: dict | None = None
                                ) -> tuple[DataFrame, DataFrame]:
    """Paragraph-dedup a NEW batch against itself AND a persisted
    paragraph-hash store — the daily-increment shape (yesterday's
    cookie banner must not re-enter today).

    ``seen``: one-column frame ``h`` (xxhash64 of the normalized
    paragraph) of every paragraph kept in prior increments; ``None``
    for a first run.  History always wins: EVERY occurrence of a
    history hash in the batch is removed; fresh paragraphs elect a
    within-batch winner exactly like ``paragraph_dedup``.

    Returns ``(result, new_hashes)``: the rewritten batch (same
    contract as ``paragraph_dedup``), and the one-column ``h`` frame of
    paragraphs that survived — append it to the store for the next
    increment (caller owns the write; the probe is a semi/anti join on
    ``h``, so a store bucketed by ``h`` co-locates it).
    """
    occ = paragraph_occurrences(df, text_col=text_col, id_col=id_col,
                                min_chars=min_chars)
    if audit is not None:
        # the occurrence table feeds three consumers (history split,
        # winner election, join-back); it is narrow (16 B/paragraph) —
        # persist so the corpus text is hashed once, not three times.
        # Caller unpersists via audit["persisted"] AFTER materializing
        # both returned frames (the clean_corpus convention; an eager
        # unpersist here would fire before the lazy plans ever run).
        occ = occ.persist()
        audit.setdefault("persisted", []).append(occ)
    if seen is not None:
        # the store is corpus-derived and unbounded: joined, never
        # force-broadcast (the decontamination drop-list precedent)
        hist_hits = occ.join(seen.select("h"), "h", "left_semi")
        fresh = occ.join(seen.select("h"), "h", "left_anti")
    else:
        hist_hits = occ.limit(0)
        fresh = occ
    winners = fresh.groupBy("h").agg(
        F.min(F.struct("id", "idx")).alias("_w"))
    batch_losers = (fresh.join(winners, "h")
                    .filter((F.col("id") != F.col("_w.id"))
                            | (F.col("idx") != F.col("_w.idx")))
                    .select("id", "idx"))
    removed = hist_hits.select("id", "idx").unionByName(batch_losers)
    result = _rebuild(df, removed, text_col=text_col, id_col=id_col)
    new_hashes = winners.select("h")
    return result, new_hashes
