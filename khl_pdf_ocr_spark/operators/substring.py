"""Exact repeated-substring (n-gram span) deduplication.

The reference is a single-document extractor (app.py:376-419) and has no
corpus-level operator; this implements the training-data preparation op
of Lee et al., "Deduplicating Training Data Makes Language Models
Better" (ACL 2022): any token window of length ``k`` whose exact
contents occur more than once in the corpus is a *repeated window*;
overlapping repeated windows merge into maximal *spans*, which can then
be stripped from the text (the paper's ExactSubstr dedup, re-expressed
relationally instead of via a monolithic suffix array).

Scale shape (the 100 TB story):

* Window enumeration happens **pre-hashed before the explode** — each
  generated element is a 16-byte ``struct(start, xxhash64)``, never the
  token array or the window string (the ``chunk_documents`` lesson:
  Spark's ``Generate`` copies every carried column once per generated
  row, so carrying the token array would be O(tokens x windows) bytes
  per document).
* Finding repeated windows is ONE hash shuffle on the 8-byte window
  hash (``groupBy(h).count``) plus one shuffle join back — both
  map-side-combinable, no quadratic path, no driver state.  The
  repeated-hash set is corpus-derived and unbounded, so it is joined,
  never force-broadcast.
* Span merging is the classic gaps-and-islands rewrite: one window
  partitioned by document (never a global window), expressible
  identically in ANSI SQL — the driver oracle recomputes the whole
  pipeline in DuckDB grouping by the literal n-gram string, which also
  makes the (negligible, 2^-64-scale) xxhash64 collision assumption
  *checked* rather than assumed at bench scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["repeated_ngram_spans", "repeated_spans_incremental",
           "strip_repeated_spans"]

# tokens are produced by splitting on whitespace, so U+001F (unit
# separator) can never appear inside one — an unambiguous join char for
# the window hash (a plain space would be ambiguous only if tokens could
# contain spaces, which they cannot; the control char documents intent)
_SEP = "\x1f"


def _tokens(text_col: str) -> Column:
    """Whitespace tokens with edge-whitespace stripped first (F.trim
    only removes spaces; a leading newline would yield a phantom empty
    token — same guard as prepare.chunk_documents)."""
    stripped = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    return F.split(stripped, r"\s+")


def _window_starts(df: DataFrame, *, k: int, text_col: str,
                   id_col: str) -> DataFrame:
    """(id, s, h): every k-token window start (0-based) with the
    xxhash64 of its SEP-joined tokens.  Documents shorter than k tokens
    (or NULL/blank) produce no windows."""
    base = (df.filter(F.col(text_col).isNotNull()
                      & F.col(text_col).rlike(r"\S"))
            .select(F.col(id_col), _tokens(text_col).alias("_toks"))
            .filter(F.size("_toks") >= k))
    # r6 change #15: posexplode of the PLAIN token array with the k-1
    # successor tokens fetched via null-safe ``get`` inside the same
    # codegen stage — the previous explode(transform(sequence, λ
    # slice+concat_ws+xxhash64)) evaluated the window build interpreted
    # per index.  Same-JVM interleaved A/B at 50k ~550-token docs on 32
    # cores: this stage [31.8, 32.2, 32.4] vs old [73.6, 56.5, 59.1] s
    # (full repeated_ngram_spans 152.7 → 89.3 s — the residual is the
    # corpus-wide hash groupBy, inherent to the repeat census).
    # Identical (id, s, h) rows; all ``get``s are in-bounds because
    # pos ≤ m−k, so concat_ws never silently skips a NULL; the hashed
    # string is the same SEP-joined k-token window.
    succ = [F.get(F.col("_toks"), F.col("s") + i) for i in range(1, k)]
    return (base.select(id_col, F.size("_toks").alias("_m"), "_toks",
                        F.posexplode("_toks").alias("s", "_t0"))
            .filter(F.col("s") <= F.col("_m") - k)
            .select(id_col, "s",
                    F.xxhash64(F.concat_ws(_SEP, F.col("_t0"), *succ)
                               ).alias("h")))


def _merge_spans(hits: DataFrame, *, k: int, id_col: str) -> DataFrame:
    """Gaps-and-islands merge of repeated window starts ``(id, s)`` into
    maximal spans: windows [s, s+k-1] chain while the next start is
    within k of the previous (coverage stays contiguous).  One window
    partitioned by document — never a global window."""
    byid = Window.partitionBy(id_col).orderBy("s")
    brk = F.when(F.col("s") <= F.lag("s").over(byid) + F.lit(k),
                 F.lit(0)).otherwise(F.lit(1))  # lag NULL -> 1 (new island)
    isl = (hits.withColumn("_brk", brk)
           .withColumn("_island", F.sum("_brk").over(
               byid.rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))))
    return (isl.groupBy(id_col, "_island")
            .agg(F.min("s").cast("long").alias("span_start"),
                 (F.max("s") + F.lit(k - 1)).cast("long").alias("span_end"),
                 F.count(F.lit(1)).alias("n_windows"))
            .drop("_island"))


def repeated_ngram_spans(df: DataFrame, *, k: int = 8, min_count: int = 2,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Maximal repeated-substring spans per document.

    A k-token window is *repeated* when its exact token sequence occurs
    at least ``min_count`` times corpus-wide (within-document repeats
    count, per Lee et al.).  Overlapping/adjacent repeated windows are
    merged into maximal token-index spans.

    Output: ``(id_col, span_start, span_end, n_windows)`` with 0-based
    inclusive token indices and the number of repeated windows the span
    absorbed.  Documents with no repeated windows emit no rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    w = _window_starts(df, k=k, text_col=text_col, id_col=id_col)
    dup = (w.groupBy("h").agg(F.count(F.lit(1)).alias("_c"))
           .filter(F.col("_c") >= min_count).select("h"))
    hits = w.join(dup, "h", "inner")
    return _merge_spans(hits, k=k, id_col=id_col)


def repeated_spans_incremental(df: DataFrame, seen_windows: DataFrame, *,
                               k: int = 8, min_count: int = 2,
                               text_col: str = "text",
                               id_col: str = "doc_id"
                               ) -> tuple[DataFrame, DataFrame]:
    """Repeated-substring spans for a NEW batch against itself AND a
    persisted window-hash store — the daily-increment twin of
    ``repeated_ngram_spans`` (a fresh crawl arrives; boilerplate that
    already exists anywhere in the ingested corpus must be stripped
    from the new documents without re-scanning 100 TB of history).

    ``seen_windows``: the store — ``(h, n)`` distinct window hashes
    with their occurrence counts per increment (append ``new_windows``
    each increment).  History TEXT is never read: a batch window is
    repeated when its batch occurrences plus the store's count for the
    same hash reach ``min_count``.  The store is O(distinct windows) —
    linear in corpus tokens, the honest cost of exact-substring state
    (the batch-mode alternative, a corpus-wide suffix structure, is the
    same order); at scale bucket it by ``h`` so the probe's equi-join
    co-locates, and the probe aggregates the store ONLY for hashes the
    batch actually contains (semi-join first, never a full-store scan
    aggregate).

    Returns ``(spans, new_windows)``:
    - ``spans`` — as ``repeated_ngram_spans`` over the batch docs;
    - ``new_windows`` — ``(h, n)`` for THIS batch: append to the store,
      keyed/partitioned by increment id like the signature stores, so
      scheduler retries overwrite idempotently.

    History-only documents are untouched: spans are emitted for batch
    rows only (history text was already stripped when ITS batch was
    ingested — within-history repeats are history's business, not this
    run's).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    w = _window_starts(df, k=k, text_col=text_col, id_col=id_col)
    bc = w.groupBy("h").agg(F.count(F.lit(1)).alias("_bc"))
    # restrict the store to hashes present in the batch BEFORE
    # aggregating across increments (the store is corpus-sized; the
    # batch hash set is not)
    hist = (seen_windows.join(bc.select("h"), "h", "left_semi")
            .groupBy("h").agg(F.sum("n").alias("_hn")))
    dup = (bc.join(hist, "h", "left")
           .filter((F.col("_bc") + F.coalesce(F.col("_hn"), F.lit(0)))
                   >= min_count)
           .select("h"))
    hits = w.join(dup, "h", "inner")
    spans = _merge_spans(hits, k=k, id_col=id_col)
    new_windows = bc.select("h", F.col("_bc").cast("long").alias("n"))
    return spans, new_windows


def strip_repeated_spans(df: DataFrame, spans: DataFrame | None = None, *,
                         k: int = 8, min_count: int = 2,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Remove every token covered by a repeated span.

    ``spans`` defaults to ``repeated_ngram_spans`` over ``df`` with the
    same parameters.  Adds ``text_deduped`` (tokens outside all spans,
    space-joined; NULL text stays NULL) and ``n_tokens_removed``.
    Documents without spans pass through with the original token stream
    re-joined on single spaces (tokenization is whitespace-normalizing
    by construction).

    Per-row cost is O(tokens x spans-in-doc) array work, JVM-side; the
    span list rides in as a sorted array column via one left join.
    """
    if spans is None:
        spans = repeated_ngram_spans(df, k=k, min_count=min_count,
                                     text_col=text_col, id_col=id_col)
    per_doc = (spans.groupBy(id_col)
               .agg(F.sort_array(F.collect_list(
                   F.struct("span_start", "span_end"))).alias("_spans")))
    empty = F.array().cast(
        "array<struct<span_start:bigint,span_end:bigint>>")
    joined = (df.join(per_doc, id_col, "left")
              .withColumn("_spans", F.coalesce(F.col("_spans"), empty)))
    toks = _tokens(text_col)
    covered = lambda i: F.exists(  # noqa: E731 — tiny predicate factory
        F.col("_spans"),
        lambda sp: (i >= sp["span_start"]) & (i <= sp["span_end"]))
    kept = F.filter(toks, lambda t, i: ~covered(i))
    return (joined
            .withColumn("text_deduped",
                        F.when(F.col(text_col).isNull(), F.lit(None))
                        .otherwise(F.concat_ws(" ", kept)))
            .withColumn("n_tokens_removed",
                        F.when(F.col(text_col).isNull(), F.lit(0))
                        .otherwise(F.size(toks) - F.size(kept))
                        .cast("long"))
            .drop("_spans"))
