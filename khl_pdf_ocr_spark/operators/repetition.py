"""The FULL Gopher repetition table (Rae et al. 2021, "Scaling
Language Models: Methods, Analysis & Insights from Training Gopher",
Appendix A1.1, Table A1) — all 13 measures with the published
thresholds, complementing ``prepare.repetition_stats``'s light
2-measure variant (kept for back-compat; ``clean_cli --repetition``)
and ``prepare.gopher_quality_filter``'s document-quality rules (the
same appendix's OTHER table — compose both for the complete Gopher
gate).

Measures (exact semantics in ``gopher_repetition_stats``; the
``top_*`` fractions count OVERLAPPING occurrences — as the published
implementations do — so a degenerate doc like "one two one two …" can
score above 1.0, which simply fails harder.  The n-gram rules
presuppose ``gopher_quality_filter``'s 50-word minimum: on very short
documents a single occurrence already exceeds the threshold):

====================================  =========  ====================
measure                               threshold  computation shape
====================================  =========  ====================
``dup_line_fraction``                 0.30       per-row counter scan
``dup_para_fraction``                 0.30       per-row counter scan
``dup_line_char_fraction``            0.20       per-row counter scan
``dup_para_char_fraction``            0.20       per-row counter scan
``top_2gram_char_fraction``           0.20       per-row counter scan
``top_3gram_char_fraction``           0.18       per-row counter scan
``top_4gram_char_fraction``           0.16       per-row counter scan
``dup_5gram_char_fraction``           0.15       per-row counter scan
``dup_6gram_char_fraction``           0.14       per-row counter scan
``dup_7gram_char_fraction``           0.13       per-row counter scan
``dup_8gram_char_fraction``           0.12       per-row counter scan
``dup_9gram_char_fraction``           0.11       per-row counter scan
``dup_10gram_char_fraction``          0.10       per-row counter scan
====================================  =========  ====================

Scale shape — every measure is within-document state, so the whole
table is ONE map-only pass: zero shuffles, zero joins, row count in ==
row count out (plan-asserted).  History of the implementation, because
each step was measured (BENCH §4.23, OPTIMIZATION_r06.md):

* r4 EXPLODED (id, n, start, gram_hash) rows and counted via
  corpus-wide window/groupBy — locally fast, but it shuffles ~6 narrow
  rows per token ≈ 24× the raw text bytes over a real cluster's
  network: petabytes at the 100 TB target.  Rejected.
* r5 rewrote it as a pure Catalyst projection (sort_array + adjacent-
  equal scans over per-row gram-hash arrays) — shuffle-free, but every
  per-element step of a higher-order function is an INTERPRETED
  expression eval: 5.4 s warm at 48k docs, with the per-start hash
  fold alone costing 2.2 s, and restructuring the fold bought only
  1.16× because the bottleneck is expression-eval overhead itself.
* r6 moved the per-document loop into an Arrow-batched ``mapInArrow``
  kernel (the mandate's prescribed shape — "vectorized pandas/Arrow
  UDFs (no per-row Python)": one Python call per BATCH, with the
  per-doc work in C-level ``str.split``/``zip``/``Counter``) — the
  guide §4.2 pattern.  Measured 0.24 ms/doc single-core vs ~3.1
  ms/doc-core for the interpreted Catalyst form (~13×); the text
  crosses the Python boundary once, column-pruned to (id, text), and
  nothing ever shuffles, so the 100 TB story is unchanged.

Tokenization is raw whitespace (no lowercasing/punct-strip — Gopher
measures the document as written; the decontamination/dedup operators
normalize because THEY chase cosmetic edits, repetition does not).
The whitespace class is Java's ASCII ``\\s`` — ``[ \\t\\n\\x0b\\f\\r]``
— NOT Python's unicode-aware ``\\s``, so the kernel splits and trims
exactly like the Catalyst/DuckDB formulations (NBSP stays inside a
token; pinned by the NBSP row of tests/test_repetition.py).
Character counts are sums of token code-point lengths (separators
excluded from numerator and denominator alike); line/paragraph chars
count the trimmed element text.  Cross-engine note: every measure is
integer-ratio arithmetic — the single ``int/int`` division produces
the identical IEEE double in CPython and the JVM for operands
< 2^53, so no floating accumulation order needs pinning.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator
from itertools import accumulate

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gopher_repetition_stats", "gopher_repetition_filter",
           "GOPHER_REPETITION_THRESHOLDS"]

_TOP_NS = (2, 3, 4)
_DUP_NS = (5, 6, 7, 8, 9, 10)

# Rae et al. 2021, Table A1 — published thresholds, in the table's own
# order (first-failing-rule reasons follow it; the stats output column
# order follows it too)
GOPHER_REPETITION_THRESHOLDS: dict[str, float] = {
    "dup_line_fraction": 0.30,
    "dup_para_fraction": 0.30,
    "dup_line_char_fraction": 0.20,
    "dup_para_char_fraction": 0.20,
    "top_2gram_char_fraction": 0.20,
    "top_3gram_char_fraction": 0.18,
    "top_4gram_char_fraction": 0.16,
    "dup_5gram_char_fraction": 0.15,
    "dup_6gram_char_fraction": 0.14,
    "dup_7gram_char_fraction": 0.13,
    "dup_8gram_char_fraction": 0.12,
    "dup_9gram_char_fraction": 0.11,
    "dup_10gram_char_fraction": 0.10,
}

# Java \s (ASCII) — the class every engine-side split/trim uses; a bare
# Python \s would additionally match NBSP/U+2028/… and drift from the
# Catalyst and DuckDB formulations
_JWS = " \t\n\x0b\f\r"
_RE_TOK = re.compile(f"[{_JWS}]+")
_RE_TRIM = re.compile(f"^[{_JWS}]+|[{_JWS}]+$")
_RE_PARA = re.compile(r"\n[ \t\r]*\n")

_ZEROS = (0.0,) * 13


def _dup_fracs(els: list[str]) -> tuple[float, float]:
    """(dup_fraction, dup_char_fraction) of an element list:
    occurrences beyond the first of each distinct value / total, plain
    and char-length-weighted."""
    if not els:
        return 0.0, 0.0
    c = Counter(els)
    d = dc = totc = 0
    for e, v in c.items():
        le = len(e)
        totc += v * le
        if v > 1:
            d += v - 1
            dc += (v - 1) * le
    return (d / len(els), dc / totc if totc else 0.0)


def _doc_measures(text: str | None) -> tuple[float, ...]:
    """All 13 Table A1 measures for one document (column order =
    GOPHER_REPETITION_THRESHOLDS)."""
    if not text:
        return _ZEROS
    sub = _RE_TRIM.sub
    lines = [e for e in (sub("", x) for x in text.split("\n")) if e]
    paras = [e for e in (sub("", x) for x in _RE_PARA.split(text)) if e]
    dlf, dlcf = _dup_fracs(lines)
    dpf, dpcf = _dup_fracs(paras)

    toks = [t for t in _RE_TOK.split(text) if t]
    w = len(toks)
    tl = [len(t) for t in toks]
    tc = sum(tl)
    out = [dlf, dpf, dlcf, dpcf]
    if tc == 0:
        out.extend([0.0] * 9)
        return tuple(out)

    # top-{2,3,4}: most frequent (overlapping) word n-gram; char mass =
    # count × Σ token lengths, ties toward the larger char footprint
    for n in _TOP_NS:
        if w < n:
            out.append(0.0)
            continue
        cnt = Counter(zip(*[toks[k:] for k in range(n)]))
        best_c, best_l = max((v, sum(map(len, g)))
                             for g, v in cnt.items())
        out.append(best_c * best_l / tc)

    # dup-{5..10}: Σ lengths of tokens covered by ≥1 n-gram occurring
    # ≥2 times (positions counted once) — interval-union scan over the
    # ascending duplicate starts against a token-length prefix sum
    pre = [0, *accumulate(tl)]
    for n in _DUP_NS:
        if w < n:
            out.append(0.0)
            continue
        grams = list(zip(*[toks[k:] for k in range(n)]))
        cnt = Counter(grams)
        covered = 0
        end = 0
        for s, g in enumerate(grams):
            if cnt[g] >= 2:
                lo = s if s > end else end
                hi = s + n
                covered += pre[hi] - pre[lo]
                end = hi
        out.append(covered / tc)
    return tuple(out)


def _make_kernel(n_measures: int):
    import pyarrow as pa

    def kernel(batches: Iterator["pa.RecordBatch"]
               ) -> Iterator["pa.RecordBatch"]:
        out_schema = None
        for batch in batches:
            if out_schema is None:
                out_schema = pa.schema(
                    [batch.schema.field(0)]
                    + [pa.field(m, pa.float64())
                       for m in GOPHER_REPETITION_THRESHOLDS])
            cols: list[list[float]] = [[] for _ in range(n_measures)]
            for text in batch.column(1).to_pylist():
                m = _doc_measures(text)
                for j in range(n_measures):
                    cols[j].append(m[j])
            yield pa.RecordBatch.from_arrays(
                [batch.column(0)]
                + [pa.array(c, type=pa.float64()) for c in cols],
                schema=out_schema)

    return kernel


def gopher_repetition_stats(df: DataFrame, *, text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Per-document frame with every Table A1 repetition measure.

    Exact semantics (deterministic, engine-reproducible):

    * lines split on ``\\n``, paragraphs on blank-line runs
      (``\\n[ \\t\\r]*\\n``); elements trimmed (Java-``\\s`` class),
      empties dropped; ``dup_*_fraction`` = occurrences beyond the
      first of each distinct element / total elements,
      ``dup_*_char_fraction`` the same with elements weighted by their
      character length;
    * tokens = whitespace split (Java-``\\s``); total chars = Σ token
      lengths;
    * ``top_{n}gram_char_fraction`` = c·len(g) / total chars, where g
      is the most frequent word n-gram (c its overlapping-occurrence
      count, len the sum of its token lengths; ties broken toward the
      larger character footprint — the stricter gate);
    * ``dup_{n}gram_char_fraction`` = Σ lengths of tokens covered by
      at least one n-gram occurring ≥2 times / total chars (positions
      counted once however many duplicated grams overlap them).

    NULL/empty text and docs shorter than n tokens score 0.0 — a row
    always appears, never vanishes.

    Shape: one column-pruned (id, text) projection into an
    Arrow-batched ``mapInArrow`` kernel (the module docstring's r6
    note: ~13× the interpreted Catalyst formulation, measured) — zero
    shuffles, zero joins, no Generate/Window; the id column passes
    through the kernel untouched as its original Arrow array.
    """
    from pyspark.sql import types as T

    id_field = df.schema[id_col]
    out_type = T.StructType(
        [T.StructField(id_field.name, id_field.dataType, True)]
        + [T.StructField(m, T.DoubleType(), True)
           for m in GOPHER_REPETITION_THRESHOLDS])
    return df.select(id_col, text_col).mapInArrow(
        _make_kernel(len(GOPHER_REPETITION_THRESHOLDS)), out_type)


def gopher_repetition_filter(df: DataFrame, *, text_col: str = "text",
                             id_col: str = "doc_id",
                             thresholds: dict[str, float] | None = None
                             ) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into ``(kept, ledger)`` on the Table A1 thresholds
    (override individual ones via ``thresholds`` — unknown keys
    raise).  Ledger reasons name the FIRST failing measure in the
    table's order: ``rep_dup_line`` / ``rep_dup_para`` /
    ``rep_dup_line_char`` / ``rep_dup_para_char`` / ``rep_top_2gram``
    … ``rep_dup_10gram``."""
    limits = dict(GOPHER_REPETITION_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(limits)
        if unknown:
            raise ValueError(f"unknown repetition measures: "
                             f"{sorted(unknown)}")
        limits.update(thresholds)

    stats = gopher_repetition_stats(df, text_col=text_col, id_col=id_col)
    joined = df.join(stats, id_col)
    reason = None
    for measure in GOPHER_REPETITION_THRESHOLDS:  # table order
        tag = "rep_" + measure.removesuffix("_fraction")
        if tag.endswith("gram_char"):  # the n-gram rules are all
            tag = tag.removesuffix("_char")  # char-based — no ambiguity
        cond = F.col(measure) > F.lit(limits[measure])
        reason = (F.when(cond, tag) if reason is None
                  else reason.when(cond, tag))
    tagged = joined.withColumn("_reject", reason)
    kept = tagged.filter(F.col("_reject").isNull()).select(*df.columns)
    ledger = (tagged.filter(F.col("_reject").isNotNull())
              .select(F.col(id_col).alias("id"),
                      F.col("_reject").alias("reject_reason")))
    return kept, ledger
