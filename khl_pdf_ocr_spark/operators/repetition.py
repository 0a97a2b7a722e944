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
``dup_line_fraction``                 0.30       per-row sorted scan
``dup_para_fraction``                 0.30       per-row sorted scan
``dup_line_char_fraction``            0.20       per-row sorted scan
``dup_para_char_fraction``            0.20       per-row sorted scan
``top_2gram_char_fraction``           0.20       explode → groupBy
``top_3gram_char_fraction``           0.18       explode → groupBy
``top_4gram_char_fraction``           0.16       explode → groupBy
``dup_5gram_char_fraction``           0.15       explode → window
``dup_6gram_char_fraction``           0.14       explode → window
``dup_7gram_char_fraction``           0.13       explode → window
``dup_8gram_char_fraction``           0.12       explode → window
``dup_9gram_char_fraction``           0.11       explode → window
``dup_10gram_char_fraction``          0.10       explode → window
====================================  =========  ====================

Scale shape — the two cost classes, chosen deliberately:

* The four line/paragraph measures need only per-value occurrence
  counts WITHIN one document: ``sort_array`` + an adjacent-equal
  ``aggregate`` scan with scalar accumulators — O(k log k) per row,
  ZERO shuffles, and no array-building accumulator (appending to an
  array inside ``aggregate`` copies it per step — the quadratic trap
  ``paragraphs.py`` documents).
* The nine n-gram measures need positions of grams whose value
  repeats, and a per-row membership test of "is this gram duplicated"
  against a per-row dup set is O(grams × dups) interpreted — the
  melt-on-long-docs class.  So they explode: ONE tagged pass emits
  (id, n, start, gram_hash) for n = 2..10 (~9 narrow rows per token),
  top-{2,3,4} group by (id, n, hash), dup-{5..10} count via a window
  on the same key, then covered token positions explode/distinct and
  join token lengths.  Every shuffle is keyed by (id, ...) — skew is
  bounded by the longest single document, and rows are 4 scalars wide
  (the token array itself never crosses the explode — the
  ``chunk_documents`` generator-carry lesson).

Grams are hashed (``xxhash64`` of the space-joined window) before the
shuffle — a 64-bit collision merging two distinct grams within one
document is ~2^-64 per pair and would only PERTURB a fraction, never
crash (the MinHash/SimHash banding precedent).

Tokenization is raw whitespace (no lowercasing/punct-strip — Gopher
measures the document as written; the decontamination/dedup operators
normalize because THEY chase cosmetic edits, repetition does not).
Character counts are sums of token lengths (separators excluded from
numerator and denominator alike); line/paragraph chars count the
trimmed element text.  Cross-engine note: every measure is
integer-ratio arithmetic — no floating accumulation order to pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gopher_repetition_stats", "gopher_repetition_filter",
           "GOPHER_REPETITION_THRESHOLDS"]

_TOP_NS = (2, 3, 4)
_DUP_NS = (5, 6, 7, 8, 9, 10)

# Rae et al. 2021, Table A1 — published thresholds, in the table's own
# order (first-failing-rule reasons follow it)
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


def _elements(text, sep_regex: str):
    """Trimmed non-empty elements of ``text`` split on ``sep_regex``.

    Trim = explicit ``\\s``-class strip, NOT ``F.trim`` — SQL trim
    removes only the space character, so a tab-padded line would
    survive in one engine and vanish in another (Python ``strip()``
    and DuckDB ``trim()`` disagree with it in different directions).
    """
    return F.filter(F.transform(F.split(text, sep_regex),
                                lambda e: F.regexp_replace(
                                    e, r"^\s+|\s+$", "")),
                    lambda e: F.length(e) > 0)


def _dup_scan(arr):
    """(n_dup_occurrences, dup_chars) over an array — occurrences
    beyond the first of each distinct value, and the sum of their
    lengths.  Sorted adjacent-equal scan, scalar accumulators only."""
    zero = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).cast("long").alias("d"),
                    F.lit(0).cast("long").alias("dc"))

    def step(acc, x):
        is_dup = acc["prev"].isNotNull() & (x == acc["prev"])
        one = F.when(is_dup, F.lit(1).cast("long")).otherwise(F.lit(0))
        chars = F.when(is_dup, F.length(x).cast("long")).otherwise(F.lit(0))
        return F.struct(x.alias("prev"), (acc["d"] + one).alias("d"),
                        (acc["dc"] + chars).alias("dc"))

    return F.aggregate(F.sort_array(arr), zero, step)


def _chars(arr):
    """Sum of element lengths (long)."""
    return F.aggregate(arr, F.lit(0).cast("long"),
                       lambda acc, x: acc + F.length(x).cast("long"))


def _frac(num, den):
    return F.when(den > 0, num.cast("double") / den.cast("double")) \
            .otherwise(F.lit(0.0))


def gopher_repetition_stats(df: DataFrame, *, text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Per-document frame with every Table A1 repetition measure.

    Exact semantics (deterministic, engine-reproducible):

    * lines split on ``\\n``, paragraphs on blank-line runs
      (``\\n[ \\t\\r]*\\n``); elements trimmed, empties dropped;
      ``dup_*_fraction`` = occurrences beyond the first of each
      distinct element / total elements, ``dup_*_char_fraction``
      the same with elements weighted by their character length;
    * tokens = whitespace split; total chars = Σ token lengths;
    * ``top_{n}gram_char_fraction`` = c·len(g) / total chars, where g
      is the most frequent word n-gram (c its overlapping-occurrence
      count, len the sum of its token lengths; ties broken toward the
      larger character footprint — the stricter gate);
    * ``dup_{n}gram_char_fraction`` = Σ lengths of tokens covered by
      at least one n-gram occurring ≥2 times / total chars (positions
      counted once however many duplicated grams overlap them).

    NULL/empty text and docs shorter than n tokens score 0.0 — a row
    always appears, never vanishes.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0)
    lines = _elements(text, r"\n")
    paras = _elements(text, r"\n[ \t\r]*\n")

    ldup, pdup = _dup_scan(lines), _dup_scan(paras)
    w_col = F.size(F.col("_tk"))

    # top-{2,3,4} PER ROW (measured 2× the explode→groupBy version,
    # and zero shuffle): sort the gram-string array, then one
    # adjacent-equal scan tracking the best run — scalar accumulators
    # only.  Exact string equality (no hash), ties toward the larger
    # char footprint.  Gram char length = string length − (n−1)
    # separators (tokens are whitespace-free, so the NUL join is
    # unambiguous for any token not itself containing NUL).
    def _top_chars(n: int):
        def one(i):
            return F.concat_ws("\x00", F.slice(F.col("_tk"), i + 1, n))
        grams = F.when(w_col >= n, F.sort_array(
            F.transform(F.sequence(F.lit(0), w_col - n), one))) \
            .otherwise(F.array().cast("array<string>"))
        zero = F.struct(F.lit(None).cast("string").alias("prev"),
                        F.lit(0).cast("long").alias("run"),
                        F.lit(0).cast("long").alias("best"),
                        F.lit(0).cast("long").alias("bl"))

        def step(acc, x):
            run = (F.when(acc["prev"].isNotNull() & (x == acc["prev"]),
                          acc["run"] + 1)
                   .otherwise(F.lit(1).cast("long")))
            xl = (F.length(x) - F.lit(n - 1)).cast("long")
            better = (run > acc["best"]) | ((run == acc["best"])
                                            & (xl > acc["bl"]))
            return F.struct(
                x.alias("prev"), run.alias("run"),
                F.when(better, run).otherwise(acc["best"]).alias("best"),
                F.when(better, xl).otherwise(acc["bl"]).alias("bl"))

        fin = F.aggregate(grams, zero, step)
        return (fin["best"] * fin["bl"]).alias(f"_top{n}")

    base = (df.select(
        F.col(id_col).alias("_id"), toks.alias("_tk"),
        _frac(ldup["d"], F.size(lines)).alias("dup_line_fraction"),
        _frac(ldup["dc"], _chars(lines)).alias("dup_line_char_fraction"),
        _frac(pdup["d"], F.size(paras)).alias("dup_para_fraction"),
        _frac(pdup["dc"], _chars(paras)).alias("dup_para_char_fraction"))
        .select("*", _chars(F.col("_tk")).alias("_tc"),
                w_col.alias("_w"), *[_top_chars(n) for n in _TOP_NS]))

    # dup-{5..10}: ONE tagged explode of (n, start, hash) scalars —
    # the token array stays behind.  Gram hash = left fold of
    # F.xxhash64(acc, token_hash) over a PRE-HASHED token array
    # (measured ~1.4× the concat-the-window-then-hash variant: the
    # window's characters are hashed once per token, not once per
    # containing gram).
    hashed = base.withColumn(
        "_th", F.transform(F.col("_tk"), lambda t: F.xxhash64(t)))

    def gram_structs(n: int):
        # NB: one(i) must stay 1-arg — F.transform treats a 2-param
        # callable as (element, index) and silently rebinds defaults;
        # gram_structs itself is the closure factory capturing n
        def one(i):
            h = F.aggregate(F.slice(F.col("_th"), i + 1, n),
                            F.lit(0).cast("long"),
                            lambda a, b: F.xxhash64(a, b))
            return F.struct(F.lit(n).alias("n"), i.alias("s"),
                            h.alias("gh"))
        empty = F.array().cast("array<struct<n:int,s:int,gh:bigint>>")
        return F.when(F.col("_w") >= n,
                      F.transform(F.sequence(F.lit(0), F.col("_w") - n),
                                  one)) \
                .otherwise(empty)

    occ = (hashed.select("_id", F.explode(F.flatten(F.array(
               *[gram_structs(n) for n in _DUP_NS]))).alias("g"))
           .select("_id", "g.*"))

    # occurrences of grams repeating within the doc (window keeps the
    # rows flat — no per-hot-gram array during the count), collapsed
    # to ONE row per (doc, n) carrying the sorted duplicate start
    # positions; covered chars = a linear interval-union scan over
    # those starts against the doc's token-length array (replaces the
    # covered-position explode → distinct → token join of the first
    # version — two corpus-scale shuffles gone).  Starts are strictly
    # increasing and every interval has length n, so each interval's
    # uncovered remainder [max(s, prev_end), s+n) is never empty.
    cnt_w = Window.partitionBy("_id", "n", "gh")
    dup_starts = (occ.withColumn("c", F.count(F.lit(1)).over(cnt_w))
                  .filter(F.col("c") >= 2)
                  .groupBy("_id", "n")
                  .agg(F.sort_array(F.collect_list("s")).alias("ss")))

    zero_iv = F.struct(F.lit(0).cast("int").alias("end"),
                       F.lit(0).cast("long").alias("tot"))

    def iv_step(acc, s):
        lo = F.greatest(s, acc["end"])
        hi = s + F.col("n")
        piece = F.aggregate(
            F.sequence(lo, hi - 1), F.lit(0).cast("long"),
            lambda t, p: t + F.element_at(F.col("_tl"), p + 1))
        return F.struct(hi.cast("int").alias("end"),
                        (acc["tot"] + piece).alias("tot"))

    dup = (dup_starts
           .join(base.select(
               "_id", F.transform(F.col("_tk"),
                                  lambda t: F.length(t).cast("long"))
               .alias("_tl")), "_id")
           .select("_id", "n",
                   F.aggregate("ss", zero_iv, iv_step)["tot"]
                   .alias("chars"))
           .groupBy("_id").pivot("n", list(_DUP_NS)).agg(F.first("chars")))
    dup = dup.select("_id", *[F.col(str(n)).alias(f"_dup{n}")
                              for n in _DUP_NS])

    out = base.drop("_tk").join(dup, "_id", "left")
    gram_cols = [
        *[_frac(F.coalesce(F.col(f"_top{n}"), F.lit(0)), F.col("_tc"))
          .alias(f"top_{n}gram_char_fraction") for n in _TOP_NS],
        *[_frac(F.coalesce(F.col(f"_dup{n}"), F.lit(0)), F.col("_tc"))
          .alias(f"dup_{n}gram_char_fraction") for n in _DUP_NS],
    ]
    return out.select(
        F.col("_id").alias(id_col),
        "dup_line_fraction", "dup_para_fraction",
        "dup_line_char_fraction", "dup_para_char_fraction", *gram_cols)


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
