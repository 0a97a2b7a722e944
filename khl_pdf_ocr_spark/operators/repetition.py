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
``top_2gram_char_fraction``           0.20       per-row sorted scan
``top_3gram_char_fraction``           0.18       per-row sorted scan
``top_4gram_char_fraction``           0.16       per-row sorted scan
``dup_5gram_char_fraction``           0.15       per-row sorted scan
``dup_6gram_char_fraction``           0.14       per-row sorted scan
``dup_7gram_char_fraction``           0.13       per-row sorted scan
``dup_8gram_char_fraction``           0.12       per-row sorted scan
``dup_9gram_char_fraction``           0.11       per-row sorted scan
``dup_10gram_char_fraction``          0.10       per-row sorted scan
====================================  =========  ====================

Scale shape — every measure is within-document state, so the whole
table is ONE projection pipeline: zero shuffles, zero joins, row
count in == row count out (plan-asserted).  The trick everywhere is
``sort_array`` + an adjacent-equal scan with scalar accumulators —
duplicate detection over a sorted array is neighbor equality, never a
per-row membership test (which would be O(grams × dups)) and never an
array-building accumulator (appending inside ``aggregate`` copies the
array per step — the quadratic trap ``paragraphs.py`` documents).
The first version instead EXPLODED (id, n, start, gram_hash) rows for
the nine n-gram measures and counted via corpus-wide window/groupBy —
locally ~1.4× faster warm (a local shuffle is a memcpy), but it
shuffles ~6 narrow rows per token ≈ 24× the raw text bytes over a
real cluster's network: petabytes at the 100 TB target.  The per-row
form trades that for per-task CPU that scales with W log W per
document.  Both were measured and outputs are identical — BENCH §4.23.

Grams are hashed — one shared incremental ``xxhash64`` fold per start
position covering all six dup orders — and compared by hash: a 64-bit
collision merging two distinct grams within one document is ~2^-64
per pair and would only PERTURB a fraction, never crash (the
MinHash/SimHash banding precedent).

Tokenization is raw whitespace (no lowercasing/punct-strip — Gopher
measures the document as written; the decontamination/dedup operators
normalize because THEY chase cosmetic edits, repetition does not).
Character counts are sums of token lengths (separators excluded from
numerator and denominator alike); line/paragraph chars count the
trimmed element text.  Cross-engine note: every measure is
integer-ratio arithmetic — no floating accumulation order to pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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

    # dup-{5..10}: PER ROW, like top-{2,3,4} — duplicate-gram
    # detection is within-document state, so sort the (hash, start)
    # gram array and duplicates become NEIGHBOR equalities (never the
    # O(grams × dups) membership test the explode version was built to
    # avoid).  This removes the explode AND every shuffle in the query
    # (the window count, the groupBy/pivot, and the join back are all
    # gone — measured 3.4× end-to-end, BENCH §4.23).  Gram hash = left
    # fold of F.xxhash64(acc, token_hash) over a PRE-HASHED token
    # array (measured ~1.4× the concat-the-window-then-hash variant:
    # the window's characters are hashed once per token, not once per
    # containing gram).
    hashed = base.select(
        "*", F.transform(F.col("_tk"), lambda t: F.xxhash64(t)).alias("_th"),
        F.transform(F.col("_tk"),
                    lambda t: F.length(t).cast("long")).alias("_tl"))

    # all six gram orders from ONE incremental fold per start position:
    # h5(i) folds 5 token hashes, then h_{n+1}(i) = xxhash64(h_n(i),
    # th[i+n]) — 10 hash calls per start instead of the 45 that six
    # independent slice-folds pay (hash VALUES are identical: the fold
    # chain is the same, only shared).  F.get past the end is NULL and
    # the resulting h_n is garbage-but-unused (per-n slices below stop
    # at the last valid start).
    n_lo, n_hi = _DUP_NS[0], _DUP_NS[-1]

    def all_orders(i):
        h = F.aggregate(F.slice(F.col("_th"), i + 1, n_lo),
                        F.lit(0).cast("long"),
                        lambda a, b: F.xxhash64(a, b))
        fields, cur = [h.alias(f"h{n_lo}")], h
        for n in range(n_lo + 1, n_hi + 1):
            cur = F.xxhash64(cur, F.get(F.col("_th"), i + n - 1))
            fields.append(cur.alias(f"h{n}"))
        return F.struct(*fields)

    folded = hashed.select(
        "*",
        F.when(F.col("_w") >= n_lo,
               F.transform(F.sequence(F.lit(0), F.col("_w") - n_lo),
                           all_orders))
         .otherwise(F.array().cast(
             "array<struct<" + ",".join(f"h{n}:bigint"
                                        for n in _DUP_NS) + ">>"))
        .alias("_gh"))

    def gram_sorted(n: int):
        # sorted by (gh, s) — struct field order drives sort_array; the
        # slice keeps starts 0..w-n and the transform index IS the
        # start (2-arg lambda = (element, index), intended here)
        empty = F.array().cast("array<struct<gh:bigint,s:int>>")
        return F.when(F.col("_w") >= n, F.sort_array(F.transform(
            F.slice(F.col("_gh"), 1, F.col("_w") - n + 1),
            lambda e, i: F.struct(e[f"h{n}"].alias("gh"),
                                  i.cast("int").alias("s"))))) \
                .otherwise(empty)

    staged = folded.select(
        "*", *[gram_sorted(n).alias(f"_g{n}") for n in _DUP_NS])

    def dup_chars(n: int):
        # indices whose gram hash equals a sorted neighbor's = every
        # occurrence of a within-doc duplicated gram.  F.get is 0-based
        # and NULL out of range (ANSI-safe at both array edges; NULL
        # comparisons collapse to not-true in filter).  Covered chars =
        # the linear interval-union scan over the re-sorted start
        # positions against the token-length array: each interval is
        # [s, s+n) and starts ascend, so the uncovered remainder
        # [max(s, prev_end), s+n) is never empty.
        g = F.col(f"_g{n}")

        def is_dup(j):
            return ((F.get(g, j - 1)["gh"] == F.get(g, j)["gh"])
                    | (F.get(g, j + 1)["gh"] == F.get(g, j)["gh"]))

        idx = F.when(F.size(g) > 0,
                     F.sequence(F.lit(0), F.size(g) - 1)) \
               .otherwise(F.array().cast("array<int>"))
        starts = F.sort_array(F.transform(F.filter(idx, is_dup),
                                          lambda j: F.get(g, j)["s"]))

        zero_iv = F.struct(F.lit(0).cast("int").alias("end"),
                           F.lit(0).cast("long").alias("tot"))

        def iv_step(acc, s):
            lo = F.greatest(s, acc["end"])
            hi = s + F.lit(n)
            piece = F.aggregate(
                F.sequence(lo, hi - 1), F.lit(0).cast("long"),
                lambda t, p: t + F.element_at(F.col("_tl"), p + 1))
            return F.struct(hi.cast("int").alias("end"),
                            (acc["tot"] + piece).alias("tot"))

        return F.aggregate(starts, zero_iv, iv_step)["tot"].alias(f"_dup{n}")

    out = staged.select(
        "_id", "_tc", "dup_line_fraction", "dup_line_char_fraction",
        "dup_para_fraction", "dup_para_char_fraction",
        *[F.col(f"_top{n}") for n in _TOP_NS],
        *[dup_chars(n) for n in _DUP_NS])
    gram_cols = [
        *[_frac(F.col(f"_top{n}"), F.col("_tc"))
          .alias(f"top_{n}gram_char_fraction") for n in _TOP_NS],
        *[_frac(F.col(f"_dup{n}"), F.col("_tc"))
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
