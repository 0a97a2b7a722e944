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
    """Trimmed non-empty elements of ``text`` split on ``sep_regex``."""
    return F.filter(F.transform(F.split(text, sep_regex),
                                lambda e: F.trim(e)),
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
    base = df.select(
        F.col(id_col).alias("_id"), toks.alias("_tk"),
        _frac(ldup["d"], F.size(lines)).alias("dup_line_fraction"),
        _frac(ldup["dc"], _chars(lines)).alias("dup_line_char_fraction"),
        _frac(pdup["d"], F.size(paras)).alias("dup_para_fraction"),
        _frac(pdup["dc"], _chars(paras)).alias("dup_para_char_fraction"),
    ).withColumn("_tc", _chars(F.col("_tk"))) \
     .withColumn("_w", F.size("_tk"))

    # ONE tagged gram pass for all nine n values.  Rows are (n, start,
    # hash[, gram char length]) scalars — the token array stays behind.
    w_col = F.col("_w")

    def gram_structs(n: int):
        # NB: one(i) must stay 1-arg — F.transform treats a 2-param
        # callable as (element, index) and silently rebinds defaults;
        # gram_structs itself is the closure factory capturing n
        def one(i):
            win = F.slice(F.col("_tk"), i + 1, n)
            gl = (_chars(win) if n in _TOP_NS
                  else F.lit(None).cast("long"))
            return F.struct(F.lit(n).alias("n"), i.alias("s"),
                            F.xxhash64(F.concat_ws("\x00", win)).alias("gh"),
                            gl.alias("gl"))
        empty = F.array().cast(
            "array<struct<n:int,s:int,gh:bigint,gl:bigint>>")
        return F.when(w_col >= n,
                      F.transform(F.sequence(F.lit(0), w_col - n), one)) \
                .otherwise(empty)

    occ = (base.select("_id", F.explode(F.flatten(F.array(
               *[gram_structs(n) for n in _TOP_NS + _DUP_NS]))).alias("g"))
           .select("_id", "g.*"))

    # top-{2,3,4}: most frequent gram's count × its char length.
    # max(struct(c, gl)) = max count, ties → larger char footprint.
    top = (occ.filter(F.col("n").isin(*_TOP_NS))
           .groupBy("_id", "n", "gh")
           .agg(F.count(F.lit(1)).alias("c"), F.max("gl").alias("gl"))
           .groupBy("_id", "n")
           .agg(F.max(F.struct("c", "gl")).alias("b"))
           .select("_id", "n",
                   (F.col("b.c") * F.col("b.gl")).alias("chars"))
           .groupBy("_id").pivot("n", list(_TOP_NS)).agg(F.first("chars")))
    top = top.select("_id", *[F.col(str(n)).alias(f"_top{n}")
                              for n in _TOP_NS])

    # dup-{5..10}: occurrences of grams repeating within the doc →
    # covered token positions (distinct — overlaps count once) →
    # token lengths.  The window on (id, n, hash) keeps occurrence
    # rows flat (no collect_list array per hot gram).
    cnt_w = Window.partitionBy("_id", "n", "gh")
    covered = (occ.filter(F.col("n") >= _DUP_NS[0])
               .withColumn("c", F.count(F.lit(1)).over(cnt_w))
               .filter(F.col("c") >= 2)
               .select("_id", "n",
                       F.explode(F.sequence(
                           F.col("s"), F.col("s") + F.col("n") - 1))
                       .alias("p"))
               .distinct())
    tok_lens = (base.select("_id", F.posexplode("_tk").alias("p", "t"))
                .select("_id", "p", F.length("t").cast("long").alias("tl")))
    dup = (covered.join(tok_lens, ["_id", "p"])
           .groupBy("_id", "n").agg(F.sum("tl").alias("chars"))
           .groupBy("_id").pivot("n", list(_DUP_NS)).agg(F.first("chars")))
    dup = dup.select("_id", *[F.col(str(n)).alias(f"_dup{n}")
                              for n in _DUP_NS])

    out = base.drop("_tk").join(top, "_id", "left").join(dup, "_id", "left")
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
