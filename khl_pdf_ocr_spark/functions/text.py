"""Text-analytics building blocks over a string column.

Every function here is expressible in ANSI SQL (the oracle contract);
the regex/stopword constants are shared with the SQL strings in
``__spark_entry__.py`` so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["EN_STOPWORDS", "STOPWORD_RE", "PUNCT_RE", "DIGIT_RE", "CYRILLIC_RE",
           "BPE_TOKEN_RE", "tokens", "token_count", "stopword_count",
           "punct_count", "digit_count", "cyrillic_count", "bpe_token_count",
           "quality_score", "lang_id", "text_analytics", "normalized_text", "fingerprint",
           "with_winnow_fingerprint"]

# tiny, fixed stopword list — a deterministic heuristic, not linguistics
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
STOPWORD_RE = r"\b(" + "|".join(EN_STOPWORDS) + r")\b"
PUNCT_RE = r"[.,!?;:]"
DIGIT_RE = r"[0-9]"
CYRILLIC_RE = r"[а-яёА-ЯЁ]"
WS_SPLIT_RE = r"\s+"
# GPT-2-style pre-tokenizer shape (letter runs / digit runs / symbol
# runs, each absorbing one leading space), restricted to constructs
# both engines implement identically: NO lookahead (DuckDB's RE2 has
# none), explicit character classes instead of \p{L}/\s (Java and RE2
# disagree at the edges of Unicode properties and \s).  The alternation
# branches are first-character-disjoint after the optional space, so
# Java's leftmost-first and RE2's leftmost-first agree on every match
# boundary; whitespace runs are separators, never tokens.
_LETTER = "A-Za-zА-Яа-яЁё"
BPE_TOKEN_RE = (f" ?[{_LETTER}]+"
                f"| ?[0-9]+"
                f"| ?[^ \\t\\n\\r{_LETTER}0-9]+")


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), WS_SPLIT_RE)


def token_count(col: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings, NULL for NULL
    (matching SQL semantics — Spark's bare size(split(NULL)) would give
    the legacy -1)."""
    return (F.when(col.isNull(), F.lit(None).cast("int"))
            .when(F.length(F.trim(col)) == 0, F.lit(0))
            .otherwise(F.size(tokens(col))))


def stopword_count(col: Column) -> Column:
    return F.regexp_count(F.lower(col), F.lit(STOPWORD_RE))


def punct_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(PUNCT_RE))


def digit_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(DIGIT_RE))


def cyrillic_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(CYRILLIC_RE))


def bpe_token_count(col: Column) -> Column:
    """Sub-word-ish token count: matches of the GPT-2-shaped
    pre-tokenizer regex (``BPE_TOKEN_RE``) — the cheap LLM-budget
    estimator of a training-data pipeline (whitespace tokens
    under-count CJK-free web text by ~1.3-1.5× vs BPE; counting
    letter/digit/symbol runs tracks real tokenizers far closer while
    staying a single vectorized JVM regex pass).  NULL for NULL."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE))


def quality_score(col: Column, *, n_tok: Column | None = None,
                  n_sw: Column | None = None, n_dig: Column | None = None,
                  n_punct: Column | None = None,
                  n_chr: Column | None = None) -> Column:
    """Deterministic [0,1] quality heuristic (length / punctuation /
    stopword / digit signals) — the web-scale "keep this document?"
    scoring stage of a training-data pipeline.

        score = 0.4*min(1, tokens/100)           (long enough)
              + 0.3*min(1, 5*stopwords/tokens)   (natural language)
              + 0.2*(1 - min(1, 10*digits/chars))(not a number dump)
              + 0.1*(1 - min(1, 10*punct/chars)) (not markup soup)

    The keyword columns let ``text_analytics`` substitute counts it
    already computed (same expression tree, shared operands — so the
    fused query can never drift from the standalone one).
    """
    from khl_pdf_ocr_spark.functions.rounding import round_half_up

    n_tok = (token_count(col) if n_tok is None else n_tok).cast("double")
    if n_chr is None:
        n_chr = F.greatest(F.length(col).cast("double"), F.lit(1.0))
    n_sw = stopword_count(col) if n_sw is None else n_sw
    n_dig = digit_count(col) if n_dig is None else n_dig
    n_punct = punct_count(col) if n_punct is None else n_punct
    safe_tok = F.greatest(n_tok, F.lit(1.0))
    return round_half_up(
        F.lit(0.4) * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + F.lit(0.3) * F.least(F.lit(1.0),
                               F.lit(5.0) * n_sw.cast("double") / safe_tok)
        + F.lit(0.2) * (F.lit(1.0) - F.least(F.lit(1.0),
                                             F.lit(10.0) * n_dig.cast("double") / n_chr))
        + F.lit(0.1) * (F.lit(1.0) - F.least(F.lit(1.0),
                                             F.lit(10.0) * n_punct.cast("double") / n_chr)),
        4)


def lang_id(col: Column, *, n_cyr: Column | None = None,
            n_sw: Column | None = None, n_chr: Column | None = None) -> Column:
    """Character/stopword n-gram heuristic → 'ru' / 'en' / 'other'."""
    if n_chr is None:
        n_chr = F.greatest(F.length(col).cast("double"), F.lit(1.0))
    cyr = cyrillic_count(col) if n_cyr is None else n_cyr
    sw = stopword_count(col) if n_sw is None else n_sw
    return (F.when(cyr.cast("double") / n_chr > 0.3, F.lit("ru"))
            .when(sw >= 3, F.lit("en"))
            .otherwise(F.lit("other")))


def text_analytics(df, text_col: str = "text",
                   id_cols: tuple[str, ...] = ("doc_id",)):
    """The full per-document analytics projection, staged so each
    distinct count (whitespace tokens, BPE-ish tokens, stopwords,
    digits, punctuation, Cyrillic chars, length) is computed ONCE and
    every derived column reuses it — the naive 5-column select
    recomputes stopword_count 3× and token_count 2× across
    quality_score/lang_id (r3 VERDICT #6; measured at sf0.1/48k docs:
    0.61 s staged vs 0.72 s naive, byte-identical values — the
    remaining cost is the irreducible distinct regex passes, see
    BENCH.md §4.13).  Output: id_cols + n_tokens, n_bpe_tokens,
    n_stopwords, quality, lang_pred."""
    c = F.col(text_col)
    s1 = df.select(
        *id_cols,
        token_count(c).alias("_ntok"),
        stopword_count(c).alias("_nsw"),
        digit_count(c).alias("_ndig"),
        punct_count(c).alias("_npun"),
        cyrillic_count(c).alias("_ncyr"),
        bpe_token_count(c).alias("_nbpe"),
        F.greatest(F.length(c).cast("double"), F.lit(1.0)).alias("_nchr"))
    dummy = F.lit("")  # every count is substituted; col itself unused
    return s1.select(
        *id_cols,
        F.col("_ntok").cast("long").alias("n_tokens"),
        F.col("_nbpe").cast("long").alias("n_bpe_tokens"),
        F.col("_nsw").cast("long").alias("n_stopwords"),
        quality_score(dummy, n_tok=F.col("_ntok"), n_sw=F.col("_nsw"),
                      n_dig=F.col("_ndig"), n_punct=F.col("_npun"),
                      n_chr=F.col("_nchr")).alias("quality"),
        lang_id(dummy, n_cyr=F.col("_ncyr"), n_sw=F.col("_nsw"),
                n_chr=F.col("_nchr")).alias("lang_pred"))


def normalized_text(col: Column) -> Column:
    """lowercase → strip punctuation → collapse whitespace → trim."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(col), PUNCT_RE, ""), WS_SPLIT_RE, " "))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (dedup key)."""
    return F.md5(normalized_text(col))


def _poly_hash(col: Column) -> Column:
    """Polynomial codepoint hash mod 2^31-1 over a string column —
    identical in ANSI SQL (see dedup.sql_token_hash)."""
    cps = F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(cps, F.lit(0).cast("long"),
                       lambda acc, c: (acc * F.lit(131) + c) % F.lit(2147483647))


def with_winnow_fingerprint(df, text_col: str = "text",
                            out_col: str = "winnow_fp",
                            k: int = 7, w: int = 4):
    """Winnowing document fingerprint (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003): hash every k-char gram of the normalized text, slide a
    window of w consecutive hashes, keep each window's minimum — the
    selected hash SET is robust to local edits and position shifts
    (plagiarism/near-dup detection granularity between md5-exact and
    shingle-Jaccard).  Byte-for-byte reproducible in SQL (the driver
    oracle recomputes it).

    STAGED projections on purpose: interpreted higher-order functions
    have no common-subexpression elimination, so an inline formulation
    re-evaluates the entire gram-hash pipeline once PER WINDOW —
    O(n_grams² · k) per row (measured: minutes at sf0.01).  Each stage
    below materializes its array as a plain column reference, keeping
    the whole thing O(n_grams · (k + w)).
    """
    t = normalized_text(F.col(text_col))
    step1 = df.withColumn("_wt", t)
    gidx = F.sequence(
        F.lit(1), F.greatest(F.length("_wt") - F.lit(k - 1), F.lit(1)))
    grams = F.transform(gidx, lambda i: F.col("_wt").substr(i, F.lit(k)))
    step2 = step1.withColumn("_whs", F.transform(grams, _poly_hash)).drop("_wt")
    widx = F.sequence(
        F.lit(0), F.greatest(F.size("_whs") - F.lit(w), F.lit(0)))
    sel = F.transform(
        widx, lambda j: F.array_min(F.slice(F.col("_whs"), j + F.lit(1), w)))
    return step2.withColumn(out_col,
                            F.sort_array(F.array_distinct(sel))).drop("_whs")
