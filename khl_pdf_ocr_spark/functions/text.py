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
           "quality_score", "lang_id", "normalized_text", "fingerprint",
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


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic (length / punctuation /
    stopword / digit signals) — the web-scale "keep this document?"
    scoring stage of a training-data pipeline.

        score = 0.4*min(1, tokens/100)           (long enough)
              + 0.3*min(1, 5*stopwords/tokens)   (natural language)
              + 0.2*(1 - min(1, 10*digits/chars))(not a number dump)
              + 0.1*(1 - min(1, 10*punct/chars)) (not markup soup)
    """
    from khl_pdf_ocr_spark.functions.rounding import round_half_up

    n_tok = token_count(col).cast("double")
    n_chr = F.greatest(F.length(col).cast("double"), F.lit(1.0))
    safe_tok = F.greatest(n_tok, F.lit(1.0))
    return round_half_up(
        F.lit(0.4) * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + F.lit(0.3) * F.least(F.lit(1.0),
                               F.lit(5.0) * stopword_count(col).cast("double") / safe_tok)
        + F.lit(0.2) * (F.lit(1.0) - F.least(F.lit(1.0),
                                             F.lit(10.0) * digit_count(col).cast("double") / n_chr))
        + F.lit(0.1) * (F.lit(1.0) - F.least(F.lit(1.0),
                                             F.lit(10.0) * punct_count(col).cast("double") / n_chr)),
        4)


def lang_id(col: Column) -> Column:
    """Character/stopword n-gram heuristic → 'ru' / 'en' / 'other'."""
    n_chr = F.greatest(F.length(col).cast("double"), F.lit(1.0))
    cyr_ratio = cyrillic_count(col).cast("double") / n_chr
    sw = stopword_count(col)
    return (F.when(cyr_ratio > 0.3, F.lit("ru"))
            .when(sw >= 3, F.lit("en"))
            .otherwise(F.lit("other")))


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
