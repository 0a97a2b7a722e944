"""Training-data preparation operators — the post-cleaning stages that
turn an extracted/deduped corpus into model-ready shards:

- ``chunk_documents``  : split long documents into token-bounded,
  overlapping chunks (the context-window packing precursor);
- ``redact_pii``       : deterministic regex scrubbing of emails /
  phone numbers / IPv4s, with per-kind match counts for audit;
- ``repetition_stats`` : Gopher/C4-style repetition heuristics
  (duplicate-line fraction, top word-2-gram fraction) used to drop
  template/boilerplate junk;
- ``repetition_filter``: the keep/reject split over those stats;
- ``hash_split``       : deterministic train/val/test assignment by
  seeded hash — stable across runs and cluster sizes, no RNG state.

Everything is built-in JVM expressions except ``repetition_stats``'s
2-gram mode, which is an explode→groupBy (two narrow shuffles over
(id, gram) pairs) — the per-doc interpreted-HOF alternative is O(n²)
per document and melts on long docs.

Scale notes: chunking explodes one row per chunk (bounded by
len/stride); PII redaction is three regexp_replace passes, pure
codegen; hash_split is a stateless projection (xxhash64 of id+seed),
so the same row lands in the same split on any cluster, any
partitioning, any day — the property that matters when the corpus is
rebuilt incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions import text as X

__all__ = ["chunk_documents", "redact_pii", "PII_PATTERNS",
           "repetition_stats", "repetition_filter", "pack_sequences",
           "decontaminate", "decontaminate_fuzzy", "deterministic_sample",
           "hash_split", "parse_split_weights", "parse_float_bounds",
           "c4_filters", "gopher_quality_filter"]


def chunk_documents(df: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id", max_tokens: int = 512,
                    overlap: int = 64) -> DataFrame:
    """One row per (doc, chunk): whitespace-token windows of
    ``max_tokens`` advancing by ``max_tokens - overlap``.

    Output: (id_col, chunk_id, chunk_text, n_tokens).  The final chunk
    may be short; empty/NULL docs yield zero chunks (filter upstream if
    they must be ledgered).  Pure array expressions, no Python, no
    shuffle (the explode multiplies rows in place; downstream
    repartition if chunk sizes skew partitions).

    Scale shape (r6 change #15 — MEASURED inversion of the r4 stance):
    the generator explodes only the tiny ``sequence(0, n_chunks-1)``
    chunk-id array; the token array is carried ACROSS the Generate as a
    per-input-row reference inside the same WholeStageCodegen stage
    (there is no Exchange in this pipeline, so it never serializes per
    chunk row) and each chunk's ``slice`` materializes only the tokens
    that chunk contains — amplification stays ``max_tokens / stride``
    (~1.14× at 512/64).  The r4 form instead built
    ``struct(chunk_id, piece)`` elements INSIDE a ``transform`` lambda,
    which evaluates interpreted per element: 27.4 s for 50k ~550-token
    docs and 28.3 s for ONE 200k-token doc, vs 8.1 s / 0.59 s for this
    form — identical rows (0-diff both corpora, pinned by the long-doc
    test's per-chunk accounting).
    """
    if overlap >= max_tokens:
        raise ValueError(f"overlap ({overlap}) must be < max_tokens "
                         f"({max_tokens}) or the stride is non-positive")
    stride = max_tokens - overlap
    # strip ALL edge whitespace before splitting: F.trim removes only
    # spaces, so a leading "\n" would otherwise yield a phantom empty
    # first token (and a "\n\n"-only doc a phantom 1-token chunk —
    # r4 review); the emptiness guard is rlike(\\S) for the same reason
    stripped = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    toks = F.split(stripped, r"\s+")
    n = F.size(F.col("_toks"))
    n_chunks = F.when(n <= max_tokens, F.lit(1)) \
        .otherwise(F.ceil((n - F.lit(max_tokens)) / F.lit(stride)) + 1) \
        .cast("int")
    piece = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1,
                    max_tokens)
    return (df.filter(F.col(text_col).isNotNull()
                      & F.col(text_col).rlike(r"\S"))
            .select(F.col(id_col), toks.alias("_toks"))
            .select(id_col, "_toks",
                    F.posexplode(F.sequence(F.lit(0), n_chunks - 1))
                    .alias("_p", "chunk_id"))
            .select(id_col, "chunk_id",
                    F.concat_ws(" ", piece).alias("chunk_text"),
                    F.size(piece).alias("n_tokens")))


# deterministic, intentionally conservative patterns (shared constants
# so tests / SQL twins can't drift); ORDER is semantic — emails first
# (digit runs inside an address must not half-redact as phones), then
# IPv4 BEFORE phone (dotted quads match the looser phone shape)
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # phone requires an explicit phone MARKER — a leading + or a
    # parenthesized area code — not just >=9 mixed digits: the loose
    # digit-run form also matches ISO dates ("2024-05-06") and numeric
    # score/stat tables, which are pervasive in this corpus and would
    # be destroyed corpus-wide by the in-place redaction (r4 review).
    # Structure is bounded, not an open [\d\s.-]{7,} run (r4 ADVICE):
    # after the 1-3 digit country code a MANDATORY 3-5 digit area-code
    # group (optionally parenthesized), then 1-3 short digit groups
    # with at most one separator each — so a plus-minus stat row
    # ("IVANOV +2 10 23 45 67 89": every group 2 digits) never
    # matches, and a match can run past a real phone by at most one
    # short group instead of to the last digit on the line.
    # Conservative by design: a bare "4951234567" stays; a false
    # negative is recoverable, a shredded stat column is not.
    ("phone", r"\+\d{1,3}[\s.-]?\(?\d{3,5}\)?(?:[\s.-]?\d{2,4}){1,3}"
              r"|\(\d{3,5}\)(?:[\s.-]?\d{2,4}){2,4}",
     "<PHONE>"),
)


def redact_pii(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Replace email / IPv4 / phone matches with typed placeholders and
    append per-kind match counts (``n_pii_email``...) for run audit —
    redaction you can't count is redaction you can't verify.  Each
    kind is COUNTED on the text with earlier kinds already replaced,
    so the counts sum to what the output actually redacted (an IPv4 is
    one ``n_pii_ipv4``, never also a phone).  Adds
    ``<text_col>_redacted``; original column untouched (lineage keeps
    the raw shard until the write explicitly drops it)."""
    red = F.col(text_col)
    counts = []
    for kind, rx, token in PII_PATTERNS:
        counts.append(F.coalesce(F.regexp_count(red, F.lit(rx)), F.lit(0))
                      .alias(f"n_pii_{kind}"))
        red = F.regexp_replace(red, rx, token)
    return df.select("*", *counts, red.alias(f"{text_col}_redacted"))


def repetition_stats(df: DataFrame, *, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition heuristics (Gopher §A.1.1 / C4 flavor):

    - ``dup_line_fraction``  : 1 - distinct_lines/lines (array ops,
      no shuffle);
    - ``top_2gram_fraction`` : occurrences of the most frequent word
      2-gram / total 2-grams — explode → count per (id, gram) → max
      per id: two narrow shuffles over (id, gram) rows, never a
      per-doc O(n²) interpreted loop.

    Docs with <2 tokens get 0.0 fractions (nothing to repeat).
    Output: (id_col, n_lines, dup_line_fraction, top_2gram_fraction).
    """
    lines = F.filter(F.split(F.col(text_col), r"\n"),
                     lambda ln: F.length(F.trim(ln)) > 0)
    n_lines = F.size(lines)
    dup_frac = F.when(n_lines > 0,
                      F.lit(1.0) - F.size(F.array_distinct(lines))
                      / n_lines.cast("double")).otherwise(F.lit(0.0))
    base = df.select(F.col(id_col).alias("id"),
                     F.col(text_col).alias("_t"),
                     n_lines.alias("n_lines"), dup_frac.alias("dup_line_fraction"))

    toks = F.split(F.trim(F.col("_t")), r"\s+")
    n2 = F.greatest(F.size(toks) - 1, F.lit(0))
    # r6 change #15: posexplode of the BARE token array + successor via
    # null-safe ``get`` (same codegen stage) replaces the interpreted
    # transform(sequence, concat_ws(slice)) generator child; bigram
    # starts are 0.._n2-1, so single-token docs emit no rows exactly
    # like the old when(n2 > 0, ...) guard and every get is in-bounds.
    g = (base.select("id", n2.alias("_n2"), toks.alias("_tk"))
         .select("id", "_n2", "_tk",
                 F.posexplode("_tk").alias("_i", "_t0"))
         .filter(F.col("_i") <= F.col("_n2") - 1)
         .select("id", "_n2",
                 F.concat_ws(" ", F.col("_t0"),
                             F.get(F.col("_tk"), F.col("_i") + 1))
                 .alias("gram")))
    top = (g.groupBy("id", "_n2", "gram")
           .agg(F.count(F.lit(1)).alias("c"))
           .groupBy("id", "_n2").agg(F.max("c").alias("top_c"))
           .select("id", (F.col("top_c") / F.col("_n2").cast("double")
                          ).alias("top_2gram_fraction")))
    return (base.drop("_t")
            .join(top, "id", "left")
            .select(F.col("id").alias(id_col), "n_lines", "dup_line_fraction",
                    F.coalesce("top_2gram_fraction", F.lit(0.0))
                    .alias("top_2gram_fraction")))


def repetition_filter(df: DataFrame, *, text_col: str = "text",
                      id_col: str = "doc_id",
                      max_dup_line_fraction: float = 0.3,
                      max_top_2gram_fraction: float = 0.2
                      ) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (kept, ledger) on the repetition thresholds —
    ledger rows carry ``reject_reason`` ``rep_lines`` / ``rep_2gram``
    (first failing rule wins), composing with clean_corpus's ledger."""
    stats = repetition_stats(df, text_col=text_col, id_col=id_col)
    joined = df.join(stats, id_col)
    reason = (F.when(F.col("dup_line_fraction") > max_dup_line_fraction,
                     "rep_lines")
              .when(F.col("top_2gram_fraction") > max_top_2gram_fraction,
                    "rep_2gram"))
    tagged = joined.withColumn("_reject", reason)
    kept = tagged.filter(F.col("_reject").isNull()).select(*df.columns)
    ledger = (tagged.filter(F.col("_reject").isNotNull())
              .select(F.col(id_col).alias("id"),
                      F.col("_reject").alias("reject_reason")))
    return kept, ledger


def decontaminate(corpus: DataFrame, benchmark: DataFrame, *,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str = "text", n: int = 13,
                  min_hits: int = 1) -> tuple[DataFrame, DataFrame]:
    """Benchmark decontamination: drop corpus documents sharing any
    ``n``-gram with an evaluation set (the GPT-3/PaLM-style 13-gram
    rule) — training on eval data silently inflates benchmark scores,
    and at 100 TB the overlap is never zero.

    Returns ``(kept, flagged)``; ``flagged`` is (id, n_hits) — the
    count of distinct contaminated n-grams per dropped doc, because a
    decontamination pass you can't audit is indistinguishable from a
    bug.

    Scale shape: the benchmark is eval-set-sized (KB–MB) → its hashed
    n-gram set builds in one tiny aggregation and BROADCASTS; the
    corpus side is one shingle projection + a broadcast join — the
    corpus itself never shuffles.  Normalization (lowercase, punct
    strip, whitespace collapse) applies to BOTH sides so cosmetic
    edits don't hide contamination.
    """
    from khl_pdf_ocr_spark.operators.dedup import _shingle_stream, shingles

    bench_grams = (benchmark
                   .select(F.explode(shingles(bench_text_col, n)).alias("g"))
                   .select(F.xxhash64("g").alias("gh")).distinct())
    # corpus side: the HOF-free shingle stream (r6 change #14 — the
    # interpreted explode(shingles(...)) pipeline measured ~190 s for
    # 50k ~550-token docs; identical shingle strings, duplicates kept,
    # which count_distinct and the broadcast join are insensitive to).
    # The benchmark side stays on the tiny HOF form: eval-set-sized
    # input, and keeping both formulations exercised pins their parity.
    corpus_grams = (_shingle_stream(corpus, text_col=text_col,
                                    id_col=id_col, n=n)
                    .withColumnRenamed("h", "gh"))
    hits = (corpus_grams.join(F.broadcast(bench_grams), "gh")
            .groupBy("id").agg(F.count_distinct("gh").alias("n_hits"))
            .filter(F.col("n_hits") >= min_hits))
    flagged_ids = hits.select("id")
    # flagged_ids is CORPUS-derived and unbounded (a boilerplate
    # sentence shared with the eval set can flag millions of docs) —
    # never force-broadcast it; AQE broadcasts at runtime when it is
    # actually small (r4 review)
    kept = corpus.join(flagged_ids,
                       corpus[id_col] == flagged_ids["id"], "left_anti")
    return kept, hits


def c4_filters(df: DataFrame, *, text_col: str = "text",
               id_col: str = "doc_id", min_words_per_line: int = 5,
               min_sentences: int = 3
               ) -> tuple[DataFrame, DataFrame]:
    """The C4 cleaning heuristics (Raffel et al. 2020, §2.2) —
    line-level scrubbing plus page-level drops:

    * keep only lines that END in a terminal punctuation mark
      (``. ! ? "``), have at least ``min_words_per_line`` words, and do
      not contain the word "javascript" (case-insensitive);
    * DROP pages that contain "lorem ipsum" or a ``{`` (templating/
      code leakage), or whose surviving text has fewer than
      ``min_sentences`` sentences (terminal-punctuation count — the
      lightweight stand-in for C4's sentence tokenizer, disclosed).

    Returns ``(kept, ledger)``: kept rows carry the original columns
    with ``text_col`` rewritten to the surviving lines plus
    ``n_lines``/``n_lines_removed`` counters; the ledger is
    ``(id, reject_reason)`` with reasons ``c4_brace`` / ``c4_lorem`` /
    ``c4_few_sentences``.  NULL-text rows drop as
    ``c4_few_sentences`` (no surviving sentences — a row must never
    vanish from both kept and ledger).

    Scale shape: everything is per-row array expressions over the
    staged line array — zero shuffles, zero UDFs, whole-stage codegen.
    """
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    staged = df.withColumn("_ls", lines)
    keep_line = (
        lambda ln: F.regexp_replace(ln, r"\s+$", "").rlike(r'[.!?"]$')
        & (F.size(F.filter(F.split(ln, r"\s+"),
                           lambda w: F.length(w) > 0))
           >= min_words_per_line)
        & ~F.lower(ln).contains("javascript"))
    kept_lines = F.filter(F.col("_ls"), keep_line)
    new_text = F.concat_ws("\n", kept_lines)
    tagged = (staged
              .withColumn("n_lines", F.size("_ls"))
              .withColumn("_new", new_text)
              .withColumn("n_lines_removed",
                          F.size("_ls") - F.size(kept_lines)))
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    reason = (F.when(low.contains("{"), "c4_brace")
              .when(low.contains("lorem ipsum"), "c4_lorem")
              .when(F.regexp_count(F.col("_new"), F.lit(r"[.!?]"))
                    < min_sentences, "c4_few_sentences"))
    tagged = tagged.withColumn("_reject", reason)
    kept = (tagged.filter(F.col("_reject").isNull())
            .withColumn(text_col, F.col("_new"))
            .drop("_ls", "_new", "_reject"))
    ledger = (tagged.filter(F.col("_reject").isNotNull())
              .select(F.col(id_col).alias("id"),
                      F.col("_reject").alias("reject_reason")))
    return kept, ledger


# A deliberately SMALL disclosed seed list for the C4 §2.2 bad-words
# page drop — production runs pass their own list (the paper uses the
# ~1,300-entry "List of Dirty, Naughty, Obscene..." which does not
# belong vendored in source); these few unambiguous tokens make the
# default behavior real and testable without shipping a slur file.
C4_BADWORDS_SEED = ("porn", "xxx", "viagra", "erotic", "escort")


def c4_badwords_filter(df: DataFrame, *, words=None,
                       text_col: str = "text", id_col: str = "doc_id"
                       ) -> tuple[DataFrame, DataFrame]:
    """C4's bad-words page drop (Raffel et al. 2020, §2.2: remove any
    page containing a word from the blocklist).  Matching is
    WHOLE-TOKEN on the lowercased ``\\W+`` tokenization — "essex" or
    "classic" never match a 3-letter substring, exactly because the
    published filter is word-level, not substring-level.

    ``words``: iterable of lowercase tokens (e.g. read from the
    caller's list file); defaults to the small disclosed
    ``C4_BADWORDS_SEED``.  Returns ``(kept, ledger)`` with reason
    ``c4_badwords``; NULL text passes (nothing to match).

    Scale shape: one ``arrays_overlap`` against an array LITERAL —
    pure whole-stage codegen, zero shuffles, zero Python.  The list
    rides the plan itself (thousands of entries are fine; it is the
    same mechanism as a giant ``isin``), never a join.
    """
    vocab = sorted({w.strip().lower() for w in (words or C4_BADWORDS_SEED)
                    if w and w.strip()})
    if not vocab:
        raise ValueError("bad-words list is empty after normalization")
    # \p{L}\p{N} (not \W): Java's \w is ASCII-only, which would shred
    # Cyrillic text into empty tokens and make non-ASCII list entries
    # unmatchable; the Unicode classes work identically in RE2
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                   r"[^\p{L}\p{N}_]+")
    hit = F.arrays_overlap(toks, F.lit(vocab))
    kept = df.filter(~hit)
    ledger = (df.filter(hit)
              .select(F.col(id_col).alias("id"),
                      F.lit("c4_badwords").alias("reject_reason")))
    return kept, ledger


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def gopher_quality_filter(df: DataFrame, *, text_col: str = "text",
                          id_col: str = "doc_id",
                          min_words: int = 50, max_words: int = 100_000,
                          min_mean_word_len: float = 3.0,
                          max_mean_word_len: float = 10.0,
                          max_symbol_ratio: float = 0.1,
                          max_bullet_frac: float = 0.9,
                          max_ellipsis_frac: float = 0.3,
                          min_alpha_word_frac: float = 0.8,
                          min_stopword_hits: int = 2
                          ) -> tuple[DataFrame, DataFrame]:
    """The Gopher document-quality rules (Rae et al. 2021, Appendix
    A1.1) with their published thresholds as defaults:

    * 50–100,000 words; mean word length 3–10 characters;
    * symbol-to-word ratio (``#`` / ellipsis) ≤ 0.1;
    * ≤90 % of lines bullet-started, ≤30 % ellipsis-ended;
    * ≥80 % of words contain at least one letter (any script — the
      corpus is en+ru, so ``\\p{L}``, not ``[a-z]``);
    * at least 2 distinct hits from the 8-word stop list
      (``GOPHER_STOPWORDS`` — presence, not frequency).

    The repetition rules from the same appendix live in
    ``repetition_filter``; compose both for the full Gopher gate.

    Returns ``(kept, ledger)``; reasons name the FIRST failing rule
    (``gopher_word_count`` / ``gopher_word_length`` /
    ``gopher_symbol_ratio`` / ``gopher_bullet_lines`` /
    ``gopher_ellipsis_lines`` / ``gopher_alpha_words`` /
    ``gopher_stopwords``).  NULL/blank text fails the word count — a
    row never vanishes from both frames.

    Scale shape: one Arrow-batched reason kernel per row (r6 change
    #17) — zero shuffles.  The previous all-expression form (kept
    below as ``_gopher_reason_expr``, the parity oracle) evaluated
    its token/line rules through interpreted ``filter``/``aggregate``/
    ``transform`` lambdas with a regex per element: 43.5 s for 50k
    ~550-token docs on 32 cores, vs seconds for the kernel.
    """
    thresholds = (min_words, max_words, min_mean_word_len,
                  max_mean_word_len, max_symbol_ratio, max_bullet_frac,
                  max_ellipsis_frac, min_alpha_word_frac,
                  min_stopword_hits)
    tagged = df.withColumn("_reject",
                           _gopher_reason_kernel(text_col, *thresholds))
    kept = tagged.filter(F.col("_reject").isNull()).drop("_reject")
    ledger = (tagged.filter(F.col("_reject").isNotNull())
              .select(F.col(id_col).alias("id"),
                      F.col("_reject").alias("reject_reason")))
    return kept, ledger


def _gopher_reason_expr(text_col: str, min_words, max_words,
                        min_mean_word_len, max_mean_word_len,
                        max_symbol_ratio, max_bullet_frac,
                        max_ellipsis_frac, min_alpha_word_frac,
                        min_stopword_hits):
    """The r5 all-expression reason column — retained as the in-tree
    parity oracle for the kernel (interpreted HOF lambdas; see the
    gopher_quality_filter docstring for the measured cost)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    tk = F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0)
    ln = F.filter(F.split(text, "\n"), lambda l: l.rlike(r"\S"))
    n_w = F.size(tk).cast("double")
    n_l = F.greatest(F.size(ln), F.lit(1)).cast("double")
    mean_len = F.aggregate(
        tk, F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(t)).cast("double") \
        / F.greatest(n_w, F.lit(1.0))
    symbol_ratio = (F.regexp_count(text, F.lit(r"#|\.\.\.|…"))
                    .cast("double") / F.greatest(n_w, F.lit(1.0)))
    bullet_frac = (F.size(F.filter(
        ln, lambda l: l.rlike(r"^\s*[-*•●▪‣·]")))
        .cast("double") / n_l)
    ellipsis_frac = (F.size(F.filter(
        ln, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
        .cast("double") / n_l)
    alpha_frac = (F.size(F.filter(
        tk, lambda t: t.rlike(r"\p{L}")))
        .cast("double") / F.greatest(n_w, F.lit(1.0)))
    stop_hits = F.size(F.array_intersect(
        F.transform(tk, lambda t: F.lower(
            F.regexp_replace(t, r"^\W+|\W+$", ""))),
        F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])))
    return (
        F.when((n_w < min_words) | (n_w > max_words), "gopher_word_count")
        .when((mean_len < min_mean_word_len)
              | (mean_len > max_mean_word_len), "gopher_word_length")
        .when(symbol_ratio > max_symbol_ratio, "gopher_symbol_ratio")
        .when(bullet_frac > max_bullet_frac, "gopher_bullet_lines")
        .when(ellipsis_frac > max_ellipsis_frac, "gopher_ellipsis_lines")
        .when(alpha_frac < min_alpha_word_frac, "gopher_alpha_words")
        .when(stop_hits < min_stopword_hits, "gopher_stopwords"))


def _gopher_reason_kernel(text_col: str, min_words, max_words,
                          min_mean_word_len, max_mean_word_len,
                          max_symbol_ratio, max_bullet_frac,
                          max_ellipsis_frac, min_alpha_word_frac,
                          min_stopword_hits):
    """Arrow-batched replay of ``_gopher_reason_expr`` (r6 change #17).

    Java-parity notes, each pinned by ``test_gopher_kernel_parity``:
    Java-default ``\\s``/``\\W`` are ASCII → all patterns compile with
    ``re.ASCII`` (NBSP stays inside tokens and counts as ``\\S`` in the
    line filter); ``\\p{L}`` is Unicode-L → ``str.isalpha()`` (the same
    L* categories); ``length``/``size`` are code-point counts → Python
    ``len``; every ratio replays the identical int→float64 division and
    comparison order; NULL text coalesces to ``""`` exactly like the
    expression form (word-count reject, never a NULL verdict).
    """
    import re

    import pandas as pd

    ws_re = re.compile(r"\s+", re.ASCII)
    nonsp_re = re.compile(r"\S", re.ASCII)
    sym_re = re.compile(r"#|\.\.\.|…")
    bullet_re = re.compile(r"^\s*[-*•●▪‣·]", re.ASCII)
    ellipsis_re = re.compile(r"(\.\.\.|…)\s*$", re.ASCII)
    strip_re = re.compile(r"^\W+|\W+$", re.ASCII)
    stop = frozenset(GOPHER_STOPWORDS)

    def _reason(s):
        if s is None:
            s = ""
        tk = [t for t in ws_re.split(s) if t]
        n_w = float(len(tk))
        if n_w < min_words or n_w > max_words:
            return "gopher_word_count"
        mean_len = float(sum(len(t) for t in tk)) / max(n_w, 1.0)
        if mean_len < min_mean_word_len or mean_len > max_mean_word_len:
            return "gopher_word_length"
        if len(sym_re.findall(s)) / max(n_w, 1.0) > max_symbol_ratio:
            return "gopher_symbol_ratio"
        ln = [l for l in s.split("\n") if nonsp_re.search(l)]
        n_l = float(max(len(ln), 1))
        if sum(1 for l in ln if bullet_re.match(l)) / n_l > max_bullet_frac:
            return "gopher_bullet_lines"
        if (sum(1 for l in ln if ellipsis_re.search(l)) / n_l
                > max_ellipsis_frac):
            return "gopher_ellipsis_lines"
        alpha = sum(1 for t in tk if any(c.isalpha() for c in t))
        if alpha / max(n_w, 1.0) < min_alpha_word_frac:
            return "gopher_alpha_words"
        hits = len({w for t in tk
                    if (w := strip_re.sub("", t).lower()) in stop})
        if hits < min_stopword_hits:
            return "gopher_stopwords"
        return None

    def _batch(s):
        return s.map(_reason)

    _batch.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_batch, "string")(F.col(text_col))


def decontaminate_fuzzy(corpus: DataFrame, benchmark: DataFrame, *,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_text_col: str = "text",
                        threshold: float = 0.5, num_perm: int = 64,
                        bands: int = 32, shingle_n: int = 3,
                        sigs: DataFrame | None = None
                        ) -> tuple[DataFrame, DataFrame]:
    """NEAR-duplicate benchmark decontamination: drop corpus documents
    whose shingle-set Jaccard with ANY eval document reaches
    ``threshold`` (MinHash signature-agreement estimate) — the
    paraphrase net behind the exact filter.  ``decontaminate``'s
    13-gram rule is defeated by one edit every 12 tokens; a lightly
    reworded eval answer keeps most of its 3-shingles and is caught
    here (the Llama/OLMo-style fuzzy pass; run BOTH: exact for verbatim
    leakage, fuzzy for cosmetic rewrites).

    Returns ``(kept, flagged)``; ``flagged`` is
    ``(id, n_bench_matches, max_jaccard)`` per dropped doc — an
    unauditable decontamination pass is indistinguishable from a bug.

    Recall note: candidates come from LSH band collisions, so the
    band shape bounds what the threshold filter ever SEES.  The
    default is ``bands=32`` (2 rows/band, LSH knee ≈ (1/32)^(1/2) ≈
    0.18) rather than the dedup operators' 16×4 (knee ≈ 0.5): a
    decontamination pass is a safety net — at threshold 0.5 a 16×4
    banding can deterministically miss a ~0.5-Jaccard paraphrase
    (measured in the planted test), while 32×2 over-generates
    candidates and lets the exact agreement filter decide.  The eval
    side is tiny, so the extra candidates cost broadcast-join lookups,
    not a shuffle.

    Scale shape: the eval set is KB–MB → its banded signatures
    BROADCAST; the corpus side is one per-row signature projection
    (``with_minhash_signature`` — array expressions, zero shuffle) +
    a stateless band explode + the broadcast join + the agreement
    filter.  The corpus never shuffles; the drop list is corpus-derived
    and unbounded, so it is joined back ``left_anti``, never
    force-broadcast.  Blank/NULL-text docs cannot be contaminated and
    pass through.
    """
    from khl_pdf_ocr_spark.operators.dedup import (
        _band_signatures, signature_jaccard_estimate,
        with_minhash_signature)

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if sigs is None:
        eligible = corpus.filter(F.col(text_col).isNotNull()
                                 & F.col(text_col).rlike(r"\S"))
        sigged = with_minhash_signature(
            eligible.select(F.col(id_col).alias("id"), F.col(text_col)),
            text_col=text_col, id_col="id",
            num_perm=num_perm, shingle_n=shingle_n)
        c_sigs = sigged.select("id", "sig")
    else:
        # ``sigs``: precomputed (id, sig) — MUST match num_perm/
        # shingle_n (the minhash_lsh_pairs contract); lets clean_corpus
        # share ONE signature pass between the near-dup and fuzzy
        # stages (r5 review).  Restricted to THIS frame's ids so a
        # superset store can never flag a row that is not here (which
        # would double-ledger an already-rejected doc).
        probe = sigs.select(F.size("sig").alias("n")).first()
        if probe is not None and probe["n"] != num_perm:
            raise ValueError(f"sigs width {probe['n']} != num_perm "
                             f"{num_perm}")
        c_sigs = sigs.join(
            corpus.select(F.col(id_col).alias("id")), "id", "left_semi")
    c_banded = _band_signatures(c_sigs,
                                num_perm=num_perm, bands=bands,
                                carry=("sig",))
    # the eval doc's identity for the audit trail: a deterministic
    # content hash (benchmarks need no id column)
    bench = (benchmark
             .filter(F.col(bench_text_col).isNotNull()
                     & F.col(bench_text_col).rlike(r"\S"))
             .select(F.xxhash64(X.normalized_text(F.col(bench_text_col)))
                     .alias("id"),
                     F.col(bench_text_col).alias("_bt")))
    b_sigged = with_minhash_signature(bench, text_col="_bt", id_col="id",
                                      num_perm=num_perm,
                                      shingle_n=shingle_n)
    b_banded = _band_signatures(b_sigged.select("id", "sig"),
                                num_perm=num_perm, bands=bands,
                                carry=("sig",))
    b_side = F.broadcast(b_banded.select(F.col("id").alias("bench_id"),
                                         "band", "bh",
                                         F.col("sig").alias("sig_b")))
    est = signature_jaccard_estimate(F.col("sig"), F.col("sig_b"),
                                     num_perm=num_perm)
    # a pair can collide in several bands; the estimate is pair-level
    # (band-independent), so distinct (id, bench_id) dedups exactly
    hits = (c_banded.join(b_side, ["band", "bh"])
            .select("id", "bench_id", est.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
            .distinct())
    flagged = hits.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bench_matches"),
        F.max("jaccard").alias("max_jaccard"))
    flagged_ids = flagged.select("id")
    kept = corpus.join(flagged_ids,
                       corpus[id_col] == flagged_ids["id"], "left_anti")
    return kept, flagged


def deterministic_sample(df: DataFrame, fractions: dict[str, float], *,
                         strata_col: str = "source", id_col: str = "doc_id",
                         seed: int = 23) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-mixture stage
    (e.g. web 60 %, books 2×-upsampled corpora elsewhere): keep a row
    iff ``xxhash64(id, seed) mod 10^6 < fraction·10^6`` for its
    stratum.  Unlike ``df.sample``, membership is a pure function of
    the row — stable under re-runs, repartitioning, cluster resizing,
    and incremental rebuilds, and a document sampled into the corpus
    stays sampled (no eval-set churn between builds).  Strata absent
    from ``fractions`` are DROPPED (explicit mixture, no silent
    pass-through); fractions must be in [0, 1].
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0,1], got {v}")
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    expr = None
    for name, frac in fractions.items():
        # round, don't truncate: int(0.29*1e6) is 289999 under binary
        # floats, silently losing a bucket and disagreeing with
        # hash_split's cutoffs on the same weights (r4 review)
        cond = (F.col(strata_col) == name) \
            & (bucket < int(round(frac * 1_000_000)))
        expr = cond if expr is None else expr | cond
    if expr is None:
        raise ValueError("fractions must name at least one stratum")
    return df.filter(expr)


def parse_float_bounds(spec: str) -> tuple[float | None, float | None]:
    """Parse ``"LO,HI"`` with ``none`` for an open side (e.g.
    ``"-3.9,none"``) — the shared ``--lm-cutoffs``/``--lm-tails`` spec
    of clean_cli and increment_cli (one parser so the two CLIs can't
    drift; r5 review).  Raises ValueError; CLIs wrap with ap.error."""
    parts = spec.split(",")
    if len(parts) != 2:
        raise ValueError(f"want LO,HI, got {spec!r}")
    lo, hi = (None if p.strip().lower() == "none" else float(p)
              for p in parts)
    return lo, hi


def parse_split_weights(spec: str) -> dict[str, float]:
    """Parse ``"train=0.98,val=0.01,test=0.01"`` — the shared CLI
    weight-spec format of clean_cli/shard_cli.  Duplicate split names
    are rejected here (silently overwriting one would otherwise
    surface later as a confusing weights-must-sum-to-1 error)."""
    weights: dict[str, float] = {}
    for part in spec.split(","):
        name, _, w = part.partition("=")
        name = name.strip()
        if not name or not w:
            raise ValueError(f"bad split spec segment {part!r} "
                             "(want name=weight)")
        if name in weights:
            raise ValueError(f"duplicate split name {name!r} in {spec!r}")
        weights[name] = float(w)
    return weights


def pack_sequences(chunks: DataFrame, *, len_col: str = "n_tokens",
                   capacity: int = 2048, bucket_col: str = "doc_id",
                   n_buckets: int | None = None,
                   max_bucket_rows: int = 50_000,
                   group_cols: tuple[str, ...] = (),
                   audit: dict | None = None) -> DataFrame:
    """Greedy sequence packing: assign token-counted chunks to packs of
    at most ``capacity`` tokens — the context-window packing stage
    between chunking and shard writing (unpacked short sequences waste
    padding FLOPs at train time).

    Bin packing is inherently sequential, so the distributed shape is
    bucket-then-pack: chunks hash-bucket by ``bucket_col`` (chunks of
    one document co-bucket, so they can share packs), and each bucket
    packs independently with first-fit-decreasing inside an
    ``applyInPandas`` group — the (b) tier of the custom-operator
    ladder (no built-in composition expresses FFD).  One shuffle on the
    bucket key; state per task is one bucket's chunk list.

    ``group_cols`` adds hard packing boundaries (e.g. ``("split",)``
    so a pack never mixes train and val rows): packing groups are
    (*group_cols, bucket), all in ONE grouped job — callers must not
    emulate this with per-group filters, which re-run the upstream
    chunking lineage once per group.

    Output: input columns + ``pack_id``.  ``pack_id`` is unique WITHIN
    a ``group_cols`` combination (globally unique when ``group_cols``
    is empty) — consumers key packs by (*group_cols, pack_id); the
    output already carries those columns.  Deterministic: bucket
    assignment is a hash, the in-bucket order is (len desc, remaining
    columns asc), and FFD is deterministic given an order.  FFD
    guarantee (tested): at most ONE pack per bucket ends ≤ half full.

    A chunk longer than ``capacity`` raises with a clear message (no
    silent truncation — resize upstream with ``chunk_documents``).

    Bucket sizing must scale with the CORPUS, not the cluster: a
    parallelism-only default ties bucket size to cluster width, so at
    fixed width buckets balloon linearly with data — and FFD's
    first-fit scan is O(chunks × open packs) per bucket (r4 verdict).
    When ``n_buckets`` is not given it is derived from ONE ``count()``
    of ``chunks``: ``max(4 × parallelism, ceil(rows /
    max_bucket_rows))``.  That count is an ACTION over the input
    lineage — callers with an expensive upstream (chunking a 100 TB
    corpus) should persist the input first (shard_cli does) or pass
    ``n_buckets`` explicitly.  ``audit`` (optional dict) receives
    ``pack_n_buckets`` and, when derived, ``pack_n_rows`` — the
    telemetry that makes a ballooned bucket visible in run stats.
    """
    import pandas as pd

    from pyspark.sql import types as T

    spark = chunks.sparkSession
    if n_buckets is None:
        n_rows = chunks.count()
        n_buckets = max(spark.sparkContext.defaultParallelism * 4,
                        -(-n_rows // max_bucket_rows))
        if audit is not None:
            audit["pack_n_rows"] = n_rows
    if audit is not None:
        audit["pack_n_buckets"] = n_buckets
    in_cols = chunks.columns
    if len_col not in in_cols:
        raise ValueError(f"len_col {len_col!r} not in {in_cols}")
    bucketed = chunks.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(bucket_col), F.lit(7)),
                          F.lit(n_buckets)).cast("int"))
    out_schema = T.StructType(
        list(bucketed.schema.fields)
        + [T.StructField("pack_id", T.LongType(), False)])
    # only atomic-typed columns can key the in-bucket sort: pandas
    # cannot hash/compare array//map/struct cells (token_ids payloads
    # arrive as ndarrays), and the scalar columns already carry the
    # identifying keys that make the order total in practice
    atomic = {f.name for f in chunks.schema.fields
              if isinstance(f.dataType, T.AtomicType)}
    order_cols = [len_col] + [c for c in in_cols
                              if c != len_col and c in atomic]
    ascending = [False] + [True] * (len(order_cols) - 1)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, ascending=ascending,
                              kind="mergesort").reset_index(drop=True)
        bucket = int(pdf["_bucket"].iloc[0])
        loads: list[int] = []          # current token load per pack
        assign: list[int] = []
        for n in pdf[len_col]:
            n = int(n)
            if n > capacity:
                raise ValueError(
                    f"chunk of {n} tokens exceeds pack capacity "
                    f"{capacity}; re-chunk upstream (chunk_documents "
                    f"max_tokens <= capacity)")
            for i, load in enumerate(loads):   # first fit
                if load + n <= capacity:
                    loads[i] = load + n
                    assign.append(i)
                    break
            else:
                loads.append(n)
                assign.append(len(loads) - 1)
        pdf["pack_id"] = [bucket * (1 << 32) + a for a in assign]
        return pdf

    return (bucketed.groupBy(*group_cols, "_bucket")
            .applyInPandas(pack, out_schema)
            .drop("_bucket"))


def hash_split(df: DataFrame, *, id_col: str = "doc_id",
               weights: dict[str, float] | None = None,
               seed: int = 17) -> DataFrame:
    """Deterministic train/val/test assignment: bucket =
    ``xxhash64(id, seed) mod 10_000``; cumulative weight ranges map
    buckets to split names.  Stateless projection → the same document
    always lands in the same split regardless of partitioning, cluster
    size, or which increment it arrived in (re-sampling with an RNG
    would leak val docs into train across rebuilds).  Adds ``split``.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1.0, got {total}")
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(10_000))
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(round(acc * 10_000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)
