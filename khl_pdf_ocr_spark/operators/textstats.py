"""Text-analytics operators over a documents table (training-data
pipeline stages: language ID, quality scoring, token counting, document
fingerprinting).  All JVM-side whole-stage-codegen expressions — zero
Python UDFs in these paths, with one declared exception:
``compression_ratio`` (zlib has no Catalyst expression; it runs as an
Arrow-batched pandas UDF)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions import text as X

__all__ = ["text_stats", "language_id", "quality_filter", "fingerprints",
           "compression_ratio", "zlib_ratio_col",
           "top_terms_per_group", "train_unigram_lm", "unigram_logprob_scores",
           "train_bigram_lm", "bigram_logprob_scores", "save_lm", "load_lm",
           "lm_tier_assign", "append_lm_tiers", "lm_tier_stats"]


def save_lm(lm, path: str) -> None:
    """Persist a trained LM with overwrite semantics (a retried nightly
    run with an unchanged path must not crash after the training pass):
    a single ``(token, logprob)`` frame writes to ``path``; a
    ``(unigram, bigram)`` pair writes to ``path/unigram`` +
    ``path/bigram``.  The ONE place the on-disk layout lives — both
    CLIs save and load through this pair so the convention can't drift
    (r5 review)."""
    if isinstance(lm, tuple):
        uni, bi = lm
        uni.write.mode("overwrite").parquet(f"{path}/unigram")
        bi.write.mode("overwrite").parquet(f"{path}/bigram")
    else:
        lm.write.mode("overwrite").parquet(path)


def load_lm(spark, path: str, order: int = 1):
    """Inverse of ``save_lm``: order 1 returns the single frame, order
    2 the ``(unigram, bigram)`` pair — the shapes ``clean_corpus(lm=)``
    accepts."""
    if order == 2:
        return (spark.read.parquet(f"{path}/unigram"),
                spark.read.parquet(f"{path}/bigram"))
    if order != 1:
        raise ValueError(f"LM order must be 1 or 2, got {order}")
    return spark.read.parquet(path)


def top_terms_per_group(df: DataFrame, *, text_col: str = "text",
                        group_col: str = "lang", k: int = 3) -> DataFrame:
    """Top-k terms per group by document frequency (corpus vocabulary
    profiling).  explode → two-level aggregation → window top-k; all
    shuffles are on (group, token) / group keys with map-side combine.
    Deterministic tie-break: higher doc-frequency first, then token asc.
    """
    from pyspark.sql import Window

    toks = df.select(F.col(group_col).alias("grp"),
                     F.col("doc_id"),
                     F.explode(F.array_distinct(
                         F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
                     ).alias("token"))
    counts = (toks.filter(F.length("token") > 0)
              .groupBy("grp", "token")
              .agg(F.count(F.lit(1)).alias("doc_freq")))
    # EXACT two-phase top-k: a single rank window per group would sort
    # the group's ENTIRE vocabulary (10^8 tokens per language at web
    # scale) in one task.  Phase 1 takes the per-(group, token-hash
    # salt) top-k — the global top-k is necessarily a subset of the
    # union of salt-local top-ks — so the final window ranks at most
    # salts×k rows per group.
    salts = 32
    order = (F.col("doc_freq").desc(), F.col("token").asc())
    w1 = Window.partitionBy("grp", F.pmod(F.xxhash64("token"), F.lit(salts))
                            ).orderBy(*order)
    cand = (counts.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= k).drop("_r1"))
    w = Window.partitionBy("grp").orderBy(*order)
    return (cand.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(F.col("grp").alias(group_col), "rank", "token", "doc_freq"))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars_actual"),
        X.token_count(c).alias("n_tokens"),
        X.stopword_count(c).alias("n_stopwords"),
        X.punct_count(c).alias("n_punct"),
        X.digit_count(c).alias("n_digits"),
        X.quality_score(c).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col), X.lang_id(F.col(text_col)).alias("lang_pred"))


def quality_filter(df: DataFrame, text_col: str = "text",
                   min_score: float = 0.5) -> DataFrame:
    """The keep/drop gate of a corpus-cleaning pipeline."""
    return (df.withColumn("quality", X.quality_score(F.col(text_col)))
            .filter(F.col("quality") >= min_score))


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col),
                     X.fingerprint(F.col(text_col)).alias("fingerprint"))


def compression_ratio(df: DataFrame, *, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6) -> DataFrame:
    """zlib-compressibility quality signal (the RedPajama-v2 /
    Dolma-style ``ccnet_*``-adjacent heuristic): ``compressed bytes /
    raw utf-8 bytes``.  Boilerplate and templated spam compress far
    below prose (~0.2 vs ~0.4-0.6); glyph soup and binary junk sit
    near 1.0 — so both tails are suspect, like the LM-perplexity
    signal but model-free.

    The ONE textstats stage that genuinely needs Python (Catalyst has
    no deflate expression): an Arrow-batched scalar pandas UDF —
    documents stream through in Arrow record batches, zlib runs in C,
    and there is no per-row pickling.  NULL/empty text → NULL ratio.
    Returns ``(id, n_bytes, zlib_ratio)``; zero shuffles.
    """
    c = F.col(text_col)
    return df.select(F.col(id_col),
                     F.octet_length(c).alias("n_bytes"),
                     zlib_ratio_col(c, level=level).alias("zlib_ratio"))


def zlib_ratio_col(text: "F.Column", *, level: int = 6):
    """The compression-ratio signal as a reusable Column expression
    (Arrow-batched pandas UDF) — ``clean_corpus``'s zlib stage applies
    it with ``withColumn`` so no join-back shuffle is ever needed."""
    @F.pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if t is None:
                return None
            b = t.encode("utf-8")
            if not b:
                return None
            return len(zlib.compress(b, level)) / len(b)

        return s.map(one)

    return _ratio(text)


def train_unigram_lm(df: DataFrame, *, text_col: str = "text",
                     vocab_size: int = 65_536) -> DataFrame:
    """Corpus unigram language model: (token, logprob) over the
    ``vocab_size`` most frequent normalized tokens — the honest
    dependency-free stand-in for CCNet's KenLM perplexity filter
    (tokens = whitespace split of ``normalized_text``; probabilities
    are counts over ALL token occurrences, so out-of-vocab mass stays
    unassigned and OOV scoring is explicit in the scorer).

    One explode→groupBy over (token) with map-side combine; the top-V
    cut is ``orderBy(count desc, token asc).limit(V)`` — Spark plans
    TakeOrderedAndProject (distributed per-partition top-V + merge),
    never a full vocabulary sort shuffle.  Deterministic tie-break on
    the token string.  The returned frame is localCheckpoint'ed —
    self-contained and tiny (V ≤ 64k rows ≈ KBs–MBs); it broadcasts
    into ``unigram_logprob_scores``.
    """
    toks = (df.select(F.explode(
        F.split(X.normalized_text(F.col(text_col)), r"\s+")).alias("token"))
        .filter(F.length("token") > 0))
    # ONE corpus pass: the grouped counts are persisted, the total and
    # the top-V cut both read the cache, and the tiny result is
    # localCheckpoint'ed (self-contained — no lineage back to the
    # corpus, nothing left persisted) before the cache is released
    # (r4 review: the eager total + a lazy return re-ran the full
    # explode→groupBy 2-3×)
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")).persist()
    try:
        total = counts.agg(F.sum("n")).first()[0] or 1
        return (counts.orderBy(F.col("n").desc(), F.col("token").asc())
                .limit(vocab_size)
                .select("token",
                        (F.log(F.col("n").cast("double"))
                         - F.log(F.lit(float(total)))).alias("logprob"))
                .localCheckpoint())
    finally:
        counts.unpersist()


def train_bigram_lm(df: DataFrame, *, text_col: str = "text",
                    vocab_size: int = 65_536,
                    bigram_size: int = 1_048_576
                    ) -> tuple[DataFrame, DataFrame]:
    """Corpus bigram language model — one step closer to CCNet's 5-gram
    KenLM than the unigram stand-in: word ORDER now matters (a token
    scramble keeps its unigram score but collapses its bigram score).

    Returns ``(unigram_lm, bigram_lm)``:
    - ``unigram_lm`` — (token, logprob), exactly ``train_unigram_lm``'s
      contract (top-``vocab_size`` by count);
    - ``bigram_lm`` — (token, next, logprob) with CONDITIONAL
      log p(next | token) = ln c(token, next) − ln n1(token), where
      n1(token) is the count of ALL bigrams starting with ``token``
      (computed before the top-``bigram_size`` cut, so kept rows carry
      exact conditional probabilities; the truncated tail's mass is the
      disclosed sketch trade — absent pairs score as probability 0 in
      the interpolation).

    ONE pass over the corpus text: the explode emits
    ``struct(token, next)`` elements (next = NULL at the document tail),
    so unigram counts (groupBy token) and bigram counts (groupBy token,
    next) both read the same persisted narrow pair frame — the text is
    tokenized once.  Top-V/top-B cuts are TakeOrderedAndProject
    (distributed partial top-k, never a full vocabulary sort shuffle);
    count-desc with lexicographic tie-break keeps training
    deterministic and input-order-insensitive.  Both returned frames
    are localCheckpoint'ed (tiny, lineage-free, broadcastable).
    """
    # STAGED token array (the winnowing lesson: interpreted HOFs have no
    # common-subexpression elimination — element_at(<full tokenize
    # expr>, i) inside the lambda would re-run the tokenize PER ELEMENT,
    # O(tokens²) per doc; a materialized column reference is O(1))
    staged = df.select(F.filter(
        F.split(X.normalized_text(F.col(text_col)), r"\s+"),
        lambda t: F.length(t) > 0).alias("_toks"))
    # 2-arg lambda on purpose: (element, index) — each generated element
    # is a struct of two SMALL strings, never the token array
    pairs_arr = F.transform(
        F.col("_toks"), lambda t, i: F.struct(
            t.alias("token"),
            # F.get: 0-based and NULL past the end (element_at would
            # throw under ANSI at the document tail)
            F.get(F.col("_toks"), i + 1).alias("next")))
    pairs = (staged.select(F.explode(pairs_arr).alias("_p"))
             .select("_p.token", "_p.next")
             .persist())
    try:
        uni_counts = pairs.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
        total = uni_counts.agg(F.sum("n")).first()[0] or 1
        unigram = (uni_counts
                   .orderBy(F.col("n").desc(), F.col("token").asc())
                   .limit(vocab_size)
                   .select("token",
                           (F.log(F.col("n").cast("double"))
                            - F.log(F.lit(float(total)))).alias("logprob"))
                   .localCheckpoint())
        bi_counts = (pairs.filter(F.col("next").isNotNull())
                     .groupBy("token", "next")
                     .agg(F.count(F.lit(1)).alias("n")))
        # context totals from the FULL bigram counts (pre-cut): narrow
        # (token, n) rows, one extra shuffle over the count table only
        ctx = bi_counts.groupBy("token").agg(F.sum("n").alias("n1"))
        bigram = (bi_counts
                  .orderBy(F.col("n").desc(), F.col("token").asc(),
                           F.col("next").asc())
                  .limit(bigram_size)
                  .join(ctx, "token")
                  .select("token", "next",
                          (F.log(F.col("n").cast("double"))
                           - F.log(F.col("n1").cast("double"))
                           ).alias("logprob"))
                  .localCheckpoint())
        return unigram, bigram
    finally:
        pairs.unpersist()


def bigram_logprob_scores(df: DataFrame, unigram_lm: DataFrame,
                          bigram_lm: DataFrame, *,
                          text_col: str = "text", id_col: str = "doc_id",
                          lam: float = 0.7,
                          oov_logprob: float | None = None) -> DataFrame:
    """Per-document mean token log-probability under an INTERPOLATED
    bigram model:

        p(w_i | w_{i-1}) = lam * p_bi(w_i | w_{i-1})
                         + (1 - lam) * p_uni(w_i)

    The first token of each document scores p_uni alone; a pair absent
    from the bigram table contributes only its unigram share (p_bi = 0
    — standard Jelinek-Mercer interpolation, which also absorbs the
    top-B truncation); an out-of-vocab token falls to the same OOV
    floor as ``unigram_logprob_scores``.

    Both LM frames broadcast (≤ vocab/bigram_size rows); the corpus
    side is one explode of (prev, token) structs + two broadcast joins
    + a per-doc aggregate — narrow rows, never a corpus shuffle.
    Output schema matches ``unigram_logprob_scores``:
    (id_col, n_scored_tokens, avg_logprob) — so the clean-corpus
    both-tails gate consumes either model unchanged.
    """
    if not 0.0 < lam < 1.0:
        raise ValueError(f"lam must be in (0, 1), got {lam}")
    if oov_logprob is None:
        row = unigram_lm.agg(F.min("logprob")).first()
        base = row[0] if row and row[0] is not None else -20.0
        oov_logprob = float(base) - 2.302585092994046  # − ln 10
    # STAGED token array (no CSE in interpreted HOFs — see
    # train_bigram_lm)
    staged = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(X.normalized_text(F.coalesce(F.col(text_col),
                                                 F.lit(""))), r"\s+"),
            lambda t: F.length(t) > 0).alias("_toks"))
    # (prev, token) with prev = NULL for the first token; explode_outer
    # keeps empty docs as a NULL sentinel row (they must score NULL,
    # never vanish)
    pairs_arr = F.transform(
        F.col("_toks"), lambda t, i: F.struct(
            # F.get: 0-based, NULL for i-1 == -1 (the first token has no
            # predecessor; element_at(…, 0) would throw under ANSI)
            F.get(F.col("_toks"), i - 1).alias("prev"),
            t.alias("token")))
    pairs = staged.select(
        "id", F.explode_outer(pairs_arr).alias("_p")
    ).select("id", "_p.prev", "_p.token")
    uni = unigram_lm.select(F.col("token"), F.col("logprob").alias("_ulp"))
    bi = bigram_lm.select(F.col("token").alias("prev"),
                          F.col("next").alias("token"),
                          F.col("logprob").alias("_blp"))
    scored = (pairs
              .join(F.broadcast(uni), "token", "left")
              .join(F.broadcast(bi), ["prev", "token"], "left"))
    p_uni = F.exp(F.coalesce(F.col("_ulp"), F.lit(oov_logprob)))
    p_bi = F.coalesce(F.exp(F.col("_blp")), F.lit(0.0))
    lp = F.when(F.col("token").isNull(), None) \
          .when(F.col("prev").isNull(),
                F.coalesce(F.col("_ulp"), F.lit(oov_logprob))) \
          .otherwise(F.log(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni))
    return (scored.select("id", lp.alias("lp"))
            .groupBy("id")
            .agg(F.count("lp").alias("n_scored_tokens"),
                 F.avg("lp").alias("avg_logprob"))
            .select(F.col("id").alias(id_col), "n_scored_tokens",
                    "avg_logprob"))


def unigram_logprob_scores(df: DataFrame, lm: DataFrame, *,
                           text_col: str = "text", id_col: str = "doc_id",
                           oov_logprob: float | None = None,
                           deterministic_fold: bool = False) -> DataFrame:
    """Per-document mean token log-probability under a
    ``train_unigram_lm`` model — the CCNet-style quality signal: fluent
    prose scores near the corpus average, gibberish / rare-token dumps
    score far more negative, and pathologically repetitive boilerplate
    scores suspiciously HIGH (CCNet keeps the middle of the
    distribution; threshold both tails).

    ``oov_logprob`` defaults to (min in-vocab logprob) − ln 10 — one
    decade below the rarest modeled token; the lookup is computed once
    on the tiny lm frame.  The lm broadcasts (≤ vocab_size rows); the
    corpus side is one explode + broadcast join + per-doc aggregate —
    narrow (id, token) rows, never a corpus shuffle.

    Output: (id_col, n_scored_tokens, avg_logprob); docs with zero
    scorable tokens (NULL/whitespace text) return NULL avg_logprob
    with n_scored_tokens 0, never silently vanish.

    ``deterministic_fold``: sum the per-token logprobs in a CANONICAL
    order (sorted ascending, sequential left fold) instead of
    ``F.avg`` — float addition isn't associative, so the default avg
    depends on partition/arrival order and differs across runs and
    engines in the last ulps.  The fold is bit-reproducible given the
    same logprob values, which is what an exact-value oracle (the
    driver's DuckDB twin, which folds the same sorted list) needs.
    Costs a per-doc collect_list + sort; use the default for bulk
    filtering, the fold for oracle-gated scoring.
    """
    if oov_logprob is None:
        row = lm.agg(F.min("logprob")).first()
        base = row[0] if row and row[0] is not None else -20.0
        oov_logprob = float(base) - 2.302585092994046  # − ln 10
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(F.filter(
            F.split(X.normalized_text(F.coalesce(F.col(text_col), F.lit(""))),
                    r"\s+"),
            lambda t: F.length(t) > 0)).alias("token"))
    scored = (toks.join(F.broadcast(lm), "token", "left")
              .select("id", F.when(F.col("token").isNull(), None)
                      .otherwise(F.coalesce(F.col("logprob"),
                                            F.lit(oov_logprob))).alias("lp")))
    if deterministic_fold:
        # collect_list drops NULL lp (the explode_outer sentinel of an
        # empty doc), so size() is the non-null token count and the
        # empty array folds to the NULL-avg case
        return (scored.groupBy("id")
                .agg(F.sort_array(F.collect_list("lp")).alias("_lps"))
                .select(F.col("id").alias(id_col),
                        F.size("_lps").cast("long").alias("n_scored_tokens"),
                        F.when(F.size("_lps") > 0,
                               F.aggregate("_lps", F.lit(0.0),
                                           lambda a, v: a + v)
                               / F.size("_lps")).alias("avg_logprob")))
    return (scored.groupBy("id")
            .agg(F.count("lp").alias("n_scored_tokens"),
                 F.avg("lp").alias("avg_logprob"))
            .select(F.col("id").alias(id_col), "n_scored_tokens",
                    "avg_logprob"))


def lm_tier_assign(scored: DataFrame, *, score_col: str = "avg_logprob",
                   by: str | None = None,
                   fractions: tuple[float, float] = (1 / 3, 2 / 3),
                   cutoffs: tuple[float, float] | None = None,
                   out_col: str = "lm_tier",
                   relative_error: float = 1e-4,
                   audit: dict | None = None) -> DataFrame:
    """CCNet-style quality tiers: bucket documents into ``tail`` /
    ``middle`` / ``head`` by their LM score (CCNet §4.3 splits each
    language's crawl into perplexity terciles and publishes the tiers
    instead of hard-filtering; head = lowest perplexity = HIGHEST
    ``avg_logprob`` here).

    ``scored`` must already carry ``score_col`` (the output of
    ``unigram_logprob_scores``/``bigram_logprob_scores`` joined onto
    the corpus, or any other quality score).  Tier boundaries come
    from either

    - ``cutoffs=(lo, hi)`` — explicit frozen values (the increment /
      reproducibility path: score a new batch against the REFERENCE
      corpus's boundaries, exactly how CCNet scores every crawl
      against the Wikipedia-trained model's terciles), or
    - the batch's own quantiles at ``fractions`` — global, or
      PER-GROUP when ``by`` names a column (CCNet's per-language
      terciles).  Derived via ``percentile_approx`` (one aggregate
      row, or one bounded-cardinality group aggregate broadcast back);
      the corpus never shuffles — tier assignment is a projection.

    NULL scores (docs with no scorable tokens) get a NULL tier —
    unjudgeable is not ``tail``.  ``audit`` receives
    ``lm_tier_cutoffs``: ``{"_global": [lo, hi]}`` or per-group values.
    """
    if not (0 < fractions[0] < fractions[1] < 1):
        raise ValueError(f"fractions must satisfy 0 < lo < hi < 1, "
                         f"got {fractions!r}")
    accuracy = max(100, int(1.0 / relative_error))
    s = F.col(score_col)
    if cutoffs is not None:
        lo, hi = float(cutoffs[0]), float(cutoffs[1])
        if not lo <= hi:
            raise ValueError(f"cutoffs must satisfy lo <= hi, "
                             f"got {cutoffs!r}")
        if audit is not None:
            audit["lm_tier_cutoffs"] = {"_global": [lo, hi]}
        tier = (F.when(s.isNull(), None)
                .when(s >= hi, "head")
                .when(s >= lo, "middle")
                .otherwise("tail"))
        return scored.withColumn(out_col, tier)
    q = F.percentile_approx(score_col, list(fractions), accuracy)
    if by is None:
        row = scored.agg(q.alias("q")).first()
        qs = row["q"]
        if qs is None or any(v is None for v in qs):
            raise ValueError(
                f"cannot derive tier cutoffs: no non-NULL {score_col!r} "
                "values in the batch (pass cutoffs= explicitly)")
        return lm_tier_assign(scored, score_col=score_col,
                              cutoffs=(float(qs[0]), float(qs[1])),
                              out_col=out_col, audit=audit)
    # per-group boundaries: the group table is bounded (languages,
    # sources), so collect it ONCE — the corpus-scale groupBy aggregate
    # runs a single time, and the collected rows rebuild as a local
    # frame for the broadcast join (a lazy `bounds` in the join would
    # re-run the full aggregate at write time — r5 review).  Groups
    # whose scores are all NULL get NULL bounds and their rows a NULL
    # tier (disclosed in the audit).
    bounds = (scored.groupBy(F.col(by).alias("_tier_key"))
              .agg(q.alias("_tier_q")))
    rows = bounds.collect()
    if audit is not None:
        audit["lm_tier_cutoffs"] = {
            r["_tier_key"]: ([float(r["_tier_q"][0]),
                              float(r["_tier_q"][1])]
                             if r["_tier_q"] is not None else None)
            for r in rows}
    local = scored.sparkSession.createDataFrame(rows, bounds.schema)
    joined = scored.join(
        F.broadcast(local),
        F.col(by).eqNullSafe(F.col("_tier_key")), "left")
    lo_b, hi_b = F.col("_tier_q")[0], F.col("_tier_q")[1]
    tier = (F.when(s.isNull() | F.col("_tier_q").isNull(), None)
            .when(s >= hi_b, "head")
            .when(s >= lo_b, "middle")
            .otherwise("tail"))
    return (joined.withColumn(out_col, tier)
            .drop("_tier_key", "_tier_q"))


def append_lm_tiers(kept: DataFrame, lm, *, order: int = 1,
                    text_col: str = "text", id_col: str = "doc_id",
                    cutoffs: tuple[float, float] | None = None,
                    fractions: tuple[float, float] | None = None,
                    audit: dict | None = None) -> DataFrame:
    """The CLI-facing tier stage, shared by clean_cli and increment_cli
    so their tier semantics can't drift (the ``parse_float_bounds``
    precedent): score ``kept`` under ``lm`` (order 1 = unigram frame,
    2 = (unigram, bigram) pair), join the score on, assign tiers, drop
    the score column.

    Persist discipline: with FROZEN ``cutoffs`` everything is lazy —
    one scoring join + projection on the way to the caller's write, no
    extra action, no cache.  With derived ``fractions`` the quantile
    agg is an action over the scored lineage, so the POST-join frame
    persists (caching only pre-join kept would re-run the corpus-scale
    scoring join at write time — r5 review); the handle lands in
    ``audit["persisted"]`` for the caller's unpersist sweep.
    """
    scores = (bigram_logprob_scores(kept, lm[0], lm[1], text_col=text_col,
                                    id_col=id_col)
              if order == 2 else
              unigram_logprob_scores(kept, lm, text_col=text_col,
                                     id_col=id_col))
    kept = kept.join(scores.select(id_col, "avg_logprob"), id_col, "left")
    if cutoffs is None:
        kept = kept.persist()
        if audit is not None:
            audit.setdefault("persisted", []).append(kept)
    kw = {"fractions": fractions} if fractions else {}
    return lm_tier_assign(kept, cutoffs=cutoffs, audit=audit,
                          **kw).drop("avg_logprob")


def lm_tier_stats(kept_rb: DataFrame) -> dict:
    """Per-tier counts for a run-stats line (NULL tier → "(null)") —
    the shared telemetry shape for both CLIs."""
    return {(r["lm_tier"] if r["lm_tier"] is not None else "(null)"):
            r["n"] for r in kept_rb.groupBy("lm_tier")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
