"""End-to-end training-corpus cleaning: the composition a 100 TB
pretraining-data pipeline actually runs over extracted text.

    extract → language filter → quality filter → exact dedup
            → MinHash near-dup removal → cleaned corpus + reject ledger

Each stage is one of this engine's operators; the composition adds the
keep/drop bookkeeping (every dropped row lands in the ledger with its
reject reason — at scale you audit the drops, not the keeps).

Shuffle budget: lang/quality filters are map-only; exact dedup is one
hash shuffle on the fingerprint; near-dup removal reuses the MinHash-LSH
band shuffle + a broadcast-able drop-list anti-join (the drop list is
tiny relative to the corpus — near-dup rates are single-digit percent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions import text as X
from khl_pdf_ocr_spark.operators.dedup import exact_dedup, minhash_lsh_pairs

__all__ = ["clean_corpus"]


def clean_corpus(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
                 allowed_langs: tuple[str, ...] = ("en", "ru"),
                 min_quality: float = 0.4,
                 near_dup_threshold: float = 0.8,
                 near_dup_policy: str = "pairs",
                 url_col: str | None = None,
                 declared_canonical_col: str | None = None,
                 zlib_bounds: tuple[float | None, float | None] | None = None,
                 benchmark: DataFrame | None = None,
                 benchmark_fuzzy_threshold: float | None = None,
                 lm: DataFrame | None = None,
                 lm_tails: tuple[float, float] = (0.05, 0.95),
                 lm_cutoffs: tuple[float | None, float | None] | None = None,
                 audit: dict | None = None) -> tuple[DataFrame, DataFrame]:
    """Returns ``(kept, ledger)``.

    ``kept``   — surviving rows of ``df`` (original columns).
    ``ledger`` — (id, reject_reason) for every dropped row:
                 url_dup | lang | quality | exact_dup | near_dup.
    ``url_col``— optional: stage 0 dedups on the CANONICAL url
                 (functions.urls.canonical_url — case/ports/fragments/
                 tracking-params variants collapse) keeping the min id;
                 the cheapest web-crawl dedup, run before any text work.
    ``declared_canonical_col`` — optional (requires ``url_col``): a
                 rel=canonical column tagged at ingest
                 (``licensing.canonical_link``); where non-NULL it
                 REPLACES the fetch url as the dedup key, so mirrors /
                 variant urls that declare one target collapse onto it
                 even when their fetch urls normalize differently.
    ``zlib_bounds`` — optional (lo, hi) compression-ratio band
                 (``textstats.zlib_ratio_col``; either side None =
                 unbounded): the model-free two-tailed quality gate —
                 boilerplate compresses far below prose, glyph soup
                 sits near 1.  Runs after the heuristic quality stage;
                 drops land as ``zlib_ratio`` (NULL ratio = empty text
                 rejects, like the LM stage's zero-token rule).
    ``audit``  — optional dict; gains the near-dup stage's lazy
                 ``"hot_buckets"`` frame (band buckets whose candidate
                 generation was chain-bounded — the no-silent-caps
                 audit; count it into run stats).
    ``benchmark`` — optional eval-set frame with a ``text`` column:
                 runs ``prepare.decontaminate`` as the LAST stage (so
                 no later stage can reintroduce eval text); drops land
                 as ``contaminated`` in the ledger.
    ``benchmark_fuzzy_threshold`` — optional Jaccard threshold: with
                 ``benchmark``, ALSO runs ``decontaminate_fuzzy``
                 (MinHash paraphrase net) after the exact pass; drops
                 land as ``contaminated_fuzzy``.
    ``lm``     — optional (token, logprob) frame from
                 ``textstats.train_unigram_lm``, or a
                 ``(unigram_lm, bigram_lm)`` tuple from
                 ``train_bigram_lm`` (scored with the interpolated
                 bigram model — word-order-sensitive): appends the
                 CCNet-style LM quality stage after near-dup removal —
                 score every surviving doc with
                 ``unigram_logprob_scores`` and KEEP THE MIDDLE of the
                 ``avg_logprob`` distribution (gibberish scores far
                 negative, pathologically repetitive boilerplate
                 suspiciously high — both tails are junk).  Drops land
                 as ``lm_quality``; docs with zero scorable tokens are
                 dropped too (a row never vanishes from both outputs).
    ``lm_tails`` — (lo_q, hi_q) batch quantiles defining the kept
                 middle when ``lm_cutoffs`` is not given.  Computing
                 them is an ACTION: the pipeline up to the LM stage is
                 persisted (handle appended to ``audit["persisted"]``)
                 so the cutoff pass and the final write don't each
                 re-run the upstream dedup lineage.
    ``lm_cutoffs`` — absolute (lo, hi) ``avg_logprob`` bounds (either
                 side None = unbounded).  Overrides ``lm_tails`` and
                 keeps the whole pipeline LAZY (no quantile action, no
                 persist) — the production increment shape: freeze
                 cutoffs from a reference batch, apply them to every
                 daily increment so the accept band doesn't drift with
                 batch composition.

    ``near_dup_policy``:
    - ``"pairs"`` (default): drop ``id_b`` of every confirmed pair.
      For pair sets like (A,C),(B,C) this keeps both A and B even though
      they are transitively near-dups — cheap, and correct when clusters
      are cliques (the common case for boilerplate dups).
    - ``"components"``: connected components over the pair graph, keep
      the min id per component — exactly one representative per
      transitive cluster (iterative label propagation; a few extra tiny
      shuffles over the pair set only).
    - ``"components_best"``: components as above, but keep the
      HIGHEST-quality member of each cluster (the already-computed
      quality score; ties → min id) — the production survivor policy:
      the cleanest copy of a page wins, not the first-crawled one.
    """
    if benchmark_fuzzy_threshold is not None and benchmark is None:
        # silently no-opping here would let a caller believe paraphrased
        # eval text is being dropped while nothing runs (r5 review)
        raise ValueError("benchmark_fuzzy_threshold requires benchmark")
    if declared_canonical_col is not None and url_col is None:
        # the declared canonical only feeds the url-dedup stage; with
        # that stage off it would silently do nothing (r5 review rule)
        raise ValueError("declared_canonical_col requires url_col")
    url_bad = None
    if url_col is not None:
        from khl_pdf_ocr_spark.functions.urls import canonical_url

        # the dedup key honors the page's own rel=canonical declaration
        # when one was tagged at ingest (licensing.canonical_link):
        # variant urls that declare one target collapse onto it
        eff_url = F.col(url_col)
        if declared_canonical_col is not None:
            decl = F.col(declared_canonical_col)
            eff_url = F.when(decl.isNull() | (F.length(decl) == 0),
                             eff_url).otherwise(decl)
        # NULL/empty urls get a per-row unique key: they must BYPASS
        # url dedup, never collapse into one surviving document
        curl = F.when(
            eff_url.isNull() | (F.length(eff_url) == 0),
            F.concat(F.lit("\x00nourl:"), F.col(id_col).cast("string"))
        ).otherwise(canonical_url(eff_url))
        with_url = df.withColumn("_curl", curl)
        url_keeps = (with_url.groupBy("_curl")
                     .agg(F.min(F.col(id_col)).alias("_keep_id")))
        tagged = with_url.join(url_keeps, "_curl")
        url_bad = (tagged.filter(F.col(id_col) != F.col("_keep_id"))
                   .select(F.col(id_col).alias("id"),
                           F.lit("url_dup").alias("reject_reason")))
        df = tagged.filter(F.col(id_col) == F.col("_keep_id")) \
                   .drop("_curl", "_keep_id")

    # score on coalesce(text,'') — NULL text propagates oddly through
    # SQL null semantics (size(split(NULL)) = -1); empty text scores a
    # deterministic 0.3 → quality reject
    scored = F.coalesce(F.col(text_col), F.lit(""))
    # stopword_count/char-length feed BOTH lang_id and quality_score —
    # compute each shared count once and substitute it (same expression
    # tree as the standalone calls; see text.text_analytics, r4)
    n_sw = X.stopword_count(scored)
    n_chr = F.greatest(F.length(scored).cast("double"), F.lit(1.0))
    base = (df.withColumn("_nsw", n_sw).withColumn("_nchr", n_chr)
            .withColumn("_lang", X.lang_id(scored, n_sw=F.col("_nsw"),
                                           n_chr=F.col("_nchr")))
            .withColumn("_q", X.quality_score(scored, n_sw=F.col("_nsw"),
                                              n_chr=F.col("_nchr"))))

    lang_bad = base.filter(~F.col("_lang").isin(*allowed_langs)) \
                   .select(F.col(id_col).alias("id"),
                           F.lit("lang").alias("reject_reason"))
    stage1 = base.filter(F.col("_lang").isin(*allowed_langs))

    # NULL text → NULL quality → reject (a row must never vanish from
    # both kept and ledger)
    q_bad = stage1.filter((F.col("_q") < min_quality) | F.col("_q").isNull()) \
                  .select(F.col(id_col).alias("id"),
                          F.lit("quality").alias("reject_reason"))
    stage2 = stage1.filter(F.col("_q") >= min_quality)

    zlib_bad = None
    if zlib_bounds is not None:
        # compression-ratio band (textstats.zlib_ratio_col): both tails
        # are junk — templated boilerplate compresses far below prose,
        # glyph soup/binary junk sits near 1.  A withColumn of the
        # Arrow-batched UDF — no join-back, no shuffle.  NULL ratio
        # (empty text) rejects, mirroring the LM stage's zero-token
        # rule (a row never vanishes from both outputs).
        from khl_pdf_ocr_spark.operators.textstats import zlib_ratio_col

        zlo, zhi = zlib_bounds
        zscored = stage2.withColumn("_zr", zlib_ratio_col(F.col(text_col)))
        in_band = F.col("_zr").isNotNull()
        if zlo is not None:
            in_band = in_band & (F.col("_zr") >= zlo)
        if zhi is not None:
            in_band = in_band & (F.col("_zr") <= zhi)
        zlib_bad = (zscored.filter(~F.coalesce(in_band, F.lit(False)))
                    .select(F.col(id_col).alias("id"),
                            F.lit("zlib_ratio").alias("reject_reason")))
        stage2 = zscored.filter(in_band).drop("_zr")

    # exact dedup: keep min(id) per fingerprint
    groups = exact_dedup(stage2, text_col=text_col, id_col=id_col)
    keep_ids = groups.select(F.col("keep_id").alias(id_col))
    exact_bad = (stage2.join(keep_ids, id_col, "left_anti")
                 .select(F.col(id_col).alias("id"),
                         F.lit("exact_dup").alias("reject_reason")))
    stage3 = stage2.join(keep_ids, id_col, "left_semi")

    shared_sigs = None
    if benchmark is not None and benchmark_fuzzy_threshold is not None:
        # the fuzzy decontamination stage needs the same (id, sig)
        # minhash signatures the near-dup stage computes — the single
        # most expensive map-side pass; compute ONCE and share (r5
        # review).  Persisted via the audit dict when available, else
        # the two consumers re-run the lineage (no worse than before).
        from khl_pdf_ocr_spark.operators.dedup import minhash_signatures

        shared_sigs = minhash_signatures(stage3, text_col=text_col,
                                         id_col=id_col)
        if audit is not None:
            shared_sigs = shared_sigs.persist()
            audit.setdefault("persisted", []).append(shared_sigs)
    pairs = minhash_lsh_pairs(stage3, text_col=text_col, id_col=id_col,
                              verify_threshold=near_dup_threshold,
                              audit=audit, sigs=shared_sigs)
    if near_dup_policy == "components":
        from khl_pdf_ocr_spark.operators.dedup import connected_components

        comp = connected_components(pairs)
        drop = (comp.filter(F.col("id") != F.col("component"))
                .select(F.col("id").alias(id_col)).distinct())
    elif near_dup_policy == "components_best":
        from pyspark.sql import Window

        from khl_pdf_ocr_spark.operators.dedup import connected_components

        # keep the HIGHEST-QUALITY member of each duplicate cluster
        # (min-id is an arbitrary survivor; a production corpus wants
        # the cleanest copy of the page, not the first-crawled one).
        # Quality is the already-computed _q column — no second text
        # pass; ties break to min id so the choice stays deterministic.
        comp = connected_components(pairs)
        member_q = comp.join(
            stage3.select(F.col(id_col).alias("id"), F.col("_q")), "id")
        w = Window.partitionBy("component").orderBy(
            F.col("_q").desc(), F.col("id").asc())
        drop = (member_q.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") > 1)
                .select(F.col("id").alias(id_col)))
    elif near_dup_policy == "pairs":
        # drop the higher id of every confirmed pair
        drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    else:
        raise ValueError(f"unknown near_dup_policy: {near_dup_policy!r}")
    near_bad = drop.select(F.col(id_col).alias("id"),
                           F.lit("near_dup").alias("reject_reason"))
    # drop is corpus-derived and unbounded (a re-crawl batch can
    # near-dup most of itself) — joined, never force-broadcast; AQE
    # broadcasts at runtime when it is actually small (the r4
    # decontamination rule, applied here too in r5)
    kept = stage3.join(drop, id_col, "left_anti") \
                 .drop("_lang", "_q", "_nsw", "_nchr")

    ledger = lang_bad.unionByName(q_bad).unionByName(exact_bad).unionByName(near_bad)
    if zlib_bad is not None:
        ledger = ledger.unionByName(zlib_bad)
    if lm is not None:
        if isinstance(lm, tuple):
            from khl_pdf_ocr_spark.operators.textstats import \
                bigram_logprob_scores

            uni_lm, bi_lm = lm

            def _lm_scores(frame):
                return bigram_logprob_scores(frame, uni_lm, bi_lm,
                                             text_col=text_col,
                                             id_col=id_col)
        else:
            from khl_pdf_ocr_spark.operators.textstats import \
                unigram_logprob_scores

            def _lm_scores(frame):
                return unigram_logprob_scores(frame, lm, text_col=text_col,
                                              id_col=id_col)

        kept_cols = kept.columns
        if lm_cutoffs is None:
            # quantile cutoffs need an action over the scored batch;
            # persist the pre-LM survivors so that action and the
            # eventual output write share one run of the upstream
            # lang/quality/dedup lineage (caller unpersists via audit)
            kept = kept.persist()
            if audit is not None:
                audit.setdefault("persisted", []).append(kept)
            scores = _lm_scores(kept)
            cuts = scores.filter(F.col("avg_logprob").isNotNull()) \
                .approxQuantile("avg_logprob", list(lm_tails), 0.001)
            # approxQuantile returns [] when NO doc has a score (every
            # row already rejected upstream, or all-unscorable text) —
            # unbounded cutoffs then drop only the NULL-score rows
            # instead of crashing the run after the expensive upstream
            # pipeline already executed (r5 review, reproduced)
            lo, hi = cuts if cuts else (None, None)
        else:
            lo, hi = lm_cutoffs
            scores = _lm_scores(kept)
        if audit is not None:
            audit["lm_cutoffs"] = (lo, hi)
        bad = F.col("avg_logprob").isNull()
        if lo is not None:
            bad = bad | (F.col("avg_logprob") < lo)
        if hi is not None:
            bad = bad | (F.col("avg_logprob") > hi)
        rescored = kept.join(scores, id_col, "left")
        lm_bad = rescored.filter(bad).select(
            F.col(id_col).alias("id"),
            F.lit("lm_quality").alias("reject_reason"))
        kept = rescored.filter(~bad).select(*kept_cols)
        ledger = ledger.unionByName(lm_bad)
    if benchmark is not None:
        from khl_pdf_ocr_spark.operators.prepare import decontaminate

        kept, flagged = decontaminate(kept, benchmark, text_col=text_col,
                                      id_col=id_col)
        ledger = ledger.unionByName(
            flagged.select(F.col("id"),
                           F.lit("contaminated").alias("reject_reason")))
        if benchmark_fuzzy_threshold is not None:
            from khl_pdf_ocr_spark.operators.prepare import \
                decontaminate_fuzzy

            # the paraphrase net behind the exact 13-gram rule: catches
            # eval text edited every few tokens (which breaks every
            # exact n-gram but keeps most shingles)
            kept, f_flagged = decontaminate_fuzzy(
                kept, benchmark, text_col=text_col, id_col=id_col,
                threshold=benchmark_fuzzy_threshold, sigs=shared_sigs)
            ledger = ledger.unionByName(
                f_flagged.select(F.col("id"),
                                 F.lit("contaminated_fuzzy")
                                 .alias("reject_reason")))
    if url_bad is not None:
        ledger = url_bad.unionByName(ledger)
    return kept, ledger
