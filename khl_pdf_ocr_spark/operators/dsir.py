"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"):
select raw-crawl documents whose hashed-n-gram distribution looks like
a target corpus.  Fit two bag-of-hashed-n-grams models — p̂ on the
target/seed corpus, q̂ on the raw corpus — and weight every raw
document by its log importance ratio

    log w(x) = Σ_buckets  c_b(x) · (log p̂_b − log q̂_b),

then resample: Gumbel-perturbed top-k (≡ sampling without replacement
proportional to softmax of the log-weights — the paper's sampled
variant) or plain top-k (the argmax variant).

This is the third, distribution-matching member of the quality-gate
family: the CCNet LM stage (``textstats``) scores *fluency*, the
seed-vs-crawl classifier (``quality_model``) scores *resemblance
learned discriminatively*, DSIR scores *distributional closeness* with
a closed-form generative ratio — no gradient training at all.  No
counterpart exists in the reference (`/root/reference/app.py` has no
corpus layer); the grounding is the published method.

Scale design (100 TB):
- features are HASHED n-gram counts (the paper uses 10k buckets): a
  stateless projection — no vocabulary build, no driver collect; each
  model is a ``num_buckets``-row frame (10k rows ≈ nothing) that
  BROADCASTS for scoring.
- model fit = one explode + one map-side-combined ``groupBy(bucket)``
  per corpus; the full-range bucket table comes from ``spark.range``
  so the scorer never handles missing buckets.
- scoring = explode + broadcast join against the (bucket, Δlog) dim +
  one per-doc aggregate — narrow (id, bucket) rows, zero corpus-wide
  shuffles beyond the per-doc combine.
- the Gumbel noise is DERIVED from ``xxhash64(id, seed)`` (the
  ``deterministic_sample`` rule), not an RNG: membership survives
  re-runs, repartitioning, and cluster resizing.
- ``dsir_select`` top-k runs on the narrow (id, key) projection via
  sort+limit (Catalyst's TakeOrderedAndProject — per-partition top-k,
  merged on the driver: O(k) driver memory, disclosed).  For k beyond
  driver reach, pass ``threshold=`` instead — a fully distributed
  stateless filter (the paper's large-scale mode: pick the cut from a
  quantile sketch, then stream-filter).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions import text as X
from khl_pdf_ocr_spark.functions.rounding import round_half_up

__all__ = ["hashed_ngram_buckets", "fit_hashed_ngram_model",
           "dsir_logratio_scores", "dsir_select",
           "save_dsir_model", "load_dsir_model"]


def _ngram_strings(text_col, orders: tuple[int, ...]):
    """Array of n-gram strings (space-joined normalized tokens) for the
    requested orders, as one pure-JVM array expression."""
    toks = F.filter(F.split(X.normalized_text(
        F.coalesce(text_col, F.lit(""))), r"\s+"),
        lambda t: F.length(t) > 0)
    parts = []
    for n in sorted(set(orders)):
        if n < 1:
            raise ValueError(f"n-gram orders must be >= 1, got {n}")
        if n == 1:
            parts.append(toks)
        else:
            # zip the array against its n-1 shifted selves; zip_with
            # pads the shorter side with NULL, so trailing partial
            # windows concat to NULL and are filtered out
            g = toks
            for off in range(1, n):
                shifted = F.slice(toks, off + 1,
                                  F.greatest(F.size(toks) - off, F.lit(0)))
                g = F.zip_with(g, shifted,
                               lambda a, b: F.concat_ws(" ", a, b))
            # concat_ws skips NULLs, so guard: a window is valid only
            # when its LAST token exists — trim to size-n+1 windows
            g = F.slice(g, 1, F.greatest(F.size(toks) - (n - 1),
                                         F.lit(0)))
            parts.append(g)
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def hashed_ngram_buckets(text_col, *, num_buckets: int = 10_000,
                         orders: tuple[int, ...] = (1, 2), seed: int = 11,
                         ngram_hash=None):
    """Array-of-bucket-ids column: each n-gram occurrence hashed into
    ``[0, num_buckets)``.  ``ngram_hash`` (Column → Column) defaults to
    ``xxhash64(ngram, seed)``; pass ``dedup.sql_token_hash`` for the
    SQL-/pure-Python-reproducible 31-bit variant (the simhash
    precedent — weaker hash, identical cross-engine)."""
    if num_buckets < 2:
        raise ValueError(f"num_buckets must be >= 2, got {num_buckets}")
    grams = _ngram_strings(text_col, orders)
    if ngram_hash is None:
        def ngram_hash(c):
            return F.xxhash64(c, F.lit(seed))
    return F.transform(grams,
                       lambda g: F.pmod(ngram_hash(g),
                                        F.lit(num_buckets)).cast("int"))


def fit_hashed_ngram_model(df: DataFrame, *, text_col: str = "text",
                           num_buckets: int = 10_000,
                           orders: tuple[int, ...] = (1, 2),
                           alpha: float = 1.0, seed: int = 11,
                           ngram_hash=None) -> DataFrame:
    """Bag-of-hashed-n-grams model: ``(bucket, logp)`` for EVERY bucket
    in range (``spark.range`` left-join — the scorer never sees a
    missing bucket), with additive smoothing
    ``logp_b = ln((c_b + α) / (T + α·m))``.  ``num_buckets`` rows —
    localCheckpoint-able, broadcastable."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    buckets = hashed_ngram_buckets(F.col(text_col),
                                   num_buckets=num_buckets, orders=orders,
                                   seed=seed, ngram_hash=ngram_hash)
    # ≤ num_buckets rows, but its lineage is the full corpus explode —
    # localCheckpoint so the total and the join below each cost one
    # tiny local read, not a corpus pass (the train_unigram_lm rule)
    counts = (df.select(F.explode(buckets).alias("bucket"))
              .groupBy("bucket").agg(F.count("*").alias("c"))
              .localCheckpoint(eager=True))
    total = counts.agg(F.sum("c")).first()[0] or 0
    denom = float(total) + alpha * num_buckets
    full = df.sparkSession.range(num_buckets) \
        .select(F.col("id").cast("int").alias("bucket"))
    return (full.join(counts, "bucket", "left")
            .select("bucket",
                    F.log((F.coalesce(F.col("c"), F.lit(0))
                           + F.lit(float(alpha))) / F.lit(denom))
                    .alias("logp")))


def dsir_logratio_scores(df: DataFrame, target_model: DataFrame,
                         raw_model: DataFrame, *, text_col: str = "text",
                         id_col: str = "doc_id",
                         num_buckets: int = 10_000,
                         orders: tuple[int, ...] = (1, 2), seed: int = 11,
                         ngram_hash=None,
                         deterministic_fold: bool = False) -> DataFrame:
    """Per-document log importance weight under the two fitted models:
    ``(id_col, n_ngrams, dsir_logratio)``.  The (bucket, Δlog) dim is
    the join of the two ``num_buckets``-row models — broadcast; the
    corpus side explodes to narrow (id, bucket) rows, joins broadcast,
    and combines per doc.  Docs with zero n-grams get NULL logratio and
    n_ngrams 0 — never silently vanish.

    ``deterministic_fold``: canonical sorted left-fold summation
    instead of ``F.sum`` (the ``unigram_logprob_scores`` contract) for
    exact cross-engine gating; both variants round half-up at 6 dp.

    Hash/bucket/order/seed parameters MUST match the ones the models
    were fitted with — they parameterize the feature space itself.
    """
    delta = (target_model.select("bucket",
                                 F.col("logp").alias("_lt"))
             .join(raw_model.select("bucket", F.col("logp").alias("_lr")),
                   "bucket")
             .select("bucket", (F.col("_lt") - F.col("_lr")).alias("dlog")))
    buckets = hashed_ngram_buckets(F.col(text_col),
                                   num_buckets=num_buckets, orders=orders,
                                   seed=seed, ngram_hash=ngram_hash)
    rows = df.select(F.col(id_col).alias("id"),
                     F.explode_outer(buckets).alias("bucket"))
    scored = (rows.join(F.broadcast(delta), "bucket", "left")
              .select("id", F.when(F.col("bucket").isNull(), None)
                      .otherwise(F.col("dlog")).alias("d")))
    if deterministic_fold:
        agg = (scored.groupBy("id")
               .agg(F.sort_array(F.collect_list("d")).alias("_ds"))
               .select("id", F.size("_ds").cast("long").alias("n_ngrams"),
                       F.when(F.size("_ds") > 0,
                              F.aggregate("_ds", F.lit(0.0),
                                          lambda a, v: a + v))
                       .alias("_sum")))
    else:
        agg = (scored.groupBy("id")
               .agg(F.count("d").alias("n_ngrams"),
                    F.sum("d").alias("_sum")))
    return agg.select(F.col("id").alias(id_col), "n_ngrams",
                      round_half_up(F.col("_sum"), 6)
                      .alias("dsir_logratio"))


def _gumbel(id_col, seed: int):
    """Deterministic standard-Gumbel draw per id: u ∈ (0, 1) from the
    unsigned xxhash64 midpoint, g = −ln(−ln u).  A pure row function —
    the same id draws the same noise on any cluster."""
    h = F.xxhash64(F.col(id_col), F.lit(seed))
    u = (h.cast("double") + F.lit(2.0 ** 63) + F.lit(0.5)) / F.lit(2.0 ** 64)
    return -F.log(-F.log(u))


def dsir_select(df: DataFrame, scores: DataFrame, k: int, *,
                id_col: str = "doc_id", seed: int = 13,
                gumbel: bool = True,
                threshold: float | None = None
                ) -> tuple[DataFrame, DataFrame]:
    """Returns ``(kept, dropped)``; ``dropped`` is the
    ``(id, reject_reason='dsir')`` ledger (the ``clean_corpus``
    contract).  ``scores`` is a ``dsir_logratio_scores`` frame; docs
    absent from it (or with NULL logratio) never qualify.

    Selection key = ``dsir_logratio`` (+ deterministic Gumbel noise
    when ``gumbel=True`` — the paper's softmax-sampling variant;
    ``False`` = plain top-k).  With ``threshold=`` the top-k sort is
    skipped entirely: keep iff key ≥ threshold (fully distributed, for
    k beyond driver-side top-k reach).
    """
    if k < 1 and threshold is None:
        raise ValueError(f"k must be >= 1, got {k}")
    key = F.col("dsir_logratio")
    if gumbel:
        key = key + _gumbel(id_col, seed)
    keyed = (scores.filter(F.col("dsir_logratio").isNotNull())
             .select(F.col(id_col), key.alias("_key")))
    if threshold is not None:
        chosen = keyed.filter(F.col("_key") >= float(threshold)) \
                      .select(id_col)
    else:
        chosen = (keyed.orderBy(F.col("_key").desc(),
                                F.col(id_col).asc())
                  .limit(int(k)).select(id_col))
    kept = df.join(chosen, id_col, "left_semi")
    dropped = (df.join(chosen, id_col, "left_anti")
               .select(F.col(id_col).alias("id"),
                       F.lit("dsir").alias("reject_reason")))
    return kept, dropped


def save_dsir_model(target_model: DataFrame, raw_model: DataFrame,
                    path: str, *, num_buckets: int = 10_000,
                    orders: tuple[int, ...] = (1, 2),
                    seed: int = 11) -> None:
    """Persist a fitted (target, raw) model pair with overwrite
    semantics (the ``save_lm`` layout discipline — one place the
    convention lives): ``path/target`` + ``path/raw`` hold the two
    ``(bucket, logp)`` frames, ``path/meta`` one row pinning the
    FEATURE-SPACE parameters (num_buckets / orders / seed) so a later
    scorer can't silently hash into a different space.  Only the
    default ``xxhash64`` feature hash is representable on disk — a
    custom ``ngram_hash`` callable has no serialization, so models
    fitted with one must stay in-session (tests/oracles use them;
    production uses the default)."""
    spark = target_model.sparkSession
    target_model.write.mode("overwrite").parquet(f"{path}/target")
    raw_model.write.mode("overwrite").parquet(f"{path}/raw")
    spark.createDataFrame(
        [(int(num_buckets), ",".join(str(n) for n in sorted(set(orders))),
          int(seed))],
        "num_buckets int, orders string, seed int") \
        .write.mode("overwrite").parquet(f"{path}/meta")


def load_dsir_model(spark, path: str
                    ) -> tuple[DataFrame, DataFrame, dict]:
    """Inverse of ``save_dsir_model``: returns ``(target_model,
    raw_model, kw)`` where ``kw`` carries the pinned feature-space
    parameters, ready to splat into ``dsir_logratio_scores``."""
    meta = spark.read.parquet(f"{path}/meta").first()
    kw = {"num_buckets": int(meta["num_buckets"]),
          "orders": tuple(int(n) for n in meta["orders"].split(",")),
          "seed": int(meta["seed"])}
    return (spark.read.parquet(f"{path}/target"),
            spark.read.parquet(f"{path}/raw"), kw)


def py_gumbel(id_val: int, seed: int = 13) -> float:
    """Pure-Python twin of ``_gumbel`` (tests / oracle replay)."""
    from khl_pdf_ocr_spark.functions.xxh import xxhash64_long_int

    h = xxhash64_long_int(id_val, seed)
    u = (float(h) + 2.0 ** 63 + 0.5) / 2.0 ** 64
    return -math.log(-math.log(u))
