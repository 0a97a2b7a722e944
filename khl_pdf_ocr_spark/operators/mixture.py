"""Token-budget mixture sampling — the "mixture weights" stage of
LM-pretraining corpus assembly (Gao et al. 2021, The Pile, Table 1;
Brown et al. 2020 §2.2 Table 2.2; Touvron et al. 2023 Table 1: each
source contributes a fixed share of the training-token budget, with
under-sized sources flagged for multi-epoch repetition).

Given per-source mixture weights and a total token budget, source ``s``
gets ``floor(budget · w_s / Σw)`` tokens, filled by the maximal prefix
of its documents in ``(xxhash64(id, seed), id)`` order whose cumulative
token count stays within the budget.  The hash lottery makes membership
a pure function of the row and the seed — stable across re-runs,
repartitioning, cluster sizes, and incremental rebuilds (the
``deterministic_sample`` / ``cap_per_domain`` rule), and uniform over
each source (ids are hashed, so crawl order carries no bias).  Sources
absent from ``weights`` are dropped explicitly, mirroring
``prepare.deterministic_sample``'s unnamed-strata contract.

No counterpart exists in the reference (`/root/reference/app.py` is a
single-document extractor with no corpus layer); the grounding is the
published corpus-assembly recipe.

Scale design (100 TB): the naive form is one running-sum window per
source — a total sort of every source's rows through a single reducer
per source.  The production path instead finds each source's hash
CUTOFF with a bucket histogram: top-``bucket_bits``-bits bucketing of
the signed hash (arithmetic shift — order-preserving for signed longs),
one map-side-combined ``groupBy(source, bucket)`` for per-bucket token
sums, a window over that histogram (≤ |weights| · 2^bits rows — tiny),
then one exact running-sum window over the BOUNDARY bucket only
(~1/2^bits of the source).  Buckets wholly inside the budget are kept
by a stateless semi-join; buckets wholly beyond are dropped the same
way.  The bucket frames are bounded by construction (never
corpus-sized), so broadcasting them does not violate the r4
no-force-broadcast-of-unbounded-lists rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mixture_budgets", "mixture_sample", "temperature_weights"]


def mixture_budgets(weights: dict[str, float],
                    token_budget: int) -> dict[str, int]:
    """Per-source token budgets: ``floor(budget · w_s / Σw)``.

    Weights need not sum to 1 — they are normalised, matching the
    published tables (The Pile's Table 1 lists raw proportions).  A
    budget of 0 tokens for a tiny weight is allowed: such a source then
    keeps only its zero-token hash-prefix (usually nothing).
    """
    if not weights:
        raise ValueError("weights must name at least one source")
    for s, w in weights.items():
        if not w > 0:
            raise ValueError(f"weight for {s!r} must be > 0, got {w}")
    if token_budget < 1:
        raise ValueError(f"token_budget must be >= 1, got {token_budget}")
    total = float(sum(weights.values()))
    return {s: int(token_budget * (w / total)) for s, w in weights.items()}


def mixture_sample(df: DataFrame, weights: dict[str, float],
                   token_budget: int, *, token_col: str = "n_tokens",
                   source_col: str = "source", id_col: str = "doc_id",
                   seed: int = 7, bucket_bits: int = 10,
                   exact: bool = False) -> tuple[DataFrame, DataFrame]:
    """Returns ``(kept, stats)``.

    ``kept`` — the selected rows, original columns only.  Selection per
    source: order by ``(xxhash64(id, seed), id)``, keep every row whose
    running token total (inclusive) is ≤ the source's budget.  NULL
    token counts weigh 0.  The prefix rule is strict — once a document
    crosses the budget, no later document of that source is taken (no
    skip-and-refill), so the kept set is a true hash-order prefix,
    reproducible from (ids, seed, budgets) alone.

    ``stats`` — one row per source in ``weights`` (lazy; shares the
    kept lineage — persist upstream if both frames are consumed):
    ``(source, budget_tokens, avail_docs, avail_tokens, kept_docs,
    kept_tokens, epochs_needed)`` where ``epochs_needed`` > 1.0 signals
    an under-sized source the published recipes repeat for multiple
    epochs (round-half-even at 6 dp via SQL ``round``).

    ``exact=True`` forces the single-window path (one total sort per
    source) — for tests and small frames; the default bucketed path
    produces the identical kept set (pinned in tests/test_mixture.py).
    """
    if not 1 <= bucket_bits <= 20:
        raise ValueError(f"bucket_bits must be in [1, 20], got {bucket_bits}")
    from pyspark.sql import Window

    budgets = mixture_budgets(weights, token_budget)
    spark = df.sparkSession
    bdf = spark.createDataFrame(
        sorted(budgets.items()), f"{source_col} string, _budget long")

    base = (df.join(F.broadcast(bdf), source_col, "inner")
            .withColumn("_h", F.xxhash64(F.col(id_col), F.lit(seed)))
            .withColumn("_tok", F.coalesce(F.col(token_col).cast("long"),
                                           F.lit(0))))
    w_run = (Window.partitionBy(source_col)
             .orderBy(F.col("_h").asc(), F.col(id_col).asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    if exact:
        kept = (base.withColumn("_cum", F.sum("_tok").over(w_run))
                .filter(F.col("_cum") <= F.col("_budget"))
                .select(*df.columns))
    else:
        # bucket = top bits of the signed hash; Java's arithmetic >>
        # preserves signed order, so ascending-bucket traversal IS
        # ascending-hash traversal
        based = base.withColumn("_b", F.shiftright(F.col("_h"),
                                                   64 - bucket_bits))
        w_hist = (Window.partitionBy(source_col).orderBy(F.col("_b").asc())
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        hist = (based.groupBy(source_col, "_b", "_budget")
                .agg(F.sum("_tok").alias("_bsum"))
                .withColumn("_cum_through", F.sum("_bsum").over(w_hist))
                .withColumn("_cum_before",
                            F.col("_cum_through") - F.col("_bsum")))
        full = (hist.filter(F.col("_cum_through") <= F.col("_budget"))
                .select(source_col, "_b"))
        # cum_before == budget stays a BOUNDARY bucket (not a drop):
        # its zero-token hash-prefix rows still satisfy cum <= budget
        boundary = (hist.filter((F.col("_cum_before") <= F.col("_budget"))
                                & (F.col("_cum_through") > F.col("_budget")))
                    .select(source_col, "_b", "_cum_before"))
        kept_full = based.join(F.broadcast(full), [source_col, "_b"],
                               "left_semi")
        kept_bnd = (based.join(F.broadcast(boundary), [source_col, "_b"])
                    .withColumn("_cum", F.col("_cum_before")
                                + F.sum("_tok").over(w_run))
                    .filter(F.col("_cum") <= F.col("_budget")))
        kept = (kept_full.select(*df.columns)
                .unionByName(kept_bnd.select(*df.columns)))

    tok = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    avail = (base.groupBy(source_col)
             .agg(F.count("*").alias("avail_docs"),
                  F.sum("_tok").alias("avail_tokens")))
    kstat = (kept.groupBy(source_col)
             .agg(F.count("*").alias("kept_docs"),
                  F.sum(tok).alias("kept_tokens")))
    stats = (bdf.join(avail, source_col, "left")
             .join(kstat, source_col, "left")
             .select(source_col,
                     F.col("_budget").alias("budget_tokens"),
                     F.coalesce("avail_docs", F.lit(0)).alias("avail_docs"),
                     F.coalesce("avail_tokens",
                                F.lit(0)).alias("avail_tokens"),
                     F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
                     F.coalesce("kept_tokens",
                                F.lit(0)).alias("kept_tokens"),
                     F.when((F.col("avail_tokens") > 0)
                            & (F.col("avail_tokens") < F.col("_budget")),
                            F.round(F.col("_budget")
                                    / F.col("avail_tokens"), 6))
                     .otherwise(F.lit(1.0)).alias("epochs_needed")))
    return kept, stats


def temperature_weights(df: DataFrame, *, temperature: float,
                        token_col: str = "n_tokens",
                        source_col: str = "source"
                        ) -> dict[str, float]:
    """Temperature-scaled mixture weights from the corpus's OWN source
    sizes (Conneau et al. 2020, XLM-R §3.1; Xue et al. 2021, mT5
    §3.2): ``w_s ∝ (n_s / Σn)^(1/T)``.  ``T = 1`` reproduces the
    natural proportions, ``T → ∞`` approaches uniform — the standard
    knob for upweighting small sources without hand-picking every
    weight.  Feed the result straight to ``mixture_sample`` (which
    normalises, so these are returned unnormalised-but-proportional).

    One map-side-combined ``groupBy(source)`` and a source-count-sized
    collect — the only action, bounded by the number of sources, never
    by rows.  NULL token counts weigh 0; sources whose total is 0 are
    dropped (a zero share stays zero at any temperature, and
    ``mixture_budgets`` rejects non-positive weights).
    """
    if not temperature > 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    rows = (df.groupBy(source_col)
            .agg(F.sum(F.coalesce(F.col(token_col).cast("long"),
                                  F.lit(0))).alias("_n"))
            .collect())
    counts = {r[source_col]: int(r["_n"]) for r in rows if r["_n"]}
    total = sum(counts.values())
    if not counts:
        raise ValueError("no source has a positive token count")
    return {s: (n / total) ** (1.0 / temperature)
            for s, n in sorted(counts.items())}
