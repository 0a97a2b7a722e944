"""Model-based document-quality classification — the GPT-3 / LLaMA
"quality classifier" corpus stage (Brown et al. 2020, Appendix A;
Touvron et al. 2023 §2): train a logistic regression to separate a
curated high-quality seed corpus (positives) from the raw crawl
(negatives), score every document with the positive-class probability,
and keep documents either by a hard threshold or by the published
Pareto lottery ``keep iff pareto_draw(alpha) > 1 - score`` (which keeps
most high-scoring docs but lets a long low-scoring tail through so the
corpus is not homogenised around the classifier's taste).

This complements the CCNet-style LM-perplexity stage
(``textstats.train_unigram_lm`` / ``bigram``): the LM scores fluency
against a reference distribution; the classifier scores *resemblance to
a curated corpus* — different signal, and production pipelines run
both.  No counterpart exists in the reference (`/root/reference/app.py`
has no corpus layer at all); the grounding is the published recipe.

Scale design (100 TB):
- features = ``HashingTF`` over whitespace tokens — a STATELESS
  projection (hash-mod bucketing, no vocabulary build), so unlike
  ``CountVectorizer`` there is no vocab shuffle and no driver-side
  vocabulary collect; the only model state is one coefficient vector of
  ``num_features`` doubles (2^18 → 2 MiB) that ml broadcasts for
  scoring.
- training = ``LogisticRegression`` (JVM LBFGS, ``treeAggregate``
  gradient passes — bounded number of distributed passes over the
  labelled frame; the labelled frame is seed-corpus-sized + a crawl
  sample, not the corpus).
- scoring = one narrow ``PipelineModel.transform`` map pass, zero
  shuffles, whole-stage-codegen on either side of the ml transform.
- the Pareto lottery uses ``xxhash64(id, seed)`` as the uniform source
  (the ``deterministic_sample`` rule): membership is a pure function of
  the row — stable under re-runs, repartitioning, and cluster resizing,
  unlike ``np.random.pareto`` in the paper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_quality_classifier", "score_quality_classifier",
           "classifier_quality_filter", "save_classifier",
           "load_classifier"]

#: HashingTF width.  2^18 buckets × 8-byte coefficients = 2 MiB of
#: model state; large enough that hash collisions on a ~10^5-word
#: effective vocabulary are rare (~18 % birthday-bound occupancy).
DEFAULT_NUM_FEATURES = 1 << 18

_TOKENS, _FEATURES, _SCORE_VEC = "_clf_toks", "_clf_feats", "probability"


def train_quality_classifier(positives: DataFrame, negatives: DataFrame, *,
                             text_col: str = "text",
                             num_features: int = DEFAULT_NUM_FEATURES,
                             max_iter: int = 60,
                             reg_param: float = 1e-4):
    """Fit the quality classifier: ``positives`` = curated seed docs
    (the corpus you wish the crawl looked like), ``negatives`` = raw
    crawl docs.  Both frames need ``text_col``; everything else is
    ignored.  Returns a ``PipelineModel`` (tokenizer → HashingTF →
    logistic regression) whose positive class is "seed-like".

    The returned model records ``text_col`` as its input column;
    ``score_quality_classifier`` adapts frames with a different text
    column name, so one saved model serves every table layout.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    labelled = (positives.select(F.coalesce(F.col(text_col), F.lit(""))
                          .alias(text_col), F.lit(1.0).alias("label"))
                .unionByName(
                    negatives.select(F.coalesce(F.col(text_col), F.lit(""))
                                     .alias(text_col),
                                     F.lit(0.0).alias("label"))))
    pipe = Pipeline(stages=[
        # whitespace tokenize, lowercased — the same token definition as
        # textstats/top_terms (split on \s+); gaps=True splits on the
        # pattern rather than matching tokens
        RegexTokenizer(inputCol=text_col, outputCol=_TOKENS,
                       pattern=r"\s+", gaps=True, toLowercase=True,
                       minTokenLength=1),
        HashingTF(inputCol=_TOKENS, outputCol=_FEATURES,
                  numFeatures=num_features),
        LogisticRegression(featuresCol=_FEATURES, labelCol="label",
                           maxIter=max_iter, regParam=reg_param,
                           standardization=False),
    ])
    return pipe.fit(labelled)


def score_quality_classifier(df: DataFrame, model, *,
                             text_col: str = "text",
                             score_col: str = "clf_score") -> DataFrame:
    """Append ``score_col`` = P(seed-like) in [0, 1] to every row.
    One ml transform pass; NULL text scores as empty text (the
    ``clean_corpus`` coalesce rule — a row never scores NULL).
    Intermediate token/feature/prediction columns are dropped.
    """
    from pyspark.ml.functions import vector_to_array

    model_text = model.stages[0].getInputCol()
    out_cols = df.columns
    staged = df
    if model_text not in df.columns:
        staged = staged.withColumn(model_text, F.col(text_col))
    staged = staged.withColumn(
        model_text, F.coalesce(F.col(model_text), F.lit("")))
    scored = model.transform(staged)
    scored = scored.withColumn(
        score_col, vector_to_array(F.col(_SCORE_VEC)).getItem(1))
    return scored.select(*out_cols, score_col)


def classifier_quality_filter(df: DataFrame, model, *,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              threshold: float | None = None,
                              pareto_alpha: float | None = None,
                              seed: int = 77,
                              score_col: str = "clf_score",
                              ) -> tuple[DataFrame, DataFrame]:
    """Returns ``(kept, ledger)``; dropped rows land in the ledger as
    ``clf_quality``.  Exactly one selection rule:

    - ``threshold``: keep rows with ``score >= threshold`` — the hard
      gate (LLaMA-style "kept pages classified as references").
    - ``pareto_alpha``: the GPT-3 Appendix-A lottery — keep iff
      ``pareto_draw > 1 - score`` with a Lomax(alpha) draw.  Keep
      probability for score s is ``(2 - s)^-alpha``: α=9 keeps ~42 % at
      s=0.9 and ~0.2 % at s=0, preserving tail diversity instead of
      hard-truncating it.  The draw derives from
      ``xxhash64(id, seed)`` via the inverse CDF
      ``(1-u)^(-1/alpha) - 1`` — deterministic per id, so membership
      survives re-runs and repartitioning (u < 1 − 1e-6, so the draw is
      bounded and no id keeps unconditionally).
    """
    if (threshold is None) == (pareto_alpha is None):
        raise ValueError(
            "exactly one of threshold / pareto_alpha is required")
    scored = score_quality_classifier(df, model, text_col=text_col,
                                     score_col=score_col)
    if threshold is not None:
        keep = F.col(score_col) >= F.lit(float(threshold))
    else:
        if pareto_alpha <= 0:
            raise ValueError(f"pareto_alpha must be > 0, got {pareto_alpha}")
        u = (F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)),
                    F.lit(1_000_000)).cast("double") / F.lit(1_000_000.0))
        draw = F.pow(F.lit(1.0) - u, F.lit(-1.0 / float(pareto_alpha))) \
            - F.lit(1.0)
        keep = draw > (F.lit(1.0) - F.col(score_col))
    kept = scored.filter(keep).drop(score_col)
    ledger = (scored.filter(~keep)
              .select(F.col(id_col).alias("id"),
                      F.lit("clf_quality").alias("reject_reason")))
    return kept, ledger


def save_classifier(model, path: str) -> None:
    """Persist with overwrite semantics (retried nightly runs must not
    crash on an existing path — the ``save_lm`` rule)."""
    model.write().overwrite().save(path)


def load_classifier(spark, path: str):
    """Inverse of ``save_classifier``."""
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)
