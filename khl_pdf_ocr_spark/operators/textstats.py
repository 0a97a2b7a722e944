"""Text-analytics operators over a documents table (training-data
pipeline stages: language ID, quality scoring, token counting, document
fingerprinting).  All JVM-side whole-stage-codegen expressions — zero
Python UDFs in these paths."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions import text as X

__all__ = ["text_stats", "language_id", "quality_filter", "fingerprints",
           "top_terms_per_group"]


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
