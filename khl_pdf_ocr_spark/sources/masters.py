"""Master name dimension tables + broadcast validation joins.

The reference ships two single-column Cyrillic CSVs (UTF-8 with BOM):
``players_master.csv`` (664 rows) and ``referees_master.csv`` (50 rows)
— dimension data for validating/normalizing extracted names (they are
never referenced in the reference's code; SURVEY.md §1.1).  KB-sized →
ALWAYS a broadcast hash join, never a shuffle join (SURVEY.md §2.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["load_master", "load_masters", "validate_goalie_names",
           "validate_referee_names"]

REFERENCE_DIR = os.environ.get("KHL_REFERENCE_DIR", "/root/reference")


def load_master(spark: SparkSession, csv_path: str) -> DataFrame:
    """One column ``name``; BOM stripped; two-token join key ``name_key``."""
    df = (spark.read.option("encoding", "UTF-8").csv(csv_path)
          .withColumnRenamed("_c0", "name")
          .withColumn("name", F.regexp_replace("name", "^﻿", ""))
          .withColumn("name", F.trim("name"))
          .filter(F.length("name") > 0))
    # masters may carry a disambiguating initial («Исаев Даниил А.»);
    # extracted names are two-token — key on the first two tokens
    return df.withColumn(
        "name_key", F.concat_ws(" ", F.slice(F.split(F.col("name"), r"\s+"), 1, 2)))


def load_masters(spark: SparkSession, reference_dir: str | None = None
                 ) -> tuple[DataFrame, DataFrame]:
    d = reference_dir or REFERENCE_DIR
    return (load_master(spark, os.path.join(d, "players_master.csv")),
            load_master(spark, os.path.join(d, "referees_master.csv")))


def _validate(names_df: DataFrame, master: DataFrame) -> DataFrame:
    """names_df(url, name) + master → (url, name, known boolean).

    Both sides key on the first two tokens: extracted goalie names may
    carry a third word (RE_GOALIE_NAME matches 2-3 capitalized words,
    pdfops.py) just as master rows may carry a disambiguating initial.
    """
    dim = F.broadcast(master.select("name_key").distinct())
    keyed = names_df.withColumn(
        "_key", F.concat_ws(" ", F.slice(F.split(F.col("name"), r"\s+"), 1, 2)))
    return (keyed.join(dim, keyed["_key"] == dim["name_key"], "left")
            .select("url", "name", F.col("name_key").isNotNull().alias("known")))


def _nn(col):
    """NULL array → empty array, matching DuckDB ``list_concat``'s
    ignore-a-NULL-side semantics: Spark's ``concat`` is NULL-propagating,
    so a one-sided NULL block would silently drop the OTHER side's names
    too (latent driver-parity divergence, ADVICE r3)."""
    return F.coalesce(col, F.array().cast("array<string>"))


def validate_referee_names(extracted: DataFrame, referees_master: DataFrame) -> DataFrame:
    """Explode referees.{main,linesmen} → broadcast-validate each name."""
    names = extracted.select(
        "url",
        F.explode(F.concat(_nn(F.col("referees.main")),
                           _nn(F.col("referees.linesmen")))).alias("name"))
    return _validate(names, referees_master)


def validate_goalie_names(extracted: DataFrame, players_master: DataFrame) -> DataFrame:
    names = extracted.select(
        "url",
        F.explode(F.concat(_nn(F.col("goalies.home.name")),
                           _nn(F.col("goalies.away.name")))).alias("name"))
    return _validate(names, players_master)
