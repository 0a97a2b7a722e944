"""AQE skew-join splitting — the runtime re-plan the session enables
(`session.py: spark.sql.adaptive.skewJoin.enabled=true`), demonstrated
actually firing.

At 100 TB the failure mode is one hot join key (a boilerplate url, a
dominant lang) putting an entire shuffle partition on one task.  The
session turns AQE skew splitting on; this test plants exactly that
skew, shrinks the thresholds so the local data qualifies, and asserts
the EXECUTED plan shows the skewed partition was split (`skew=true`) —
so a future conf regression fails a test, not a production job.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SKEW_CONFS = {
    # thresholds sized DOWN so a ~MB local partition counts as skewed;
    # the production values stay at Spark defaults (256 MB)
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_session(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_planted_hot_key(skew_session):
    spark = skew_session
    # fact: 50k rows of one hot key + a uniform tail.  The pad column
    # must be NON-FOLDABLE (md5 of id): a constant pad gets projected
    # after the join by Catalyst and nothing heavy ever shuffles.
    fact = spark.range(0, 60_000).select(
        F.when(F.col("id") < 50_000, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("k"),
        F.md5(F.col("id").cast("string")).alias("pad"))
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", i) for i in range(97)], ["k", "v"])
    joined = fact.join(dim, "k")
    # execute THIS frame (a downstream agg would finalize a different
    # adaptive plan object and leave joined's own plan un-executed)
    rows = joined.collect()
    assert sum(1 for r in rows if r["k"] == "hot") == 50_000

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    # the FINAL adaptive plan must show the skew-split sort-merge join
    assert "skew=true" in plan, plan
