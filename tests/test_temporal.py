"""As-of + range joins vs DuckDB's native implementations.

DuckDB ships a true ASOF JOIN and evaluates range predicates exactly —
so even though the driver's 50-query window is fully allocated, these
operators get the same oracle discipline at pytest level: full-result
equality on the sf0.001 events table plus planted edge cases.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.temporal import (asof_join,
                                                  point_in_interval_join)

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(EVENTS)


@pytest.fixture(scope="module")
def snapshots(spark, events):
    # deterministic per-user "profile snapshots": every 6 hours over the
    # events' own time range, version = hour index
    return (events.groupBy("user_id")
            .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
            .select("user_id", F.explode(F.sequence(
                F.date_trunc("hour", "t0"), "t1",
                F.expr("INTERVAL 6 HOURS"))).alias("ts"))
            .withColumn("version",
                        (F.unix_timestamp("ts") / 3600).cast("long")))


def _duck(events_df, snaps_df, sql):
    con = duckdb.connect()
    con.register("ev", events_df.toPandas())
    con.register("snap", snaps_df.toPandas())
    return con.sql(sql).df()


def test_asof_backward_matches_duckdb(events, snapshots):
    got = (asof_join(events.select("event_id", "user_id", "ts"),
                     snapshots, on="ts", by="user_id")
           .select("event_id", "user_id", "ts", "r_ts", "r_version")
           .toPandas())
    want = _duck(events.select("event_id", "user_id", "ts"), snapshots, """
        SELECT ev.event_id, ev.user_id, ev.ts,
               snap.ts AS r_ts, snap.version AS r_version
        FROM ev ASOF LEFT JOIN snap
          ON ev.user_id = snap.user_id AND ev.ts >= snap.ts
    """)
    import pandas as pd

    key = ["event_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)[got.columns]
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def test_asof_tolerance_and_tie(spark):
    snaps = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00", 1), ("u", "2024-01-01 02:00:00", 2)],
        ["user_id", "ts", "version"]).withColumn("ts", F.to_timestamp("ts"))
    evs = spark.createDataFrame(
        [("e_tie", "u", "2024-01-01 02:00:00"),     # ties take the snapshot
         ("e_late", "u", "2024-01-01 05:00:00"),    # > tolerance → NULL
         ("e_before", "u", "2023-12-31 23:00:00")], # nothing before → NULL
        ["event_id", "user_id", "ts"]).withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_id"]: r for r in
           asof_join(evs, snaps, on="ts", by="user_id",
                     tolerance_sec=3600).collect()}
    assert out["e_tie"]["r_version"] == 2       # equal-ts snapshot visible
    assert out["e_late"]["r_version"] is None   # 3 h gap > 1 h tolerance
    assert out["e_before"]["r_version"] is None


def test_asof_forward_direction(spark):
    snaps = spark.createDataFrame(
        [("u", "2024-01-01 03:00:00", 7)],
        ["user_id", "ts", "version"]).withColumn("ts", F.to_timestamp("ts"))
    evs = spark.createDataFrame(
        [("e1", "u", "2024-01-01 01:00:00"), ("e2", "u", "2024-01-01 04:00:00")],
        ["event_id", "user_id", "ts"]).withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_id"]: r["r_version"] for r in
           asof_join(evs, snaps, on="ts", by="user_id",
                     direction="forward").collect()}
    assert out == {"e1": 7, "e2": None}


def test_range_join_matches_duckdb(events, spark):
    # per-user maintenance windows: [t0 + k*8h, +3h) for k in 0..2
    intervals = (events.groupBy("user_id").agg(F.min("ts").alias("t0"))
                 .select("user_id", F.explode(F.array(
                     *[F.struct(
                         (F.col("t0") + F.expr(f"INTERVAL {8*k} HOURS")
                          ).alias("start_ts"),
                         (F.col("t0") + F.expr(f"INTERVAL {8*k+3} HOURS")
                          ).alias("end_ts"),
                         F.lit(k).alias("win_id")) for k in range(3)]
                 )).alias("w"))
                 .select("user_id", "w.start_ts", "w.end_ts", "w.win_id"))
    pts = events.select("event_id", "user_id", "ts")
    got = (point_in_interval_join(pts, intervals, point_col="ts",
                                  by="user_id", bin_width_sec=3600)
           .select("event_id", "win_id").toPandas())
    want = _duck(pts, intervals, """
        SELECT ev.event_id, snap.win_id
        FROM ev JOIN snap
          ON ev.user_id = snap.user_id
         AND ev.ts >= snap.start_ts AND ev.ts < snap.end_ts
    """)
    assert len(got) == len(want) > 0
    assert (set(map(tuple, got.values.tolist()))
            == set(map(tuple, want.values.tolist())))


def test_range_join_never_plans_cartesian(events, spark):
    intervals = (events.groupBy("user_id").agg(F.min("ts").alias("start_ts"))
                 .withColumn("end_ts",
                             F.col("start_ts") + F.expr("INTERVAL 2 HOURS")))
    df = point_in_interval_join(events.select("event_id", "user_id", "ts"),
                                intervals, by="user_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_asof_fuzz_vs_pandas_merge_asof(spark):
    """Seeded random fuzz against pandas.merge_asof — a third
    independent implementation (besides DuckDB ASOF JOIN) of backward
    as-of semantics, including per-key alignment and tolerance."""
    import random

    import pandas as pd

    from datetime import datetime, timedelta

    rng = random.Random(41)
    base = datetime(2024, 3, 1)  # plain datetime — a bare pandas
    # Timestamp in a tuple infers as struct<> in createDataFrame
    evs = [(f"e{i}", f"u{rng.randrange(4)}",
            base + timedelta(seconds=rng.randrange(0, 72_000)))
           for i in range(150)]
    snaps = [(f"u{u}", base + timedelta(seconds=rng.randrange(0, 72_000)), v)
             for v, u in enumerate(rng.choices(range(4), k=40))]
    ev_df = spark.createDataFrame(evs, ["event_id", "user_id", "ts"])
    sn_df = spark.createDataFrame(snaps, ["user_id", "ts", "version"])

    got = (asof_join(ev_df, sn_df, on="ts", by="user_id",
                     tolerance_sec=7200)
           .select("event_id", "r_version").toPandas()
           .set_index("event_id")["r_version"].to_dict())

    lp = pd.DataFrame(evs, columns=["event_id", "user_id", "ts"]) \
        .sort_values("ts", kind="mergesort")
    rp = pd.DataFrame(snaps, columns=["user_id", "ts", "version"]) \
        .sort_values("ts", kind="mergesort")
    want_df = pd.merge_asof(lp, rp, on="ts", by="user_id",
                            direction="backward",
                            tolerance=pd.Timedelta(seconds=7200),
                            allow_exact_matches=True)
    want = {r.event_id: (None if pd.isna(r.version) else int(r.version))
            for r in want_df.itertuples()}
    got = {k: (None if pd.isna(v) else int(v)) for k, v in got.items()}
    assert got == want


def test_asof_subsecond_tolerance(spark):
    """Tolerance compares full-precision timestamps (review finding:
    unix_timestamp truncation both admitted out-of-tolerance matches
    and rejected in-tolerance ones at sub-second scales)."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    snaps = spark.createDataFrame(
        [("u", t0 + timedelta(milliseconds=100), 1)],
        ["user_id", "ts", "version"])
    evs = spark.createDataFrame(
        [("in_tol", "u", t0 + timedelta(milliseconds=150)),   # gap 50 ms
         ("out_tol", "u", t0 + timedelta(milliseconds=900))], # gap 800 ms
        ["event_id", "user_id", "ts"])
    out = {r["event_id"]: r["r_version"] for r in
           asof_join(evs, snaps, on="ts", by="user_id",
                     tolerance_sec=0.1).collect()}
    assert out == {"in_tol": 1, "out_tol": None}


def test_range_join_subsecond_interval_end(spark):
    """An interval ending at a sub-second offset past a bin boundary
    must still catch points in the tail bin (review finding: second-
    truncated end arithmetic never exploded the final bin)."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    intervals = spark.createDataFrame(
        [("u", t0 + timedelta(minutes=30),
          t0 + timedelta(hours=1, milliseconds=500), 0)],
        ["user_id", "start_ts", "end_ts", "win_id"])
    points = spark.createDataFrame(
        [("tail", "u", t0 + timedelta(hours=1, milliseconds=250)),
         ("past_end", "u", t0 + timedelta(hours=1, milliseconds=600))],
        ["event_id", "user_id", "ts"])
    got = {r["event_id"] for r in
           point_in_interval_join(points, intervals, by="user_id",
                                  bin_width_sec=3600).collect()}
    assert got == {"tail"}


def test_asof_nokey_stitch_matches_pandas(spark):
    """by=None runs the range-pre-split path (r3 VERDICT: the global-
    window hazard must be unreachable).  split_parts=8 over 120 rows
    forces multiple time ranges, including ranges with no right row at
    all — the boundary carry must hand each of them the previous
    range's last snapshot.  Checked both directions vs pandas."""
    import pandas as pd

    import random
    from datetime import datetime, timedelta

    rng = random.Random(17)
    base = datetime(2024, 5, 1)
    evs = [(f"e{i}", base + timedelta(seconds=rng.randrange(0, 50_000)))
           for i in range(120)]
    # sparse right side clumped early: later ranges have NO right rows
    snaps = [(base + timedelta(seconds=rng.randrange(0, 9_000)), v)
             for v in range(7)]
    ev_df = spark.createDataFrame(evs, ["event_id", "ts"])
    sn_df = spark.createDataFrame(snaps, ["ts", "version"])

    lp = pd.DataFrame(evs, columns=["event_id", "ts"]) \
        .sort_values("ts", kind="mergesort")
    rp = pd.DataFrame(snaps, columns=["ts", "version"]) \
        .sort_values("ts", kind="mergesort")
    for direction in ("backward", "forward"):
        got = (asof_join(ev_df, sn_df, on="ts", direction=direction,
                         split_parts=8)
               .select("event_id", "r_version").toPandas()
               .set_index("event_id")["r_version"].to_dict())
        want_df = pd.merge_asof(lp, rp, on="ts", direction=direction,
                                allow_exact_matches=True)
        want = {r.event_id: (None if pd.isna(r.version) else int(r.version))
                for r in want_df.itertuples()}
        got = {k: (None if pd.isna(v) else int(v)) for k, v in got.items()}
        assert got == want, direction


def test_asof_nokey_million_rows_not_single_task(spark):
    """The planted 10^6-row no-key join: the plan must contain no
    SinglePartition exchange (= no one-task global sort), and the
    result is verified exactly (r_version == i//100) WITHOUT
    collecting — a distributed mismatch count."""
    left = (spark.range(1_000_000)
            .select(F.col("id").alias("i"),
                    F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")
                                        ).alias("ts")))
    right = (spark.range(10_000)
             .select(F.col("id").alias("version"),
                     F.timestamp_seconds(F.lit(1_700_000_000)
                                         + F.col("id") * 100).alias("ts")))
    out = asof_join(left, right, on="ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    bad = out.filter(F.col("r_version") != (F.col("i") / 100).cast("long")
                     ).count()
    assert bad == 0
    assert out.count() == 1_000_000
