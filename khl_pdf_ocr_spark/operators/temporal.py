"""Temporal joins Spark lacks as built-ins: as-of join and range
(point-in-interval) join — implemented as compositions of existing
DataFrame ops (union + window / bin-bucketed equi-join), never a
cross join and never per-row Python.

As-of join (align each event to the latest snapshot at or before it):
the classic union trick — tag both sides, sort per key by (ts, tag)
with the right side ordered first at ties, and carry the last non-null
right row forward with an unbounded-preceding window.  ONE shuffle on
the key; state per task is a single row (``last``), so a key's history
length never matters.  This is the same plan shape a
``applyInPandasWithState`` stream twin would hold as state.

Range join (points ↔ intervals): exploding each interval into
fixed-width time bins turns the θ-join into an equi-join on
``(key, bin)`` + an exact residual filter — the standard binning
rewrite (Spark's own optimized range join in Databricks runtime does
exactly this under the hood).  Shuffle is by (key, bin); a pathological
interval spanning B bins contributes B rows, bounded by
``(end-start)/bin_width``, never |points|×|intervals|.

Both are verified against DuckDB's native ASOF JOIN / range predicates
in tests/test_temporal.py — pytest-level oracles; the driver's
50-query window is already fully allocated (SURVEY §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "point_in_interval_join"]



def _epoch_sec(c):
    """Sub-second epoch seconds.  TIMESTAMP_NTZ has no direct DOUBLE
    cast, so normalize through TIMESTAMP first — the session-tz shift
    is uniform across both join sides, so gaps and bin alignment are
    unaffected."""
    return c.cast("timestamp").cast("double")


def _asof_nokey(u: DataFrame, direction: str, split_parts: int | None,
                cache: list | None = None) -> DataFrame:
    """No-key as-of core: range-pre-split the time axis so no single
    task ever sorts the whole union (the ``by=None`` global-window
    hazard, r3 VERDICT).

    1. sample ~``split_parts`` quantile boundaries of ``_t`` over the
       union (one cheap pass over a 1-column projection);
    2. assign each row a range id ``_rng`` (count of boundaries ≤ t —
       a small array fold, pure JVM);
    3. run the per-range window partitioned by ``_rng`` — parallel,
       bounded partitions;
    4. stitch: a range whose earliest rows precede any right row in it
       must inherit the LAST right row of the preceding ranges
       (symmetrically FIRST for ``forward``).  Per-range extrema are
       ≤ ``split_parts`` tiny rows → collected, prefix-scanned on the
       driver, and broadcast-joined back.  The carry is bounded
       metadata (one row per range), never data-dependent state.

    Output is row-for-row identical to the single global window.

    The union is persisted here: this path is NOT a lazy-pure
    transformation — the quantile sample and the per-range extrema run
    as (small) jobs at BUILD time, and the caller's action is a third
    pass; without the persist each pass would recompute the full
    left∪right lineage (r4 review).  The persisted handle is appended
    to ``cache`` when the caller passes a list (release with
    ``frame.unpersist()`` after materializing; otherwise it lives
    until session end).
    """
    spark = u.sparkSession
    u = u.persist()
    if cache is not None:
        cache.append(u)
    parts = split_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = max(2, min(int(parts), 512))  # boundaries stay driver-tiny
    probs = [i / parts for i in range(1, parts)]
    bounds_raw = (u.select(_epoch_sec(F.col("_t")).alias("_d"))
                  .approxQuantile("_d", probs, 0.001))
    bounds: list[float] = []
    for bval in bounds_raw:
        if bval is not None and (not bounds or bval > bounds[-1]):
            bounds.append(float(bval))

    if bounds:
        barr = F.array(*[F.lit(bv) for bv in bounds])
        rng = F.aggregate(
            barr, F.lit(0),
            lambda acc, bv: acc + F.when(_epoch_sec(F.col("_t")) >= bv,
                                         1).otherwise(0))
    else:
        rng = F.lit(0)
    u = u.withColumn("_rng", rng)

    if direction == "backward":
        w = Window.partitionBy("_rng") \
            .orderBy(F.col("_t").asc(), F.col("_tag").asc()) \
            .rowsBetween(Window.unboundedPreceding, 0)
        matched = F.last("_rrow", ignorenulls=True).over(w)
        extremum = F.max_by("_rrow", F.struct(F.col("_t")))
    else:
        w = Window.partitionBy("_rng") \
            .orderBy(F.col("_t").asc(), F.col("_tag").desc()) \
            .rowsBetween(0, Window.unboundedFollowing)
        matched = F.first("_rrow", ignorenulls=True).over(w)
        extremum = F.min_by("_rrow", F.struct(F.col("_t")))

    out = (u.withColumn("_m", matched)
           .filter(F.col("_tag") == 1))

    # per-range right-row extrema → driver prefix scan → broadcast carry
    per_rng = (u.filter(F.col("_tag") == 0)
               .groupBy("_rng").agg(extremum.alias("_edge"))
               .collect())
    edge_by_rng = {r["_rng"]: r["_edge"] for r in per_rng}
    n_rng = len(bounds) + 1
    order = range(n_rng) if direction == "backward" else range(n_rng - 1, -1, -1)
    carry_rows, running = [], None
    for i in order:
        if running is not None:
            carry_rows.append((i, running))
        if edge_by_rng.get(i) is not None:
            running = edge_by_rng[i]
    if carry_rows:
        from pyspark.sql.types import IntegerType, StructField, StructType

        rrow_type = u.schema["_rrow"].dataType
        cdf = spark.createDataFrame(
            carry_rows,
            StructType([StructField("_rng", IntegerType(), False),
                        StructField("_carry", rrow_type, True)]))
        out = (out.join(F.broadcast(cdf), "_rng", "left")
               .withColumn("_m", F.coalesce(F.col("_m"), F.col("_carry"))))
    return out


def asof_join(left: DataFrame, right: DataFrame, *, on: str = "ts",
              by: str | None = None, tolerance_sec: float | None = None,
              direction: str = "backward",
              right_prefix: str = "r_", split_parts: int | None = None,
              cache: list | None = None) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``on`` ≤ left's ``on`` (``direction="backward"``; ``"forward"``
    gives the least ≥), optionally per ``by`` key and within
    ``tolerance_sec``.  Right columns come back ``right_prefix``-ed
    (NULL when no match).  Column ``on`` must be a timestamp on both
    sides.

    Scale note: with ``by`` the sort parallelizes per key.  WITHOUT a
    key the naive plan is one global window partition (a single task
    sorts both sides end-to-end — the round-3 documented hazard), so
    the no-key path instead RANGE-PRE-SPLITS the time axis: sample
    quantile boundaries over the union, window within each time range
    in parallel, then stitch range boundaries by carrying each range's
    last (first) right row across via a driver-side prefix scan over
    ≤ ``split_parts`` tiny rows + a broadcast join.  Output is
    identical to the global window; no single-task sort remains.
    ``split_parts`` defaults to the session's shuffle partitions.

    NOTE: the no-key path is NOT lazy — it runs two small driver-
    visible jobs (quantile sample + per-range extrema) when the join is
    BUILT, and persists the union so those passes and the caller's
    action share one computation; pass ``cache=[]`` to receive the
    persisted handle for release (every keyed call stays fully lazy).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    rcols = [c for c in right.columns if c != on and c != by]

    key = [by] if by else []
    ltagged = left.select(
        *key, F.col(on).alias("_t"), F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(
                F.col(on).alias("_rt"),
                *[F.col(c) for c in rcols]).alias("_rrow")
            ).schema["_rrow"].dataType).alias("_rrow"))
    rtagged = right.select(
        *key, F.col(on).alias("_t"), F.lit(0).alias("_tag"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("_lrow")
                        ).schema["_lrow"].dataType).alias("_lrow"),
        F.struct(F.col(on).alias("_rt"),
                 *[F.col(c) for c in rcols]).alias("_rrow"))
    u = ltagged.unionByName(rtagged)

    if key:
        if direction == "backward":
            # right rows sort BEFORE left rows at equal ts (_tag 0 < 1),
            # so a snapshot at exactly the event time is visible to it
            w = Window.partitionBy(*key) \
                .orderBy(F.col("_t").asc(), F.col("_tag").asc()) \
                .rowsBetween(Window.unboundedPreceding, 0)
            matched = F.last("_rrow", ignorenulls=True).over(w)
        else:
            w = Window.partitionBy(*key) \
                .orderBy(F.col("_t").asc(), F.col("_tag").desc()) \
                .rowsBetween(0, Window.unboundedFollowing)
            matched = F.first("_rrow", ignorenulls=True).over(w)
        out = (u.withColumn("_m", matched)
               .filter(F.col("_tag") == 1))
    else:
        out = _asof_nokey(u, direction, split_parts, cache)
    if tolerance_sec is not None:
        # timestamp→double keeps sub-second precision; unix_timestamp
        # truncates to whole seconds and both admits matches beyond a
        # sub-second tolerance and rejects ones within it
        gap = F.abs(_epoch_sec(F.col("_m._rt"))
                    - _epoch_sec(F.col("_t")))
        out = out.withColumn(
            "_m", F.when(gap <= F.lit(float(tolerance_sec)),
                         F.col("_m")))
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        F.col("_m._rt").alias(f"{right_prefix}{on}"),
        *[F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in rcols])


def point_in_interval_join(points: DataFrame, intervals: DataFrame, *,
                           point_col: str = "ts", start_col: str = "start_ts",
                           end_col: str = "end_ts", by: str | None = None,
                           bin_width_sec: int = 3600) -> DataFrame:
    """Inner join of point rows to every interval containing them
    (``start ≤ point < end``), optionally per ``by`` key, via the
    bin-bucketed equi-join rewrite.  ``bin_width_sec`` trades
    duplication (long intervals → more bins) against bucket selectivity;
    size it near the median interval length.
    """
    key = [by] if by else []
    # all bin arithmetic on timestamp→double (sub-second precision):
    # unix_timestamp truncates to whole seconds, so an interval ending
    # at 01:00:00.500 would never explode into the hour-1 bin and every
    # point in that tail would be silently lost
    p = points.withColumn(
        "_bin", F.floor(_epoch_sec(F.col(point_col))
                        / F.lit(bin_width_sec)).cast("long"))
    bins = F.sequence(
        F.floor(_epoch_sec(F.col(start_col)) / F.lit(bin_width_sec)
                ).cast("long"),
        # end is exclusive: the last bin containing any point < end is
        # ceil(end/width) - 1 (end exactly on a boundary excludes it)
        (F.ceil(_epoch_sec(F.col(end_col)) / F.lit(bin_width_sec))
         - 1).cast("long"))
    iv = (intervals
          .filter(F.col(end_col) > F.col(start_col))
          .withColumn("_bin", F.explode(bins)))
    cond = [p["_bin"] == iv["_bin"]] + \
        ([p[by] == iv[by]] if by else [])
    joined = (p.join(iv, cond)
              .filter((p[point_col] >= iv[start_col])
                      & (p[point_col] < iv[end_col])))
    pcols = [p[c] for c in points.columns]
    icols = [iv[c] for c in intervals.columns if c != by]
    return joined.select(*pcols, *icols)
