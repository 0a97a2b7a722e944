"""Helpers for asserting the plans we *want*, not just the ones that pass.

The engine's scale story rests on plan properties: pruned scans, pushed
filters, broadcast (not shuffle) dimension joins, map-side partial
aggregation, bounded exchange counts.  These helpers make those
properties testable (tests/test_plans.py) so a regression in plan shape
fails CI, not the 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["physical_plan", "count_exchanges", "has_broadcast_join",
           "read_schema", "pushed_filters", "codegen_stage_count"]


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the physical plan (excluding reused exchanges)."""
    plan = physical_plan(df)
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|"
                          r"RoundRobinPartitioning|SinglePartition)", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def read_schema(df: DataFrame) -> list[str]:
    """ReadSchema column lists of every file scan (plan strings may be
    truncated with '…', so match up to the line end)."""
    return [s.rstrip(">.") for s in
            re.findall(r"ReadSchema: struct<([^\n]*)", physical_plan(df))]


def pushed_filters(df: DataFrame) -> list[str]:
    return re.findall(r"PushedFilters: \[([^\]\n]*)", physical_plan(df))


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters of every file scan — non-empty means the scan
    prunes whole partition directories at planning time (the persisted
    ANN index contract: a query must read only its probed buckets)."""
    return [s for s in
            re.findall(r"PartitionFilters: \[([^\]\n]*)", physical_plan(df))
            if s.strip()]


def codegen_stage_count(df: DataFrame) -> int:
    return physical_plan(df).count("*(")
