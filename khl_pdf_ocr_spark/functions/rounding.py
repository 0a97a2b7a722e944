"""Deterministic cross-engine rounding.

``round()`` tie behavior differs between engines (Spark HALF_UP on the
decimal expansion vs C-library rounding in DuckDB), which breaks exact
value comparison on boundary values like 0.78875.  Both sides of every
oracle-checked query therefore use the identical formula

    floor(x * 10^d + 0.5) / 10^d

whose double arithmetic is bit-reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["round_half_up", "sql_round_half_up"]


def round_half_up(col: Column, d: int) -> Column:
    k = float(10 ** d)
    return F.floor(col * F.lit(k) + F.lit(0.5)) / F.lit(k)


def sql_round_half_up(expr: str, d: int) -> str:
    k = float(10 ** d)
    return f"floor(({expr}) * {k} + 0.5) / {k}"
