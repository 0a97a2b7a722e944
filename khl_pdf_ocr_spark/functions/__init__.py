"""Shared expression helpers & constants (kept engine-agnostic so the
Spark operators and their DuckDB oracle SQL stay in lockstep)."""
