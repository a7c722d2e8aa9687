"""Shared expression helpers for oracle-parity determinism.

Floating-point sums are order-dependent; Spark's parallel partial/final
aggregation and DuckDB's sequential scan can disagree in the last ulp,
which breaks value-hash parity. Rule: every SUM/AVG over a double that
feeds an oracle-checked result goes through an exact DECIMAL accumulator
(bit-identical in both engines), then back to double. This costs nothing
at scale — decimal partial aggregation is still map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,10)"


def dsum(col: Column | str) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str, ndigits: int = 4) -> Column:
    """Exact-accumulator average rounded to ``ndigits`` (oracle-stable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round((F.sum(c.cast(DEC)) / F.count(c)).cast("double"), ndigits)


def sql_dsum(expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,10))) AS DOUBLE)"


def sql_davg(expr: str, ndigits: int = 4) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(30,10))) / COUNT({expr}) AS DOUBLE), {ndigits})"
    )
