"""Deterministic cross-engine numeric idioms.

Floating-point SUM/AVG over doubles is order-dependent, and Spark's
partition-parallel partial aggregation does not sum in the same order as
DuckDB — so raw ``SUM(double)`` can differ in the last bits and fail a
value-hash compare. The fix: accumulate in *decimal* (exact, associative,
order-independent), then cast the exact result to double. Both engines
round the same binary double to the same DECIMAL(18,s) and convert the
same decimal to the same float64, so results are bit-equal by
construction — no tolerance needed, at any scale factor.

These helpers emit the *same* SQL text for Spark (`F.expr`) and DuckDB,
keeping the two sides textually auditable. All expressions stay inside
whole-stage codegen (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum_sql(expr: str, scale: int = 2) -> str:
    """Order-independent double SUM: decimal-accumulate then to double.

    The decimal->double conversion goes through a STRING round-trip:
    decimal->string is exact and string->double is correctly rounded in
    both engines, whereas DuckDB's direct DECIMAL->DOUBLE cast double-
    rounds once the scaled integer exceeds 2^53 (observed: a
    DECIMAL(30,4) sum of 7096786968835.8685 cast to 7096786968835.869
    by DuckDB vs the correctly-rounded ...5.868 from Spark/Python).
    """
    return (f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale})))"
            f" AS STRING) AS DOUBLE)")


def davg_sql(expr: str, scale: int = 6) -> str:
    """Order-independent double AVG: exact decimal sum / exact count."""
    return (f"{dsum_sql(expr, scale)}"
            f" / CAST(COUNT({expr}) AS DOUBLE)")


def dsum(expr: str, alias: str, scale: int = 2) -> Column:
    return F.expr(dsum_sql(expr, scale)).alias(alias)


def davg(expr: str, alias: str, scale: int = 6) -> Column:
    return F.expr(davg_sql(expr, scale)).alias(alias)


def dsum_over_sql(expr: str, partition_by: str = "", scale: int = 2) -> str:
    """Windowed form of :func:`dsum_sql` — the same exact decimal
    accumulation as an analytic function, so an aggregate+self-join can
    collapse into a single-scan window (Catalyst does not reuse the
    probe exchange across that split; measured on tf-idf and the
    decorrelated TPC-H shapes). Empty ``partition_by`` = global frame.
    """
    over = f"OVER (PARTITION BY {partition_by})" if partition_by else "OVER ()"
    return (f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) {over}"
            f" AS STRING) AS DOUBLE)")


def davg_over_sql(expr: str, partition_by: str = "", scale: int = 6) -> str:
    """Windowed form of :func:`davg_sql`: exact decimal sum / count."""
    over = f"OVER (PARTITION BY {partition_by})" if partition_by else "OVER ()"
    return (f"{dsum_over_sql(expr, partition_by, scale)}"
            f" / CAST(COUNT({expr}) {over} AS DOUBLE)")


def rounded(expr: str, alias: str, ndigits: int = 6) -> Column:
    """ROUND for single-row (non-accumulated) doubles where both engines
    see identical input bits; deterministic because the operand is."""
    return F.expr(f"ROUND(({expr}), {ndigits})").alias(alias)
