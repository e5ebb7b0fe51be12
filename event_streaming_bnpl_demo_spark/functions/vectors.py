"""Vector math over ``array<float>`` columns — JVM-side, codegen'd.

Everything is built from higher-order SQL functions (``aggregate`` over
an index ``sequence``), not Python UDFs: the dot product of a 64-dim
embedding never leaves Tungsten. Elements are cast float->double before
multiplying so both Spark and an oracle engine do the identical IEEE
double fold (1-based ``element_at`` indexing matches DuckDB's 1-based
lists, keeping the SQL texts aligned).

At 100 TB the pattern is: broadcast the (tiny) query-vector side, keep
the embedding table columnar, and pre-filter candidates with an LSH /
sign-bucket key before any exact cosine — see operators.similarity.
"""

from __future__ import annotations


def dot_expr(a: str, b: str, dim: int) -> str:
    """SQL for the double-precision dot product of two array columns."""
    return (
        f"aggregate(sequence(1, {dim}), CAST(0.0 AS DOUBLE), "
        f"(acc, i) -> acc + CAST(element_at({a}, i) AS DOUBLE)"
        f" * CAST(element_at({b}, i) AS DOUBLE))"
    )


def norm_expr(a: str, dim: int) -> str:
    """SQL for the L2 norm of an array column."""
    return f"SQRT({dot_expr(a, a, dim)})"


def cosine_expr(a: str, b: str, dim: int) -> str:
    """SQL for cosine similarity; assumes non-zero vectors."""
    return f"({dot_expr(a, b, dim)} / ({norm_expr(a, dim)} * {norm_expr(b, dim)}))"


def duckdb_dot(a: str, b: str, dim: int) -> str:
    """The DuckDB-dialect twin of :func:`dot_expr` (1-based lists)."""
    return (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def duckdb_norm(a: str, dim: int) -> str:
    return f"SQRT({duckdb_dot(a, a, dim)})"


def duckdb_cosine(a: str, b: str, dim: int) -> str:
    return f"({duckdb_dot(a, b, dim)} / ({duckdb_norm(a, dim)} * {duckdb_norm(b, dim)}))"
