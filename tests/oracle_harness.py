"""Local replica of the driver's correctness gate: run each catalog
query under Spark AND its oracle SQL under DuckDB over the same parquet
tables; compare row count, sorted column names, and the order-insensitive
multiset of normalized values. Strict equality — no tolerances — because
the driver hashes values; any mismatch here is a mismatch there.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    """Engine-neutral value normalization (mirrors a hash compare)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, _dt.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"dt:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def rows_to_multiset(cols: list[str], rows) -> list[tuple]:
    """Sort columns by name, normalize every value, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(sql)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    sm = rows_to_multiset(s_cols, s_rows)
    dm = rows_to_multiset(d_cols, d_rows)
    if sm != dm:
        diff_s = [r for r in sm if r not in set(dm)][:3]
        diff_d = [r for r in dm if r not in set(sm)][:3]
        problems.append(
            f"value multiset differs; spark-only sample={diff_s} "
            f"duck-only sample={diff_d}")
    return problems
