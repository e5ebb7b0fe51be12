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
import re

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

#: duckdb size strings only ("40GiB", "512 MB") — these values are
#: interpolated into SET statements, so anything else (typos, quotes)
#: must fail as a config error here, not a confusing SQL error there.
_SIZE_RE = re.compile(r"^\d+(\.\d+)?\s*[KMGT]i?B$", re.IGNORECASE)


def _size_env(var: str) -> str | None:
    val = os.environ.get(var)
    if not val:
        return None
    val = val.strip()
    if not _SIZE_RE.match(val):
        raise ValueError(
            f"{var} must be a duckdb size string like '40GiB'; "
            f"got {val!r}")
    return val


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Optional resource caps for replica-scale gate runs: the exact
    # pair-expansion dedup oracles (ngram-jaccard, prefix-filter) spill
    # tens of GB of duckdb temp at the 10x sf1 replica — two concurrent
    # gate shards once filled the disk. Env-gated so the default pytest
    # path is unchanged; values are duckdb size strings ("40GiB").
    mem = _size_env("GRAFT_DUCK_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    cap = _size_env("GRAFT_DUCK_TEMP_CAP")
    if cap:
        con.execute(f"SET max_temp_directory_size='{cap}'")
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
        # tz-aware UTC and naive-UTC are the SAME instant here: the
        # session tz is pinned UTC, so the legacy row-collect path
        # yielded naive UTC datetimes while the Arrow path yields
        # aware ones for TIMESTAMP_LTZ — normalize before comparing
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
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


def _spark_kind(dt) -> str:
    """Spark SQL type -> coarse type kind."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integer"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "floating"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_kind(dt.elementType)}>"
    return type(dt).__name__


def _arrow_kind(t) -> str:
    """pyarrow type -> coarse type kind."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "integer"
    if pa.types.is_floating(t):
        return "floating"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_kind(t.value_type)}>"
    return str(t)


def driver_boundary_violations(spark_df) -> list[str]:
    """Catalog invariant: no top-level ``ArrayType``/``MapType`` column
    may cross the driver boundary. The driver canonicalizes results by
    pandas-sorting every column, and numpy arrays are unhashable — the
    round-4 ``agg_collect_sorted`` red row was exactly this (``TypeError:
    unhashable type: 'numpy.ndarray'``) despite a correct answer.
    Serialize collections as csv (``concat_ws`` / ``string_agg``) or
    json (``to_json``) strings on BOTH sides instead."""
    from pyspark.sql import types as T

    return [
        f"top-level {type(f.dataType).__name__} column {f.name!r} would "
        f"crash the driver's pandas canonicalizer — project it as a "
        f"csv/json string instead"
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType))
    ]


def _duck_kind(t: str) -> str:
    """DuckDB DESCRIBE type string -> coarse type kind (the same kinds
    as :func:`_arrow_kind`: HUGEINT surfaces as decimal128 through
    Arrow, so it maps to 'decimal' here too)."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return f"list<{_duck_kind(t[:-2])}>"
    if t.startswith("DECIMAL") or t in ("HUGEINT", "UHUGEINT"):
        return "decimal"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "integer"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "floating"
    if t == "BOOLEAN":
        return "bool"
    if t in ("VARCHAR", "STRING", "TEXT"):
        return "string"
    if t in ("BLOB", "BYTEA"):
        return "binary"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return t.lower()


def type_kind_mismatches(spark_df, con, sql: str) -> list[str]:
    """Column-level type-KIND divergences between the Spark result
    schema and the oracle's schema.

    This is the channel that exposes coercions ``fetchall`` hides:
    DuckDB types an uncast ``SUM(BIGINT)`` as HUGEINT, which leaves
    duckdb as decimal128 (Arrow) / float64 (pandas) while Spark emits
    int64 — value-identical under Python ``fetchall``, but any
    dtype-sensitive serialization on the driver's side (hashing
    ``2054.0`` vs ``2054``) diverges. Root cause of the round-2
    ``llm_pack_sequences`` red row: rows/schema matched, hash didn't.
    Kind-level (not width-level) so nullable-int/NaN/date artifacts
    that affect both engines identically don't false-positive.

    The oracle schema comes from ``DESCRIBE <sql>`` — a plan-only
    statement, so the kind check no longer re-EXECUTES the oracle (at
    the sf1 replica the second execution of a heavy oracle dominated
    the whole compare).
    """
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    duck_kinds = {r[0]: _duck_kind(r[1]) for r in desc}
    problems = []
    for f in spark_df.schema.fields:
        sk = _spark_kind(f.dataType)
        dk = duck_kinds.get(f.name)
        if dk is not None and sk != dk:
            problems.append(
                f"type-kind mismatch on {f.name!r}: spark={sk} duck={dk} "
                f"(cast the oracle column so both engines serialize "
                f"identically)")
    return problems


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass).

    Two channels: exact value-multiset equality over ``fetchall``
    (native Python values, no tolerances), and type-kind equality over
    the oracle's Arrow schema (catches dtype coercions like
    HUGEINT→decimal/float that are value-equal in Python but diverge
    under any dtype-sensitive hash).
    """
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    # Arrow collect, not Row collect: py4j row deserialization is
    # single-threaded Python at ~10s of µs/row — a full-projection
    # query at the sf1 replica (millions of rows) took tens of minutes
    # through collect() and seconds through Arrow. Value semantics per
    # _norm are identical (timestamps: see the tz note in _norm).
    try:
        tbl = spark_df.toArrow()
        s_rows = list(zip(*(c.to_pylist() for c in tbl.columns)))
    except Exception:  # exotic types Arrow can't carry: legacy path
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
        # hoist the sets: building them inside the comprehension's
        # condition re-evaluates set(...) PER ROW — quadratic, which
        # turned a million-row mismatch into a half-hour hang
        dset, sset = set(dm), set(sm)
        diff_s = [r for r in sm if r not in dset][:3]
        diff_d = [r for r in dm if r not in sset][:3]
        problems.append(
            f"value multiset differs; spark-only sample={diff_s} "
            f"duck-only sample={diff_d}")
    problems.extend(type_kind_mismatches(spark_df, con, sql))
    return problems
