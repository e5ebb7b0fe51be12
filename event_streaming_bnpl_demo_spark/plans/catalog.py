"""Query catalog — the engine's declared operator surface.

Every operator from SURVEY.md §2.2 is registered here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
a DuckDB oracle SQL string over the same parquet tables. The driver's
correctness harness consumes exactly this mapping through
``__spark_entry__.py``.

Contract invariants enforced by construction:

- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver sorts columns by name before hashing);
- double-valued aggregates use the deterministic ``dsum``/``davg``
  idioms from :mod:`.sqlcompat` so Spark and DuckDB produce bit-equal
  float64, independent of partition-level summation order;
- timestamps cross the comparison boundary as dates or formatted
  strings, never raw engine-local timestamp objects.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None          # DuckDB SQL, or None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the catalog."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags,
                                doc=(fn.__doc__ or "").strip())
        return fn
    return deco


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    """name -> callable, in the driver's expected shape (wraps each call
    with session tuning so runtime confs hold on driver-owned sessions)."""
    from ..session import tune

    def wrap(q: Query) -> QueryFn:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return q.fn(spark, sf_dir)
        run.__name__ = q.name
        run.__doc__ = q.doc
        return run

    return {name: wrap(q) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """name -> DuckDB SQL, omitting rows-only queries."""
    return {name: q.oracle for name, q in all_queries().items()
            if q.oracle is not None}


_LOADED = False


def _load() -> None:
    """Import every query module exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from . import queries_core      # noqa: F401
    from . import queries_ref       # noqa: F401
    from . import queries_window    # noqa: F401
    from . import queries_stream    # noqa: F401
    from . import queries_llm       # noqa: F401
    from . import queries_ext       # noqa: F401
    from . import queries_ext2      # noqa: F401
    from . import queries_tpch      # noqa: F401
    from . import queries_ext3      # noqa: F401
    from . import queries_stats     # noqa: F401
    from . import queries_udf       # noqa: F401
    _LOADED = True
