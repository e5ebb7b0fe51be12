"""Driver contract for the spark-graft builder (PySpark target).

Backed by the ``event_streaming_bnpl_demo_spark`` package: the query
catalog (``plans.catalog``) declares every implemented operator from
SURVEY.md §2 as a (spark, sf_dir) -> DataFrame callable plus, where
SQL-expressible, a DuckDB oracle string with identically-aliased
columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from event_streaming_bnpl_demo_spark import plans
from event_streaming_bnpl_demo_spark.session import tune

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    tune(spark)
    return plans.queries()["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    return plans.oracle_sql()
