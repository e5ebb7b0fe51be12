"""Every catalog query with an oracle must match DuckDB exactly at
sf0.001 (fast inner loop; the driver re-checks at sf0.01). Queries
without an oracle get a schema/runs/rows>=0 smoke check."""

from __future__ import annotations

import pytest

from event_streaming_bnpl_demo_spark.plans import all_queries

from .conftest import SF_SMOKE
from .oracle_harness import (compare, driver_boundary_violations,
                             duck_connection)

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, duck, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_SMOKE)
    problems = driver_boundary_violations(df) + compare(df, duck, q.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_SMOKE)
    violations = driver_boundary_violations(df)
    assert not violations, f"{name}: " + "; ".join(violations)
    assert df.count() >= 0
    assert len(df.columns) > 0
