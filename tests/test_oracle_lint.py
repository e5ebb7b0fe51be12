"""tools/oracle_lint.py — static DuckDB-feasibility lint for oracles.

The r12 finding it mechanizes: an oracle whose JOIN condition embeds a
scalar subquery (the first llm_dedup_embedding form) cannot hash-join
in DuckDB and plans a BLOCKWISE_NL_JOIN — 77 s at the sf1 replica,
>25 min at sf10, for results the materialized-key form produces in
seconds. These tests pin the detector on synthetic shapes where the
pathology provably binds / provably doesn't, then hold the whole
catalog to zero unexplained ERRORs so a future oracle edit that
reintroduces the class fails the suite, not a replica sweep an hour in.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from oracle_lint import ALLOWLIST, _cte_reuse_findings, lint_one  # noqa: E402
from oracle_harness import duck_connection  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duck_connection(SF)


def _errors(con, sql):
    return [f for f in lint_one(con, "t", sql) if f[0] == "ERROR"]


def test_subquery_join_key_flags_blockwise(con):
    # the r12 llm_dedup_embedding pathology, minimized: equality join
    # whose key expression embeds a scalar subquery
    bad = """
    SELECT 1 FROM orders a JOIN orders b
      ON substr(CAST(a.o_custkey AS VARCHAR), 1,
                (SELECT MAX(1) FROM orders))
       = substr(CAST(b.o_custkey AS VARCHAR), 1,
                (SELECT MAX(1) FROM orders))
    """
    errs = _errors(con, bad)
    assert errs and errs[0][1] == "blockwise_nl_join"


def test_materialized_key_form_is_clean(con):
    # the shipped fix shape: key computed per-row in a CTE, then a
    # plain-column equality join -> hash join, no ERROR findings
    good = """
    WITH k AS MATERIALIZED (
      SELECT o_custkey,
             substr(CAST(o_custkey AS VARCHAR), 1,
                    (SELECT MAX(1) FROM orders)) AS kk
      FROM orders
    )
    SELECT 1 FROM k a JOIN k b ON a.kk = b.kk
    """
    assert _errors(con, good) == []


def test_benign_shapes_not_flagged(con):
    # plain equality, expression equality, inequality (IE_JOIN), and a
    # 1-row scalar-subquery comparison all plan without BLOCKWISE
    for sql in (
        "SELECT 1 FROM orders a JOIN customer b ON a.o_custkey = b.c_custkey",
        "SELECT 1 FROM orders a JOIN customer b "
        "ON a.o_custkey % 7 = b.c_custkey % 7",
        "SELECT 1 FROM orders a JOIN orders b "
        "ON a.o_custkey < b.o_custkey AND a.o_totalprice > b.o_totalprice",
        "SELECT 1 FROM orders "
        "WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)",
    ):
        assert _errors(con, sql) == [], sql


def test_cte_reuse_inventory_detector():
    twice = "WITH x AS (SELECT 1 AS a) SELECT * FROM x JOIN x USING (a)"
    assert len(_cte_reuse_findings(twice)) == 1
    mat = ("WITH x AS MATERIALIZED (SELECT 1 AS a) "
           "SELECT * FROM x JOIN x USING (a)")
    assert _cte_reuse_findings(mat) == []
    once = "WITH x AS (SELECT 1 AS a) SELECT * FROM x"
    assert _cte_reuse_findings(once) == []


def test_catalog_zero_unexplained_errors(con):
    """Every oracle in the catalog EXPLAINs without an un-triaged
    BLOCKWISE_NL_JOIN; the 4 allowlisted shapes still produce their
    finding (a stale allowlist entry fails here too)."""
    from event_streaming_bnpl_demo_spark.plans.catalog import all_queries

    unexplained, hits = [], set()
    for name, q in all_queries().items():
        if not q.oracle:
            continue
        for sev, check, detail in lint_one(con, name, q.oracle):
            if sev != "ERROR":
                continue
            if ALLOWLIST.get(name, {}).get(check) is not None:
                hits.add(name)
            else:
                unexplained.append((name, check, detail))
    assert unexplained == []
    assert hits == set(ALLOWLIST), (
        "stale/unused allowlist entries", hits ^ set(ALLOWLIST))
