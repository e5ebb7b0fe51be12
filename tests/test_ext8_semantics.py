"""Semantic law tests for the ext8 closing pack — invariants that hold
for ANY input data, independent of the oracle compare: weighted-mean
bounds and series-start identity for the binary-decay EWMA, Herfindahl
bounds for the diversity profile, pigeonhole/skew-factor laws for the
key-skew profile, hit-count bounds for the dedup recall eval, and
consistency laws for the cadence metrics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from event_streaming_bnpl_demo_spark.plans import all_queries
from event_streaming_bnpl_demo_spark.sources import load_table

from .conftest import SF_SMOKE

QUERIES = all_queries()


def test_ewma_is_bounded_by_trailing_window(spark):
    """The gap-aware EWMA is a weighted mean of the trailing 16 days'
    totals actually present — so for every day it must lie within
    [min, max] of those days' cents (floor division can dip at most 1
    below the true weighted mean, still >= min since min is an
    integer the mean never goes below). And the very first day of the
    series has no history: its EWMA must equal its own cents exactly
    (renormalization, not zero-padding)."""
    rows = QUERIES["ts_ewma_daily"].fn(spark, SF_SMOKE).collect()
    by_day = {dt.date.fromisoformat(r["day"]): r["cents"] for r in rows}
    first = min(by_day)
    for r in rows:
        d = dt.date.fromisoformat(r["day"])
        window = [by_day[d - dt.timedelta(days=k)] for k in range(16)
                  if d - dt.timedelta(days=k) in by_day]
        assert min(window) - 1 <= r["ewma_cents"] <= max(window), r
        if d == first:
            assert r["ewma_cents"] == r["cents"]


def test_source_diversity_herfindahl_bounds(spark):
    """HHI laws: uniform mix over k languages gives HHI = 1/k, a
    single language gives 1 — so 1e6/n_langs <= hhi_ppm <= 1e6
    (floor division can undershoot the lower bound by < 1 ppm).
    The dominant share bounds HHI on both sides:
    dom^2 <= HHI <= dom. Effective languages never exceeds the
    actual count."""
    for r in QUERIES["llm_source_diversity"].fn(spark, SF_SMOKE).collect():
        dom = r["dom_share_ppm"] / 1e6
        hhi = r["hhi_ppm"] / 1e6
        assert 1e6 / r["n_langs"] - 1 <= r["hhi_ppm"] <= 1e6, r
        # ppm floor-rounding slack on both inequalities
        assert dom * dom - 2e-6 <= hhi <= dom + 2e-6, r
        assert 1.0 <= r["eff_langs"] <= r["n_langs"] + 1e-9, r


def test_skew_profile_pigeonhole_laws(spark):
    """For every key column: rows equal the table's row count, the
    hottest key holds at least the average (pigeonhole: skew factor
    >= 1, minus floor-division slack), the top key's share is a valid
    ppm, and skew_x1000 is exactly floor(1000 * max * keys / rows)."""
    n_li = load_table(spark, SF_SMOKE, "lineitem").count()
    rows = QUERIES["dq_skew_profile"].fn(spark, SF_SMOKE).collect()
    assert {r["key_col"] for r in rows} == {
        "l_orderkey", "l_partkey", "l_suppkey"}
    for r in rows:
        assert r["n_rows"] == n_li
        assert r["n_keys"] <= r["n_rows"]
        assert r["max_rows_per_key"] * r["n_keys"] >= r["n_rows"]
        assert r["skew_x1000"] >= 999, r   # >= 1.0 minus floor slack
        assert 0 < r["top_key_ppm"] <= 10**6
        assert r["skew_x1000"] == (
            1000 * r["max_rows_per_key"] * r["n_keys"]) // r["n_rows"]


def test_dedup_recall_eval_bounds(spark):
    """Hits can't exceed either side; recall/precision are exact
    ratios of the reported integer counts."""
    r = QUERIES["llm_dedup_recall_eval"].fn(spark, SF_SMOKE).head()
    assert r["n_hits"] <= min(r["n_true_pairs"], r["n_candidates"])
    if r["n_true_pairs"]:
        assert r["pair_recall"] == r["n_hits"] / r["n_true_pairs"]
    if r["n_candidates"]:
        assert (r["candidate_precision"]
                == r["n_hits"] / r["n_candidates"])


def test_order_cadence_consistency(spark):
    """Per nation: repeat customers are a subset of customers; gaps
    are one fewer than orders for every repeat customer, so n_gaps >=
    n_repeat_customers; avg is the exact mean of the gaps and median
    never exceeds max. Totals across nations reconcile with the raw
    orders table."""
    rows = QUERIES["q_order_cadence"].fn(spark, SF_SMOKE).collect()
    o = load_table(spark, SF_SMOKE, "orders")
    n_orders = o.count()
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert sum(r["n_gaps"] for r in rows) == n_orders - n_cust
    for r in rows:
        assert r["n_repeat_customers"] <= r["n_customers"]
        assert r["n_gaps"] >= r["n_repeat_customers"]
        if r["n_gaps"]:
            assert 0 <= r["avg_gap_days"] <= r["max_gap_days"]
            assert r["median_gap_days"] <= r["max_gap_days"]
