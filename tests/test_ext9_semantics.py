"""Semantic law tests for the ext9 final pack — invariants independent
of the oracle compare: prefix-filter losslessness (result identical to
the exhaustive inverted-index twin), YoY shifted-key consistency,
DAU/MAU bounds, the FD positive control, and the business-day closed
form checked against a brute-force per-day count."""

from __future__ import annotations

import datetime as dt

from event_streaming_bnpl_demo_spark.plans import all_queries

from .conftest import SF_SMOKE

QUERIES = all_queries()


def test_prefix_filter_equals_exhaustive_twin(spark):
    """The prefix-filter lemma is a theorem, not a heuristic: for
    Jaccard >= t with the global (df, shingle) order, prefix-generated
    candidates lose NO qualifying pair. The prefix-filter join's output
    must therefore be row-identical to the uncapped exhaustive
    inverted-index twin."""
    pf = {(r["doc_a"], r["doc_b"]): r["jaccard"]
          for r in QUERIES["llm_dedup_prefix_filter"].fn(
              spark, SF_SMOKE).collect()}
    ex = {(r["doc_a"], r["doc_b"]): r["jaccard"]
          for r in QUERIES["llm_dedup_ngram_jaccard_exact"].fn(
              spark, SF_SMOKE).collect()}
    assert pf == ex
    assert len(pf) > 0  # non-vacuous: the corpus has real near-dups


def test_yoy_rows_are_shifted_key_matches(spark):
    """Every YoY row compares calendar months exactly 12 apart (the
    gap-safe join semantics), the delta is the exact integer
    difference, and the ratio is the single division of the two
    integer revenues."""
    rows = QUERIES["ts_yoy_growth"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        y, m = map(int, r["month"].split("-"))
        assert r["delta_cents"] == r["rev_cents"] - r["prev_cents"]
        assert r["yoy_ratio"] == r["rev_cents"] / r["prev_cents"]
        assert y >= 1996  # a prior-year month must exist
        assert 1 <= m <= 12


def test_stickiness_bounds(spark):
    """DAU/MAU laws: each day's actives are a subset of the month's
    actives, so sum_dau <= n_days * mau and stickiness is in (0, 1];
    dau_avg never exceeds mau; a month has at most 31 active days."""
    rows = QUERIES["events_stickiness"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_days"] <= 31
        assert 0 < r["sum_dau"] <= r["n_days"] * r["mau"]
        assert 0.0 < r["stickiness"] <= 1.0
        assert r["dau_avg"] <= r["mau"]


def test_fd_positive_control_and_ppm_bounds(spark):
    """The key FD (c_custkey -> c_nationkey) can never be violated —
    one row per customer means one RHS per LHS. Every violation_ppm is
    the exact floor of n_violating*1e6/n_lhs and lies in [0, 1e6]."""
    rows = {r["fd"]: r for r in QUERIES["dq_fd_violations"].fn(
        spark, SF_SMOKE).collect()}
    ctrl = rows["customer.c_custkey->c_nationkey"]
    assert ctrl["n_violating"] == 0
    assert ctrl["violation_ppm"] == 0
    assert ctrl["max_distinct_rhs"] == 1
    for r in rows.values():
        assert 0 <= r["n_violating"] <= r["n_lhs"]
        assert r["violation_ppm"] == (r["n_violating"] * 1_000_000
                                      ) // r["n_lhs"]


def _brute_business_days(d1: dt.date, d2: dt.date) -> int:
    """Weekdays in the half-open (d1, d2]: the reference definition the
    closed form must reproduce."""
    n, d = 0, d1
    while d < d2:
        d += dt.timedelta(days=1)
        if d.weekday() < 5:
            n += 1
    return n


def test_business_day_closed_form_matches_brute_force():
    """The Monday-anchored closed form wd(d2)-wd(d1) equals a literal
    per-day weekday count over (d1, d2] for every day-pair in a window
    spanning month/year boundaries and both weekend edges."""
    def wd(d: int) -> int:
        return 5 * (d // 7) + min(d % 7 + 1, 5)

    anchor = dt.date(1970, 1, 5)  # a Monday
    base = dt.date(1995, 12, 20)
    for off1 in range(0, 30, 3):
        for span in range(0, 40, 7):
            d1 = base + dt.timedelta(days=off1)
            d2 = d1 + dt.timedelta(days=span)
            e1, e2 = (d1 - anchor).days, (d2 - anchor).days
            assert wd(e2) - wd(e1) == _brute_business_days(d1, d2), (d1, d2)


def test_business_days_aggregate_consistency(spark):
    """avg_bdays is exactly sum_bdays / n; business days are
    non-negative (ship never precedes order) and bounded by 5/7 of the
    dataset's whole 1995-2001 calendar span (~1830 weekdays) — the
    synthetic shipdate is not TPC-H's 122-day offset, it can trail the
    order by years."""
    rows = QUERIES["scalar_business_days"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["avg_bdays"] == r["sum_bdays"] / r["n"]
        assert 0 <= r["max_bdays"] < 1830
