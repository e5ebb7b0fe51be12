"""Semantic laws for the ext24 pack:

- Point-in-time features must be leakage-free by recomputation: an
  independent Python pass over (user, ts, event_id)-sorted history
  must reproduce every feature from STRICTLY-prior rows only.
- The mix planner's targets must (a) never exceed the budget in sum,
  (b) be monotone in source token mass (temperature < 1 reweights, it
  never reorders), and (c) carry epoch ratios that are exactly
  floor(target·1e6 / actual).
"""

from __future__ import annotations

import math
from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_pit_features_match_strictly_prior_recompute(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext24 import \
        events_pit_features
    from event_streaming_bnpl_demo_spark.sources import load_table

    rows = (load_table(spark, SF, "events")
            .selectExpr("event_id", "user_id", "event_type", "ts",
                        "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc")
            .collect())
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    expect = {}
    for u, evs in by_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        n = v = 0
        cnt = defaultdict(int)
        for r in evs:
            if r["event_type"] == "purchase":
                expect[r["event_id"]] = (
                    u, n, cnt["view"], cnt["click"], cnt["error"], v)
            n += 1
            v += r["vc"]
            cnt[r["event_type"]] += 1
    got = {r["event_id"]: (r["user_id"], r["n_prior_events"],
                           r["n_prior_views"], r["n_prior_clicks"],
                           r["n_prior_errors"], r["prior_value_cents"])
           for r in events_pit_features(spark, SF).collect()}
    assert got == expect
    assert got  # the corpus does contain purchases


def test_mix_planner_budget_monotonicity_and_epochs(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext24 import (
        _EPOCH_WARN_MICRO, _MIX_TOKEN_BUDGET, llm_mix_epochs_planner)

    rows = llm_mix_epochs_planner(spark, SF).collect()
    assert rows
    # floor-rounded shares can only undershoot the budget
    assert sum(r["target_tokens"] for r in rows) <= _MIX_TOKEN_BUDGET
    # temperature 0.7 reweights but never reorders sources
    by_tokens = sorted(rows, key=lambda r: r["n_tokens"])
    targets = [r["target_tokens"] for r in by_tokens]
    assert targets == sorted(targets)
    # ...and compresses: the target/token RATIO favors small sources
    ratios = [r["target_tokens"] / r["n_tokens"] for r in by_tokens]
    assert ratios[0] >= ratios[-1]
    for r in rows:
        assert r["epochs_micro"] == (r["target_tokens"] * 1_000_000
                                     ) // r["n_tokens"]
        assert r["over_repeated"] == int(
            r["epochs_micro"] > _EPOCH_WARN_MICRO)
    # targets agree with an independent Python recompute (libm pow may
    # differ from the JVM's by an ulp, so weights get 1-micro slack and
    # the implied target the rounding it propagates)
    wgt = {r["source"]: int(math.floor(
        r["n_tokens"] ** 0.7 * 1_000_000 + 0.5)) for r in rows}
    wtot = sum(wgt.values())
    for r in rows:
        py_target = (_MIX_TOKEN_BUDGET * wgt[r["source"]]) // wtot
        assert abs(r["target_tokens"] - py_target) <= 1, r
