"""Semantic laws for the ext23 pack:

- The decomposition is EXACTLY additive in micro-units — not a
  rounding story, an identity: x*1e6 == trend + seasonal + residual
  for every output row, because both subtractions are integer-exact.
- The integer trend is the true 7-row mean to within 1 micro-unit.
- The streamed rule view equals the batch rule engine shape over the
  full feed (incremental == batch), and its state really is per-batch
  |rules|-row partials, proving O(batch) maintenance.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_decomposition_is_exactly_additive(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext23 import \
        ts_seasonal_decompose

    rows = ts_seasonal_decompose(spark, SF).collect()
    assert rows
    for r in rows:
        assert (r["cents"] * 1_000_000
                == r["trend_micro"] + r["seasonal_micro"]
                + r["resid_micro"]), r


def test_trend_is_seven_row_mean_within_one_micro(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext23 import \
        ts_seasonal_decompose

    daily = sorted(
        (r["d"], r["x"]) for r in
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(F.expr(
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")).alias("x"))
        .collect())
    got = {r["d"]: r for r in ts_seasonal_decompose(spark, SF).collect()}
    # interior rows only (full 7-row window)
    assert len(got) == len(daily) - 6
    for i in range(3, len(daily) - 3):
        d = daily[i][0]
        s7 = sum(x for _, x in daily[i - 3:i + 4])
        true_mean_micro = s7 * 1_000_000 / 7
        assert abs(got[d]["trend_micro"] - true_mean_micro) <= 1, d


def test_stream_rule_view_equals_batch_and_keeps_tiny_state(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext23 import (
        _STREAM_RULES, mv_stream_rule_engine)
    from event_streaming_bnpl_demo_spark.plans.queries_ext import (
        _scratch, source_fingerprint)
    from event_streaming_bnpl_demo_spark.sources import load_table

    got = {r["rule_id"]: r for r in mv_stream_rule_engine(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    n = ev.count()
    assert set(got) == {rid for rid, _ in _STREAM_RULES}
    for rid, pred in _STREAM_RULES:
        viol = ev.filter(f"NOT COALESCE({pred}, FALSE)").count()
        assert got[rid]["n_checked"] == n
        assert got[rid]["n_violations"] == viol, rid
    # the cap + domain + cutoff rules all fire on this feed
    assert got["value_cap_300"]["n_violations"] > 0
    assert got["type_domain"]["n_violations"] > 0
    # state = per-batch partials of |rules| rows each, four batches
    state = f"{_scratch(f'rulestream_v1_{source_fingerprint(SF)}')}/state"
    batches = glob.glob(f"{state}/batch=*")
    assert len(batches) == 4, batches
    for b in batches:
        assert spark.read.parquet(b).count() == len(_STREAM_RULES)
