"""Semantic law tests for the ext14 pack: the bloom manifest must
actually SKIP files (the oracle only proves no-false-negative
equality; effectiveness is the operator's reason to exist), and CUPED
must reduce variance relative to the raw metric on this data.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_bloom_manifest_prunes_files(spark):
    """The catalog query's staged bloom index must skip files for the
    probe key (zone maps cannot — the table is date-clustered) while
    returning exactly the full filter's rows. The LakeTable-level
    no-false-negative law is unit-tested in test_lake.py; this pins
    the staged catalog instance at the driver's smoke SF."""
    from event_streaming_bnpl_demo_spark.plans.queries_ext14 import (
        _BLOOM_PROBE_KEY, lake_bloom_point_lookup)
    from event_streaming_bnpl_demo_spark.plans.queries_lake import (
        _staged_table)
    from event_streaming_bnpl_demo_spark.sources import load_table

    # run the query once so the staged table exists (idempotent)
    got = sorted(r["o_orderkey"] for r in
                 lake_bloom_point_lookup(spark, SF_SMOKE).collect())
    t = _staged_table(spark, SF_SMOKE, "bloomidx_v1", lambda t: None,
                      stat_cols=("o_orderdate",))
    cand, total = t.bloom_candidates("o_orderkey", _BLOOM_PROBE_KEY)
    assert total == 8
    assert len(cand) < total, \
        f"bloom pruned nothing: {len(cand)}/{total} files read"
    want = sorted(r["o_orderkey"] for r in
                  load_table(spark, SF_SMOKE, "orders")
                  .filter(F.col("o_orderkey") == _BLOOM_PROBE_KEY)
                  .collect())
    assert got == want and len(got) == 1


def test_cuped_reduces_variance(spark):
    """theta chosen as cov/var is the variance-MINIMIZING linear
    adjustment, so the adjusted per-user residuals must have variance
    <= the raw post-period metric's (strictly, unless cov = 0)."""
    from event_streaming_bnpl_demo_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    per_user = (ev.groupBy("user_id")
                .agg(F.sum(F.when(F.to_date("ts")
                                  < F.lit("2024-01-16").cast("date"), 1)
                           .otherwise(0)).alias("x"),
                     F.sum(F.when(F.to_date("ts")
                                  >= F.lit("2024-01-16").cast("date"), 1)
                           .otherwise(0)).alias("y"))).toPandas()
    x, y = per_user["x"].astype(float), per_user["y"].astype(float)
    theta = ((x * y).mean() - x.mean() * y.mean()) / \
        ((x * x).mean() - x.mean() ** 2)
    adj = y - theta * (x - x.mean())
    assert adj.var() <= y.var()


def test_luhn_checksum_validates_independently(spark):
    """The Luhn query's oracle shares its formula with the Spark side,
    so a same-formula semantic error would pass the gate (it did once,
    in-session: the verify pass doubled the wrong parity). Pin the
    SEMANTICS against a fully independent string-based Luhn
    implementation: every generated PAN must validate, and corrupting
    any single digit must break validation."""
    from event_streaming_bnpl_demo_spark.plans.queries_ext17 import (
        scalar_luhn_checksum)

    def luhn_ok(n: int) -> bool:
        s, alt = 0, False
        for ch in reversed(str(n)):
            d = int(ch)
            if alt:
                d = d * 2
                if d > 9:
                    d -= 9
            s += d
            alt = not alt
        return s % 10 == 0

    rows = scalar_luhn_checksum(spark, SF_SMOKE).collect()
    assert rows and all(r["luhn_residue"] == 0 for r in rows)
    assert all(luhn_ok(r["pan"]) for r in rows)
    # single-digit corruption detection (the property Luhn guarantees)
    pan = rows[0]["pan"]
    for pos in (0, 5, 15):
        delta = 10 ** pos
        corrupted = pan + delta if (pan // delta) % 10 != 9 \
            else pan - delta
        assert not luhn_ok(corrupted)
