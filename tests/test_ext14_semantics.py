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
    """At least one of the 8 date-clustered files must be skipped for
    the probe key, and every file containing the key must survive
    (no false negatives, per-file ground truth)."""
    from event_streaming_bnpl_demo_spark.plans.queries_ext import (
        source_fingerprint, stage_once)
    from event_streaming_bnpl_demo_spark.plans.queries_ext14 import (
        _BLOOM_PROBE_KEY, _bloom_bucket, lake_bloom_point_lookup)
    from event_streaming_bnpl_demo_spark.sources import load_table

    # run the query once so the staged table exists
    lake_bloom_point_lookup(spark, SF_SMOKE).collect()
    root = stage_once(f"bloomlake_{source_fingerprint(SF_SMOKE)}",
                      lambda tmp: None)
    data = os.path.join(root, "data")
    files = spark.read.parquet(data).select(
        F.input_file_name().alias("f"), "o_orderkey")
    manifest = (files.selectExpr(
        "f", "explode(array(0, 1)) AS hrow", "o_orderkey")
        .selectExpr("f", "hrow",
                    f"{_bloom_bucket('o_orderkey', 'hrow')} AS bucket")
        .distinct())
    probe_bits = {h: int(spark.sql(
        f"SELECT {_bloom_bucket(str(_BLOOM_PROBE_KEY), str(h))}")
        .collect()[0][0]) for h in (0, 1)}
    cand = None
    for h, b in probe_bits.items():
        hits = {r["f"] for r in manifest.filter(
            (F.col("hrow") == h) & (F.col("bucket") == b))
            .select("f").collect()}
        cand = hits if cand is None else cand & hits
    all_files = {r["f"] for r in files.select("f").distinct().collect()}
    truth = {r["f"] for r in files.filter(
        F.col("o_orderkey") == _BLOOM_PROBE_KEY)
        .select("f").distinct().collect()}
    assert truth <= cand, "bloom must never skip a file holding the key"
    assert len(cand) < len(all_files), \
        f"bloom pruned nothing: {len(cand)}/{len(all_files)} files read"
    # cross-check the catalog query's result against the direct filter
    got = lake_bloom_point_lookup(spark, SF_SMOKE).count()
    want = (load_table(spark, SF_SMOKE, "orders")
            .filter(F.col("o_orderkey") == _BLOOM_PROBE_KEY).count())
    assert got == want


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
