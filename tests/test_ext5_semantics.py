"""Semantic law tests for the ext5 pack — invariants the oracle
compare can't express: conservation counts for the BPE pair expansion,
quantized-vs-exact ANN recall, mixture budget bounds, snapshot row
conservation, and HLL sketch mergeability."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_streaming_bnpl_demo_spark.plans import all_queries
from event_streaming_bnpl_demo_spark.sources import load_table

from .conftest import SF_SMOKE

QUERIES = all_queries()


def test_bpe_pair_expansion_conserves_counts(spark):
    """Every word of length L >= 2 contributes exactly L-1 adjacent
    pairs: the UNLIMITED pair multiset must sum to sum(len(w) - 1)."""
    d = load_table(spark, SF_SMOKE, "documents")
    words = (d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
             .filter(F.length("w") >= 2))
    expected = words.agg(
        F.sum(F.length("w") - 1).alias("n")).head()["n"]
    pairs = words.select(F.explode(F.expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
    )).alias("pair"))
    total = pairs.groupBy("pair").count().agg(
        F.sum("count").alias("n")).head()["n"]
    assert total == expected


def test_quantized_topk_recalls_exact_topk(spark):
    """Int8 quantization of 64-dim unit-scale embeddings must keep
    most of the exact cosine top-10 (the production pattern is
    quantized shortlist -> exact re-rank; a low overlap would make the
    shortlist useless)."""
    quant = {r["vec_id"]
             for r in QUERIES["llm_simsearch_quantized"]
             .fn(spark, SF_SMOKE).collect()}
    exact = {r["vec_id"]
             for r in QUERIES["llm_simsearch_topk"]
             .fn(spark, SF_SMOKE).collect()}
    assert len(quant) == len(exact) == 10
    assert len(quant & exact) >= 6, (quant, exact)


def test_temperature_mix_respects_budget_and_caps(spark):
    """Mixture quotas never exceed a source's holdings and the total
    kept never exceeds the global budget (floor rounding may leave
    slack, never overshoot)."""
    from event_streaming_bnpl_demo_spark.plans.queries_ext5 import _MIX_BUDGET

    rows = QUERIES["llm_temperature_mix"].fn(spark, SF_SMOKE).collect()
    assert rows, "mixture must produce one row per source"
    assert all(r["n_keep"] <= r["n_total"] for r in rows)
    assert sum(r["n_keep"] for r in rows) <= _MIX_BUDGET


def test_snapshot_time_travel_conserves_keys(spark):
    """Updates never add or drop keys, so every AS OF version's status
    counts must sum to the full order count."""
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    rows = QUERIES["snapshot_time_travel"].fn(spark, SF_SMOKE).collect()
    by_asof = {}
    for r in rows:
        by_asof[r["as_of"]] = by_asof.get(r["as_of"], 0) + r["n_orders"]
    assert set(by_asof) == {0, 1, 2}
    assert all(v == n_orders for v in by_asof.values()), by_asof


def test_cluster_safe_split_never_splits_a_cluster(spark):
    """The defining guarantee: every connected component lands wholly
    in one split — the per-split distinct-cluster counts must sum to
    the TOTAL number of clusters (a straddling cluster would be
    counted in both splits and overshoot)."""
    from event_streaming_bnpl_demo_spark.plans.queries_llm import (
        llm_dedup_components,
    )

    total_clusters = (llm_dedup_components(spark, SF_SMOKE)
                      .select("component").distinct().count())
    rows = QUERIES["llm_split_cluster_safe"].fn(spark, SF_SMOKE).collect()
    assert sum(r["n_clusters"] for r in rows) == total_clusters
    assert sum(r["n_docs"] for r in rows) == load_table(
        spark, SF_SMOKE, "documents").count()


def test_hll_partial_merge_matches_global_sketch(spark):
    """Mergeability law for the HLL distinct-user tier: unioning
    per-day partial sketches must estimate EXACTLY what the one-shot
    global sketch estimates (same deterministic sketch over the same
    value set — merge order cannot matter), and the estimate must
    land within 5% of the exact distinct count at fixture scale."""
    ev = load_table(spark, SF_SMOKE, "events")
    direct = (ev.groupBy("event_type")
              .agg(F.hll_sketch_estimate(
                  F.hll_sketch_agg("user_id")).alias("est")))
    partials = (ev.groupBy("event_type",
                           F.date_trunc("day", "ts").alias("day"))
                .agg(F.hll_sketch_agg("user_id").alias("sk")))
    merged = (partials.groupBy("event_type")
              .agg(F.hll_sketch_estimate(
                  F.hll_union_agg("sk")).alias("est")))
    exact = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")))
    d = {r["event_type"]: r["est"] for r in direct.collect()}
    m = {r["event_type"]: r["est"] for r in merged.collect()}
    x = {r["event_type"]: r["n"] for r in exact.collect()}
    assert d == m, "partial-merge estimate diverged from global sketch"
    for t, n in x.items():
        assert abs(d[t] - n) <= max(1, n * 0.05), (t, d[t], n)
