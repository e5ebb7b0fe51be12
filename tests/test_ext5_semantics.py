"""Semantic law tests for the ext5 pack — invariants the oracle
compare can't express: conservation counts for the BPE pair expansion,
quantized-vs-exact ANN recall, mixture budget bounds, snapshot row
conservation, HLL sketch mergeability, theta set algebra, and KLL
quantile rank error."""

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
    """Mergeability law for the HLL distinct-user tier, asserted on
    the REGISTERED query's own columns (so a regression in
    agg_hll_mergeable itself fails here, not just in a re-derivation):
    the per-day partial-union estimate must equal the one-shot global
    sketch estimate exactly (same deterministic sketch over the same
    value set — merge order cannot matter), and both must land within
    5% of the exact distinct count at fixture scale."""
    rows = QUERIES["agg_hll_mergeable"].fn(spark, SF_SMOKE).collect()
    assert rows, "one row per event type expected"
    for r in rows:
        assert r["est_users"] == r["est_merged"], \
            f"{r['event_type']}: partial-merge diverged from global sketch"
        assert abs(r["est_users"] - r["n_exact"]) <= max(
            1, r["n_exact"] * 0.05), dict(r.asDict())


def test_theta_set_algebra_respects_exact_counts(spark):
    """Theta sketch algebra laws against exact ground truth: at
    fixture cardinalities (well under the sketch's exact-mode
    threshold) every estimate equals its exact count, and the
    partition identity |A∩B| + |A\\B| = |A| composes across the two
    derived sketches."""
    row = QUERIES["agg_theta_set_algebra"].fn(spark, SF_SMOKE).head()
    assert round(row["est_intersection"]) == row["n_intersection"]
    assert round(row["est_union"]) == row["n_union"]
    assert round(row["est_only_purchase"]) == row["n_only_purchase"]
    assert (round(row["est_intersection"] + row["est_only_purchase"])
            == row["n_intersection"] + row["n_only_purchase"])


def test_kll_quantiles_bound_by_exact_order_stats(spark):
    """KLL quantile law: every sketched quantile must be an actual
    stored value of its group (KLL returns elements, not
    interpolations) and must sit within rank tolerance of the exact
    discrete percentile — checked by rank-bracketing each estimate
    against the sorted values."""
    import bisect

    rows = QUERIES["agg_kll_quantiles"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "value")
    by_type = {}
    for r in ev.collect():
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for r in rows:
        vals = sorted(by_type[r["event_type"]])
        n = len(vals)
        for q, est in ((0.5, r["kll_p50"]), (0.9, r["kll_p90"])):
            assert vals[0] <= est <= vals[-1]
            # rank of the estimate within the sorted data must be
            # within tolerance of the requested rank. KLL's ~1.65%
            # bound at default k holds with high probability, not
            # certainty, and its compaction is RANDOMIZED (measured:
            # estimates vary run-to-run) — assert at 5% so the law
            # test never flakes on an unlucky compaction while still
            # catching a broken sketch outright
            rank = bisect.bisect_left(vals, est) / n
            assert abs(rank - q) <= 0.05 + 1.0 / n, (r["event_type"], q, rank)


def test_rerank_composition_equals_exact_search(spark):
    """The quantize -> shortlist-50 -> exact-re-rank composition must
    return EXACTLY the brute-force exact top-10 (same rows, same
    scores): the 5x-overfetch shortlist absorbs quantization rank
    error, so the cheap path is a drop-in replacement for the exact
    one."""
    rerank = [(r["vec_id"], r["cos_sim"])
              for r in QUERIES["llm_simsearch_rerank"]
              .fn(spark, SF_SMOKE).collect()]
    exact = [(r["vec_id"], r["cos_sim"])
             for r in QUERIES["llm_simsearch_topk"]
             .fn(spark, SF_SMOKE).collect()]
    assert rerank == exact


def test_results_invariant_under_shuffle_parallelism(spark):
    """Partition-independence law: the determinism doctrine (decimal
    accumulation, integer fixed-point, FLOOR rounding) claims results
    are EXACTLY equal no matter how many partitions the aggregation
    runs over. Prove it on the most float-exposed shapes by running
    each query under 3 and 32 shuffle partitions and comparing
    collected rows bit-for-bit."""
    names = ["q1_pricing_summary", "agg_stats_moments",
             "mv_join_agg_maintain", "llm_tfidf_top_terms",
             "llm_simsearch_quantized", "llm_temperature_mix"]
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("3", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                df = QUERIES[n].fn(spark, SF_SMOKE)
                rows = sorted(tuple(r) for r in df.collect())
                results.setdefault(n, []).append(rows)
        for n, (a, b) in results.items():
            assert a == b, f"{n} diverged across shuffle parallelism"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


def test_stream_maintained_hll_equals_batch_sketch(spark):
    """The streaming sketch-view law: per-micro-batch HLL partials
    unioned across arbitrary batch boundaries must estimate EXACTLY
    what the one-shot batch sketch estimates — incremental ==
    recompute, the same invariant the decimal MV tier proves, now for
    the sketch algebra."""
    rows = QUERIES["mv_stream_hll_distinct"].fn(spark, SF_SMOKE).collect()
    assert rows, "one row per event type expected"
    for r in rows:
        assert r["est_streamed"] == r["est_batch"], dict(r.asDict())
