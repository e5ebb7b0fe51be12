"""Semantic laws for the LSH banding sweep (ext26):

- Pair mass is monotone along the refinement chain b1_r6 -> b2_r3 ->
  b3_r2 -> b6_r1: a pair matching a longer band matches at least one
  band of every coarser layout (prefix/suffix structure of the chosen
  layouts), so coarser banding can only add candidate mass.
- The production dedup (3 bands x 2 rows) generates DISTINCT candidate
  pairs; the sweep's b3_r2 pair mass counts band multiplicity, so it
  must dominate the production candidate count — and both derive from
  the same signature, so a drift in either implementation breaks it.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_pair_mass_monotone_and_dominates_production_candidates(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext26 import \
        llm_lsh_band_sweep
    from event_streaming_bnpl_demo_spark.plans.queries_llm import \
        llm_dedup_minhash

    rows = {r["layout"]: r for r in llm_lsh_band_sweep(spark, SF).collect()}
    assert set(rows) == {"b1_r6", "b2_r3", "b3_r2", "b6_r1"}
    chain = ["b1_r6", "b2_r3", "b3_r2", "b6_r1"]
    masses = [rows[k]["pair_mass"] for k in chain]
    assert masses == sorted(masses), masses
    for k in chain:
        assert rows[k]["n_bands"] * rows[k]["rows_per_band"] == 6
        assert rows[k]["max_bucket"] >= 1
        assert rows[k]["n_hot_buckets"] >= 0

    n_candidates = llm_dedup_minhash(spark, SF).count()
    assert rows["b3_r2"]["pair_mass"] >= n_candidates
