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


def test_minhash_overcap_cluster_collapses(spark, tmp_path):
    """The r12 star-over-cap rule (r11 advice): a genuine duplicate
    cluster LARGER than _LSH_BUCKET_CAP must still collapse to one
    survivor. r11 dropped over-cap buckets wholesale, so a boilerplate
    cluster of 600 identical docs emitted ZERO pairs (it exceeds the
    cap in every band) and all 600 copies survived llm_dedup_apply.
    With star pairs the bucket emits n-1 rows — O(n), not O(n²) — and
    star components == clique components, so exactly one copy survives.

    This corpus is the one place the cap BINDS (driver gates run where
    it never does), so the engine/oracle strict compare here is the
    recall-region parity check the sf0.01 gate is structurally blind to.
    """
    import duckdb

    from event_streaming_bnpl_demo_spark.plans.catalog import all_queries
    from event_streaming_bnpl_demo_spark.plans.queries_llm import \
        _LSH_BUCKET_CAP
    from .oracle_harness import compare

    n_cluster = _LSH_BUCKET_CAP + 88  # over the cap in every band
    boiler = ("click here to accept all cookies and continue to the "
              "site terms of service apply to every visitor today")
    rows = [(i, boiler, "en", "web", len(boiler))
            for i in range(n_cluster)]
    # distinct background docs: unique vocabularies, no shared shingles
    for i in range(8):
        txt = " ".join(f"w{i}x{j}" for j in range(12))
        rows.append((10_000 + i, txt, "en", "web", len(txt)))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    pairs = all_queries()["llm_dedup_minhash"].fn(spark, sf_dir).collect()
    # star, not clique: n-1 pairs, every one anchored at the min doc_id
    assert len(pairs) == n_cluster - 1
    assert {p["doc_a"] for p in pairs} == {0}
    assert {p["doc_b"] for p in pairs} == set(range(1, n_cluster))

    survivors = all_queries()["llm_dedup_apply"].fn(spark, sf_dir)
    surv = {r["doc_id"]: r["cluster_size"] for r in survivors.collect()}
    assert surv[0] == n_cluster, \
        "over-cap duplicate cluster did not collapse to one survivor"
    assert sum(1 for k in surv if k < 10_000) == 1
    assert len(surv) == 1 + 8  # one boilerplate survivor + 8 singletons

    # strict oracle parity in the binding region
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet/*.parquet')")
    for name in ("llm_dedup_minhash", "llm_dedup_apply"):
        q = all_queries()[name]
        problems = compare(q.fn(spark, sf_dir), con, q.oracle)
        assert not problems, (name, problems)
