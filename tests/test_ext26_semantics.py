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


def test_embedding_band_bits_scale_with_corpus(spark, tmp_path):
    """The r12 corpus-scaled banding for llm_dedup_embedding: nbits
    follows the hottest label (clamp(2, 16, ceil(log2(max/64)))), so
    block size targets a constant ~64 vectors at any corpus size —
    the fixed-2-bit shape left blocks growing linearly with the corpus
    and in-block pair mass quadratically (the minhash fourth-decade
    class). Pins the formula at the gate SFs (2 bits — identical
    results to the historical shape there) and through the decades,
    then strict-compares engine vs oracle on a corpus HOT enough that
    the dynamic region actually binds (nbits=4), which the driver's
    sf0.01 gate never exercises.
    """
    import math
    import duckdb

    from event_streaming_bnpl_demo_spark.plans.catalog import all_queries
    from event_streaming_bnpl_demo_spark.plans.queries_llm import (
        DIM, _dedup_band_bits)
    from .oracle_harness import compare

    # the formula at the standing gate scales and through the decades
    assert _dedup_band_bits(59) == 2      # sf0.01: unchanged behavior
    assert _dedup_band_bits(218) == 2     # sf0.1 (bench): unchanged
    assert _dedup_band_bits(2180) == 6    # 20k-vector sf1 replica
    assert _dedup_band_bits(545_000) == 14
    assert _dedup_band_bits(10**9) == 16  # the DIM-bounded ceiling
    assert _dedup_band_bits(0) == 2

    # hot-label corpus: 600 vectors in one label -> nbits = 4
    n_hot = 600
    assert _dedup_band_bits(n_hot) == 4

    def vec(seed: int) -> list[float]:
        # deterministic pseudo-random unit-ish vector, sign-diverse
        return [math.sin(0.7 * seed + 1.3 * j) for j in range(DIM)]

    rows = [(i, vec(i), "hot") for i in range(n_hot)]
    rows += [(1_000 + i, vec(7_000 + i), f"bg{i % 3}") for i in range(30)]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, f"vec_id long, embedding array<float>, label string"
    ).coalesce(1).write.parquet(f"{sf_dir}/embeddings.parquet")

    q = all_queries()["llm_dedup_embedding"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')")
    df = q.fn(spark, sf_dir)
    # the dynamic region actually bound: buckets are 4-bit strings
    buckets = {r["bucket"] for r in df.select("bucket").distinct().collect()}
    assert buckets and all(len(b) == 4 for b in buckets), buckets
    problems = compare(df, con, q.oracle)
    assert not problems, problems
