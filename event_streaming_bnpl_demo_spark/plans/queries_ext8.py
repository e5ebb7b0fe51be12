"""Round-7 closing pack: pipeline metrology + operational diagnostics.

Five queries that close out dimensions the catalog measures everywhere
else but never turned on itself or on operations telemetry:

- ``llm_dedup_recall_eval`` — recall/precision of the banded MinHash-LSH
  candidate generator against the exact n-gram-Jaccard ground truth, as
  a catalog query (the approximate-dedup twin of ``llm_ann_recall_eval``).
- ``llm_source_diversity`` — per-source language-mix concentration via
  the Herfindahl index. Deliberately log-free: Shannon entropy needs
  ``log``, whose last-ulp behavior is not guaranteed identical across
  engines; HHI is a pure integer numerator, so the concentration number
  is exact by construction.
- ``dq_skew_profile`` — per-join-key skew diagnostics (max/avg rows per
  key, top-key share) — the measurement that decides salting/AQE-skew
  strategy before a 100 TB join, from one scan.
- ``ts_ewma_daily`` — gap-aware exponentially-decayed smoothing of the
  daily revenue series with binary (2^-k) weights, so every weight and
  every weighted sum is an exact integer.
- ``q_order_cadence`` — per-nation repeat-purchase cadence (inter-order
  gap stats + repeat rate), the BNPL retention metric.

Determinism doctrine as everywhere: integer cents, exact floor division
over DECIMAL(38,0) (Spark) vs HUGEINT ``//`` (DuckDB), doubles only as
a single division/multiplication of exactly-agreed integers.

Reference parity note: the reference engine's analytics surface is two
SQL strings over its MySQL projection (main.go:214,:241); everything
here is the capability superset SURVEY.md §2.2 mandates for the
100 TB training-data pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import _REGISTRY, register
from .queries_ext7 import _CENTS, _floordiv_dec

# importing for side effect (registration) AND direct reuse: the eval
# query composes these two registered pipelines verbatim.
from .queries_llm import (  # noqa: F401
    llm_dedup_minhash,
    llm_dedup_ngram_jaccard_exact,
)


def _dedup_recall_oracle() -> str:
    """Compose the registered LSH-candidate and exact-Jaccard oracles
    into one recall/precision measurement — both SQL texts reused
    verbatim, so the eval stays consistent with what it evaluates."""
    truth = _REGISTRY["llm_dedup_ngram_jaccard_exact"].oracle
    cand = _REGISTRY["llm_dedup_minhash"].oracle
    # AS MATERIALIZED: truth is referenced twice and cand three times
    # below; inlined, duckdb re-executes the exact pair-expansion truth
    # per reference — at the 10x sf1 replica that multiplied a ~50 GB
    # temp spill past the disk. Materializing pins each CTE to one
    # execution; results are identical.
    return f"""
    WITH truth AS MATERIALIZED ({truth}),
         cand AS MATERIALIZED ({cand}),
    h AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM truth t
      JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
    )
    SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true_pairs,
           CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
           (SELECT n FROM h) AS n_hits,
           CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN NULL
                ELSE CAST((SELECT n FROM h) AS DOUBLE)
                     / CAST((SELECT COUNT(*) FROM truth) AS DOUBLE)
           END AS pair_recall,
           CASE WHEN (SELECT COUNT(*) FROM cand) = 0 THEN NULL
                ELSE CAST((SELECT n FROM h) AS DOUBLE)
                     / CAST((SELECT COUNT(*) FROM cand) AS DOUBLE)
           END AS candidate_precision
    """


@register("llm_dedup_recall_eval", oracle=_dedup_recall_oracle(),
          tags=("llm", "dedup", "eval"))
def llm_dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-dedup quality eval: recall and candidate precision of
    the banded MinHash-LSH pair generator (`llm_dedup_minhash`) against
    the exact n-gram-Jaccard >= 0.5 ground truth
    (`llm_dedup_ngram_jaccard_exact`) — the measurement that justifies
    running the banded shape corpus-wide and the exact twin only on
    samples. Mirrors `llm_ann_recall_eval` for the dedup tier.

    Determinism: counts are integers; recall/precision are one double
    division each, NULL-guarded identically on both sides. Scale: both
    inputs are pair relations already bounded by their own banded /
    inverted-index generation; the overlap equi-join and the single-row
    aggregates are trivial next to the pipelines themselves. At 100 TB
    this eval runs on a sampled shard — the relational shape is
    unchanged, only the input split changes.
    """
    truth = llm_dedup_ngram_jaccard_exact(spark, sf_dir) \
        .select("doc_a", "doc_b")
    cand = llm_dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    nt = truth.agg(F.count(F.lit(1)).alias("n_true_pairs"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    nh = (truth.join(cand, ["doc_a", "doc_b"])
          .agg(F.count(F.lit(1)).alias("n_hits")))
    return (
        nt.crossJoin(F.broadcast(nc)).crossJoin(F.broadcast(nh))
        .select(
            "n_true_pairs", "n_candidates", "n_hits",
            F.when(F.col("n_true_pairs") == 0, F.lit(None).cast("double"))
            .otherwise(F.col("n_hits").cast("double")
                       / F.col("n_true_pairs").cast("double"))
            .alias("pair_recall"),
            F.when(F.col("n_candidates") == 0, F.lit(None).cast("double"))
            .otherwise(F.col("n_hits").cast("double")
                       / F.col("n_candidates").cast("double"))
            .alias("candidate_precision"))
    )


@register(
    "llm_source_diversity",
    oracle="""
    WITH c AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           CAST((1000000 * MAX(n)) // SUM(n) AS BIGINT) AS dom_share_ppm,
           CAST((1000000 * SUM(n * n)) // (SUM(n) * SUM(n)) AS BIGINT)
             AS hhi_ppm,
           CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS DOUBLE)
             / CAST(SUM(n * n) AS DOUBLE) AS eff_langs
    FROM c GROUP BY source
    """,
    tags=("llm", "curation", "stats"),
)
def llm_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-mix concentration: dominant-language share,
    Herfindahl index (HHI, ppm), and the effective number of languages
    (1/HHI) — the curation dashboard that flags sources collapsing to a
    single language before they skew a training mix.

    Deliberately log-free: Shannon entropy would put ``log`` inside the
    aggregate, and log's last-ulp rounding is not guaranteed identical
    across engines. HHI = sum(n_i^2)/total^2 has a pure integer
    numerator — concentration in exact ppm via DECIMAL(38,0) floor
    division (Spark) vs HUGEINT ``//`` (DuckDB); eff_langs is a single
    correctly-rounded double division of exact integers (its operands
    stay below 2^53 until a source holds ~10^8 docs of one language —
    past that, ship the ppm columns only).

    Scale: one map-side-combined count per (source, lang) — cardinality
    sources x langs, tiny at any corpus size — then a second agg over
    that. No row-level data survives the first shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    sq = ("CAST(SUM(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)))"
          " AS DECIMAL(38,0))")
    tot = "CAST(SUM(n) AS DECIMAL(38,0))"
    return c.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_langs"),
        F.expr(_floordiv_dec(
            f"CAST(1000000 AS DECIMAL(38,0)) * CAST(MAX(n) AS DECIMAL(38,0))",
            tot)).alias("dom_share_ppm"),
        F.expr(_floordiv_dec(
            f"CAST(1000000 AS DECIMAL(38,0)) * {sq}",
            f"{tot} * {tot}")).alias("hhi_ppm"),
        F.expr(f"CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS DOUBLE)"
               f" / CAST(SUM(n * n) AS DOUBLE)").alias("eff_langs"),
    )


@register(
    "dq_skew_profile",
    oracle="""
    WITH k AS (
      SELECT 'l_orderkey' AS key_col, l_orderkey AS k FROM lineitem
      UNION ALL
      SELECT 'l_partkey' AS key_col, l_partkey AS k FROM lineitem
      UNION ALL
      SELECT 'l_suppkey' AS key_col, l_suppkey AS k FROM lineitem
    ), g AS (
      SELECT key_col, k, CAST(COUNT(*) AS BIGINT) AS n
      FROM k GROUP BY key_col, k
    )
    SELECT key_col,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(n) AS BIGINT) AS max_rows_per_key,
           CAST((1000 * MAX(n) * COUNT(*)) // SUM(n) AS BIGINT)
             AS skew_x1000,
           CAST((1000000 * MAX(n)) // SUM(n) AS BIGINT) AS top_key_ppm
    FROM g GROUP BY key_col
    """,
    tags=("dq", "skew", "ops"),
)
def dq_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for lineitem's three join keys in one
    scan: rows, distinct keys, max rows per key, skew factor
    (max/avg, x1000 exact) and the hottest key's row share (ppm) —
    the numbers that decide broadcast vs shuffle vs salt vs AQE-skew
    BEFORE committing a 100 TB join (`join_salted_skew` is the cure;
    this is the diagnosis).

    One pass: the three key columns unpivot through an exploded literal
    map (3x row expansion, zero extra scans — the UNION ALL in the
    oracle is the same multiset), then two map-side-combined aggs.
    Determinism: pure integer arithmetic end-to-end; the skew factor is
    exact floor division over DECIMAL(38,0) vs HUGEINT, never a float.
    """
    li = load_table(spark, sf_dir, "lineitem")
    kv = li.select(F.explode(F.create_map(
        F.lit("l_orderkey"), F.col("l_orderkey"),
        F.lit("l_partkey"), F.col("l_partkey"),
        F.lit("l_suppkey"), F.col("l_suppkey"),
    )).alias("key_col", "k"))
    g = kv.groupBy("key_col", "k").agg(F.count(F.lit(1)).alias("n"))
    return g.groupBy("key_col").agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_rows_per_key"),
        F.expr(_floordiv_dec(
            "CAST(1000 AS DECIMAL(38,0)) * CAST(MAX(n) AS DECIMAL(38,0))"
            " * CAST(COUNT(1) AS DECIMAL(19,0))",
            "CAST(SUM(n) AS DECIMAL(38,0))")).alias("skew_x1000"),
        F.expr(_floordiv_dec(
            "CAST(1000000 AS DECIMAL(38,0)) * CAST(MAX(n) AS DECIMAL(38,0))",
            "CAST(SUM(n) AS DECIMAL(38,0))")).alias("top_key_ppm"),
    )


@register(
    "ts_ewma_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM({_CENTS.format(col='o_totalprice')}) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ), contrib AS (
      SELECT d + CAST(o AS INTEGER) AS td,
             cents * (CAST(1 AS BIGINT) << CAST(15 - o AS INTEGER)) AS wc,
             CAST(1 AS BIGINT) << CAST(15 - o AS INTEGER) AS w
      FROM (SELECT d, cents, UNNEST(generate_series(0, 15)) AS o
            FROM daily)
    ), sm AS (
      SELECT td, SUM(wc) AS num, SUM(w) AS den FROM contrib GROUP BY td
    )
    SELECT strftime(daily.d, '%Y-%m-%d') AS day,
           daily.cents,
           CAST(sm.num // sm.den AS BIGINT) AS ewma_cents
    FROM daily JOIN sm ON daily.d = sm.td
    """,
    tags=("ts", "smoothing", "window"),
)
def ts_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed smoothing of the daily revenue series with
    binary weights 2^(15-age) over a trailing 16-day horizon,
    renormalized by the weights actually present — so calendar gaps
    don't drag the average toward zero (gap-aware EWMA, the smoothing a
    revenue dashboard actually wants).

    Binary decay is the determinism trick: every weight is a power of
    two (shiftleft — exact integers), every weighted sum is an exact
    integer, and the final value is exact floor division — no float
    ever appears, unlike alpha-decay EWMA whose pow(1-a, k) would
    round. The recursive EWMA definition is inherently sequential;
    this trailing-horizon form recovers distribution-friendliness by
    FANNING OUT each day's total to the <= 16 target days it
    influences (explode of a 16-element sequence), then one groupBy —
    bounded 16x expansion of the tiny daily relation, no unbounded
    state, no sort of the full series on one node. At 100 TB the heavy
    pass is the daily pre-agg (map-side combined); everything after
    runs on ~number-of-days rows.

    The daily subtree feeds both the fan-out and the final join;
    identical aggregate subtrees are deduped at runtime by
    ReuseExchange, so the plan-text double scan is not a double cost.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.expr(_CENTS.format(col="o_totalprice"))).alias("cents"))
    contrib = (
        daily.select(
            "d", "cents",
            F.explode(F.sequence(F.lit(0), F.lit(15))).alias("off"))
        .select(
            F.date_add(F.col("d"), F.col("off")).alias("td"),
            F.expr("cents * shiftleft(CAST(1 AS BIGINT), 15 - off)")
            .alias("wc"),
            F.expr("shiftleft(CAST(1 AS BIGINT), 15 - off)").alias("w")))
    sm = contrib.groupBy("td").agg(
        F.expr("SUM(CAST(wc AS DECIMAL(38,0)))").alias("num"),
        F.sum("w").alias("den"))
    return (daily.join(sm, daily.d == sm.td)
            .select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                    "cents",
                    F.expr(_floordiv_dec(
                        "num", "CAST(den AS DECIMAL(38,0))"))
                    .alias("ewma_cents")))


@register(
    "q_order_cadence",
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             CAST(CAST(o_orderdate AS DATE)
                  - lag(CAST(o_orderdate AS DATE)) OVER (
                      PARTITION BY o_custkey
                      ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
                  AS BIGINT) AS gap
      FROM orders
    )
    SELECT n_name,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT CASE WHEN gap IS NOT NULL
                                    THEN o_custkey END) AS BIGINT)
             AS n_repeat_customers,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(gap) AS DOUBLE)
             AS avg_gap_days,
           median(gap) AS median_gap_days,
           CAST(MAX(gap) AS BIGINT) AS max_gap_days
    FROM seq
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("analytics", "window", "join"),
)
def q_order_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation repeat-purchase cadence: customers with >= 2 orders,
    inter-order gap stats (avg / median / max days) — the BNPL
    retention metric behind "how often do customers come back", and
    the reference's purchase-history projection (main.go:241) taken to
    its analytical conclusion.

    The lag ordering is (order date, order key) — the key tiebreak
    makes same-day multi-order customers deterministic in both
    engines. Customers with no orders never appear (inner join from
    the order sequence). Determinism: gaps are exact integer days;
    avg is one double division of exact integers; the median of an
    even-count integer set is the exact midpoint (a+b)/2 — exact FP
    per the agg_median_exact argument.

    Scale: the window shuffles orders once on custkey (the natural
    key), and the customer join reuses that same key — AQE picks
    broadcast while customer fits and falls back to a co-keyed shuffle
    join when it doesn't (customer is NOT small at 100 TB, so it is
    not force-broadcast; nation's 25 rows are). The final agg runs on
    25 nation groups. Exact median buffers per (nation) group at the
    END — but its input is already one row per order, and at true
    100 TB the swap is approx_percentile, same shape.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey")
    from pyspark.sql import Window
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.datediff(F.col("d"), F.lag("d").over(w)).cast("bigint")
        .alias("gap"))
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    joined = (seq.join(c, seq.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    return joined.groupBy("n_name").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.when(F.col("gap").isNotNull(),
                               F.col("o_custkey"))).alias(
            "n_repeat_customers"),
        F.count("gap").alias("n_gaps"),
        (F.sum("gap").cast("double") / F.count("gap").cast("double"))
        .alias("avg_gap_days"),
        F.expr("percentile(gap, 0.5)").alias("median_gap_days"),
        F.max("gap").alias("max_gap_days"),
    )
