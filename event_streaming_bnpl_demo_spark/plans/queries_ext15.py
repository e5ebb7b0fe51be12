"""Ext15 pack: the BI/master-data capstones — segment migration,
cohort lifetime-value curves, and a quality evaluation for the
entity-resolution blocking — three oracled queries.

- ``q_segment_migration`` — year-over-year customer segment migration
  matrix: customers quartiled by 1996 spend and by 1997 spend
  (discrete row_number picks, not ntile — deterministic under ties),
  cross-tabbed into the 5x5 transition matrix (quartiles 1-4 plus
  0 = inactive that year). The churn/upsell dashboard every
  subscription business runs.
- ``q_cohort_ltv_curve`` — cumulative lifetime value by acquisition
  cohort: customers grouped by first-order quarter, revenue
  accumulated by quarters-since-acquisition — the cohort LTV triangle
  that pays for every marketing budget.
- ``er_blocking_quality`` — evaluation of the entity-resolution
  blocking (er_resolve_pipeline's (brand, size) scheme): reduction
  ratio (how much of the cross product blocking avoids) and recall
  (what fraction of true fuzzy matches the blocks retain), ground
  truth computed by exhaustive Jaro-Winkler over a bounded probe
  subset. The eval half of the ER story — a blocking scheme without a
  measured recall is a guess.

Reference parity note: beyond-reference extension tier (SURVEY.md
§2.2); the reference's analytics surface is two filter-project SQL
strings (main.go:214,:241).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .catalog import register
from .queries_ext7 import _CENTS

_O_CENTS = _CENTS.format(col="o_totalprice")


def _year_quartiles_sql(year: int, alias: str) -> str:
    """Customers active in ``year`` with their spend quartile 1-4 —
    discrete row_number pick over (spend, custkey), NOT ntile, so ties
    land deterministically in both engines."""
    return f"""
      SELECT o_custkey AS c, CAST(CEIL(4.0 * rn / n) AS BIGINT) AS {alias}
      FROM (
        SELECT o_custkey,
               row_number() OVER (ORDER BY spend, o_custkey) AS rn,
               COUNT(*) OVER () AS n
        FROM (
          SELECT o_custkey,
                 CAST(SUM({_CENTS.format(col='o_totalprice')}) AS BIGINT)
                   AS spend
          FROM orders
          WHERE EXTRACT(year FROM o_orderdate) = {year}
          GROUP BY o_custkey
        )
      )
    """


@register(
    "q_segment_migration",
    oracle=f"""
    WITH y96 AS ({_year_quartiles_sql(1996, 'q96')}),
    y97 AS ({_year_quartiles_sql(1997, 'q97')})
    SELECT COALESCE(y96.q96, 0) AS seg_1996,
           COALESCE(y97.q97, 0) AS seg_1997,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM y96 FULL OUTER JOIN y97 ON y97.c = y96.c
    GROUP BY 1, 2
    ORDER BY seg_1996, seg_1997
    """,
    tags=("bi", "window", "reshape"),
)
def q_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year spend-segment migration matrix: each customer's
    1996 spend quartile crossed with their 1997 quartile (0 = inactive
    that year) — who upgraded, who churned, who arrived. Quartile
    assignment is a DISCRETE rank pick (ceil(4*rn/n) over
    (spend, custkey) order), not ntile, so equal spends tie-break
    identically in both engines.

    Scale: two map-side-combined yearly rollups (each reduced to one
    row per active customer) ranked within their own year — ntile-free
    quartiles still need the year-global sort, but over |customers|,
    not |orders|; the full-outer join and the 25-cell cross-tab ride
    the same customer clustering.
    """
    o = load_table(spark, sf_dir, "orders")

    def quartiles(year: int, alias: str) -> DataFrame:
        spend = (o.filter(F.year("o_orderdate") == year)
                 .groupBy("o_custkey")
                 .agg(F.expr(f"CAST(SUM({_O_CENTS}) AS BIGINT)")
                      .alias("spend")))
        w = Window.orderBy("spend", "o_custkey")
        return (spend
                .withColumn("rn", F.row_number().over(w))
                .withColumn("n", F.count(F.lit(1)).over(
                    Window.partitionBy()))
                .selectExpr("o_custkey AS c",
                            f"CAST(CEIL(4.0 * rn / n) AS BIGINT)"
                            f" AS {alias}"))

    y96 = quartiles(1996, "q96")
    y97 = quartiles(1997, "q97")
    return (y96.join(y97, "c", "full_outer")
            .groupBy(F.coalesce("q96", F.lit(0)).alias("seg_1996"),
                     F.coalesce("q97", F.lit(0)).alias("seg_1997"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
            .orderBy("seg_1996", "seg_1997"))


@register(
    "q_cohort_ltv_curve",
    oracle=f"""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) * 4
                 + CAST((EXTRACT(month FROM o_orderdate) - 1) // 3
                        AS BIGINT)) AS cohort_q
      FROM orders GROUP BY o_custkey
    ),
    facts AS (
      SELECT f.cohort_q,
             CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) * 4
               + CAST((EXTRACT(month FROM o.o_orderdate) - 1) // 3
                      AS BIGINT)
               - f.cohort_q AS age_q,
             {_CENTS.format(col='o.o_totalprice')} AS cents
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    ),
    per_age AS (
      SELECT cohort_q, age_q, CAST(SUM(cents) AS BIGINT) AS rev
      FROM facts GROUP BY cohort_q, age_q
    ),
    sizes AS (
      SELECT cohort_q, CAST(COUNT(*) AS BIGINT) AS cohort_n
      FROM firsts GROUP BY cohort_q
    )
    SELECT p.cohort_q, p.age_q, s.cohort_n,
           CAST(SUM(p.rev) OVER (PARTITION BY p.cohort_q ORDER BY p.age_q
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_rev_cents
    FROM per_age p JOIN sizes s ON s.cohort_q = p.cohort_q
    ORDER BY p.cohort_q, p.age_q
    """,
    tags=("bi", "window", "cohort"),
)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers grouped by
    acquisition quarter (first order), revenue accumulated by
    quarters-since-acquisition — the curve that tells a business what
    a cohort is worth N quarters in, and whether newer cohorts run
    above or below older ones at the same age. Quarter index is
    year*4 + quarter, pure integer arithmetic.

    Scale: first-order discovery is one map-side-combined MIN per
    customer, materialized ONCE (its two consumers — the fact join and
    the cohort-size rollup — would otherwise each re-plan the scan;
    plan_audit caught the 3x); the age rollup reduces facts to one row
    per (cohort, age) — a few hundred — before the running-sum window
    touches anything; the cohort-size dim broadcasts.
    """
    o = load_table(spark, sf_dir, "orders")
    qidx = ("CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) * 4"
            " + CAST((EXTRACT(month FROM o_orderdate) - 1) DIV 3"
            " AS BIGINT)")
    firsts = (o.groupBy("o_custkey")
              .agg(F.expr(f"MIN({qidx})").alias("cohort_q"))
              .localCheckpoint(eager=True))
    facts = (o.join(firsts, "o_custkey")
             .selectExpr("cohort_q",
                         f"{qidx} - cohort_q AS age_q",
                         f"{_O_CENTS} AS cents"))
    per_age = (facts.groupBy("cohort_q", "age_q")
               .agg(F.expr("CAST(SUM(cents) AS BIGINT)").alias("rev")))
    sizes = (firsts.groupBy("cohort_q")
             .agg(F.count(F.lit(1)).cast("bigint").alias("cohort_n")))
    w = (Window.partitionBy("cohort_q").orderBy("age_q")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (per_age.join(F.broadcast(sizes), "cohort_q")
            .select("cohort_q", "age_q", "cohort_n",
                    F.sum("rev").over(w).cast("bigint")
                    .alias("cum_rev_cents"))
            .orderBy("cohort_q", "age_q"))


_ERQ_PROBE = 500        # bounded ground-truth subset: partkeys < 500
_ERQ_THRESHOLD = 0.90


@register(
    "er_blocking_quality",
    oracle=f"""
    WITH probe AS (
      SELECT p_partkey, p_name, p_brand, p_size FROM part
      WHERE p_partkey < {_ERQ_PROBE}
    ),
    all_pairs AS (
      SELECT a.p_partkey AS src, b.p_partkey AS dst,
             (a.p_brand = b.p_brand AND a.p_size = b.p_size) AS blocked,
             jaro_winkler_similarity(a.p_name, b.p_name)
               >= {_ERQ_THRESHOLD} AS matched
      FROM probe a JOIN probe b ON a.p_partkey < b.p_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
             AS n_candidates,
           CAST(SUM(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_matches,
           CAST(SUM(CASE WHEN matched AND blocked THEN 1 ELSE 0 END)
                AS BIGINT) AS n_found,
           1.0 - CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS reduction_ratio,
           CAST(SUM(CASE WHEN matched AND blocked THEN 1 ELSE 0 END)
                AS DOUBLE)
             / CAST(SUM(CASE WHEN matched THEN 1 ELSE 0 END) AS DOUBLE)
             AS recall
    FROM all_pairs
    """,
    tags=("er", "eval", "fuzzy", "udf"),
)
def er_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality evaluation for the ER pipeline's (brand, size)
    scheme: REDUCTION RATIO (fraction of the cross product the blocks
    never score) and RECALL (fraction of true fuzzy matches retained),
    with ground truth from an EXHAUSTIVE Jaro-Winkler pass over a
    bounded probe subset (500 parts -> ~125k pairs). The eval half of
    entity resolution: er_resolve_pipeline trusts its blocks; this
    measures what that trust costs. One number pair per run — track
    it like a model metric.

    Scale: exhaustive ground truth is only computable on the bounded
    probe (that's why it's bounded BY CONSTRUCTION, like the kNN probe
    set); the production-size answer is reduction ratio from block
    statistics alone (exact at any scale: sum of per-block C(n,2))
    plus recall estimated on this probe — the standard ER
    methodology.
    """
    from .queries_ext12 import jw_column

    jw = jw_column(spark)
    part = load_table(spark, sf_dir, "part")
    probe = (part.filter(F.col("p_partkey") < _ERQ_PROBE)
             .select("p_partkey", "p_name", "p_brand", "p_size"))
    a = probe.selectExpr("p_partkey AS src", "p_name AS name_a",
                         "p_brand AS brand_a", "p_size AS size_a")
    b = probe.selectExpr("p_partkey AS dst", "p_name AS name_b",
                         "p_brand AS brand_b", "p_size AS size_b")
    pairs = (a.join(F.broadcast(b), F.col("src") < F.col("dst"))
             .withColumn("blocked",
                         (F.col("brand_a") == F.col("brand_b"))
                         & (F.col("size_a") == F.col("size_b")))
             .withColumn("matched",
                         jw("name_a", "name_b") >= _ERQ_THRESHOLD))
    return pairs.selectExpr(
        "CAST(COUNT(*) AS BIGINT) AS n_pairs",
        "CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_candidates",
        "CAST(SUM(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_true_matches",
        "CAST(SUM(CASE WHEN matched AND blocked THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_found",
        "1.0 - CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS DOUBLE)"
        " / CAST(COUNT(*) AS DOUBLE) AS reduction_ratio",
        "CAST(SUM(CASE WHEN matched AND blocked THEN 1 ELSE 0 END)"
        " AS DOUBLE)"
        " / CAST(SUM(CASE WHEN matched THEN 1 ELSE 0 END) AS DOUBLE)"
        " AS recall")
