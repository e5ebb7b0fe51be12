"""Ext16 pack: nonparametric testing and robust rolling bands — two
oracled queries closing the session's applied-statistics tier.

- ``stat_mannwhitney_u`` — the Mann-Whitney U rank-sum test between
  two order-priority populations, with exact tie-averaged ranks kept
  in DOUBLED integer units (an average of two integers is a half-
  integer; doubling makes every rank arithmetic exact in BIGINT).
  The nonparametric two-sample test the t-test family can't cover on
  skewed revenue distributions.
- ``window_rolling_band`` — 7-day rolling exact p25/p75 band around
  the rolling median of daily revenue: the robust control-band that
  flags days breaking out of their own recent distribution. Same
  integer-interpolation determinism argument as window_rolling_median
  (integer cents below 2^52: both engines' linear interpolation
  incurs zero rounding).

Reference parity note: beyond-reference extension tier (SURVEY.md
§2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import register
from .queries_ext7 import _CENTS

_O_CENTS = _CENTS.format(col="o_totalprice")

_MW_A, _MW_B = "1-URGENT", "5-LOW"


@register(
    "stat_mannwhitney_u",
    oracle=f"""
    WITH vals AS (
      SELECT CASE WHEN o_orderpriority = '{_MW_A}' THEN 'a' ELSE 'b' END
               AS grp,
             {_CENTS.format(col='o_totalprice')} AS v
      FROM orders
      WHERE o_orderpriority IN ('{_MW_A}', '{_MW_B}')
    ),
    by_val AS (
      SELECT v,
             CAST(SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT)
               AS ca,
             CAST(COUNT(*) AS BIGINT) AS ct
      FROM vals GROUP BY v
    ),
    ranked AS (
      SELECT v, ca, ct,
             CAST(COALESCE(SUM(ct) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS below
      FROM by_val
    ),
    sums AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n1,
             CAST(SUM(ct - ca) AS BIGINT) AS n2,
             -- doubled tie-averaged rank of a value = 2*below + ct + 1
             CAST(SUM(ca * (2 * below + ct + 1)) AS BIGINT) AS r1x2
      FROM ranked
    )
    SELECT n1, n2,
           CAST((r1x2 - 2 * n1 * (n1 + 1) / 2) / 2.0 AS DOUBLE) AS u1,
           CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             - CAST((r1x2 - 2 * n1 * (n1 + 1) / 2) / 2.0 AS DOUBLE) AS u2,
           (CAST((r1x2 - 2 * n1 * (n1 + 1) / 2) / 2.0 AS DOUBLE)
              - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
             / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    * CAST(n1 + n2 + 1 AS DOUBLE) / 12.0) AS z_score
    FROM sums
    """,
    tags=("agg", "stats", "nonparametric"),
)
def stat_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test: do URGENT and LOW priority orders come
    from the same revenue distribution? Ranks are tie-averaged exactly
    by keeping them DOUBLED (2*rank is always an integer: a value with
    ``below`` smaller rows and ``ct`` ties has doubled average rank
    ``2*below + ct + 1``), so U and the rank sum are exact BIGINTs and
    the only floating point is the final z composition (no tie-variance
    correction — stated; ties are rare at cent granularity). The
    nonparametric complement to agg_chi2_independence and
    stat_bootstrap_ci in the testing toolbox.

    Scale: reduces to one row per DISTINCT value (map-side combined)
    before the rank window; the window is a single ordered pass over
    |distinct values| with a running count — never a per-row rank over
    the raw table. The final moment sum is a 3-value aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    vals = (o.filter(F.col("o_orderpriority").isin(_MW_A, _MW_B))
            .selectExpr(
                f"CASE WHEN o_orderpriority = '{_MW_A}' THEN 'a'"
                f" ELSE 'b' END AS grp",
                f"{_O_CENTS} AS v"))
    by_val = (vals.groupBy("v")
              .agg(F.sum(F.when(F.col("grp") == "a", 1).otherwise(0))
                   .cast("bigint").alias("ca"),
                   F.count(F.lit(1)).cast("bigint").alias("ct")))
    ranked = by_val.selectExpr(
        "v", "ca", "ct",
        "CAST(COALESCE(SUM(ct) OVER (ORDER BY v"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        " AS BIGINT) AS below")
    sums = ranked.selectExpr(
        "CAST(SUM(ca) AS BIGINT) AS n1",
        "CAST(SUM(ct - ca) AS BIGINT) AS n2",
        "CAST(SUM(ca * (2 * below + ct + 1)) AS BIGINT) AS r1x2")
    return sums.selectExpr(
        "n1", "n2",
        "CAST((r1x2 - 2 * n1 * (n1 + 1) / 2) / 2.0 AS DOUBLE) AS u1",
        "CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
        " - CAST((r1x2 - 2 * n1 * (n1 + 1) / 2) / 2.0 AS DOUBLE) AS u2",
        "(CAST((r1x2 - 2 * n1 * (n1 + 1) / 2) / 2.0 AS DOUBLE)"
        "   - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)"
        " / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
        "        * CAST(n1 + n2 + 1 AS DOUBLE) / 12.0) AS z_score")


@register(
    "window_rolling_band",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
             CAST(SUM({_O_CENTS}) AS BIGINT) AS day_cents
      FROM orders GROUP BY 1, 2
    ),
    banded AS (
      SELECT d, yr, day_cents,
             quantile_cont(day_cents, 0.25) OVER w AS p25,
             quantile_cont(day_cents, 0.75) OVER w AS p75
      FROM daily
      WINDOW w AS (PARTITION BY yr ORDER BY d
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, day_cents, p25, p75,
           CASE WHEN CAST(day_cents AS DOUBLE) > p75 THEN 'above'
                WHEN CAST(day_cents AS DOUBLE) < p25 THEN 'below'
                ELSE 'inside' END AS band
    FROM banded
    ORDER BY day
    """,
    tags=("window", "ts", "robust"),
)
def window_rolling_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling interquartile band of daily revenue with a
    per-day above/inside/below flag — the robust control chart
    (window_rolling_median gives the centerline; this adds the band
    that makes it actionable). Exactness: integer-cent inputs keep
    Spark's percentile() and DuckDB's quantile_cont bit-equal through
    linear interpolation (sums and halvings of integers < 2^52 incur
    zero rounding at any frame size).

    Scale: identical posture to window_rolling_median — days collapse
    map-side to one row each, the window runs over ~365 rows per
    year partition, never a global single-partition sort.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = (o.groupBy(
        F.to_date("o_orderdate").alias("d"),
        F.year("o_orderdate").cast("int").alias("yr"))
        .agg(F.expr(f"CAST(SUM({_O_CENTS}) AS BIGINT)").alias("day_cents")))
    frame = ("PARTITION BY yr ORDER BY d"
             " ROWS BETWEEN 6 PRECEDING AND CURRENT ROW")
    return (daily.selectExpr(
        "d", "day_cents",
        f"percentile(day_cents, 0.25) OVER ({frame}) AS p25",
        f"percentile(day_cents, 0.75) OVER ({frame}) AS p75")
        .selectExpr(
            "date_format(d, 'yyyy-MM-dd') AS day", "day_cents",
            "p25", "p75",
            "CASE WHEN CAST(day_cents AS DOUBLE) > p75 THEN 'above'"
            " WHEN CAST(day_cents AS DOUBLE) < p25 THEN 'below'"
            " ELSE 'inside' END AS band", "d")
        .orderBy("d").drop("d"))
