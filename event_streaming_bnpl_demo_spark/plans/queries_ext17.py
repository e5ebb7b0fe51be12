"""Ext17 pack: revenue-concentration analytics and a payments-domain
checksum scalar — two oracled queries.

- ``q_pareto_concentration`` — the Pareto/Lorenz table: customers
  ranked by revenue, bucketed into deciles, with each decile's exact
  cumulative revenue share — "the top 10% of customers carry X% of
  revenue", the concentration readout every revenue team tracks
  (events_activity_gini summarizes the same curve to one number; this
  exposes the curve itself).
- ``scalar_luhn_checksum`` — Luhn check-digit generation and
  self-verification over synthetic 16-digit account numbers derived
  from order keys: THE payments-industry checksum (the reference is a
  BNPL payments demo; its ids are plain uuids — card-number handling
  is the obvious adjacent need). Pure integer digit arithmetic,
  unrolled to a fixed expression identical in both engines.

Reference parity note: beyond-reference extension tier (SURVEY.md
§2.2); domain grounding per producer/events's payment ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import register
from .queries_ext7 import _CENTS

_O_CENTS = _CENTS.format(col="o_totalprice")


@register(
    "q_pareto_concentration",
    oracle=f"""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM({_CENTS.format(col='o_totalprice')}) AS BIGINT) AS r
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT r,
             row_number() OVER (ORDER BY r DESC, o_custkey) AS rn,
             COUNT(*) OVER () AS n,
             CAST(SUM(r) OVER () AS BIGINT) AS total
      FROM rev
    ),
    deciles AS (
      SELECT CAST(CEIL(10.0 * rn / n) AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(r) AS BIGINT) AS rev_cents,
             MAX(total) AS total
      FROM ranked GROUP BY 1
    )
    SELECT decile, n_customers, rev_cents,
           CAST(CAST(SUM(rev_cents) OVER (ORDER BY decile
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE)
             / CAST(total AS DOUBLE) AS cum_share
    FROM deciles
    ORDER BY decile
    """,
    tags=("bi", "window", "concentration"),
)
def q_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/Lorenz revenue concentration: customers ranked by total
    spend (deterministic custkey tie-break), bucketed into deciles,
    each with its exact cumulative revenue share — the curve behind
    "80/20". Shares are single divisions of exact integer cumulative
    sums by the exact total, so every double hash-checks.

    Scale: facts reduce map-side to one row per customer; the global
    rank is the one inherent sort (over |customers|, not |orders| —
    and at extreme scale the decile boundaries come from a quantile
    sketch instead, trading exactness the same way
    agg_kll_quantiles documents); the decile rollup and the 10-row
    cumulative window are free afterwards.
    """
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    rev = (o.groupBy("o_custkey")
           .agg(F.expr(f"CAST(SUM({_O_CENTS}) AS BIGINT)").alias("r")))
    ranked = rev.select(
        "r",
        F.row_number().over(Window.orderBy(F.desc("r"), "o_custkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.expr("CAST(SUM(r) OVER () AS BIGINT)").alias("total"))
    deciles = (ranked
               .groupBy(F.expr("CAST(CEIL(10.0 * rn / n) AS BIGINT)")
                        .alias("decile"))
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                    F.sum("r").cast("bigint").alias("rev_cents"),
                    F.max("total").alias("total")))
    w = (Window.orderBy("decile")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (deciles.select(
        "decile", "n_customers", "rev_cents",
        (F.sum("rev_cents").over(w).cast("bigint").cast("double")
         / F.col("total").cast("double")).alias("cum_share"))
        .orderBy("decile"))


def _luhn_sum(expr: str, n_digits: int, div: str,
              double_parity: int) -> str:
    """Luhn weighted digit sum of an ``n_digits``-digit integer, as one
    unrolled expression (subtract 9 when a doubled digit exceeds 9).
    ``double_parity`` selects which right-0-indexed positions double:
    0 for a BASE about to receive a check digit (its digits shift one
    left, landing on the standard odd positions), 1 for validating a
    FULL number whose rightmost digit IS the check digit. ``div`` is
    the integer-division operator spelling ('DIV' or '//').
    """
    terms = []
    for i in range(n_digits):
        d = f"(({expr}) {div} {10 ** i}) % 10"
        if i % 2 == double_parity:
            terms.append(f"(2 * ({d}) - CASE WHEN ({d}) > 4 THEN 9"
                         f" ELSE 0 END)")
        else:
            terms.append(f"({d})")
    return " + ".join(terms)


_PAN_BASE = 400000_000000_000  # 15-digit synthetic account prefix


def _luhn_sql(div: str) -> str:
    base = f"{_PAN_BASE} + (o_orderkey % 1000000) * 7"
    s = _luhn_sum(f"({base})", 15, div, double_parity=0)
    check = f"(10 - (({s}) % 10)) % 10"
    pan = f"(({base}) * 10 + ({check}))"
    # verification: the full 16-digit number's Luhn total must be 0 —
    # digit positions shift one left, so the doubling parity flips
    verify_s = _luhn_sum(f"({pan})", 16, div, double_parity=1)
    return (f"SELECT o_orderkey, CAST({pan} AS BIGINT) AS pan,"
            f" CAST({check} AS BIGINT) AS check_digit,"
            f" CAST((({verify_s}) %% 10) AS BIGINT) AS luhn_residue"
            ).replace("%%", "%")


@register(
    "scalar_luhn_checksum",
    oracle=f"""
    WITH g AS (
      SELECT o_orderkey FROM orders WHERE o_orderkey < 200
    )
    {_luhn_sql('//').replace('SELECT o_orderkey,',
                             'SELECT g.o_orderkey,')}
    FROM g ORDER BY o_orderkey
    """,
    tags=("scalar", "payments", "checksum"),
)
def scalar_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn check-digit generation + self-verification for synthetic
    16-digit account numbers (15-digit base derived from the order
    key, check digit computed, then the FULL number re-validated —
    ``luhn_residue`` must be 0 for every row, which the oracle
    independently recomputes digit-by-digit). The payments-domain
    scalar (ISO/IEC 7812): card numbers, IMEIs, and many national ids
    checksum this way, and a BNPL ingest pipeline validates it at the
    edge. Pure unrolled integer digit arithmetic — 31 digit
    extractions per row, all inside whole-stage codegen, no UDF.

    Scale: a narrow bounded-probe map (200 rows by construction for
    the oracle; the expression itself is O(digits) per row and runs at
    full scan speed on any volume).
    """
    o = load_table(spark, sf_dir, "orders")
    sql = _luhn_sql("DIV")
    probe = o.filter(F.col("o_orderkey") < 200).select("o_orderkey")
    probe.createOrReplaceTempView("_luhn_probe")
    return spark.sql(f"{sql} FROM _luhn_probe ORDER BY o_orderkey")
