"""ext27: the one-scan covariance/correlation matrix —

``agg_covariance_matrix`` computes the full 4x4 sample
covariance+correlation matrix of the lineitem measures (quantity,
extended price, discount, tax) in ONE fact scan: every first moment,
square, and cross product accumulates as an exact integer
(cents/centi-points in BIGINT, products in DECIMAL(38,0)), and the
10 matrix cells then decode from the single moment row via a broadcast
pair spine — never re-touching the fact table. This is the
feature-covariance prep every ML pipeline runs before whitening /
feature pruning, and the matrix generalization of ``agg_stats_corr``
(one pair, grouped).

Reference parity: none of this exists in the reference (615-LoC Go
CQRS demo); SURVEY.md §2.2 capability-superset tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import register

#: (name, exact-integer expression) — identical text in both engines.
_MEASURES: tuple[tuple[str, str], ...] = (
    ("qty", "CAST(l_quantity AS BIGINT)"),
    ("price_cents", "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"),
    ("disc_cp", "CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)"),
    ("tax_cp", "CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT)"),
)

_NAMES = [n for n, _ in _MEASURES]
_PAIRS = [(a, b) for i, a in enumerate(_NAMES) for b in _NAMES[i:]]


def _moment_sum_list() -> list[str]:
    """SUM list: 4 first moments + 10 exact cross/square products."""
    parts = [f"SUM(m_{n}) AS s_{n}" for n in _NAMES]
    parts += [
        f"SUM(CAST(m_{a} AS DECIMAL(38,0)) * m_{b}) AS x_{a}__{b}"
        for a, b in _PAIRS]
    return parts


def _moment_sums() -> str:
    return ", ".join(_moment_sum_list())


def _case(role: str, key: str, lookup: dict[str, str]) -> str:
    """Dialect-free CASE decode of a moment column by spine name."""
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in lookup.items())
    return f"(CASE {key} {whens} END) AS {role}"


#: The five decode projections — shared verbatim: joined for the
#: oracle's SELECT list, kept as a list for Spark's selectExpr (the
#: CASEs contain top-level commas, so the joined string can't be
#: re-split).
_DECODE_LIST = [
    _case("s1a", "ma", {n: f"s_{n}" for n in _NAMES}),
    _case("s1b", "mb", {n: f"s_{n}" for n in _NAMES}),
    _case("s2a", "ma", {n: f"x_{n}__{n}" for n in _NAMES}),
    _case("s2b", "mb", {n: f"x_{n}__{n}" for n in _NAMES}),
    _case("sab", "concat(ma, ':', mb)",
          {f"{a}:{b}": f"x_{a}__{b}" for a, b in _PAIRS}),
]
_DECODE = ", ".join(_DECODE_LIST)

def _dd(col: str) -> str:
    """DECIMAL(38,0) -> DOUBLE through the sqlcompat STRING round-trip:
    DuckDB's direct decimal->double cast double-rounds past 2^53 (the
    squared-cents sums here sit at ~5e18 by sf0.1 — measured 1-ulp
    variance divergence with the direct cast)."""
    return f"CAST(CAST({col} AS STRING) AS DOUBLE)"


#: Closed forms over exact moments, identical double text both sides.
_COV = (f"({_dd('sab')} - CAST(s1a AS DOUBLE) * CAST(s1b AS DOUBLE)"
        " / n) / (n - 1)")
_DEN = (f"SQRT(({_dd('s2a')} - CAST(s1a AS DOUBLE) * s1a / n)"
        f" * ({_dd('s2b')} - CAST(s1b AS DOUBLE) * s1b / n))")
_CORR = (f"({_dd('sab')} - CAST(s1a AS DOUBLE) * CAST(s1b AS DOUBLE)"
         f" / n) / ({_DEN})")

_SPINE_SQL = " UNION ALL ".join(
    f"SELECT '{a}' AS ma, '{b}' AS mb" for a, b in _PAIRS)

_COV_ORACLE = f"""
WITH base AS (
  SELECT {', '.join(f'{expr} AS m_{n}' for n, expr in _MEASURES)}
  FROM lineitem
), mom AS (
  SELECT COUNT(*) AS n, {_moment_sums()} FROM base
), spine AS ({_SPINE_SQL}
), cells AS (
  SELECT ma, mb, n, {_DECODE}
  FROM mom CROSS JOIN spine
)
SELECT ma AS measure_a, mb AS measure_b,
       CAST(n AS BIGINT) AS n,
       ROUND({_COV}, 6) AS cov,
       ROUND({_CORR}, 6) AS corr
FROM cells
"""


@register("agg_covariance_matrix", oracle=_COV_ORACLE,
          tags=("agg", "stats", "matrix"))
def agg_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full sample covariance + correlation matrix of the four lineitem
    measures in ONE scan: quantity, price cents, discount and tax
    centi-points accumulate 4 first moments and 10 exact cross/square
    products (each addend an integer product; the SUM in DECIMAL(38,0)
    because 100 TB of cent-products overflows BIGINT), and the matrix
    cells decode from the single moment row against a broadcast 10-pair
    spine — a CASE projection, never a re-scan. Diagonal cells read
    corr = 1 and cov = sample variance, off-diagonals the cross terms
    every whitening / multicollinearity check consumes. The closed
    forms run once per cell in identical double text (SQRT admissible
    per the transcendental doctrine), under ROUND(6).

    Scale: one map-side-combinable aggregate over the fact table, then
    arithmetic on 10 rows; adding a 5th measure grows the moment list,
    not the scan count.
    """
    base = load_table(spark, sf_dir, "lineitem").selectExpr(
        *[f"{expr} AS m_{n}" for n, expr in _MEASURES])
    mom = base.selectExpr("COUNT(*) AS n", *_moment_sum_list())
    spine = spark.createDataFrame(_PAIRS, "ma string, mb string")
    cells = mom.crossJoin(F.broadcast(spine)).selectExpr(
        "ma", "mb", "n", *_DECODE_LIST)
    return cells.selectExpr(
        "ma AS measure_a", "mb AS measure_b",
        "CAST(n AS BIGINT) AS n",
        f"ROUND({_COV}, 6) AS cov",
        f"ROUND({_CORR}, 6) AS corr")
