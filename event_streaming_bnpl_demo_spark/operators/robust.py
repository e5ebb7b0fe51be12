"""Reusable cores of the data-shape-sensitive ext5 operators, split
out so property tests can drive them over ARBITRARY frames (the
oracle-parity suite only ever sees the fixture's distributions; the
hypothesis laws in tests/test_properties.py cover single-element
groups, constant series, extreme skew, and zero-weight corners).

Both are pure DataFrame->DataFrame transforms with the catalog's
determinism doctrine: exact integers everywhere, discrete medians
(a stored element at rank (n+1) div 2), fixed-point sqrt weights,
and integer division — bit-equal across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Fixed-point scale for mixture weights (floor(sqrt(n) * 1e6)).
WGT_SCALE = 1_000_000


def mad_outliers(daily: DataFrame, group_col: str, order_col: str,
                 value_col: str, k: int = 3) -> DataFrame:
    """Flag rows whose ``value_col`` deviates from the per-group
    discrete median by more than ``k`` × MAD (median absolute
    deviation), with MAD=0 degrading to a ``> 1`` guard so constant
    series never flag noise. Input rows are (group, order, value) —
    already-aggregated integers. Returns the flagged rows with the
    ``med`` and ``mad`` evidence columns attached.
    """
    from ..plans.queries_stats import _pct_pick

    pick = F.expr(_pct_pick(1, 2, "spark"))
    wr = Window.partitionBy(group_col).orderBy(value_col, order_col)
    wg = Window.partitionBy(group_col)
    med = (daily.withColumn("rn", F.row_number().over(wr))
           .withColumn("grp_n", F.count(F.lit(1)).over(wg))
           .groupBy(group_col)
           .agg(F.max(F.when(F.col("rn") == pick,
                             F.col(value_col))).alias("med")))
    dev = (daily.join(F.broadcast(med), group_col)
           .withColumn("dev", F.abs(F.col(value_col) - F.col("med"))))
    wrd = Window.partitionBy(group_col).orderBy("dev", order_col)
    mad = (dev.withColumn("rn", F.row_number().over(wrd))
           .withColumn("grp_n", F.count(F.lit(1)).over(wg))
           .groupBy(group_col)
           .agg(F.max(F.when(F.col("rn") == pick,
                             F.col("dev"))).alias("mad")))
    return (dev.join(F.broadcast(mad), group_col)
            .filter(F.col("dev") > F.greatest(k * F.col("mad"), F.lit(1)))
            .select(group_col, order_col, value_col, "med", "mad"))


def temperature_quotas(counts: DataFrame, budget: int) -> DataFrame:
    """Alpha=0.5 temperature quotas: given per-source holdings
    (source, n_total), return (source, n_total, n_keep) with
    n_keep = min(n_total, budget · w_s div Σw) and
    w_s = floor(sqrt(n_total) · 1e6) — exact-integer mixture
    flattening. Σ n_keep ≤ budget and 0 ≤ n_keep ≤ n_total by
    construction (floor leaves slack, never overshoots), and quotas
    are monotone in holdings.
    """
    w = counts.withColumn("wgt", F.expr(
        f"CAST(FLOOR(SQRT(CAST(n_total AS DOUBLE)) * {WGT_SCALE})"
        f" AS BIGINT)"))
    return (w.withColumn("total_w", F.sum("wgt").over(Window.partitionBy()))
            .select("source", "n_total",
                    F.least(F.col("n_total"),
                            F.expr(f"({budget} * wgt) div total_w"))
                    .cast("bigint").alias("n_keep")))
