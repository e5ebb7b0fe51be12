"""Analytic (SQL window function) operator pack — ranking, lag/lead,
frames (SURVEY.md §2.2 "windows (analytic)").

Every window here partitions by a real key, so at scale each operator
is exactly one shuffle on that key plus a per-partition sort — the
optimal distributed plan for analytic windows. Unique columns break
ties in every ORDER BY, keeping results deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .catalog import register


@register(
    "window_rank",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
           DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk,
           ROW_NUMBER() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS rn,
           NTILE(4) OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number / ntile per nation. rank and
    dense_rank are tie-stable (value-determined); row_number and ntile
    get a unique tie-break key."""
    c = load_table(spark, sf_dir, "customer")
    by_bal = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    stable = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_nationkey", "c_custkey", "c_acctbal",
        F.rank().over(by_bal).alias("rnk"),
        F.dense_rank().over(by_bal).alias("drnk"),
        F.row_number().over(stable).alias("rn"),
        F.ntile(4).over(stable).alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(event_type) OVER w AS first_type,
           value - COALESCE(lag(value) OVER w, 0.0) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value over each user's event timeline (the
    per-user session analytics the reference's MySQL layer never had)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_type").over(w).alias("first_type"),
        (F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)))
        .alias("delta"),
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
    tags=("window", "frame"),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (UNBOUNDED PRECEDING..CURRENT ROW
    frame). Decimal accumulation inside the frame keeps every prefix
    sum exact and engine-identical."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).over(frame)
         .cast("double").alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "window_sliding_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w3 AS DOUBLE)
             / CAST(COUNT(value) OVER w3 AS DOUBLE) AS moving_avg3,
           MAX(value) OVER w3 AS moving_max3
    FROM events
    WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame"),
)
def window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row sliding average/max per user (ROWS BETWEEN 2 PRECEDING)."""
    ev = load_table(spark, sf_dir, "events")
    w3 = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-2, Window.currentRow))
    return ev.select(
        "event_id", "user_id",
        (F.sum(F.col("value").cast("decimal(30,6)")).over(w3).cast("double")
         / F.count("value").over(w3).cast("double")).alias("moving_avg3"),
        F.max("value").over(w3).alias("moving_max3"),
    )
