"""Event-analytics pack: the product-analytics queries an event log
exists to answer — ordered conversion funnels, cohort retention, and
last-touch attribution. These generalize the reference's per-user
status reads (`main.go:118-158` renders one user's event-derived
state; these compute the same event-ordering logic corpus-wide).

All three are window formulations over ONE user-clustered exchange —
the per-user event ordering the reference achieves by polling a queue
is here a sort within the user partition, so the plans scale with
users × events-per-user, never events².

Ordering discipline: every window orders by (ts, event_id) — ts alone
would be nondeterministic under duplicate timestamps, and the two
engines would tie-break differently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .catalog import register
from .sqlcompat import dsum_sql


@register(
    "events_funnel",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS v
      FROM events
    ), c AS (
      SELECT e.user_id, u.v,
             MIN(CASE WHEN e.event_type = 'click' AND e.ts > u.v
                      THEN e.ts END)
               OVER (PARTITION BY e.user_id) AS c
      FROM events e JOIN (SELECT DISTINCT user_id, v FROM u) u
        ON e.user_id = u.user_id
    ), p AS (
      SELECT e.user_id, c.v, c.c,
             MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > c.c
                       AND e.ts <= c.v + INTERVAL 7 DAY
                      THEN e.ts END)
               OVER (PARTITION BY e.user_id) AS p
      FROM events e JOIN (SELECT DISTINCT user_id, v, c FROM c) c
        ON e.user_id = c.user_id
    ), per_user AS (
      SELECT DISTINCT user_id, v, c, p FROM p
    )
    SELECT COUNT(*) AS n_users,
           COUNT(v) AS n_viewed,
           COUNT(c) AS n_clicked,
           COUNT(p) AS n_converted,
           COUNT(c) / CAST(COUNT(v) AS DOUBLE) AS view_to_click,
           COUNT(p) / CAST(COUNT(c) AS DOUBLE) AS click_to_purchase
    FROM per_user
    """,
    tags=("events", "window", "funnel"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: first view → first click after that
    view → first purchase after that click and within 7 days of the
    view, per user; reported as corpus-wide stage counts and
    conversion rates. Strict event ordering (each stage must follow
    the previous *instance*, not just exist) is what separates a
    funnel from three independent filters.

    Scale: the three stage timestamps are chained window minima over
    the SAME user partitioning — one exchange of the event log, three
    Window operators riding it, then a global single-row aggregate.
    The oracle spells the chain as three joined CTEs; Spark computes
    it without any self-join.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "v", F.min(F.when(F.col("event_type") == "view",
                              F.col("ts"))).over(w))
        .withColumn(
            "c", F.min(F.when((F.col("event_type") == "click")
                              & (F.col("ts") > F.col("v")),
                              F.col("ts"))).over(w))
        .withColumn(
            "p", F.min(F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("c"))
                & (F.col("ts") <= F.col("v") + F.expr("INTERVAL 7 DAYS")),
                F.col("ts"))).over(w))
    )
    per_user = staged.select("user_id", "v", "c", "p").distinct()
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("v").alias("n_viewed"),
        F.count("c").alias("n_clicked"),
        F.count("p").alias("n_converted"),
        (F.count("c") / F.count("v").cast("double")).alias("view_to_click"),
        (F.count("p") / F.count("c").cast("double")).alias("click_to_purchase"),
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id,
             date_trunc('week', f.first_ts) AS cohort_week,
             date_diff('day', date_trunc('week', f.first_ts),
                       date_trunc('week', e.ts)) // 7 AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           COUNT(*) AS n_active
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
    tags=("events", "window", "retention"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users cohorted by the week of their
    first event, counted as active in each later week they produced
    any event — the (cohort_week, week_offset, n_active) matrix every
    retention dashboard draws.

    Scale: the first-event timestamp is a window minimum on the same
    user-clustered exchange the distinct-(user, week) dedup needs, so
    the event log shuffles once; the final aggregate runs on the
    already-small per-(user, week) rowset. datediff // 7 on
    week-truncated dates is integer-exact in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    act = (
        ev.withColumn("first_ts", F.min("ts").over(w))
        .select(
            "user_id",
            F.date_trunc("week", "first_ts").alias("cohort_ts"),
            F.date_trunc("week", "ts").alias("active_ts"))
        .select(
            "user_id", "cohort_ts",
            (F.datediff("active_ts", "cohort_ts") / 7)
            .cast("bigint").alias("week_offset"))
        .distinct()
    )
    return (
        act.groupBy(
            F.date_format("cohort_ts", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "events_attribution",
    oracle=f"""
    WITH attributed AS (
      SELECT value,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS attributed_type
      FROM events
      QUALIFY event_type = 'purchase'
    )
    SELECT COALESCE(attributed_type, '(none)') AS attributed_type,
           COUNT(*) AS n_purchases,
           {dsum_sql('value')} AS total_value
    FROM attributed
    GROUP BY 1
    """,
    tags=("events", "window", "attribution"),
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the most recent
    preceding non-purchase event of the same user; purchase value is
    summed per attributed channel. The as-of-self-join shape every
    attribution model starts from, expressed as a running
    last-non-null over the user's timeline (linear, no candidate
    pairs).

    Scale: one user-clustered exchange + in-partition sort carries the
    whole computation; the aggregate output is one row per event type.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    attributed = (
        ev.withColumn(
            "attributed_type",
            F.last(F.when(F.col("event_type") != "purchase",
                          F.col("event_type")), ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
    )
    return (
        attributed.groupBy(
            F.coalesce("attributed_type", F.lit("(none)"))
            .alias("attributed_type"))
        .agg(F.count(F.lit(1)).alias("n_purchases"),
             F.expr(dsum_sql("value")).alias("total_value"))
    )
