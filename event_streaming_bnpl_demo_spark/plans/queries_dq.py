"""Data-quality audit pack: referential-integrity orphan counts, null
profiling, and key-uniqueness checks — the assertions a production
pipeline runs continuously over its tables (and gates deploys on).
The reference trusts its inputs entirely (no validation anywhere in
consumer/consumer.go); a 100 TB lake cannot.

All outputs are pure integer counts, so the driver hash-check is
trivially stable. Each check is a single aggregate or anti-join —
shapes Catalyst already executes optimally — the value of the pack is
the composed, named audit surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import register


@register(
    "dq_referential_orphans",
    oracle="""
    SELECT 'orders_without_customer' AS check_name,
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_violations
    UNION ALL
    SELECT 'lineitem_without_order',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'customer_without_nation',
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier_without_nation',
           (SELECT COUNT(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = s.s_nationkey))
    """,
    tags=("dq", "join"),
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: rows on the fact side of each
    foreign key with no matching dimension row, as one named-check
    relation. Zero everywhere on healthy data — the value is the
    continuously-runnable assertion, not the number.

    Scale: each check is one left-anti join; dimension sides broadcast
    (stats-gated), fact sides stream through without materializing
    violations — only counting them.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")

    def orphans(name: str, fact: DataFrame, fk: str,
                dim: DataFrame, pk: str) -> DataFrame:
        return (fact.join(dim, fact[fk] == dim[pk], "left_anti")
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(F.lit(name).alias("check_name"), "n_violations"))

    return (
        orphans("orders_without_customer", o, "o_custkey", c, "c_custkey")
        .union(orphans("lineitem_without_order", li, "l_orderkey",
                       o, "o_orderkey"))
        .union(orphans("customer_without_nation", c, "c_nationkey",
                       n, "n_nationkey"))
        .union(orphans("supplier_without_nation", s, "s_nationkey",
                       n, "n_nationkey"))
    )


@register(
    "dq_null_profile",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) - COUNT(ts) AS null_ts,
           COUNT(*) - COUNT(user_id) AS null_user_id,
           COUNT(*) - COUNT(event_type) AS null_event_type,
           COUNT(*) - COUNT(value) AS null_value,
           COUNT(*) - COUNT(props) AS null_props,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS ndv_event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_user_id
    FROM events
    """,
    tags=("dq", "agg"),
)
def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column null-rate + cardinality profile of the event log in one
    scan — the completeness fingerprint monitored per ingest batch
    (a null_ts spike means a producer dropped its clock; an
    ndv_event_type jump means schema drift).

    Scale: one pass, all counters partial-aggregated map-side; the
    two exact NDVs expand to the standard two-phase distinct plan
    (the approx twin for 100 TB monitoring is agg_approx_distinct).
    """
    ev = load_table(spark, sf_dir, "events")
    nn = F.count(F.lit(1))
    return ev.agg(
        nn.alias("n_rows"),
        (nn - F.count("ts")).alias("null_ts"),
        (nn - F.count("user_id")).alias("null_user_id"),
        (nn - F.count("event_type")).alias("null_event_type"),
        (nn - F.count("value")).alias("null_value"),
        (nn - F.count("props")).alias("null_props"),
        F.countDistinct("event_type").alias("ndv_event_type"),
        F.countDistinct("user_id").alias("ndv_user_id"),
    )


@register(
    "dq_key_uniqueness",
    oracle="""
    SELECT 'events.event_id' AS key_name,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(COUNT(*) FILTER (WHERE n > 1) AS BIGINT) AS n_dup_keys,
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_excess_rows
    FROM (SELECT event_id, COUNT(*) AS n FROM events GROUP BY event_id)
    UNION ALL
    SELECT 'orders.o_orderkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE n > 1) AS BIGINT),
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'documents.doc_id', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE n > 1) AS BIGINT),
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT doc_id, COUNT(*) AS n FROM documents GROUP BY doc_id)
    """,
    tags=("dq", "agg"),
)
def dq_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across three tables: distinct key
    count, number of duplicated keys, and how many excess rows the
    duplicates contribute — the assertion behind every idempotent
    ingest path (the engine's own event-log sink enforces this with
    content-hash ids, streaming/transforms.py).

    Scale: one count-per-key aggregate per table (map-side combined),
    then a single-row fold per table; no joins, no windows.
    """
    def check(name: str, df: DataFrame, key: str) -> DataFrame:
        per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
        return per_key.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
            .alias("n_dup_keys"),
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
            .alias("n_excess_rows"),
        ).select(F.lit(name).alias("key_name"),
                 "n_keys", "n_dup_keys", "n_excess_rows")

    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    d = load_table(spark, sf_dir, "documents")
    return (check("events.event_id", ev, "event_id")
            .union(check("orders.o_orderkey", o, "o_orderkey"))
            .union(check("documents.doc_id", d, "doc_id")))


@register(
    "dq_order_reconciliation",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                AS DECIMAL(30,4))) AS STRING) AS DOUBLE)
               AS line_total
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderstatus AS status,
           COUNT(*) AS n_orders,
           CAST(COUNT(*) FILTER (
             WHERE abs(o.o_totalprice - li.line_total) / o.o_totalprice
                   < 0.01) AS BIGINT) AS n_reconciled,
           CAST(COUNT(*) FILTER (
             WHERE abs(o.o_totalprice - li.line_total) / o.o_totalprice
                   >= 0.01) AS BIGINT) AS n_drifted
    FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
    GROUP BY o.o_orderstatus
    """,
    tags=("dq", "join", "agg"),
)
def dq_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact reconciliation: each order's header total compared
    to the exact-decimal sum of its line items, counted as reconciled
    (within 1%) or drifted, per order status — the cross-table
    consistency audit every warehouse runs between an aggregate table
    and its detail. (In THIS synthetic dataset header totals are
    generated independently of the lines, so the audit correctly
    reports near-total drift — the check's value is that it measures,
    not that it passes.)

    Determinism: line sums are decimal-exact, the 1% ratio test is
    identical double arithmetic on bit-equal inputs. Scale: one
    per-orderkey aggregate (map-side combined) + one co-keyed join +
    a per-status fold; at deploy the join is co-bucketed.
    """
    from .sqlcompat import dsum_sql

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    line = li.groupBy("l_orderkey").agg(
        F.expr(dsum_sql("l_extendedprice * (1 - l_discount)", 4))
        .alias("line_total"))
    drift = F.abs(F.col("o_totalprice") - F.col("line_total")) \
        / F.col("o_totalprice")
    return (
        o.join(line, o.o_orderkey == line.l_orderkey)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum(F.when(drift < 0.01, 1).otherwise(0))
             .alias("n_reconciled"),
             F.sum(F.when(drift >= 0.01, 1).otherwise(0))
             .alias("n_drifted"))
    )


@register(
    "dq_freshness",
    oracle="""
    SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS oldest_event,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS newest_event,
           CAST(date_diff('day', MIN(ts), MAX(ts)) AS BIGINT) AS span_days,
           COUNT(*) AS n_rows,
           CAST(COUNT(*) // (date_diff('day', MIN(ts), MAX(ts)) + 1)
                AS BIGINT) AS rows_per_day
    FROM events
    """,
    tags=("dq", "agg"),
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness audit: the event log's time bounds, span, and
    average daily volume in one scan — the first panel of every
    ingest-health dashboard (a stale newest_event means the pipeline
    stopped; a rows_per_day collapse means it is dropping data).

    Scale: a single partial-aggregated pass; MIN/MAX/COUNT ship one
    accumulator triple per task.
    """
    ev = load_table(spark, sf_dir, "events")
    span = F.datediff(F.max("ts"), F.min("ts"))
    return ev.agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss")
        .alias("oldest_event"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss")
        .alias("newest_event"),
        span.cast("bigint").alias("span_days"),
        F.count(F.lit(1)).alias("n_rows"),
        # Integer (floor) division on BOTH sides: DuckDB's
        # CAST(double AS BIGINT) rounds-to-nearest while Spark's
        # truncates, so a plain double ratio would be a latent
        # hash-mismatch whenever the fraction is >= .5. `//` in the
        # oracle and floor() here truncate identically (both operands
        # non-negative).
        F.floor(F.count(F.lit(1)) / (span + 1)).cast("bigint")
        .alias("rows_per_day"))
