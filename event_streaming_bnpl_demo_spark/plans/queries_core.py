"""Core relational operator pack (SURVEY.md §2.2: project/filter, joins,
aggregation, sort/limit, set ops, scalar functions, JSON/array ops).

Everything here is declarative DataFrame API — Catalyst supplies
predicate pushdown, column pruning, join strategy selection (broadcast
for the small dims), partial aggregation and AQE re-planning. Scale
notes per query are in the docstrings: each plan was chosen so a 100 TB
fact table shuffles at most once on its natural key, dimensions
broadcast, and scans prune columns/rows at the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table, maybe_broadcast
from .catalog import register
from .sqlcompat import davg_sql, dsum_sql

# --------------------------------------------------------------------------
# aggregation
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_discount <= 0.08
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (flagship).

    Scale: single hash-aggregate on low-cardinality keys — partial
    (map-side) aggregation collapses 100 TB of lineitem to a handful of
    rows per task before the one tiny shuffle; the `l_discount`
    predicate reaches the parquet scan as a pushed filter.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") <= 0.08)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr(dsum_sql("l_quantity")).alias("sum_qty"),
        F.expr(dsum_sql("l_extendedprice")).alias("sum_base_price"),
        F.expr(dsum_sql("l_extendedprice * (1 - l_discount)", 4)).alias("sum_disc_price"),
        F.expr(dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)).alias("sum_charge"),
        F.expr(davg_sql("l_quantity")).alias("avg_qty"),
        F.expr(davg_sql("l_extendedprice")).alias("avg_price"),
        F.expr(davg_sql("l_discount")).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "agg_group_basic",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {dsum_sql('value')} AS sum_value,
           {davg_sql('value')} AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
    tags=("agg",),
)
def agg_group_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped count/sum/avg/min/max + count_distinct over the event
    stream table — the batch shape of the reference's per-type fanout
    (consumer/consumer.go:122-181) turned into one hash aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.expr(dsum_sql("value")).alias("sum_value"),
        F.expr(davg_sql("value")).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct-aggregate; Catalyst expands to a two-phase aggregate
    (partial distinct per partition, then final) — no row explosion."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           COUNT(*) AS n_customers,
           {dsum_sql('c_acctbal')} AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg", "grouping-sets"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region->nation hierarchy. nation/region broadcast
    (25/5 rows; still tiny at 100 TB), so the only shuffle is the
    rollup aggregate itself."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             F.expr(dsum_sql("c_acctbal")).alias("sum_acctbal"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers", "sum_acctbal",
        )
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS sum_totalprice
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "grouping-sets"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE on two low-cardinality dimensions of orders."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.expr(dsum_sql("o_totalprice")).alias("sum_totalprice"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders", "sum_totalprice",
        )
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING' AND o_totalprice > 100000
    """,
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders⋈customer with predicates on both sides —
    Catalyst pushes each filter below the join; at 100 TB customer is
    the (bucketable) build side and AQE picks broadcast when the
    filtered side fits."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("o_totalprice") > 100000))
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@register(
    "join_left_outer",
    oracle=f"""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           COALESCE({dsum_sql('o_totalprice')}, 0.0) AS sum_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with no orders; count over
    the nullable side skips nulls in both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.expr(dsum_sql("o_totalprice")), F.lit(0.0)).alias("sum_spend"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
                FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer vs supplier counts —
    pre-aggregating both sides before the join keeps the outer join
    input tiny regardless of fact-table scale."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_customers"))
    sn = s.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_suppliers"))
    return (
        cn.join(sn, "nk", "full")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS rewrite) — emits each customer at most
    once, no payload from the probe side crosses the shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS) — customers with no urgent orders.
    The build side is filtered before the anti-join so the scan
    predicate pushes down and the hash table stays small."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT r_name AS region_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("join", "agg", "star"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-way star join: fact lineitem joined up the
    dimension chain.

    Scale: nation/region are broadcast (hinted); orders/customer take
    stats-based hints (sources.maybe_broadcast) that vanish once their
    measured size outgrows the threshold — past that, lineitem⋈orders
    is the only large shuffle, on the shared orderkey (shuffle-free if
    both are bucketed by it), and orders⋈customer shuffles the
    pre-joined (pruned) columns only.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = maybe_broadcast(load_table(spark, sf_dir, "orders"), sf_dir, "orders")
    c = maybe_broadcast(load_table(spark, sf_dir, "customer"), sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.expr(dsum_sql("l_extendedprice * (1 - l_discount)", 4)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .withColumnRenamed("r_name", "region_name")
    )


@register(
    "join_range_theta",
    oracle="""
    SELECT v.user_id AS user_id, v.event_id AS view_id,
           COUNT(p.event_id) AS n_purchases_within_1h
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND p.event_type = 'purchase'
     AND p.ts > v.ts
     AND p.ts <= v.ts + INTERVAL 1 HOUR
    WHERE v.event_type = 'view'
    GROUP BY v.user_id, v.event_id
    """,
    tags=("join", "theta"),
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/theta self-join: purchases within 1 h after each view,
    per user. The equi part (user_id) drives the hash join; the range
    predicate is applied as a post-join filter inside the same stage.

    Scale: keying the join on user_id bounds the theta comparison to
    one user's events; for skewed users AQE skew-join splits the
    partition. (A time-bucketed band join — key on (user_id,
    hour_bucket) and probe adjacent buckets — is the documented path if
    per-user rows are huge.)
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"))
    return (
        v.join(p, (v.user_id == p.p_user_id)
               & (p.p_ts > v.v_ts)
               & (p.p_ts <= v.v_ts + F.expr("INTERVAL 1 HOUR")))
        .groupBy("user_id", "view_id")
        .agg(F.count("p_id").alias("n_purchases_within_1h"))
    )


#: Inner backward as-of oracle (nearest prior view per purchase) —
#: shared by join_asof and the streaming stateful twin
#: (queries_stream.stream_asof_join), which must converge to the same
#: relation.
ASOF_ORACLE = """
    WITH cand AS (
      SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS p_ts,
             v.event_id AS view_id, v.ts AS v_ts,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM events p
      JOIN events v ON v.user_id = p.user_id
                   AND v.event_type = 'view' AND v.ts <= p.ts
      WHERE p.event_type = 'purchase'
    )
    SELECT purchase_id, user_id, view_id,
           CAST(date_diff('second', v_ts, p_ts) AS BIGINT) AS seconds_since_view
    FROM cand WHERE rn = 1
    """


@register(
    "join_asof",
    oracle=ASOF_ORACLE,
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the nearest prior view by
    the same user — the *linear* sort-merge formulation from
    operators.asof (union both sides tagged, one window pass per user
    ordered by ts, carry the last view forward with
    ``last(..., ignorenulls=True)``).

    Scale: ONE shuffle on user_id + a per-partition sort, independent
    of per-user history density — no candidate materialization. The
    quadratic candidate-join twin (:func:`join_asof_candidate`) is kept
    un-registered for cross-checking in tests.
    """
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts"))
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts"))
    merged = asof_join(p, v, on="user_id", left_ts="p_ts", right_ts="v_ts",
                       right_cols=["view_id", "v_ts"])
    return (
        # oracle is the inner as-of: purchases with no prior view drop
        merged.filter(F.col("view_id").isNotNull())
        .select(
            "purchase_id", "user_id", "view_id",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts"))
            .cast("bigint").alias("seconds_since_view"),
        )
    )


@register(
    "join_asof_forward",
    oracle="""
    WITH cand AS (
      SELECT v.event_id AS view_id, v.user_id AS user_id, v.ts AS v_ts,
             p.event_id AS purchase_id, p.ts AS p_ts,
             ROW_NUMBER() OVER (PARTITION BY v.event_id
                                ORDER BY p.ts ASC, p.event_id ASC) AS rn
      FROM events v
      JOIN events p ON p.user_id = v.user_id
                   AND p.event_type = 'purchase' AND p.ts >= v.ts
      WHERE v.event_type = 'view'
    )
    SELECT view_id, user_id, purchase_id,
           CAST(date_diff('second', v_ts, p_ts) AS BIGINT)
             AS seconds_to_purchase
    FROM cand WHERE rn = 1
    """,
    tags=("join", "asof"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each view matched to the nearest FOLLOWING
    purchase by the same user (time-to-convert) — the mirror of
    join_asof via ``direction="forward"``: the same union + single
    user-clustered window pass, with the frame flipped to
    [current row, unbounded following] and the first following
    purchase carried backward. Equal-timestamp ties keep the minimum
    (purchase_id, ts) struct, matching the oracle's ASC tie-break.

    Scale: identical profile to the backward plan — ONE shuffle on
    user_id + per-partition sort, no candidate materialization (the
    oracle's candidate join is the quadratic check-only shape).
    """
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id",
        F.col("ts").alias("v_ts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"))
    merged = asof_join(v, p, on="user_id", left_ts="v_ts", right_ts="p_ts",
                       right_cols=["purchase_id", "p_ts"],
                       direction="forward")
    return (
        merged.filter(F.col("purchase_id").isNotNull())
        .select(
            "view_id", "user_id", "purchase_id",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts"))
            .cast("bigint").alias("seconds_to_purchase"),
        )
    )


def join_asof_candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-join as-of formulation (range join + row_number()=1):
    O(prior views × purchases) per user before the pick. Kept OFF the
    catalog — tests cross-check it against the registered sort-merge
    plan (same oracle semantics)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts"))
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"))
    cand = p.join(v, (p.user_id == v.v_user_id) & (v.v_ts <= p.p_ts))
    w = Window.partitionBy("purchase_id").orderBy(F.desc("v_ts"), F.desc("view_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id", "user_id", "view_id",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts"))
            .cast("bigint").alias("seconds_since_view"),
        )
    )


# --------------------------------------------------------------------------
# sort / limit / top-k
# --------------------------------------------------------------------------


@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort",),
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — Spark plans ORDER BY + LIMIT as TakeOrdered
    (per-partition top-k then merge of k·partitions rows), never a full
    sort; unique o_orderkey tie-break keeps the cut deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn
    FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) t WHERE rn <= 3
    """,
    tags=("sort", "window"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment via ranking window — the
    standard distributed top-k-per-key: one shuffle on the group key,
    per-partition sort, early filter on rn."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
    )


# --------------------------------------------------------------------------
# set operations
# --------------------------------------------------------------------------


@register(
    "set_union_distinct",
    oracle="""
    SELECT user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      UNION
      SELECT user_id FROM events WHERE event_type = 'signup'
    ) t
    """,
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two event-type user sets."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: users who both purchased and hit an error."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT user_id, CAST(ts AS DATE) AS day FROM events
    WHERE event_type = 'view'
    EXCEPT
    SELECT user_id, CAST(ts AS DATE) AS day FROM events
    WHERE event_type = 'purchase'
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT at (user, day) grain: days a user viewed but did not
    purchase. Spark plans EXCEPT as an aggregate + left-anti join on
    the composite key."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").cast("date").alias("day"))
    b = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("date").alias("day"))
    return a.subtract(b)


@register(
    "set_dropdup",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
    tags=("setop",),
)
def set_dropdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a projected key pair (partial-agg dedup)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").dropDuplicates()


# --------------------------------------------------------------------------
# scalar function pack
# --------------------------------------------------------------------------


@register(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_name) AS name_lower,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           CONCAT('part-', CAST(p_partkey AS VARCHAR)) AS part_tag,
           split_part(p_type, ' ', 1) AS type_head
    FROM part
    WHERE p_name LIKE '%s%'
    """,
    tags=("scalar",),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar pack: upper/lower/substring/length/regexp_extract/
    concat/split + LIKE predicate (ref R14's concat generalized)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%s%"))
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_name").alias("name_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.concat(F.lit("part-"), F.col("p_partkey").cast("string")).alias("part_tag"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
    )


@register(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-06-01 00:00:00'
    """,
    tags=("scalar",),
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar pack (ref R15): date_add, date_format,
    date_trunc, year, unix epoch — all codegen'd builtins. Date values
    cross the oracle boundary as yyyy-MM-dd strings (SURVEY §7d: keep
    engine-local temporal types at the edges)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-06-01 00:00:00").cast("timestamp"))
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30),
                      "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
         .alias("order_month"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("order_epoch"),
    )


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           ABS(l_discount - l_tax) AS disc_tax_gap,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_band
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
    tags=("scalar",),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar pack: round/abs/greatest/least/mod/floor on identical
    per-row operands — bit-deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("disc_tax_gap"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_band"),
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT event_id,
           CASE WHEN value >= 150 THEN 'high'
                WHEN value >= 50  THEN 'mid'
                ELSE 'low' END AS value_band,
           COALESCE(NULLIF(event_type, 'error'), 'ERR') AS type_or_err,
           CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS purchase_value
    FROM events
    """,
    tags=("scalar",),
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional pack: CASE WHEN / coalesce / nullif (ref R13's NULL
    handling generalized)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") >= 150, "high")
         .when(F.col("value") >= 50, "mid")
         .otherwise("low").alias("value_band"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("ERR"))
         .alias("type_or_err"),
        F.when(F.col("event_type") == "purchase", F.col("value"))
         .otherwise(F.lit(0.0)).alias("purchase_value"),
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS prop_k,
           CASE WHEN CAST(props->>'$.k' AS BIGINT) > 50 THEN 'big' ELSE 'small' END AS k_band
    FROM events
    WHERE event_type IN ('click', 'view')
    """,
    tags=("scalar", "json"),
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON document access (ref R4's dynamic parse as a scalar op):
    get_json_object pushdown-friendly, no UDF."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view"))
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select(
        "event_id",
        k.alias("prop_k"),
        F.when(k > 50, "big").otherwise("small").alias("k_band"),
    )


@register(
    "array_ops",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           array_to_string(string_split(text, ' ')[1:3], '_') AS first3,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS BIGINT)
             AS n_long_tokens
    FROM documents
    """,
    tags=("scalar", "array"),
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order pack: split, size, slice+join, contains,
    lambda filter — all JVM-side (no Python)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.array_join(F.slice(toks, 1, 3), "_").alias("first3"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).cast("bigint")
         .alias("n_long_tokens"),
    )


@register(
    "join_asof_tolerance",
    oracle="""
    WITH cand AS (
      SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS p_ts,
             v.event_id AS view_id, v.ts AS v_ts,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM events p
      JOIN events v ON v.user_id = p.user_id
                   AND v.event_type = 'view'
                   AND v.ts <= p.ts
                   AND v.ts >= p.ts - INTERVAL 1 DAY
      WHERE p.event_type = 'purchase'
    )
    SELECT purchase_id, user_id, view_id,
           CAST(date_diff('second', v_ts, p_ts) AS BIGINT)
             AS seconds_since_view
    FROM cand WHERE rn = 1
    """,
    tags=("join", "asof"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a lookback tolerance (pandas merge_asof's
    ``tolerance``): a purchase only matches a view from the last 24 h —
    stale context is worse than none for attribution. Same linear
    sort-merge plan as join_asof; the tolerance is applied as a
    post-pick null-out, so no extra shuffle or candidate work.
    """
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"))
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"))
    merged = asof_join(p, v, on="user_id", left_ts="p_ts", right_ts="v_ts",
                       right_cols=["view_id", "v_ts"],
                       tolerance=F.expr("INTERVAL 1 DAY"))
    return (
        merged.filter(F.col("view_id").isNotNull())
        .select(
            "purchase_id", "user_id", "view_id",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts"))
            .cast("bigint").alias("seconds_since_view"),
        )
    )
