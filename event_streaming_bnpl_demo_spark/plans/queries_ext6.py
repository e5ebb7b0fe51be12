"""Round-6 capability extensions: one-pass column profiling, exact
weighted median, common-neighbor link prediction, sliding-window
conversion rates, byte/char encoding ratios, and 2-D histograms.

Determinism doctrine as everywhere in the catalog: integer/decimal
arithmetic end-to-end (cents via FLOOR(x*100+0.5), per-mille ratios
via integer FLOOR division), so Spark and DuckDB agree bit-exactly
with no float summation order in play.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import register

_CENTS = "CAST(FLOOR({col} * 100 + 0.5) AS BIGINT)"


@register(
    "dq_column_profile",
    oracle="""
    SELECT 'o_orderstatus' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderstatus) AS VARCHAR) AS min_s,
           CAST(MAX(o_orderstatus) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           CAST(MIN(o_orderpriority) AS VARCHAR),
           CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_cents', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)),
           CAST(MIN(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS VARCHAR),
           CAST(MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS VARCHAR)
    FROM orders
    """,
    tags=("dq", "profile"),
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass multi-column profile (rows / nulls / exact distincts /
    min / max per column) — the data-catalog summary every ingestion
    pipeline publishes. ONE scan computes every column's aggregates
    into a single row, which is then unpivoted to the per-column
    layout driver-side-free; numeric min/max travel as integer cents
    so the string rendering is engine-independent.

    Scale: one scan + one multi-distinct aggregate; Catalyst expands
    the distincts via a single `expand` exchange, still O(rows) —
    profiling never pays per-column rescans.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(_CENTS.format(col="o_totalprice"))
    row = o.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count("o_orderstatus")).alias("null_st"),
        F.countDistinct("o_orderstatus").alias("nd_st"),
        F.min("o_orderstatus").cast("string").alias("min_st"),
        F.max("o_orderstatus").cast("string").alias("max_st"),
        (F.count(F.lit(1)) - F.count("o_orderpriority")).alias("null_pr"),
        F.countDistinct("o_orderpriority").alias("nd_pr"),
        F.min("o_orderpriority").cast("string").alias("min_pr"),
        F.max("o_orderpriority").cast("string").alias("max_pr"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("null_ck"),
        F.countDistinct("o_custkey").alias("nd_ck"),
        F.min("o_custkey").cast("string").alias("min_ck"),
        F.max("o_custkey").cast("string").alias("max_ck"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("null_tp"),
        F.countDistinct(cents).alias("nd_tp"),
        F.min(cents).cast("string").alias("min_tp"),
        F.max(cents).cast("string").alias("max_tp"),
    )
    return row.selectExpr("""
        stack(4,
          'o_orderstatus', n, null_st, nd_st, min_st, max_st,
          'o_orderpriority', n, null_pr, nd_pr, min_pr, max_pr,
          'o_custkey', n, null_ck, nd_ck, min_ck, max_ck,
          'o_totalprice_cents', n, null_tp, nd_tp, min_tp, max_tp)
        AS (col_name, n_rows, n_null, n_distinct, min_s, max_s)
    """)


@register(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS wt
      FROM lineitem
    ), g AS (
      SELECT l_returnflag, qty, SUM(wt) AS wt
      FROM w GROUP BY l_returnflag, qty
    ), c AS (
      SELECT l_returnflag, qty, wt,
             SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY qty
                           ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(wt) OVER (PARTITION BY l_returnflag) AS tot
      FROM g
    )
    SELECT l_returnflag, CAST(MIN(qty) AS BIGINT) AS median_qty
    FROM c WHERE 2 * cum >= tot
    GROUP BY l_returnflag
    """,
    tags=("agg", "robust", "weighted"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median: the smallest quantity whose cumulative
    price-weight reaches half the group's total — the
    revenue-weighted "typical order size", robust where the
    unweighted median (agg_median_exact) ignores row importance. All
    weights are integer cents; the value domain is pre-aggregated
    (one row per (group, qty)) so the window runs over |distinct
    values| rows, not |rows|.

    Scale: groupBy collapses to the value domain first — at 100 TB
    with a 50-value quantity domain the windowed relation is tiny
    regardless of row count; one exchange on the group key.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(FLOOR(l_quantity + 0.5) AS BIGINT)").alias("qty"),
        F.expr(_CENTS.format(col="l_extendedprice")).alias("wt"))
    g = li.groupBy("l_returnflag", "qty").agg(F.sum("wt").alias("wt"))
    w = Window.partitionBy("l_returnflag").orderBy("qty") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = (g.withColumn("cum", F.sum("wt").over(w))
         .withColumn("tot", F.sum("wt").over(
             Window.partitionBy("l_returnflag"))))
    return (c.filter(2 * F.col("cum") >= F.col("tot"))
            .groupBy("l_returnflag")
            .agg(F.min("qty").alias("median_qty")))


@register(
    "graph_common_neighbors",
    oracle="""
    WITH e AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), deg AS (
      SELECT p, COUNT(*) AS d FROM e GROUP BY p
    ), wedge AS (
      SELECT a.c AS c1, b.c AS c2, COUNT(*) AS n_common
      FROM e a JOIN e b ON a.p = b.p AND a.c < b.c
      JOIN deg ON deg.p = a.p AND deg.d <= 64
      GROUP BY a.c, b.c
    )
    SELECT c1, c2, CAST(n_common AS BIGINT) AS n_common
    FROM wedge
    ORDER BY n_common DESC, c1 ASC, c2 ASC
    LIMIT 20
    """,
    tags=("graph", "linkpred"),
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the customer–part
    bipartite graph: the top-20 customer pairs buying the most shared
    parts — the "similar buyers" wedge count. The pair expansion
    happens INSIDE a part bucket (never all-pairs); part degree is
    SF-stable (~30 customers/part at every testdata scale, because
    the part table grows with the fact tables), and hub parts
    (degree > 64) are excluded before expanding — the standard cap
    that bounds the worst bucket at 64^2 pairs: hubs connect to
    everyone, so their wedges carry no predictive signal while
    costing O(d^2). The same skew-capping posture as the
    inverted-index dedup (queries_llm.py); the cap is part of the
    operator's DEFINITION (both engines apply it), so the oracle
    agrees exactly. (The customer–SUPPLIER graph is the wrong
    substrate: supplier degree grows with SF — every wedge center
    becomes a hub — which is exactly what the degree audit catches.)

    Scale: per-part expansion bounded by the cap; the wedge aggregate
    is an O(wedges) groupBy; top-20 is TakeOrdered, no global sort.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    # hub cap as a count window over the per-part exchange (an
    # aggregate-and-join-back would re-plan the orders x lineitem
    # subtree once per wedge side); the capped edge set feeds both
    # wedge sides, so it is localCheckpointed exactly once — the same
    # structure as graph_jaccard_links
    e = (o.join(li, o.o_orderkey == li.l_orderkey)
         .select(F.col("o_custkey").alias("c"),
                 F.col("l_partkey").alias("p")).distinct()
         .withColumn("d", F.count(F.lit(1))
                     .over(Window.partitionBy("p")))
         .filter(F.col("d") <= 64).drop("d")
         .localCheckpoint(eager=True))
    a = e.select("p", F.col("c").alias("c1"))
    b = e.select("p", F.col("c").alias("c2"))
    wedges = (a.join(b, "p")
              .filter(F.col("c1") < F.col("c2"))
              .groupBy("c1", "c2")
              .agg(F.count(F.lit(1)).alias("n_common")))
    return (wedges.orderBy(F.desc("n_common"), F.asc("c1"), F.asc("c2"))
            .limit(20))


@register(
    "events_sliding_conversion",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      FROM events GROUP BY 1
    ), s AS (
      SELECT day,
             SUM(v) OVER (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY
                          PRECEDING AND CURRENT ROW) AS v7,
             SUM(p) OVER (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY
                          PRECEDING AND CURRENT ROW) AS p7
      FROM d
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(v7 AS BIGINT) AS views_7d, CAST(p7 AS BIGINT) AS buys_7d,
           CAST(CASE WHEN v7 > 0 THEN p7 * 1000 // v7 ELSE NULL END
                AS BIGINT) AS conv_permille
    FROM s
    """,
    tags=("events", "window", "funnel"),
)
def events_sliding_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day view→purchase conversion rate per day: daily
    counts first (the scale move — the window then runs over |days|
    rows, not |events|), then a RANGE frame in day units, ratio as
    integer per-mille. The KPI dashboard query every event pipeline
    serves continuously.

    Scale: one scan → per-day partial (map-side combined) → a window
    over the tiny day domain. Never a self-join, never a per-event
    window.
    """
    ev = load_table(spark, sf_dir, "events")
    d = (ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
         .agg(F.sum(F.when(F.col("event_type") == "view", 1)
                    .otherwise(0)).alias("v"),
              F.sum(F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)).alias("p")))
    w = (Window.orderBy(F.col("day").cast("timestamp").cast("long"))
         .rangeBetween(-6 * 86400, 0))
    s = d.select(
        "day", F.sum("v").over(w).alias("v7"), F.sum("p").over(w).alias("p7"))
    return s.select(
        F.col("day").cast("string").alias("day"),
        F.col("v7").alias("views_7d"), F.col("p7").alias("buys_7d"),
        F.expr("CAST(CASE WHEN v7 > 0 THEN p7 * 1000 div v7 "
               "ELSE NULL END AS BIGINT)").alias("conv_permille"))


@register(
    "llm_text_bytes_ratio",
    oracle="""
    SELECT lang,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(octet_length(encode(text))) * 1000 // SUM(length(text))
                AS BIGINT) AS bytes_per_char_permille
    FROM documents
    WHERE length(text) > 0
    GROUP BY lang
    """,
    tags=("llm", "text", "encoding"),
)
def llm_text_bytes_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF-8 bytes-per-character ratio per language — the encoding
    density signal a multilingual tokenizer budget needs (ASCII ≈
    1000‰, CJK ≈ 3000‰): byte and char totals are exact integers, the
    ratio is integer per-mille. Flags mislabeled-language and
    binary-contaminated documents when a lang's ratio sits far from
    its expected band.

    Scale: per-row length arithmetic inside codegen, one small-domain
    groupBy — O(bytes) scan cost, the floor for any text statistic.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0)
    return (d.groupBy("lang")
            .agg(F.sum(F.octet_length("text")).alias("total_bytes"),
                 F.sum(F.length("text")).alias("total_chars"))
            .select("lang", "total_bytes", "total_chars",
                    F.expr("CAST(total_bytes * 1000 div total_chars "
                           "AS BIGINT)").alias("bytes_per_char_permille")))


@register(
    "agg_hist2d",
    oracle="""
    SELECT CAST(FLOOR(value / 100) AS BIGINT) AS value_bucket,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    ORDER BY n DESC, value_bucket ASC, hour_of_day ASC
    LIMIT 20
    """,
    tags=("agg", "histogram"),
)
def agg_hist2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (value band × hour of day), top-20 densest cells
    — the joint-distribution heatmap behind anomaly dashboards.
    Buckets are fixed-width integer bins (no data-dependent NTILE
    boundaries, which tie-break nondeterministically), counts exact.

    Scale: map-side combine collapses to the tiny bucket domain
    before the exchange; top-20 is TakeOrdered.
    """
    ev = load_table(spark, sf_dir, "events")
    g = (ev.groupBy(
        F.expr("CAST(FLOOR(value / 100) AS BIGINT)").alias("value_bucket"),
        F.hour("ts").cast("bigint").alias("hour_of_day"))
        .agg(F.count(F.lit(1)).alias("n")))
    return g.orderBy(F.desc("n"), F.asc("value_bucket"),
                     F.asc("hour_of_day")).limit(20)
