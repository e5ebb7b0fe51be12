"""Sixth operator batch: statistical aggregates made cross-engine
deterministic, arg-min/max selection, conditional aggregates, exact
median, and the ORC source format.

Native ``stddev``/``corr`` accumulate doubles in partition order, so
Spark and DuckDB can disagree in the last bits. Here every moment is
derived from decimal power sums (exact, associative) and the SAME
closed-form SQL text is evaluated by both engines, so the final
double arithmetic is bit-identical by construction — the sqlcompat
doctrine extended from first moments to second moments.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import register
from .sqlcompat import dsum_sql


def _var_samp_sql(x: str, scale: int) -> str:
    """Sample variance from decimal power sums: (S2 - S1^2/n)/(n-1).
    S1/S2 are exact; the closing double ops are textually identical on
    both engines, hence bit-equal."""
    s1 = dsum_sql(x, scale)
    s2 = dsum_sql(f"({x}) * ({x})", 2 * scale)
    return f"(({s2}) - ({s1}) * ({s1}) / COUNT(*)) / (COUNT(*) - 1)"


def _corr_sql(x: str, y: str, sx: int, sy: int) -> str:
    """Pearson correlation from exact cross/power sums."""
    sx1, sy1 = dsum_sql(x, sx), dsum_sql(y, sy)
    sxx = dsum_sql(f"({x}) * ({x})", 2 * sx)
    syy = dsum_sql(f"({y}) * ({y})", 2 * sy)
    sxy = dsum_sql(f"({x}) * ({y})", sx + sy)
    n = "COUNT(*)"
    return (f"({n} * ({sxy}) - ({sx1}) * ({sy1}))"
            f" / (SQRT({n} * ({sxx}) - ({sx1}) * ({sx1}))"
            f" * SQRT({n} * ({syy}) - ({sy1}) * ({sy1})))")


_VAR = _var_samp_sql("c_acctbal", 2)


@register(
    "agg_stats_moments",
    oracle=f"""
    SELECT c_mktsegment,
           {_VAR} AS var_acctbal,
           SQRT({_VAR}) AS stddev_acctbal,
           COUNT(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg", "stats"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev per segment via decimal power sums — the
    order-independent formulation of the second moment (native stddev
    is partition-order-dependent and would fail a value-hash compare).

    Scale: power sums are plain partial aggregates — map-side combine
    collapses each partition to (S1, S2, n) before one tiny shuffle;
    identical cost profile to SUM/COUNT at any data size.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.expr(_VAR).alias("var_acctbal"),
        F.expr(f"SQRT({_VAR})").alias("stddev_acctbal"),
        F.count(F.lit(1)).alias("n"),
    )


_CORR = _corr_sql("l_quantity", "l_extendedprice", 1, 2)


@register(
    "agg_stats_corr",
    oracle=f"""
    SELECT l_returnflag,
           {_CORR} AS corr_qty_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return
    flag, from exact cross/power sums (see module docstring); one
    shuffle of five exact accumulators per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr(_CORR).alias("corr_qty_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_minmax_by",
    oracle="""
    SELECT c_nationkey,
           max_by(c_name, c_acctbal) AS richest_customer,
           min_by(c_name, c_acctbal) AS poorest_customer,
           MAX(c_acctbal) AS max_bal,
           MIN(c_acctbal) AS min_bal
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("agg",),
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max/arg-min selection (max_by/min_by): the row attribute at
    the extreme value, without a join-back or window. Deterministic
    here because per-nation balance extremes are unique in the dataset
    (verified at every SF); a production pipeline would tiebreak via
    max_by(struct(bal, key)) on a unique key.

    Scale: max_by carries one (value, arg) pair per group through the
    partial aggregate — same shuffle profile as plain MAX.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.expr("max_by(c_name, c_acctbal)").alias("richest_customer"),
        F.expr("min_by(c_name, c_acctbal)").alias("poorest_customer"),
        F.max("c_acctbal").alias("max_bal"),
        F.min("c_acctbal").alias("min_bal"),
    )


@register(
    "agg_conditional",
    oracle="""
    SELECT user_id,
           CAST(count_if(event_type = 'purchase') AS BIGINT) AS n_purchases,
           CAST(count_if(value > 100.0) AS BIGINT) AS n_high_value,
           bool_or(event_type = 'error') AS had_error,
           bool_and(value >= 0.0) AS all_nonneg
    FROM events
    GROUP BY user_id
    """,
    tags=("agg",),
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates: count_if / bool_or / bool_and — the
    filtered-count idiom without self-joins or CASE scaffolding; all
    partial-aggregate friendly."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.expr("count_if(event_type = 'purchase')").alias("n_purchases"),
        F.expr("count_if(value > 100.0)").alias("n_high_value"),
        F.expr("bool_or(event_type = 'error')").alias("had_error"),
        F.expr("bool_and(value >= 0.0)").alias("all_nonneg"),
    )


@register(
    "agg_median_exact",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity) AS median_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group. Safe to hash-compare because quantities
    are small integer-valued doubles: the even-count midpoint (a+b)/2
    and the interpolated form a+0.5*(b-a) are both exact FP arithmetic
    on such inputs, so the engines agree bit-for-bit. (For general
    doubles, exact-median determinism needs a single agreed formula —
    use the power-sum moments or a discrete quantile instead.)

    Scale: exact median is the one aggregate here that buffers its
    group — Spark's percentile sorts per group post-shuffle. At 100 TB
    prefer approx_percentile (sketch, mergeable) unless exactness is a
    requirement.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "source_orc_scan",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("source",),
)
def source_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source: the orders table exported once to ORC and read back
    with predicate/column pushdown (ORC supports both, like parquet) —
    proving the engine's source surface is format-plural. The filter is
    applied on the ORC read side, not the export side."""
    out = os.path.join(tempfile.gettempdir(),
                       f"spark_graft_orc_{os.path.basename(sf_dir.rstrip('/'))}")
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    src.write.mode("overwrite").orc(out)
    return (spark.read.orc(out)
            .filter(F.col("o_orderstatus") == "F"))


def _pct_pick(p_num: int, p_den: int, dialect: str = "spark") -> str:
    """Discrete-percentile row index: ceil(p*n) in pure integer
    arithmetic. Integer division spells DIV in Spark, // in DuckDB —
    the only token that differs."""
    div = "DIV" if dialect == "spark" else "//"
    return f"(({p_num} * grp_n + {p_den} - 1) {div} {p_den})"


@register(
    "agg_percentiles_disc",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS grp_n
      FROM events
    )
    SELECT event_type,
           CAST(grp_n AS BIGINT) AS n,
           MAX(CASE WHEN rn = {_pct_pick(1, 2, 'duckdb')} THEN value END)
             AS p50,
           MAX(CASE WHEN rn = {_pct_pick(9, 10, 'duckdb')} THEN value END)
             AS p90,
           MAX(CASE WHEN rn = {_pct_pick(99, 100, 'duckdb')} THEN value END)
             AS p99
    FROM ranked
    GROUP BY event_type, grp_n
    """,
    tags=("agg", "stats"),
)
def agg_percentiles_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCRETE percentiles (p50/p90/p99 of event value per
    type): the value at row ceil(p·n) of the sorted group — an actual
    stored element, never an interpolated float, so the result is
    hash-safe for arbitrary doubles (the caveat agg_median_exact's
    docstring raises is closed by picking instead of interpolating).

    Scale: one sort within the type-clustered exchange; the selecting
    aggregate rides the same clustering (no second shuffle). Exact
    percentiles buffer the partition at 100 TB — prefer the
    approx_percentile sketch (rows-only twin) unless exactness is
    contractual; this shape is also what a range-partitioned global
    percentile reduces to per partition.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wp = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("grp_n"))
    pick = lambda num, den: F.max(  # noqa: E731 - local one-liner
        F.when(F.col("rn") == F.expr(_pct_pick(num, den)), F.col("value")))
    return (
        ranked.groupBy("event_type", "grp_n")
        .agg(pick(1, 2).alias("p50"),
             pick(9, 10).alias("p90"),
             pick(99, 100).alias("p99"))
        .select("event_type", F.col("grp_n").cast("bigint").alias("n"),
                "p50", "p90", "p99")
    )


def _zscore_parts() -> tuple[str, str]:
    """(mean, var) closed forms from windowed decimal power sums —
    identical SQL text for both engines."""
    from .sqlcompat import dsum_over_sql

    s1 = dsum_over_sql("value", "event_type", 4)
    s2 = dsum_over_sql("value * value", "event_type", 4)
    n = "CAST(COUNT(value) OVER (PARTITION BY event_type) AS DOUBLE)"
    mean = f"(({s1}) / {n})"
    var = f"((({s2}) - ({s1}) * ({s1}) / {n}) / ({n} - 1.0))"
    return mean, var


def _outlier_oracle() -> str:
    mean, var = _zscore_parts()
    return f"""
    WITH flagged AS (
      SELECT event_type, value,
             {mean} AS mu,
             {var} AS var
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_outliers,
           MIN(value) AS min_outlier,
           MAX(value) AS max_outlier
    FROM flagged
    WHERE (value - mu) * (value - mu) > 9 * var
    GROUP BY event_type
    """


@register(
    "agg_outlier_zscore",
    oracle=_outlier_oracle(),
    tags=("agg", "stats", "window"),
)
def agg_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outlier detection per event type: per-row mean and
    variance come from windowed decimal power sums (exact,
    order-independent), the outlier predicate is the SAME closed-form
    text on both engines — (value-mean)² > 9·var — so which rows
    qualify is bit-deterministic, the property float anomaly gates
    usually lack across engines. Output: per-type outlier counts and
    extremes.

    Scale: ONE type-clustered exchange carries the power-sum windows,
    the filter, and the final rollup; nothing materializes except the
    outliers' aggregate. (At 100 TB the same expressions run as a
    two-pass agg+broadcast-join if the per-type row sets exceed memory
    — the window form is the single-shuffle variant.)
    """
    ev = load_table(spark, sf_dir, "events")
    mean, var = _zscore_parts()
    flagged = ev.select(
        "event_type", "value",
        F.expr(mean).alias("mu"),
        F.expr(var).alias("var"))
    return (
        flagged.filter(F.expr("(value - mu) * (value - mu) > 9 * var"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"),
             F.min("value").alias("min_outlier"),
             F.max("value").alias("max_outlier"))
    )




@register(
    "agg_mode_exact",
    oracle="""
    WITH counted AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY COUNT(*) DESC, c_mktsegment)
               AS rn
      FROM customer
      GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey,
           c_mktsegment AS mode_segment,
           n AS mode_count
    FROM counted WHERE rn = 1
    """,
    tags=("agg", "stats"),
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MODE (most frequent value) per group — the aggregate SQL
    engines expose as mode() but with engine-specific tie behavior;
    here the tie is pinned explicitly (highest count, then smallest
    value), so the result is deterministic and cross-engine
    hash-safe. Implemented as count-then-pick, the only MODE shape
    that distributes: count per (group, value), then a row_number
    window on the already-aggregated counts.

    Scale: the expensive pass is the (group, value) count — map-side
    combined, one shuffle; the pick window runs on group × distinct
    values rows. A sketch alternative (approx_top_k) would replace
    the exact count at 100 TB if the value domain were unbounded.
    """
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "customer")
    counted = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("n"), F.asc("c_mktsegment"))
    return (counted.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("c_nationkey",
                    F.col("c_mktsegment").alias("mode_segment"),
                    F.col("n").alias("mode_count")))


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS members_csv,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("agg", "collect"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collection aggregates: array_agg and listagg
    (string_agg) per group — nondeterministic by default under
    partition-parallel collection, made deterministic the only
    portable way: collect then sort INSIDE the aggregate expression
    (sort_array / ORDER BY in the aggregate), so output order is a
    property of the data, not the partitioning. The collected list
    crosses the comparison boundary as a csv string (concat_ws /
    string_agg): catalog invariant — no top-level array/map columns,
    the driver's canonicalizer cannot hash them.

    Scale: collect_list buffers its group — fine for bounded groups
    (dimension rollups like this); for unbounded groups prefer top-k
    truncation (slice(sort_array(...), 1, k)) or the explode-join
    shape. One partial-aggregated shuffle either way.
    """
    n = load_table(spark, sf_dir, "nation")
    members = F.sort_array(F.collect_list("n_name"))
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", members).alias("members_csv"),
        F.count(F.lit(1)).alias("n_members"))
