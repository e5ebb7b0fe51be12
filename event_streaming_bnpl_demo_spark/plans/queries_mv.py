"""Round-5 capability tier: incremental / materialized-view
maintenance and streaming topology generalizations.

The reference's projections (R8/R9, ``consumer/consumer.go:146-220``)
are single-table recompute-vs-incremental folds; this pack generalizes
them to the lakehouse capability they gesture at — keeping a JOIN+AGG
projection exactly equal to its batch recompute under appends, CDC
retractions, and streaming refresh, plus the engine-side
generalizations of the reference's cascade (R7,
``consumer/consumer.go:123-144``): one streaming scan fanned to N
sinks, and broadcast-state stream enrichment against a slowly-changing
dimension.

Every query's oracle is the plain BATCH SQL over the final table state
— the strongest possible check that incremental == recompute. All
delta arithmetic runs in decimal (exact, associative, order- and
partition-independent), so the maintained view is bit-equal to the
batch answer by construction, not within a tolerance; the exact
decimal is cast to double through the string round-trip idiom of
:mod:`.sqlcompat` on both engines.
"""

from __future__ import annotations

import shutil
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import register
from .queries_ext import _scratch, source_fingerprint, staged_parquet
from .sqlcompat import dsum_sql

# The exact-decimal -> double boundary used by every view below (same
# string round-trip as sqlcompat.dsum_sql, applied to an already-merged
# decimal instead of an aggregate).
_DEC_TO_DOUBLE = "CAST(CAST({col} AS STRING) AS DOUBLE)"


def _seg_partial(orders: DataFrame, dim: DataFrame,
                 scale: int = 2) -> DataFrame:
    """Partial JOIN+AGG state for the segment-revenue view: broadcast
    dim join + per-segment (count, exact decimal sum at ``scale``).
    Associative, so any base/delta split merges to the batch answer.
    Shared by mv_join_agg_maintain (scale 2), mv_avg_rewrite (scale 6,
    matching davg's idiom) and the split-invariance test."""
    return (orders.join(F.broadcast(dim),
                        orders.o_custkey == dim.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("pn"),
                 F.sum(F.col("o_totalprice").cast(f"decimal(30,{scale})"))
                 .alias("psum")))


def nation_fold_batch(dim: DataFrame, state_dir: str):
    """foreachBatch body of the streaming JOIN+AGG refresh: join the
    micro-batch to the broadcast customer dim and overwrite this
    batch's associative partial (count, exact decimal sum) per nation.
    Factored out so the exactly-once resume test drives the SAME fold
    the production query runs."""
    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        (batch.join(F.broadcast(dim), batch.o_custkey == dim.c_custkey)
         .groupBy("c_nationkey")
         .agg(F.count(F.lit(1)).alias("pn"),
              F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
              .alias("psum"))
         .write.mode("overwrite").parquet(f"{state_dir}/batch={batch_id}"))
    return fold_batch


def build_scd2_states(ev: DataFrame) -> DataFrame:
    """The SCD2 interval dimension used by stream_scd2_enrich: each
    user's NON-purchase activity becomes disjoint validity intervals
    (state, valid_from, valid_to) with a 9999 open-end sentinel.
    Factored out so the plan pin (test_stream_scd2_enrich_broadcasts_dim)
    pins the production construction, not a private copy."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim_src = ev.filter(F.col("event_type") != "purchase")
    return (
        dim_src.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull()
                | (F.col("event_type") != F.col("prev_type")))
        .select(
            F.col("user_id").alias("s_user"),
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.coalesce(F.lead("ts").over(w),
                       F.lit("9999-12-31 00:00:00")
                       .cast(dict(ev.dtypes)["ts"]))
            .alias("valid_to")))


def scd2_enrich_join(purchases: DataFrame, states: DataFrame) -> DataFrame:
    """The enrichment join: equality on user + validity-range predicate
    (intervals are disjoint, so at most one match); purchases before
    any state row keep state 'unknown'. Same code path for the static
    pin and the per-micro-batch streaming join."""
    return (purchases.join(
        F.broadcast(states),
        (purchases.user_id == states.s_user)
        & (purchases.ts >= states.valid_from)
        & (purchases.ts < states.valid_to),
        "left")
        .select("user_id", "ts", "value",
                F.coalesce("state", F.lit("unknown")).alias("state")))


@register(
    "mv_join_agg_maintain",
    oracle=f"""
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dsum_sql('o_totalprice')} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
    tags=("mv", "incremental", "join", "agg"),
)
def mv_join_agg_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained JOIN+AGG materialized view: the
    segment-revenue projection (orders ⋈ customer, grouped) is built
    from a BASE load (orders with o_orderkey % 5 != 0), then an append
    DELTA (the % 5 == 0 rows) is folded in by merging the delta's
    partial state into the stored view with one co-keyed full-outer
    join — the upsert a lakehouse MERGE runs on every refresh. The
    oracle is the one-shot batch recompute over ALL orders: exact
    equality, because count and decimal-sum partials are associative.
    Generalizes the reference's single-table projection fold (R8/R9)
    to a joined view — the shape stream_ts_rollup cannot express.

    Scale: the delta partial aggregates map-side before the merge, so
    the full-outer join moves |segments| rows per side, not |delta|;
    the dim side broadcasts; the stored view never rescans base facts.
    A 100 TB base is touched ONCE at view creation, every refresh
    after costs O(delta + view).
    """
    o = load_table(spark, sf_dir, "orders")
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    base_mv = _seg_partial(o.filter(F.col("o_orderkey") % 5 != 0), dim)
    delta_mv = _seg_partial(o.filter(F.col("o_orderkey") % 5 == 0), dim)
    zero_n = F.lit(0).cast("long")
    zero_d = F.lit("0").cast("decimal(30,2)")
    merged = (
        base_mv.alias("m")
        .join(delta_mv.alias("d"), "c_mktsegment", "full_outer")
        .select(
            F.col("c_mktsegment").alias("segment"),
            (F.coalesce(F.col("m.pn"), zero_n)
             + F.coalesce(F.col("d.pn"), zero_n)).alias("n_orders"),
            (F.coalesce(F.col("m.psum"), zero_d)
             + F.coalesce(F.col("d.psum"), zero_d)).alias("rev_dec")))
    return merged.select(
        "segment", "n_orders",
        F.expr(_DEC_TO_DOUBLE.format(col="rev_dec")).alias("revenue"))


@register(
    "mv_cdc_maintain",
    oracle=f"""
    WITH post AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
               AS status,
             o_totalprice
      FROM orders WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 11 = 0
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dsum_sql('o_totalprice')} AS revenue
    FROM post GROUP BY 1
    """,
    tags=("mv", "incremental", "cdc", "agg"),
)
def mv_cdc_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance under CDC retractions — the
    signed-multiplicity (Z-set) algebra: the status-revenue view is
    built over the full orders table, then a change feed of deletes
    (o_orderkey % 13 = 0), updates (% 7 = 0 among survivors → status
    'X': a -1 retraction of the old row plus a +1 insertion of the
    new), and inserts (copies of the % 11 = 0 rows) is folded in as
    ONE signed partial aggregate: SUM(w) corrects the count,
    SUM(w * decimal(price)) corrects the exact revenue. The oracle
    recomputes from scratch over the post-change table — exact
    equality because signed decimal partials are associative and
    invertible, which plain double sums are not. This is what
    separates view maintenance from append-only rollup: updates and
    deletes retract, nothing rescans.

    Scale: the change feed aggregates map-side to |status| signed
    rows; the merge join moves |view| rows. Groups whose count falls
    to zero drop out of the view, exactly as a batch recompute would
    drop them.
    """
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    price_dec = F.col("o_totalprice").cast("decimal(30,2)")

    base_mv = (o.groupBy(F.col("o_orderstatus").alias("status"))
               .agg(F.count(F.lit(1)).alias("pn"),
                    F.sum(price_dec).alias("psum")))

    def signed(df: DataFrame, w: int, status_col) -> DataFrame:
        return df.select(status_col.alias("status"),
                         F.lit(w).alias("w"),
                         (F.lit(w) * price_dec).alias("wprice"))

    deletes = signed(o.filter(k % 13 == 0), -1, F.col("o_orderstatus"))
    upd_src = o.filter((k % 7 == 0) & (k % 13 != 0))
    upd_old = signed(upd_src, -1, F.col("o_orderstatus"))
    upd_new = signed(upd_src, +1, F.lit("X"))
    inserts = signed(o.filter(k % 11 == 0), +1, F.col("o_orderstatus"))

    delta = (deletes.unionAll(upd_old).unionAll(upd_new).unionAll(inserts)
             .groupBy("status")
             .agg(F.sum("w").alias("dn"), F.sum("wprice").alias("dsum")))

    zero_n = F.lit(0).cast("long")
    zero_d = F.lit("0").cast("decimal(30,2)")
    merged = (
        base_mv.alias("m").join(delta.alias("d"), "status", "full_outer")
        .select(
            "status",
            (F.coalesce(F.col("m.pn"), zero_n)
             + F.coalesce(F.col("d.dn"), zero_n)).alias("n_orders"),
            (F.coalesce(F.col("m.psum"), zero_d)
             + F.coalesce(F.col("d.dsum"), zero_d)).alias("rev_dec")))
    return (merged.filter(F.col("n_orders") > 0)
            .select("status", "n_orders",
                    F.expr(_DEC_TO_DOUBLE.format(col="rev_dec"))
                    .alias("revenue")))


@register(
    "mv_avg_rewrite",
    oracle=f"""
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dsum_sql('o_totalprice', 6)}
             / CAST(COUNT(*) AS DOUBLE) AS avg_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
    tags=("mv", "incremental", "agg"),
)
def mv_avg_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-distributive aggregate maintained through its distributive
    decomposition: AVG cannot be merged from partial AVGs, so the view
    stores (exact decimal SUM, COUNT) and derives the average at read
    time — the standard MV rewrite for AVG/VAR/STDDEV. Base/delta
    split and merge as in mv_join_agg_maintain; the final division is
    the same double expression on both engines over identical exact
    inputs, hence bit-equal. (MIN/MAX are append-only distributive but
    NOT retractable — a deletion forces a per-group rescan; that
    honesty is why they are absent from the CDC view above.)

    Scale: identical topology to mv_join_agg_maintain — the rewrite
    changes the stored columns, not the data movement.
    """
    o = load_table(spark, sf_dir, "orders")
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    base_mv = _seg_partial(o.filter(F.col("o_orderkey") % 5 != 0), dim,
                           scale=6)
    delta_mv = _seg_partial(o.filter(F.col("o_orderkey") % 5 == 0), dim,
                            scale=6)
    zero_n = F.lit(0).cast("long")
    zero_d = F.lit("0").cast("decimal(30,6)")
    merged = (
        base_mv.alias("m")
        .join(delta_mv.alias("d"), "c_mktsegment", "full_outer")
        .select(
            F.col("c_mktsegment").alias("segment"),
            (F.coalesce(F.col("m.pn"), zero_n)
             + F.coalesce(F.col("d.pn"), zero_n)).alias("n_orders"),
            (F.coalesce(F.col("m.psum"), zero_d)
             + F.coalesce(F.col("d.psum"), zero_d)).alias("sum_dec")))
    avg_expr = (_DEC_TO_DOUBLE.format(col="sum_dec")
                + " / CAST(n_orders AS DOUBLE)")
    return merged.select("segment", "n_orders",
                         F.expr(avg_expr).alias("avg_price"))


@register(
    "mv_stream_join_agg",
    oracle=f"""
    SELECT c_nationkey AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dsum_sql('o_totalprice')} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
    tags=("mv", "stream", "join", "agg"),
)
def mv_stream_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING JOIN+AGG view maintenance: the order feed drains as
    four micro-batches (maxFilesPerTrigger=1 over a 4-file reshard);
    each ``foreachBatch`` joins its batch to the broadcast customer
    dimension and appends a per-batch partial (count, exact decimal
    sum) per nation; the final fold of partials IS the view. The
    oracle is the one-shot batch join+agg over all orders — exact
    equality under ANY batch boundaries, because the partial state is
    associative. This is the streaming refresh loop behind a joined
    continuous aggregate — stream_ts_rollup with a dimension join
    inside the micro-batch, which Structured Streaming's blocking
    aggregate modes cannot express incrementally without it.

    Idempotence: each micro-batch overwrites its own ``batch=<id>``
    subdirectory, so retries replace (never duplicate) partials.

    Scale: per-batch cost = one map-side-combined partial over the
    batch + a dim broadcast reused across batches; state is
    batches × |nations| rows, compacted by the terminal fold.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    work = _scratch(f"mvstream_{source_fingerprint(sf_dir)}")
    state_dir = f"{work}/state"
    in_dir = staged_parquet(o, "mvstream", sf_dir, 4)
    fold_batch = nation_fold_batch(dim, state_dir)
    q = (spark.readStream
         .schema("o_orderkey long, o_custkey long, o_totalprice double")
         .option("maxFilesPerTrigger", "1")
         .parquet(in_dir)
         .writeStream.foreachBatch(fold_batch)
         .option("checkpointLocation", f"{work}/ck")
         .trigger(availableNow=True).start())
    q.awaitTermination()

    partials = spark.read.option("basePath", state_dir).parquet(
        f"{state_dir}/batch=*")
    folded = (partials.groupBy("c_nationkey")
              .agg(F.sum("pn").alias("n_orders"),
                   F.sum("psum").alias("rev_dec")))
    return folded.select(
        F.col("c_nationkey").alias("nation"), "n_orders",
        F.expr(_DEC_TO_DOUBLE.format(col="rev_dec")).alias("revenue"))


def fanout_partials(batch: DataFrame) -> dict[str, DataFrame]:
    """The three per-micro-batch projections of the fan-out cascade,
    all folding the SAME (persisted) batch: per event-type, per user,
    per hour. Factored out so the shared-scan claim is pinnable —
    ``tests/test_plans.py`` asserts each partial's plan reads the
    cached relation (InMemoryTableScan), never a second source scan."""
    vdec = F.sum(F.col("value").cast("decimal(30,2)")).alias("psum")
    return {
        "by_type": batch.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("pn"), vdec),
        "by_user": batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("pn"), vdec),
        "hourly": batch.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("pn"), vdec),
    }


@register(
    "stream_fanout_cascade",
    oracle=f"""
    SELECT 'by_type' AS sink,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_rows,
           {dsum_sql('value')} AS total_value
    FROM events
    UNION ALL
    SELECT 'by_user',
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           {dsum_sql('value')}
    FROM events
    UNION ALL
    SELECT 'hourly',
           CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT),
           {dsum_sql('value')}
    FROM events
    """,
    tags=("stream", "fanout", "topology"),
)
def stream_fanout_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-sink streaming topology with a SHARED scan: one streaming
    read of the event feed fans out to three live projections — per
    event-type, per user, per hour — inside a single ``foreachBatch``
    (the batch is persisted once, each sink folds its own partial from
    the same in-memory scan, then unpersisted). The engine-side
    generalization of the reference's cascade (R7 derives one stream
    from another, ``consumer/consumer.go:123-144``): here N
    projections derive from ONE source without N source scans or N
    checkpoints. The result reports each sink's group count and exact
    value total; the oracle recomputes all three from the batch table
    — every sink saw every event exactly once.

    Scale: fan-out cost is one cached micro-batch scan + three
    map-side-combined partials; at 100 TB/day this is the difference
    between 1× and N× ingest bandwidth. One checkpoint governs all
    sinks, so they advance atomically.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    # Content-keyed work dir: repeat invocations resume the drained
    # checkpoint and reuse the partials (no uuid orphan per bench run).
    work = _scratch(f"fanout_{source_fingerprint(sf_dir)}")
    state = f"{work}/state"
    in_dir = staged_parquet(ev, "fanout", sf_dir, 4)

    def fan_batch(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        for sink, part in fanout_partials(batch).items():
            part.write.mode("overwrite").parquet(
                f"{state}/{sink}/batch={batch_id}")
        batch.unpersist()

    q = (spark.readStream
         .schema("event_id long, ts timestamp_ntz, user_id long, "
                 "event_type string, value double")
         .option("maxFilesPerTrigger", "1")
         .parquet(in_dir)
         .writeStream.foreachBatch(fan_batch)
         .option("checkpointLocation", f"{work}/ck")
         .trigger(availableNow=True).start())
    q.awaitTermination()

    def summarize(sink: str, key: str) -> DataFrame:
        parts = spark.read.option("basePath", f"{state}/{sink}").parquet(
            f"{state}/{sink}/batch=*")
        folded = parts.groupBy(key).agg(F.sum("psum").alias("gsum"))
        return (folded.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("gsum").alias("tot_dec"))
            .select(F.lit(sink).alias("sink"), "n_rows",
                    F.expr(_DEC_TO_DOUBLE.format(col="tot_dec"))
                    .alias("total_value")))

    return (summarize("by_type", "event_type")
            .unionAll(summarize("by_user", "user_id"))
            .unionAll(summarize("hourly", "h")))


_SCD_DIM_SQL = """
    WITH dim_src AS (
      SELECT user_id, ts, event_id, event_type
      FROM events WHERE event_type <> 'purchase'
    ), marked AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM dim_src
    ), states AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             COALESCE(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                      TIMESTAMP '9999-12-31 00:00:00') AS valid_to
      FROM marked
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
"""


@register(
    "stream_scd2_enrich",
    oracle=_SCD_DIM_SQL + f"""
    SELECT COALESCE(s.state, 'unknown') AS state,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           {dsum_sql('p.value')} AS total_value
    FROM (SELECT user_id, ts, value FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN states s
      ON p.user_id = s.user_id
     AND p.ts >= s.valid_from AND p.ts < s.valid_to
    GROUP BY 1
    """,
    tags=("stream", "scd", "join", "enrichment"),
)
def stream_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-state stream enrichment against a slowly-changing
    dimension: purchases stream in four micro-batches and each is
    enriched with the user's SCD2 state (the validity interval built
    from their NON-purchase activity — the last channel/state the user
    was in when the purchase landed). The dim is the type-2 interval
    table of ts_scd2_states composed with the stream-static join: an
    equality join on user_id plus the validity-range predicate, which
    matches at most one interval because intervals are disjoint by
    construction. Purchases before any state row keep state
    'unknown' (left join). The oracle runs the same interval lookup
    in batch over all events — streaming arrival slicing changes
    nothing.

    Scale: the dim broadcasts per micro-batch (its size is state
    CHANGES, not events); the stream side never shuffles. At dim sizes
    past the broadcast budget the same plan degrades to a user-keyed
    hash join — predicate and result unchanged.
    """
    ev = load_table(spark, sf_dir, "events")
    # the dim is STATIC for the whole run: materialize the SCD2 window
    # derivation once instead of re-planning it inside every
    # micro-batch's broadcast (4 batches re-ran the events window 4x —
    # 6.3 -> 5.8 s warm at sf1, 3.4 -> 2.6 s at sf0.1; the residual is
    # per-batch broadcast build + stream machinery)
    states = build_scd2_states(ev).localCheckpoint(eager=True)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value")
    work = _scratch(f"scd2e_{_uuid.uuid4().hex[:8]}")
    name = f"scd2e_{_uuid.uuid4().hex[:8]}"
    in_dir = staged_parquet(purchases, "scd2e", sf_dir, 4)

    stream = (spark.readStream
              .schema("user_id long, ts timestamp_ntz, value double")
              .option("maxFilesPerTrigger", "1")
              .parquet(in_dir))
    enriched = scd2_enrich_join(stream, states)
    q = (enriched.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", f"{work}/ck")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # Memory sink: rows live in the session, the checkpoint only holds
    # offsets for the now-terminated query — drop the scratch dir here
    # instead of orphaning one per invocation.
    shutil.rmtree(work, ignore_errors=True)
    return (spark.table(name).groupBy("state")
            .agg(F.count(F.lit(1)).alias("n_purchases"),
                 F.expr(dsum_sql("value")).alias("total_value")))


@register(
    "mv_topk_maintain",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    tags=("mv", "incremental", "topk"),
)
def mv_topk_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k as a selective monoid: topk(A ∪ B) = topk(topk(A) ∪
    topk(B)), so a top-10-orders-by-price view is maintained under an
    append by merging the stored top-10 with the DELTA's top-10 and
    re-selecting — k+k rows, never a rescan of base facts. The
    deterministic tiebreak (price DESC, key ASC) makes the selection a
    total order, so the maintained view is exactly the batch LIMIT 10.
    (Under DELETES top-k is NOT maintainable from k rows alone — a
    retracted member must be refilled from outside the view; real
    systems keep a k+slack buffer or rescan the group. Append-only is
    the honest scope, and it is this query's.)

    Scale: each partial is TakeOrdered (heap per partition + driver
    merge of k·partitions rows, no global sort — pinned); the merge
    re-selection runs over 2k rows.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    key = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    base_top = o.filter(F.col("o_orderkey") % 5 != 0).orderBy(*key).limit(10)
    delta_top = o.filter(F.col("o_orderkey") % 5 == 0).orderBy(*key).limit(10)
    return base_top.unionAll(delta_top).orderBy(*key).limit(10)


@register(
    "mv_incremental_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
    tags=("mv", "incremental", "distinct"),
)
def mv_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) maintained incrementally: distinct-count is not
    distributive — merging per-split distinct counts double-counts
    keys seen in both — so the view keeps its auxiliary state, the
    distinct (event_type, user_id) key relation, and an append folds
    in as |delta keys anti-join base keys| added per group. This is
    the honest cost statement for incremental distinct at 100 TB:
    auxiliary state is O(distinct keys), the per-refresh work is one
    co-keyed anti-join of the delta's keys against it (both sides
    pre-deduped map-side), and anything cheaper is a sketch
    (approx_count_distinct — the catalog's rows-only HLL twin). The
    oracle is the batch COUNT(DISTINCT) over all events.

    Scale: base keys build once; each refresh shuffles only the
    delta's deduped keys; the anti-join co-partitions on the key pair.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id",
                                                    "event_id")
    base = ev.filter(F.col("event_id") % 4 != 0)
    delta = ev.filter(F.col("event_id") % 4 == 0)
    base_keys = base.select("event_type", "user_id").distinct()
    new_keys = (delta.select("event_type", "user_id").distinct()
                .join(base_keys, ["event_type", "user_id"], "left_anti"))
    base_counts = (base_keys.groupBy("event_type")
                   .agg(F.count(F.lit(1)).alias("bn")))
    new_counts = (new_keys.groupBy("event_type")
                  .agg(F.count(F.lit(1)).alias("dn")))
    zero = F.lit(0).cast("long")
    return (base_counts.alias("b")
            .join(new_counts.alias("d"), "event_type", "full_outer")
            .select("event_type",
                    (F.coalesce(F.col("b.bn"), zero)
                     + F.coalesce(F.col("d.dn"), zero)).alias("n_users")))


@register(
    "mv_quantile_sketch",
    oracle="""
    WITH binned AS (
      SELECT o_orderpriority AS priority,
             CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2
    ), tot AS (
      SELECT priority, CAST(SUM(cnt) AS BIGINT) AS n FROM binned GROUP BY 1
    ), cum AS (
      SELECT priority, bin, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY priority ORDER BY bin)
                  AS BIGINT) AS c
      FROM binned
    )
    SELECT t.priority, t.n AS n_orders,
           MIN(CASE WHEN c.c >= (t.n + 1) // 2
                    THEN (c.bin + 1) * 1000 END) AS p50_upper,
           MIN(CASE WHEN c.c >= (19 * t.n + 19) // 20
                    THEN (c.bin + 1) * 1000 END) AS p95_upper
    FROM cum c JOIN tot t ON c.priority = t.priority
    GROUP BY 1, 2
    """,
    tags=("mv", "incremental", "sketch", "quantile"),
)
def mv_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles maintained through a MERGEABLE sketch: exact
    percentiles are not incrementally maintainable (a delta can move
    any rank), so the view stores a fixed-width histogram — (group,
    bin, count) with bin = floor(price/1000) — whose merge is plain
    count addition, and reads quantiles as the upper edge of the first
    bin whose cumulative count reaches ceil(q·n). Unlike t-digest/HLL,
    this sketch's approximation is DETERMINISTIC (a pure function of
    the data, independent of partitioning or merge order), so the
    oracle replicates the identical binning arithmetic in SQL and the
    gate checks exact equality — sketch-vs-sketch, with the
    bin-resolution error bound (<= one bin width) stated rather than
    hidden. Rank thresholds use integer arithmetic ((n+1)//2,
    (19n+19)//20) so both engines compare identical integers.

    This closes the maintainability taxonomy spanned by the mv pack:
    distributive (SUM/COUNT), algebraic (AVG), selective monoid
    (top-k), auxiliary-state (exact DISTINCT), and sketch-mergeable
    (quantiles) — each with its honest state/error trade-off.

    Scale: the histogram is |groups| x |occupied bins| rows (here
    5 x ~600); merge cost is bin-count addition, reads are one tiny
    cumulative window. A delta refresh never rescans base facts.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("bin"))

    def hist(df: DataFrame) -> DataFrame:
        return df.groupBy("priority", "bin").agg(
            F.count(F.lit(1)).alias("cnt"))

    base = hist(o.filter(F.col("bin") % 2 == 0))      # any split works:
    delta = hist(o.filter(F.col("bin") % 2 != 0))     # merge = addition
    merged = (base.unionAll(delta)
              .groupBy("priority", "bin").agg(F.sum("cnt").alias("cnt")))

    from pyspark.sql.window import Window
    wcum = (Window.partitionBy("priority").orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wtot = Window.partitionBy("priority")
    cum = (merged
           .withColumn("c", F.sum("cnt").over(wcum))
           .withColumn("n", F.sum("cnt").over(wtot)))
    p50_rank = (F.col("n") + 1) / F.lit(2)
    p95_rank = (19 * F.col("n") + 19) / F.lit(20)
    return (cum.groupBy("priority")
            .agg(F.first("n").alias("n_orders"),
                 F.min(F.when(F.col("c") >= F.floor(p50_rank),
                              (F.col("bin") + 1) * 1000)).alias("p50_upper"),
                 F.min(F.when(F.col("c") >= F.floor(p95_rank),
                              (F.col("bin") + 1) * 1000))
                 .alias("p95_upper")))


@register(
    "cdc_emit_changes",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS k, o_orderstatus AS st FROM orders
    ), new AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
               AS st
      FROM orders WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey + (SELECT MAX(o_orderkey) + 1 FROM orders),
             o_orderstatus
      FROM orders WHERE o_orderkey % 11 = 0
    )
    SELECT CASE WHEN n.k IS NULL THEN 'D'
                WHEN o.k IS NULL THEN 'I' ELSE 'U' END AS op,
           COALESCE(o.k, n.k) AS k,
           o.st AS status_old,
           n.st AS status_new
    FROM old o FULL OUTER JOIN new n ON o.k = n.k
    WHERE n.k IS NULL OR o.k IS NULL OR o.st <> n.st
    """,
    tags=("cdc", "mv", "join"),
)
def cdc_emit_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed EMISSION — the inverse of mv_cdc_maintain's
    apply direction: given two snapshots of a table (the same
    deterministic old/new states the CDC queries share), diff them
    into the minimal I/U/D feed with one co-keyed full-outer join —
    deletes are old-only keys, inserts new-only, updates keys whose
    tracked columns differ; unchanged rows emit nothing. Together
    with cdc_merge_upsert (apply) and mv_cdc_maintain (fold into an
    aggregate view) this closes the CDC loop: emit -> transport ->
    apply / maintain. This is what a lakehouse change-data-feed
    computes between table versions when the format does not record
    row-level deltas itself.

    Scale: one co-keyed exchange pair (old on key, new on key) — at
    deploy co-bucketed snapshots diff with zero exchanges; output is
    proportional to the CHANGES, never the table.
    """
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    # offset = max+1: keys start at 0, so a bare max offset maps key 0
    # onto the existing max key — caught by the emit/apply round-trip
    # law test, invisible to the oracle gate (both sides collide
    # identically)
    max_key = o.agg(F.max(k)).head()[0] + 1     # bounded 1-row scalar
    old = o.select(k.alias("k"), F.col("o_orderstatus").alias("st"))
    new = (
        o.filter(k % 13 != 0)
        .select(k.alias("k"),
                F.when(k % 7 == 0, "X").otherwise(F.col("o_orderstatus"))
                .alias("st"))
        .unionAll(o.filter(k % 11 == 0)
                  .select((k + F.lit(max_key)).alias("k"),
                          F.col("o_orderstatus").alias("st"))))
    j = old.alias("o").join(new.alias("n"),
                            F.col("o.k") == F.col("n.k"), "full_outer")
    return (j.filter(F.col("n.k").isNull() | F.col("o.k").isNull()
                     | (F.col("o.st") != F.col("n.st")))
            .select(
                F.when(F.col("n.k").isNull(), "D")
                .when(F.col("o.k").isNull(), "I")
                .otherwise("U").alias("op"),
                F.coalesce(F.col("o.k"), F.col("n.k")).alias("k"),
                F.col("o.st").alias("status_old"),
                F.col("n.st").alias("status_new")))


@register(
    "mv_stream_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    tags=("mv", "stream", "topk"),
)
def mv_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous top-k leaderboard: the order feed drains as four
    micro-batches and each ``foreachBatch`` writes only its batch's
    top-10 (TakeOrdered — k rows of state per batch, independent of
    batch size); the final merge re-selects over batches × k rows and
    equals the batch LIMIT 10 exactly, because top-k under a total
    order (price DESC, key ASC) is the selective monoid
    mv_topk_maintain proves in batch form. This is the streaming
    leaderboard every dashboard runs, with state that never grows past
    k·batches — versus a complete-mode streaming aggregation whose
    state would hold every key seen.

    Idempotence: each micro-batch overwrites its own ``batch=<id>``
    partial, so retries replace rather than duplicate.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    work = _scratch(f"mvstopk_{source_fingerprint(sf_dir)}")
    state_dir = f"{work}/state"
    in_dir = staged_parquet(o, "mvstopk", sf_dir, 4)

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        (batch.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
         .limit(10)
         .write.mode("overwrite").parquet(f"{state_dir}/batch={batch_id}"))

    q = (spark.readStream
         .schema("o_orderkey long, o_custkey long, o_totalprice double")
         .option("maxFilesPerTrigger", "1")
         .parquet(in_dir)
         .writeStream.foreachBatch(fold_batch)
         .option("checkpointLocation", f"{work}/ck")
         .trigger(availableNow=True).start())
    q.awaitTermination()

    partials = spark.read.option("basePath", state_dir).parquet(
        f"{state_dir}/batch=*")
    return (partials
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(10)
            .select("o_orderkey", "o_custkey", "o_totalprice"))
