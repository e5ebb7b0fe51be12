"""Round-4 extension pack: null-safe join semantics, interval-coverage
(sweep-line) analytics, weight-biased deterministic sampling, and
watermark-bounded streaming dedup.

Each query keeps the catalog invariants: integer/string outputs (or the
``sqlcompat`` decimal idioms) so the driver value-hash is bit-stable,
and a plan that stays one-exchange / broadcast-shaped at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .catalog import register


@register(
    "join_null_safe",
    oracle="""
    WITH keyed AS (
      SELECT NULLIF(event_type, 'error') AS k, user_id FROM events
    ),
    dim AS (
      SELECT DISTINCT k, COALESCE(k, '(errors)') AS bucket FROM keyed
    )
    SELECT d.bucket AS bucket,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM keyed e JOIN dim d ON e.k IS NOT DISTINCT FROM d.k
    GROUP BY d.bucket
    """,
    tags=("join", "null"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): the
    join key is NULL for one class of rows ('error' events) and a
    plain equi-join would silently drop them — the null-safe predicate
    keeps NULL==NULL matches, the semantics every dimension lookup
    with an "unknown" bucket needs.

    Scale: EqualNullSafe is still an equi-join predicate to Spark, so
    the tiny derived dimension broadcasts and the fact side streams
    through one BroadcastHashJoin — null-safety costs nothing over
    ``=``.
    """
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(F.expr("NULLIF(event_type, 'error')").alias("k"),
                      "user_id")
    dim = (keyed.select("k").distinct()
           .select("k", F.coalesce("k", F.lit("(errors)")).alias("bucket")))
    return (keyed.alias("e")
            .join(F.broadcast(dim.alias("d")),
                  F.col("e.k").eqNullSafe(F.col("d.k")))
            .groupBy("d.bucket")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("e.user_id").alias("n_users")))


@register(
    "ts_interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id,
             epoch_us(ts) // 1000000 AS s,
             epoch_us(ts) // 1000000 + 600 AS e
      FROM events
    ),
    m AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmax
      FROM iv
    ),
    fl AS (
      SELECT user_id, s, e,
             CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS nf
      FROM m
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(nf) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS UNBOUNDED PRECEDING) AS island
      FROM fl
    ),
    agg AS (
      SELECT user_id, island, MIN(s) AS st, MAX(e) AS en
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(en - st) AS BIGINT) AS covered_sec
    FROM agg GROUP BY user_id
    """,
    tags=("ts", "window"),
)
def ts_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-interval coverage (sweep line): each event opens a
    10-minute activity interval; overlapping intervals per user are
    merged into islands and the total covered wall-clock is summed —
    the "how much time was this user actually active" metric that
    naive SUM(duration) double-counts. The classic gaps-and-islands
    sweep: running MAX of interval end over all *preceding* rows
    detects a gap, a running SUM of gap flags numbers the islands.

    Determinism: pure integer epoch-second arithmetic.

    Scale: both windows and both aggregates cluster by user_id, so
    the whole query rides ONE hashpartitioning(user_id) exchange —
    the (user_id, island) and final user_id aggregates reuse that
    clustering (pinned in test_plans).
    """
    ev = load_table(spark, sf_dir, "events")
    sec = F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000000")
    iv = ev.select("user_id", sec.alias("s"), (sec + F.lit(600)).alias("e"))
    order = [F.col("s"), F.col("e")]
    w_prev = (Window.partitionBy("user_id").orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy("user_id").orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    flagged = iv.withColumn("pmax", F.max("e").over(w_prev)).withColumn(
        "nf", F.when(F.col("pmax").isNull()
                     | (F.col("s") > F.col("pmax")), 1).otherwise(0))
    islands = flagged.withColumn("island", F.sum("nf").over(w_run))
    per_island = (islands.groupBy("user_id", "island")
                  .agg(F.min("s").alias("st"), F.max("e").alias("en")))
    return (per_island.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_islands"),
                 F.sum(F.col("en") - F.col("st")).alias("covered_sec")))


@register(
    "llm_priority_sample",
    oracle="""
    SELECT doc_id, source, n_chars
    FROM (
      SELECT doc_id, source, n_chars,
             n_chars * CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 12)) AS BIGINT) AS pri
      FROM documents
    )
    ORDER BY pri DESC, doc_id
    LIMIT 100
    """,
    tags=("llm", "sample"),
)
def llm_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-biased deterministic sampling: rank every document by
    ``weight x uniform48`` (weight = n_chars, uniform48 = the first 12
    md5 hex chars of the doc id as a 48-bit integer) and keep the
    top 100 — longer documents are proportionally more likely to win,
    and the draw is reproducible across runs, engines, and cluster
    layouts because the "randomness" is a content hash, not an RNG.

    Honest caveat: this is weight-MONOTONE priority sampling, not
    exact Efraimidis–Spirakis A-ES (whose u^(1/w) keys need
    transcendental float math that is not bit-portable across
    engines); for corpus-curation quotas the monotone property is
    what's actually relied on. All arithmetic is 64-bit integer.

    Scale: a scalar projection plus global top-k = per-partition
    heaps + driver merge (TakeOrderedAndProject), no global sort, no
    shuffle of the full corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    u48 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
                 16, 10).cast("bigint")
    return (d.select("doc_id", "source", "n_chars",
                     (F.col("n_chars") * u48).alias("pri"))
            .orderBy(F.desc("pri"), "doc_id").limit(100)
            .select("doc_id", "source", "n_chars"))


@register(
    "stream_dedup_watermark",
    oracle="""
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
    FROM events GROUP BY event_type
    """,
    tags=("stream", "dedup", "stateful"),
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming dedup
    (``dropDuplicatesWithinWatermark``): the event log is doubled (every
    event twice) and streamed; the operator emits each event_id once
    and — unlike plain streaming ``dropDuplicates`` whose key state
    grows forever — evicts state once the watermark passes, the only
    dedup shape that survives an unbounded 100 TB stream. Duplicates
    ride in the same micro-batch so eviction can never race arrival
    and the result is exactly the distinct log, which the batch oracle
    counts.

    Scale: one state-store shuffle on the dedup key; state size is
    bounded by the watermark horizon, not stream history.
    """
    import uuid as _uuid

    from .queries_ext import _scratch

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    doubled = ev.unionAll(ev)
    work = _scratch(f"dedup_wm_{_uuid.uuid4().hex[:8]}")
    in_dir = f"{work}/in"
    doubled.coalesce(1).write.mode("overwrite").parquet(in_dir)

    name = f"dedup_wm_{_uuid.uuid4().hex[:8]}"
    stream = (spark.readStream
              .schema("event_id long, ts timestamp, event_type string")
              .parquet(in_dir))
    deduped = (stream.withWatermark("ts", "1 hour")
               .dropDuplicatesWithinWatermark(["event_id"]))
    q = (deduped.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", f"{work}/ck")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name).groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_unique")))
