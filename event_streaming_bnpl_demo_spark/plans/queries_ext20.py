"""ext20 pack: the spectral + information-theoretic tier, unlocked by
the round-7 doctrine extension (transcendentals are admissible when both
engines run the IDENTICAL formula text over engine-agreed integers —
measured bit-identical for pi/cos/sin/ln/exp/sqrt between this Spark and
this DuckDB build, with ROUND as the belt-and-braces cut):

- ``ts_periodogram_dft`` — a discrete-Fourier periodogram over the
  daily revenue series: power at candidate periods 2..30 days, the
  spectral way to FIND the weekly cycle ``ts_dow_seasonal`` assumes.
- ``agg_entropy_mix`` — Shannon entropy (and effective-category count
  exp(H)) of the monthly event-type mix: the information-theoretic
  upgrade of share-based mix monitoring (``dq_distribution_drift``).
- ``stat_welch_ttest`` — Welch's unequal-variance t statistic +
  Satterthwaite df per nation (urgent vs non-urgent order values),
  the parametric twin of ``stat_mannwhitney_u``, from exact integer
  moments (cents in BIGINT, squared cents in DECIMAL(38,0)/HUGEINT).
- ``llm_token_entropy_by_source`` — per-source unigram entropy and
  redundancy: the information-density complement of
  ``llm_zipf_slope`` for corpus intake.

Every count/sum crossing the engine boundary is an exact integer; the
transcendental step happens once, in the same written formula, on both
sides.

Reference parity: none of this exists in the reference (615-LoC Go CQRS
demo); SURVEY.md §2.2 capability-superset tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table, maybe_broadcast
from .catalog import register

_CENTS = "CAST(FLOOR({col} * 100 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# ts_periodogram_dft


_P_MIN, _P_MAX = 2, 30


_DFT_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM({_CENTS.format(col='o_totalprice')}) AS x
  FROM orders GROUP BY 1
), spine AS (
  SELECT MIN(d) AS d0, COUNT(*) AS n, SUM(x) AS sx FROM daily
), pts AS (
  SELECT date_diff('day', s.d0, daily.d) AS t,
         CAST(daily.x AS DOUBLE) - CAST(s.sx AS DOUBLE) / s.n AS w
  FROM daily, spine s
), periods AS (
  SELECT UNNEST(generate_series({_P_MIN}, {_P_MAX})) AS p
), comps AS (
  SELECT p,
         SUM(w * COS(2 * PI() * t / p)) AS sc,
         SUM(w * SIN(2 * PI() * t / p)) AS ss
  FROM pts, periods GROUP BY p
)
SELECT CAST(p AS BIGINT) AS period_days,
       ROUND((sc * sc + ss * ss) / SUM(sc * sc + ss * ss) OVER (), 6)
         AS power_share
FROM comps
"""


@register("ts_periodogram_dft", oracle=_DFT_ORACLE,
          tags=("ts", "stats", "spectral"))
def ts_periodogram_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier periodogram of daily revenue: for each
    candidate period p in {_P_MIN}..{_P_MAX} days, the spectral power
    ``(Σ w·cos(2πt/p))² + (Σ w·sin(2πt/p))²`` of the mean-centered
    series, normalized to shares — the principled way to DISCOVER
    periodicity before fitting a seasonal model (``ts_dow_seasonal``
    assumes 7; this measures whether 7 actually dominates).

    Scale: the only full-data pass is the daily rollup (map-side
    combined, calendar-bounded output), localCheckpointed because two
    consumers read it (the mean spine and the DFT sums). The DFT is a
    broadcast crossJoin of the daily table against a 29-row period
    spine — O(days x periods) trig evaluations inside codegen, then a
    29-row window normalization. Every engine-boundary value is an
    exact integer (day index, revenue cents); cos/sin/π run once in
    the identical formula text on both sides (measured bit-identical),
    under ROUND(6).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice")
    daily = (o.groupBy(F.to_date("o_orderdate").alias("d"))
             .agg(F.sum(F.expr(_CENTS.format(col="o_totalprice")))
                  .alias("x"))
             .localCheckpoint(eager=True))
    spine = daily.agg(F.min("d").alias("d0"),
                      F.count(F.lit(1)).alias("n"),
                      F.sum("x").alias("sx"))
    pts = (daily.crossJoin(F.broadcast(spine))
           .select(F.datediff("d", "d0").alias("t"),
                   F.expr("CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / n")
                    .alias("w")))
    periods = spark.range(_P_MIN, _P_MAX + 1).select(
        F.col("id").cast("int").alias("p"))
    comps = (pts.crossJoin(F.broadcast(periods))
             .groupBy("p")
             .agg(F.expr("SUM(w * COS(2 * PI() * t / p))").alias("sc"),
                  F.expr("SUM(w * SIN(2 * PI() * t / p))").alias("ss")))
    wall = Window.partitionBy()
    power = F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")
    return comps.select(
        F.col("p").cast("bigint").alias("period_days"),
        F.round(power / F.sum(power).over(wall), 6).alias("power_share"))


# ---------------------------------------------------------------------------
# agg_entropy_mix


_ENTROPY_ORACLE = """
WITH cnt AS (
  SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month,
         event_type, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT month, SUM(c) AS n, COUNT(*) AS n_types,
         SUM(c * LN(CAST(c AS DOUBLE))) AS clnc
  FROM cnt GROUP BY month
)
SELECT month,
       CAST(n AS BIGINT) AS n_events,
       CAST(n_types AS BIGINT) AS n_types,
       ROUND(LN(CAST(n AS DOUBLE)) - clnc / n, 6) AS entropy_nats,
       ROUND(EXP(LN(CAST(n AS DOUBLE)) - clnc / n), 4) AS effective_types
FROM agg
"""


@register("agg_entropy_mix", oracle=_ENTROPY_ORACLE,
          tags=("agg", "events", "stats"))
def agg_entropy_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the monthly event-type mix, via the
    numerically-clean identity ``H = ln(N) - (Σ c·ln c)/N`` (one log
    per CATEGORY, never per event; no p=c/N intermediate to drift).
    ``exp(H)`` is the effective number of event types — the
    interpretable version every mix dashboard should show: 4 types at
    25% each reads 4.0; one dominant type reads just above 1. The
    information-theoretic upgrade of the share-based
    ``dq_distribution_drift`` monitor.

    Scale: one raw scan to (month, type) counts — map-side combinable
    on a tiny key domain — then the entropy folds over |months| x
    |types| rows. ln/exp on agreed integers, identical formula text,
    ROUND(6)/(4).
    """
    ev = load_table(spark, sf_dir, "events")
    cnt = (ev.groupBy(
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month"),
        "event_type")
        .agg(F.count(F.lit(1)).alias("c")))
    agg = cnt.groupBy("month").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
        F.expr("SUM(c * LN(CAST(c AS DOUBLE)))").alias("clnc"))
    h = F.expr("LN(CAST(n AS DOUBLE)) - clnc / n")
    return agg.select(
        "month",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.round(h, 6).alias("entropy_nats"),
        F.round(F.exp(h), 4).alias("effective_types"))


# ---------------------------------------------------------------------------
# stat_welch_ttest


_WELCH_ORACLE = f"""
WITH moments AS (
  SELECT n.n_name,
         CASE WHEN o.o_orderpriority = '1-URGENT' THEN 'urgent'
              ELSE 'other' END AS grp,
         COUNT(*) AS n,
         SUM({_CENTS.format(col='o.o_totalprice')}) AS s1,
         SUM(CAST({_CENTS.format(col='o.o_totalprice')}
                  * {_CENTS.format(col='o.o_totalprice')} AS HUGEINT)) AS s2
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
), wide AS (
  SELECT n_name,
         MAX(CASE WHEN grp = 'urgent' THEN n END)  AS n1,
         MAX(CASE WHEN grp = 'urgent' THEN s1 END) AS s1a,
         MAX(CASE WHEN grp = 'urgent' THEN s2 END) AS s2a,
         MAX(CASE WHEN grp = 'other' THEN n END)   AS n2,
         MAX(CASE WHEN grp = 'other' THEN s1 END)  AS s1b,
         MAX(CASE WHEN grp = 'other' THEN s2 END)  AS s2b
  FROM moments GROUP BY n_name
), stats AS (
  SELECT n_name, n1, n2,
         CAST(s1a AS DOUBLE) / n1 AS m1,
         CAST(s1b AS DOUBLE) / n2 AS m2,
         (CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * s1a / n1) / (n1 - 1)
           AS v1,
         (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * s1b / n2) / (n2 - 1)
           AS v2
  FROM wide WHERE n1 > 1 AND n2 > 1
)
SELECT n_name,
       CAST(n1 AS BIGINT) AS n_urgent,
       CAST(n2 AS BIGINT) AS n_other,
       ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 4) AS t_stat,
       ROUND(POWER(v1 / n1 + v2 / n2, 2)
             / (POWER(v1 / n1, 2) / (n1 - 1)
                + POWER(v2 / n2, 2) / (n2 - 1)), 2) AS df
FROM stats
"""


@register("stat_welch_ttest", oracle=_WELCH_ORACLE,
          tags=("stat", "agg", "join"))
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic (+ Welch–Satterthwaite
    degrees of freedom) per nation, comparing urgent vs non-urgent
    order values — the parametric twin of ``stat_mannwhitney_u`` and
    the test actually appropriate when the two groups' variances
    differ. All moments are exact integers (cents in BIGINT; squared
    cents summed in DECIMAL(38,0)/HUGEINT — each x² fits BIGINT, the
    SUM doesn't at 100 TB); the mean/variance/t/df arithmetic runs
    once in doubles with identical formula text on both sides,
    ROUND(4)/(2).

    Scale: one fact pass to the 25-nation x 2-group moment table
    (map-side combinable; dims broadcast), then 25-row closed-form
    arithmetic — the same "exact moments first" shape as
    ``agg_stats_moments`` and ``stat_cuped_adjustment``.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    cents = F.expr(_CENTS.format(col="o_totalprice"))
    moments = (o
               .join(maybe_broadcast(c, sf_dir, "customer"),
                     o.o_custkey == c.c_custkey)
               .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
               .withColumn("grp", F.when(
                   F.col("o_orderpriority") == "1-URGENT",
                   F.lit("urgent")).otherwise(F.lit("other")))
               .withColumn("cents", cents)
               .groupBy("n_name", "grp")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("cents").alias("s1"),
                    F.sum(F.expr(
                        "CAST(cents * cents AS DECIMAL(38,0))"))
                     .alias("s2")))
    wide = moments.groupBy("n_name").agg(
        F.max(F.when(F.col("grp") == "urgent", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == "urgent", F.col("s1"))).alias("s1a"),
        F.max(F.when(F.col("grp") == "urgent", F.col("s2"))).alias("s2a"),
        F.max(F.when(F.col("grp") == "other", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("grp") == "other", F.col("s1"))).alias("s1b"),
        F.max(F.when(F.col("grp") == "other", F.col("s2"))).alias("s2b"))
    stats = (wide.filter("n1 > 1 AND n2 > 1")
             .withColumn("m1", F.expr("CAST(s1a AS DOUBLE) / n1"))
             .withColumn("m2", F.expr("CAST(s1b AS DOUBLE) / n2"))
             .withColumn("v1", F.expr(
                 "(CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * s1a / n1)"
                 " / (n1 - 1)"))
             .withColumn("v2", F.expr(
                 "(CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * s1b / n2)"
                 " / (n2 - 1)")))
    return stats.select(
        "n_name",
        F.col("n1").cast("bigint").alias("n_urgent"),
        F.col("n2").cast("bigint").alias("n_other"),
        F.expr("ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 4)")
         .alias("t_stat"),
        F.expr("ROUND(POWER(v1 / n1 + v2 / n2, 2)"
               " / (POWER(v1 / n1, 2) / (n1 - 1)"
               "    + POWER(v2 / n2, 2) / (n2 - 1)), 2)").alias("df"))


# ---------------------------------------------------------------------------
# llm_token_entropy_by_source


_TOKEN_ENTROPY_ORACLE = """
WITH cnt AS (
  SELECT source, tok, COUNT(*) AS c
  FROM (SELECT source, UNNEST(string_split(text, ' ')) AS tok
        FROM documents)
  GROUP BY source, tok
), agg AS (
  SELECT source, SUM(c) AS n, COUNT(*) AS n_distinct,
         SUM(c * LN(CAST(c AS DOUBLE))) AS clnc
  FROM cnt GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       ROUND(LN(CAST(n AS DOUBLE)) - clnc / n, 6) AS entropy_nats,
       ROUND((LN(CAST(n AS DOUBLE)) - clnc / n)
             / LN(CAST(n_distinct AS DOUBLE)), 6) AS efficiency
FROM agg
WHERE n_distinct > 1
"""


@register("llm_token_entropy_by_source", oracle=_TOKEN_ENTROPY_ORACLE,
          tags=("llm", "text", "stats"))
def llm_token_entropy_by_source(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Per-source unigram token entropy and efficiency
    (H / ln(vocabulary) — 1.0 means every token equally likely,
    boilerplate-heavy sources sag toward 0): the information-density
    intake stat that pairs with ``llm_zipf_slope`` — Zipf measures the
    SHAPE of the frequency decay, entropy its aggregate effect on
    bits-per-token, and together they are a cheap fingerprint of
    human-vs-templated text before any model runs.

    Scale: explode + two shrinking aggregates on the (source, token)
    key, vocabulary-bounded after the first; same ``ln(N) - Σc·ln(c)/N``
    identity as ``agg_entropy_mix`` (one log per distinct token).
    """
    d = load_table(spark, sf_dir, "documents")
    cnt = (d.select("source", F.explode(F.split("text", " ")).alias("tok"))
           .groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c")))
    agg = cnt.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.expr("SUM(c * LN(CAST(c AS DOUBLE)))").alias("clnc"))
    h = F.expr("LN(CAST(n AS DOUBLE)) - clnc / n")
    return (agg.filter(F.col("n_distinct") > 1)
            .select(
                "source",
                F.col("n").cast("bigint").alias("n_tokens"),
                F.col("n_distinct").cast("bigint").alias("n_distinct"),
                F.round(h, 6).alias("entropy_nats"),
                F.round(h / F.log(F.col("n_distinct").cast("double")), 6)
                 .alias("efficiency")))
