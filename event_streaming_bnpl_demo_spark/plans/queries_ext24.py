"""ext24 pack: training-set assembly planning —

- ``events_pit_features`` — leakage-safe point-in-time feature
  materialization: for every label event (purchase), per-user feature
  aggregates computed STRICTLY from events before it — the feature-
  store assembly query whose whole value is what it must NOT read
  (anything at-or-after the label timestamp = label leakage).
- ``llm_mix_epochs_planner`` — the data-mixing recipe planner: given a
  token budget and per-source temperature weights, the per-source
  target tokens, repeat factor (epochs, possibly > 1), and the
  over-repetition flag — the published-recipe arithmetic every
  pretraining run starts from. Complements ``llm_temperature_mix``
  (which SELECTS documents under a <=1-epoch cap); this PLANS the
  budget including the >1-epoch repeat regime.

Reference parity: none of this exists in the reference (615-LoC Go
CQRS demo); SURVEY.md §2.2 capability-superset tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import register

_VCENTS = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# events_pit_features


_PIT_ORACLE = f"""
WITH feat AS (
  SELECT event_id, user_id, event_type, ts,
         COUNT(*) OVER w - 1 AS n_prior_events,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w
           - CASE WHEN event_type = 'view' THEN 1 ELSE 0 END
           AS n_prior_views,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w
           - CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
           AS n_prior_clicks,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER w
           - CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
           AS n_prior_errors,
         SUM({_VCENTS}) OVER w - {_VCENTS} AS prior_value_cents
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       CAST(n_prior_events AS BIGINT) AS n_prior_events,
       CAST(n_prior_views AS BIGINT) AS n_prior_views,
       CAST(n_prior_clicks AS BIGINT) AS n_prior_clicks,
       CAST(n_prior_errors AS BIGINT) AS n_prior_errors,
       CAST(prior_value_cents AS BIGINT) AS prior_value_cents
FROM feat
WHERE event_type = 'purchase'
"""


@register("events_pit_features", oracle=_PIT_ORACLE,
          tags=("events", "features", "pit"))
def events_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time training-set assembly: for every purchase (label)
    event, the user's history features — prior event count, per-type
    prior counts, prior spend cents — computed from rows STRICTLY
    before the label in (ts, event_id) order. The running window
    includes the current row, so each feature subtracts the label row's
    own contribution: the label can never leak into its features, by
    construction rather than by filter discipline. This is the query a
    feature store materializes for supervised training; done wrong
    (any at-or-after row included) the model trains on the future.

    Scale: ONE cumulative window pass over the user-time clustering —
    no self-join (the naive formulation is events⋈events on user with
    a ts inequality: quadratic per hot user), no second shuffle for the
    label filter (it rides the window's exchange). Ties are totally
    ordered by (ts, event_id), so features are deterministic even for
    same-timestamp bursts.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts",
        F.expr(_VCENTS).alias("vcents"))
    w = ("OVER (PARTITION BY user_id ORDER BY ts, event_id"
         " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    typ = ("SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) {w}"
           " - CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END"
           " AS n_prior_{t}s")
    feat = ev.selectExpr(
        "event_id", "user_id", "event_type",
        f"COUNT(*) {w} - 1 AS n_prior_events",
        typ.format(t="view", w=w),
        typ.format(t="click", w=w),
        typ.format(t="error", w=w),
        f"SUM(vcents) {w} - vcents AS prior_value_cents")
    return (feat.filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id",
                    F.col("n_prior_events").cast("bigint")
                    .alias("n_prior_events"),
                    F.col("n_prior_views").cast("bigint")
                    .alias("n_prior_views"),
                    F.col("n_prior_clicks").cast("bigint")
                    .alias("n_prior_clicks"),
                    F.col("n_prior_errors").cast("bigint")
                    .alias("n_prior_errors"),
                    F.col("prior_value_cents").cast("bigint")
                    .alias("prior_value_cents")))


# ---------------------------------------------------------------------------
# llm_mix_epochs_planner


_MIX_TOKEN_BUDGET = 40_000          # target tokens for the mix
_MIX_TAU_NUM, _MIX_TAU_DEN = 7, 10  # temperature 0.7 as a rational
_EPOCH_WARN_MICRO = 4_000_000      # >4 epochs: repetition-damage flag

_PLANNER_ORACLE = f"""
WITH s AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(len(string_split(text, ' '))) AS n_tokens
  FROM documents GROUP BY source
), w AS (
  SELECT source, n_docs, n_tokens,
         CAST(FLOOR(EXP(({_MIX_TAU_NUM}.0e0 / {_MIX_TAU_DEN}.0e0)
                        * LN(CAST(n_tokens AS DOUBLE)))
                    * 1000000.0e0 + 0.5e0) AS BIGINT) AS wgt_micro
  FROM s
), tot AS (
  SELECT SUM(wgt_micro) AS wtot FROM w
), plan AS (
  SELECT source, n_docs, n_tokens,
         ({_MIX_TOKEN_BUDGET} * wgt_micro) // (SELECT wtot FROM tot)
           AS target_tokens
  FROM w
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(target_tokens AS BIGINT) AS target_tokens,
       CAST((target_tokens * 1000000) // n_tokens AS BIGINT)
         AS epochs_micro,
       CASE WHEN (target_tokens * 1000000) // n_tokens
                 > {_EPOCH_WARN_MICRO} THEN 1 ELSE 0 END AS over_repeated
FROM plan
"""


@register("llm_mix_epochs_planner", oracle=_PLANNER_ORACLE,
          tags=("llm", "assembly", "mixing", "planning"))
def llm_mix_epochs_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing recipe planner: per source, the temperature-weighted
    token target (w ∝ tokens^0.7 — upweights small sources exactly like
    multilingual sampling recipes), the implied repeat factor in
    micro-epochs (``target/actual`` — values above 1e6 mean the source
    repeats, the >1-epoch regime ``llm_temperature_mix`` deliberately
    caps away), and the over-repetition flag at 4 epochs (the published
    rule of thumb past which repeating pretraining data stops helping).
    This is the PLANNING table a recipe review reads before any
    sampling job runs — and because it is pure aggregate arithmetic, it
    costs one corpus scan no matter the budget.

    Numerics: token counts are exact integers; the only transcendental
    (x^0.7, computed as EXP(0.7*LN(x)) because fractional POWER is NOT
    in the probed bit-identical set — JVM Math.pow is <=1 ulp, not
    correctly rounded, while ln/exp ARE probed identical) runs once per
    source in identical formula text with explicitly-DOUBLE operands
    and e0 literals, then fixes to micro integer weights (the ext22
    BM25 doctrine); every downstream step is integer multiply/divide,
    so targets and epoch ratios hash exactly.

    Scale: one corpus scan to per-source token sums (map-side
    combinable, |sources| rows out), then closed-form arithmetic on the
    |sources|-row table with a broadcast scalar total.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).alias("n_toks"))
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"))
    w = s.withColumn("wgt_micro", F.expr(
        f"CAST(FLOOR(EXP(({_MIX_TAU_NUM}.0e0 / {_MIX_TAU_DEN}.0e0)"
        f" * LN(CAST(n_tokens AS DOUBLE)))"
        f" * 1000000.0e0 + 0.5e0) AS BIGINT)"))
    tot = w.agg(F.sum("wgt_micro").alias("wtot"))
    plan = (w.crossJoin(F.broadcast(tot))
            .withColumn("target_tokens", F.expr(
                f"({_MIX_TOKEN_BUDGET} * wgt_micro) DIV wtot")))
    epochs = "(target_tokens * 1000000) DIV n_tokens"
    return plan.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("target_tokens").cast("bigint").alias("target_tokens"),
        F.expr(epochs).cast("bigint").alias("epochs_micro"),
        F.expr(f"CASE WHEN {epochs} > {_EPOCH_WARN_MICRO} THEN 1 ELSE 0 END")
        .alias("over_repeated"))
