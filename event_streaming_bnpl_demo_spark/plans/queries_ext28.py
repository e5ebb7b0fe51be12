"""ext28: difference-in-differences —

``stat_diff_in_diff`` is the experiment readout that completes the
causal tier (``stat_cuped_adjustment`` = variance reduction,
``stat_welch_ttest`` = group comparison): a deterministic md5-assigned
treatment split, a calendar pre/post split, per-(group, period) mean
outcomes from exact integer moments, and the DiD interaction estimate
``(post_T - pre_T) - (post_C - pre_C)`` — the standard guard against
"the treated group was already trending".

Reference parity: none of this exists in the reference (615-LoC Go
CQRS demo); SURVEY.md §2.2 capability-superset tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import register

_VCENTS = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"

#: Deterministic 50/50 assignment: md5 is the hash both engines share.
_ASSIGN_SPARK = ("PMOD(CAST(CONV(SUBSTRING(MD5(CAST(user_id AS STRING)),"
                 " 1, 8), 16, 10) AS BIGINT), 2)")
_ASSIGN_DUCK = ("CAST(CAST('0x' || SUBSTRING(MD5(CAST(user_id AS VARCHAR)),"
                " 1, 8) AS UBIGINT) AS BIGINT) % 2")

_CUTOVER = "TIMESTAMP '2024-01-16 00:00:00'"

_DID_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         {_ASSIGN_DUCK} AS grp,
         CASE WHEN ts < {_CUTOVER} THEN 0 ELSE 1 END AS period,
         SUM({_VCENTS}) AS cents
  FROM events
  GROUP BY 1, 2, 3
), cells AS (
  SELECT grp, period,
         COUNT(*) AS n_users,
         SUM(cents) AS cents
  FROM per_user GROUP BY grp, period
), wide AS (
  SELECT
    MAX(CASE WHEN grp = 1 AND period = 0 THEN CAST(cents AS DOUBLE)
             / n_users END) AS pre_t,
    MAX(CASE WHEN grp = 1 AND period = 1 THEN CAST(cents AS DOUBLE)
             / n_users END) AS post_t,
    MAX(CASE WHEN grp = 0 AND period = 0 THEN CAST(cents AS DOUBLE)
             / n_users END) AS pre_c,
    MAX(CASE WHEN grp = 0 AND period = 1 THEN CAST(cents AS DOUBLE)
             / n_users END) AS post_c,
    MAX(CASE WHEN grp = 1 AND period = 0 THEN n_users END) AS n_pre_t,
    MAX(CASE WHEN grp = 1 AND period = 1 THEN n_users END) AS n_post_t,
    MAX(CASE WHEN grp = 0 AND period = 0 THEN n_users END) AS n_pre_c,
    MAX(CASE WHEN grp = 0 AND period = 1 THEN n_users END) AS n_post_c
  FROM cells
)
SELECT CAST(n_pre_t AS BIGINT) AS n_pre_t,
       CAST(n_post_t AS BIGINT) AS n_post_t,
       CAST(n_pre_c AS BIGINT) AS n_pre_c,
       CAST(n_post_c AS BIGINT) AS n_post_c,
       ROUND(pre_t, 4) AS pre_treat_mean_cents,
       ROUND(post_t, 4) AS post_treat_mean_cents,
       ROUND(pre_c, 4) AS pre_ctrl_mean_cents,
       ROUND(post_c, 4) AS post_ctrl_mean_cents,
       ROUND((post_t - pre_t) - (post_c - pre_c), 4) AS did_cents
FROM wide
"""


@register("stat_diff_in_diff", oracle=_DID_ORACLE,
          tags=("stat", "experiment", "causal"))
def stat_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: per-user spend totals roll up to the
    four (treatment x period) cell means, and the interaction
    ``(post_T - pre_T) - (post_C - pre_C)`` estimates the treatment
    effect net of the shared time trend — the first readout any
    rollout analysis should show next to the naive post-only delta.
    Assignment is md5-derived (reproducible in both engines, unlike
    rand() or engine-local hashes); the cell "users" are per-period
    active users, the standard activity-weighted DiD denominator.

    Numerics: per-cell sums are exact integer cents over exact user
    counts; the four means and the interaction run once in identical
    double text under ROUND(4).

    Scale: one fact scan to the per-(user, period) rollup (map-side
    combinable), a second shrinking aggregate to 4 cells, then
    closed-form arithmetic on one row.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", F.expr(_VCENTS).alias("vcents"))
    per_user = (ev
                .withColumn("grp", F.expr(_ASSIGN_SPARK))
                .withColumn("period", F.expr(
                    f"CASE WHEN ts < {_CUTOVER} THEN 0 ELSE 1 END"))
                .groupBy("user_id", "grp", "period")
                .agg(F.sum("vcents").alias("cents")))
    cells = per_user.groupBy("grp", "period").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("cents").alias("cents"))
    pick_mean = ("MAX(CASE WHEN grp = {g} AND period = {p} "
                 "THEN CAST(cents AS DOUBLE) / n_users END)")
    pick_n = "MAX(CASE WHEN grp = {g} AND period = {p} THEN n_users END)"
    wide = cells.selectExpr(
        pick_mean.format(g=1, p=0) + " AS pre_t",
        pick_mean.format(g=1, p=1) + " AS post_t",
        pick_mean.format(g=0, p=0) + " AS pre_c",
        pick_mean.format(g=0, p=1) + " AS post_c",
        pick_n.format(g=1, p=0) + " AS n_pre_t",
        pick_n.format(g=1, p=1) + " AS n_post_t",
        pick_n.format(g=0, p=0) + " AS n_pre_c",
        pick_n.format(g=0, p=1) + " AS n_post_c")
    return wide.selectExpr(
        "CAST(n_pre_t AS BIGINT) AS n_pre_t",
        "CAST(n_post_t AS BIGINT) AS n_post_t",
        "CAST(n_pre_c AS BIGINT) AS n_pre_c",
        "CAST(n_post_c AS BIGINT) AS n_post_c",
        "ROUND(pre_t, 4) AS pre_treat_mean_cents",
        "ROUND(post_t, 4) AS post_treat_mean_cents",
        "ROUND(pre_c, 4) AS pre_ctrl_mean_cents",
        "ROUND(post_c, 4) AS post_ctrl_mean_cents",
        "ROUND((post_t - pre_t) - (post_c - pre_c), 4) AS did_cents")
