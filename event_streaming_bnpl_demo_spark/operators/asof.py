"""As-of (nearest-prior) join — the time-series operator Spark lacks
natively, built two ways (SURVEY.md §2.2 "as-of / interval join"):

1. :func:`asof_join` — the scalable sort-merge formulation: union both
   sides tagged, one window pass per key ordered by time, carry the
   last right-side row forward with ``last(..., ignorenulls=True)``.
   Cost: ONE shuffle on the key + per-partition sort, independent of
   how many right rows precede each left row. This is the 100 TB path.

2. the candidate-join formulation (range join + row_number()=1) lives
   in plans.queries_core.join_asof where its DuckDB oracle checks it;
   it is quadratic per key and kept for oracle verification.

Both produce identical results (tested against each other).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str, right_ts: str,
              right_cols: list[str] | None = None,
              allow_exact_matches: bool = True,
              tolerance: Column | None = None) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (or ``<`` when ``allow_exact_matches=False``)
    within the same key group.

    tolerance: optional max lookback (an INTERVAL Column); matches older
    than ``left_ts - tolerance`` are nulled out, as in pandas merge_asof.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [c for c in right.columns
                                if c not in keys + [right_ts]]

    lhs = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols, F.col(right_ts).alias("_rts"))
                         .alias("x")).schema["x"].dataType
        ).alias("_r"),
    )
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("x")).schema["x"].dataType
        ).alias("_l"),
        F.struct(*right_cols, F.col(right_ts).alias("_rts")).alias("_r"),
    )
    # right rows sort before left rows at equal timestamps iff exact
    # matches are allowed; the trailing struct comparison makes the
    # winner among equal-timestamp right rows deterministic (field-wise
    # max) instead of partition-order-dependent
    tie = F.col("_is_left") if allow_exact_matches else -F.col("_is_left")
    w = (Window.partitionBy(*keys).orderBy(F.col("_ts"), tie, F.col("_r"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = (
        lhs.unionByName(rhs)
        .withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    if tolerance is not None:
        merged = merged.withColumn(
            "_last_r",
            F.when(F.col("_last_r._rts") >= F.col("_ts") - tolerance,
                   F.col("_last_r")))
    out = merged.select("_l.*", *[
        F.col(f"_last_r.{c}").alias(c) for c in right_cols])
    return out
