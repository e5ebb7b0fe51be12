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
              tolerance: Column | None = None,
              direction: str = "backward") -> DataFrame:
    """For each left row, attach the nearest right row in the same key
    group: ``direction="backward"`` (default) takes the latest right
    row with ``right_ts <= left_ts``; ``direction="forward"`` the
    earliest with ``right_ts >= left_ts`` (strict inequalities when
    ``allow_exact_matches=False``); ``direction="nearest"`` whichever
    of those two is temporally closer, equal distances breaking to the
    backward row — pandas merge_asof semantics, same ONE-shuffle
    sort-merge plan in every direction (nearest adds only a second
    per-partition sort over the same exchange). Forward sorts the union by
    DESCENDING time and keeps the identical linear running frame
    ([unboundedPreceding, currentRow] + ``last(..., ignorenulls)``),
    so both directions execute O(n) per key partition — a
    [currentRow, unboundedFollowing] frame would make Spark recompute
    the aggregate from scratch per row (O(n^2) on hot keys).

    tolerance: optional max lookback/lookahead (an INTERVAL Column);
    matches further than that from ``left_ts`` are nulled out, as in
    pandas merge_asof.

    Tie-break among equal-timestamp right rows is deterministic:
    backward keeps the field-wise MAX struct, forward the field-wise
    MIN (the row the in-frame sort meets first in each case).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction!r}")
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
    # Tie order places right rows inside the frame at equal timestamps
    # iff exact matches are allowed — backward frames end at the
    # current row (right must sort BEFORE left to be visible), forward
    # frames start at it (right must sort AFTER left). The trailing
    # struct comparison makes the winner among equal-timestamp right
    # rows deterministic instead of partition-order-dependent.
    if direction == "nearest":
        # pandas merge_asof direction="nearest": both candidates from
        # ONE exchange (the two Windows share the hash partitioning —
        # only a second per-partition sort is added), then the closer
        # wins; equal distances break to the BACKWARD row, matching
        # the documented backward/forward tie structs on each side.
        tie = F.col("_is_left") if allow_exact_matches else -F.col("_is_left")
        wb = (Window.partitionBy(*keys)
              .orderBy(F.col("_ts"), tie, F.col("_r"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wf = (Window.partitionBy(*keys)
              .orderBy(F.col("_ts").desc(), tie, F.col("_r").desc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        merged = (
            lhs.unionByName(rhs)
            .withColumn("_rb", F.last("_r", ignorenulls=True).over(wb))
            .withColumn("_rf", F.last("_r", ignorenulls=True).over(wf))
            .filter(F.col("_is_left") == 1)
        )
        if tolerance is not None:
            merged = (merged
                      .withColumn("_rb", F.when(
                          F.col("_rb._rts") >= F.col("_ts") - tolerance,
                          F.col("_rb")))
                      .withColumn("_rf", F.when(
                          F.col("_rf._rts") <= F.col("_ts") + tolerance,
                          F.col("_rf"))))
        # timestamp subtraction yields a day-time interval — directly
        # comparable at microsecond precision, and type-agnostic
        # across TIMESTAMP and TIMESTAMP_NTZ (unix_micros is not)
        chosen = (
            F.when(F.col("_rb").isNull(), F.col("_rf"))
            .when(F.col("_rf").isNull(), F.col("_rb"))
            .when((F.col("_ts") - F.col("_rb._rts"))
                  <= (F.col("_rf._rts") - F.col("_ts")),
                  F.col("_rb"))
            .otherwise(F.col("_rf")))
        merged = merged.withColumn("_last_r", chosen)
        return merged.select("_l.*", *[
            F.col(f"_last_r.{c}").alias(c) for c in right_cols])
    if direction == "backward":
        tie = F.col("_is_left") if allow_exact_matches else -F.col("_is_left")
        w = (Window.partitionBy(*keys).orderBy(F.col("_ts"), tie, F.col("_r"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        picked = F.last("_r", ignorenulls=True).over(w)
        in_tol = (lambda c: F.col(f"{c}._rts") >= F.col("_ts") - tolerance)
    else:
        # Descending time + the SAME running frame as backward: the
        # earliest following right row is the last non-null _r met in
        # reverse-time order, computed by the linear
        # RunningWindowFunctionFrame instead of the per-row-recomputed
        # UnboundedFollowing frame. At equal _ts the tie places right
        # before left (visible) iff exact matches are allowed, and
        # _r DESC makes `last` land on the field-wise MIN struct —
        # identical semantics to the ascending/first formulation.
        tie = F.col("_is_left") if allow_exact_matches else -F.col("_is_left")
        w = (Window.partitionBy(*keys)
             .orderBy(F.col("_ts").desc(), tie, F.col("_r").desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        picked = F.last("_r", ignorenulls=True).over(w)
        in_tol = (lambda c: F.col(f"{c}._rts") <= F.col("_ts") + tolerance)
    merged = (
        lhs.unionByName(rhs)
        .withColumn("_last_r", picked)
        .filter(F.col("_is_left") == 1)
    )
    if tolerance is not None:
        merged = merged.withColumn(
            "_last_r", F.when(in_tol("_last_r"), F.col("_last_r")))
    out = merged.select("_l.*", *[
        F.col(f"_last_r.{c}").alias(c) for c in right_cols])
    return out
