"""Equi-key + time-interval join — ONE implementation for batch and
stream-stream (SURVEY §2.2 'stream-stream join with watermark'; the
design stance of §7: the same transform runs under ``spark.read`` and
``spark.readStream``).

The reference cannot join streams at all — its purchase→promise cascade
loses the purchase amount because the promise event can't see back to
the purchase (consumer/consumer.go:195-198, hard-coded 3500). A
watermarked stream-stream interval join is the principled fix: promise
joins purchase-within-horizon, state for both sides is expired by the
watermark + time bound.

Scale: the equi key drives a shuffled (or broadcast) hash join; the
interval predicate evaluates inside the same stage, and — critically
for streaming — bounds the join state Spark must retain, so memory is
O(rows within the interval horizon), not O(stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RKEY = "__ij_rkey"


def interval_join(left: DataFrame, right: DataFrame, key: str,
                  left_ts: str, right_ts: str, within: str,
                  how: str = "inner") -> DataFrame:
    """Join ``right`` rows onto ``left`` rows with the same ``key``
    whose ``right_ts`` falls in ``(left_ts, left_ts + within]``.

    ``within`` is a SQL interval literal body, e.g. ``'1 HOUR'``.
    For stream-stream use, BOTH inputs must already carry
    ``withWatermark`` — the time bound plus the watermarks let the
    engine garbage-collect join state. Non-key column names must be
    disjoint between the two sides (the key itself is deduplicated
    here).
    """
    r = right.withColumnRenamed(key, _RKEY)
    cond = (
        (left[key] == r[_RKEY])
        & (r[right_ts] > left[left_ts])
        & (r[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return left.join(r, cond, how).drop(_RKEY)
