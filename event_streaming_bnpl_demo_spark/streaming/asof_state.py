"""Streaming as-of join as a custom keyed stateful operator
(``applyInPandasWithState``): each purchase is matched to the nearest
prior view by the same user, and the match stays CORRECT under
out-of-order arrival — a view arriving in a later micro-batch than
"its" purchase retroactively upgrades the purchase's match.

Structured Streaming has no native as-of join (stream-stream joins are
windowed equi/interval joins); this is exactly the custom-operator gap
the UDF/state surface exists for. Mechanism:

- state per user: the views and purchases seen so far (epoch-micro
  timestamps + ids) and a monotonically increasing version counter;
- each micro-batch folds its rows in, then re-emits the CURRENT best
  match for every purchase of the touched user (update-mode
  semantics: later batches revise earlier emissions);
- the reader takes, per purchase, the row with the highest version —
  the fixpoint — which equals the batch as-of join over the full log
  no matter how the events were split into batches or reordered
  across them. The catalog query's oracle is literally the batch
  as-of SQL (plans/queries_core.ASOF_ORACLE).

Scale: state is partitioned by user in the state store (RocksDB at
deploy), one shuffle per micro-batch on user_id; Arrow batches carry
grouped rows so the Python hop is vectorized. Per-user match
recomputation is a bisect over the user's sorted views — linear in
that user's history, embarrassingly parallel across users. Unbounded
retention here is the demo posture; production bounds it with a
watermark-driven TTL (GroupStateTimeout / transformWithState timers),
trading retroactive-correction depth for bounded state.
"""

from __future__ import annotations

from bisect import bisect_right
from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, LongType, StructField, StructType)

ASOF_STATE_SCHEMA = StructType([
    StructField("v_ts", ArrayType(LongType())),
    StructField("v_id", ArrayType(LongType())),
    StructField("p_ts", ArrayType(LongType())),
    StructField("p_id", ArrayType(LongType())),
    StructField("version", LongType()),
])

ASOF_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("purchase_id", LongType()),
    StructField("view_id", LongType()),
    StructField("seconds_since_view", LongType()),
    StructField("version", LongType()),
])

_OUT_COLS = [f.name for f in ASOF_OUTPUT_SCHEMA.fields]


def asof_update(key: tuple, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold a micro-batch into one user's state and re-emit current
    matches for all of the user's purchases (rows: ASOF_OUTPUT_SCHEMA;
    view columns None when no prior view exists yet)."""
    if state.exists:
        v_ts, v_id, p_ts, p_id, version = state.get
        v_ts, v_id, p_ts, p_id = (list(v_ts), list(v_id),
                                  list(p_ts), list(p_id))
    else:
        v_ts, v_id, p_ts, p_id, version = [], [], [], [], 0
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            if r.event_type == "view":
                v_ts.append(int(r.ts_us)); v_id.append(int(r.event_id))
            else:
                p_ts.append(int(r.ts_us)); p_id.append(int(r.event_id))
    version += 1
    state.update((v_ts, v_id, p_ts, p_id, version))

    views = sorted(zip(v_ts, v_id))
    user = key[0]
    rows = []
    for pts, pid in zip(p_ts, p_id):
        # latest view with v_ts <= p_ts; ties prefer the larger view id
        # (matches the oracle's ORDER BY v.ts DESC, v.event_id DESC)
        i = bisect_right(views, (pts, float("inf")))
        if i:
            vt, vi = views[i - 1]
            rows.append((user, pid, vi,
                         pts // 1_000_000 - vt // 1_000_000, version))
        else:
            rows.append((user, pid, None, None, version))
    yield pd.DataFrame(rows, columns=_OUT_COLS)


#: re-export for callers wiring the stream
NO_TIMEOUT = GroupStateTimeout.NoTimeout
