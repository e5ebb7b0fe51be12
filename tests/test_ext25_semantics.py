"""Semantic laws for the streaming feature store (ext25):

- incremental == batch: the streamed view must equal the batch
  ``events_pit_features`` row-for-row (the driver gate checks this
  against the SQL oracle; here it is pinned against the batch CATALOG
  query so the two Spark implementations cannot drift apart either);
- state really is per-slice per-user AGGREGATES tagged with the
  slice's min ts (the time-based prior-selection key), four slices;
- draining an already-drained checkpoint is a no-op (exactly-once
  resume), and the view is unchanged after it.
"""

from __future__ import annotations

import glob

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_pit_equals_batch_and_resumes_idempotently(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext24 import \
        events_pit_features
    from event_streaming_bnpl_demo_spark.plans.queries_ext25 import (
        _N_SLICES, _TYPES, mv_stream_pit_features)
    from event_streaming_bnpl_demo_spark.plans.queries_ext import (
        _scratch, source_fingerprint)

    streamed = _rows(mv_stream_pit_features(spark, SF))
    batch = _rows(events_pit_features(spark, SF))
    assert streamed == batch

    work = _scratch(f"pitstream_v3_{source_fingerprint(SF)}")
    state_batches = glob.glob(f"{work}/state/batch=*")
    assert len(state_batches) == _N_SLICES
    mins = []
    for b in state_batches:
        part = spark.read.parquet(b)
        assert set(part.columns) == {
            "user_id", "c_all", *{f"c_{t}" for t in _TYPES},
            "v_cents", "slice_min_ts", "slice_min_eid"}
        ms = part.select("slice_min_ts", "slice_min_eid").distinct().collect()
        assert len(ms) == 1          # one slice, one composite tag
        mins.append(tuple(ms[0]))
    assert len(set(mins)) == _N_SLICES   # slice keys are distinct

    # second drain on the same checkpoint: nothing new, same view
    again = _rows(mv_stream_pit_features(spark, SF))
    assert again == streamed


def test_stream_pit_incremental_arrival_is_immutable(spark, tmp_path):
    """The real streaming contract: feed HALF the slices, drain, then
    deliver the rest and drain again on the same checkpoint. Laws:
    (a) features computed from the partial feed never CHANGE when the
    future arrives (point-in-time features are immutable — the whole
    anti-leakage promise), and (b) the final view equals the batch
    query over the full feed."""
    import shutil

    from pyspark.sql import functions as F

    from event_streaming_bnpl_demo_spark.plans.queries_ext24 import \
        events_pit_features
    from event_streaming_bnpl_demo_spark.plans.queries_ext25 import (
        run_pit_stream, stage_time_slices)
    from event_streaming_bnpl_demo_spark.sources import load_table

    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "ts",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("vcents"))
    staged = tmp_path / "staged"
    stage_time_slices(ev, str(staged))
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    work = str(tmp_path / "work")
    slices = sorted(p.name for p in staged.iterdir())
    assert len(slices) == 4

    for s in slices[:2]:                       # copy2 preserves mtimes
        shutil.copy2(staged / s, in_dir / s)
    early = {r["event_id"]: tuple(r)
             for r in run_pit_stream(spark, str(in_dir), work).collect()}
    assert early

    for s in slices[2:]:
        shutil.copy2(staged / s, in_dir / s)
    final = {r["event_id"]: tuple(r)
             for r in run_pit_stream(spark, str(in_dir), work).collect()}
    # (a) immutability: every early feature row survives unchanged
    for eid, row in early.items():
        assert final[eid] == row, eid
    # (b) incremental == batch over the full feed
    batch = {r["event_id"]: tuple(r)
             for r in events_pit_features(spark, SF).collect()}
    assert final == batch


def test_stream_pit_hot_timestamp_boundary_and_empty_slice(spark, tmp_path):
    """The two ADVICE-flagged edges: (a) adjacent slices sharing one hot
    min timestamp — prior selection must use the composite
    (slice_min_ts, slice_min_eid) key or the earlier slice's whole
    history silently vanishes; (b) an all-empty slice file must fold as
    a no-op instead of writing a NullType slice_min_ts partial."""
    import os

    from pyspark.sql import functions as F

    from event_streaming_bnpl_demo_spark.plans.queries_ext25 import \
        run_pit_stream

    # 6 events for one user, ALL at the same timestamp: purchases at
    # event_id 3 and 6 so each sees strictly-prior history by event_id.
    rows = [(i, 1, "purchase" if i in (3, 6) else "view",
             "2026-01-01 00:00:00", 100) for i in range(1, 7)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts_s string, vcents long"
    ).select("event_id", "user_id", "event_type",
             F.col("ts_s").cast("timestamp").alias("ts"), "vcents")

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    base = 1_600_000_000
    # slice 0 = events 1-3, slice 1 = events 4-6: both have min ts =
    # the hot timestamp; slice 2 = empty (edge b).
    for k, (lo, hi) in enumerate([(1, 3), (4, 6), (99, 0)]):
        part = ev.filter((F.col("event_id") >= lo)
                         & (F.col("event_id") <= hi)).coalesce(1)
        sub = str(tmp_path / f"stage{k}")
        part.write.mode("overwrite").parquet(sub)
        src = next(p for p in os.listdir(sub) if p.startswith("part-"))
        dst = str(in_dir / f"{k:05d}.parquet")
        os.rename(os.path.join(sub, src), dst)
        os.utime(dst, (base + k, base + k))

    out = {r["event_id"]: r for r in
           run_pit_stream(spark, str(in_dir), str(tmp_path / "w")).collect()}
    assert set(out) == {3, 6}
    # event 3: two prior views within its own slice
    assert out[3]["n_prior_events"] == 2
    assert out[3]["prior_value_cents"] == 200
    # event 6: 2 within-slice priors + ALL THREE rows of the earlier
    # same-timestamp slice (the ts-only filter would have dropped them)
    assert out[6]["n_prior_events"] == 5
    assert out[6]["n_prior_views"] == 4   # the purchase at id 3 counts
    assert out[6]["n_prior_clicks"] == 0  # only in n_prior_events
    assert out[6]["prior_value_cents"] == 500
