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

    work = _scratch(f"pitstream_v2_{source_fingerprint(SF)}")
    state_batches = glob.glob(f"{work}/state/batch=*")
    assert len(state_batches) == _N_SLICES
    mins = []
    for b in state_batches:
        part = spark.read.parquet(b)
        assert set(part.columns) == {
            "user_id", "c_all", *{f"c_{t}" for t in _TYPES},
            "v_cents", "slice_min_ts"}
        ms = part.select("slice_min_ts").distinct().collect()
        assert len(ms) == 1          # one slice, one time tag
        mins.append(ms[0][0])
    assert len(set(mins)) == _N_SLICES   # slices are disjoint in time

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
