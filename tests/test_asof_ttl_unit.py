"""Spark-free unit pins for BucketedAsofProcessorTTL's timer lifecycle
(the r10 ADVICE items): eviction must delete the armed event-time
timer (not just its tracking ValueState), a stale timer firing after
the bucket repopulated must NOT evict the fresh buffers, and the
born-expired branch must emit the batch's output before clearing
(matching the GroupState twin asof_update_ttl). Driven against fake
state handles so the timer-vs-input ordering hazard — which is batch/
version dependent on the real engine — is exercised deterministically.
"""

from __future__ import annotations

import pandas as pd

from event_streaming_bnpl_demo_spark.streaming.asof_state import (
    BucketedAsofProcessorTTL)


class _FakeList:
    def __init__(self):
        self._rows = []

    def get(self):
        return list(self._rows)

    def appendList(self, rows):
        self._rows.extend(tuple(r) for r in rows)

    def clear(self):
        self._rows = []


class _FakeValue:
    def __init__(self):
        self._v = None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self._states = {}
        self.registered = []
        self.deleted = []

    def getListState(self, name, schema):
        return self._states.setdefault(name, _FakeList())

    def getValueState(self, name, schema):
        return self._states.setdefault(name, _FakeValue())

    def registerTimer(self, expiry_ms):
        self.registered.append(expiry_ms)

    def deleteTimer(self, expiry_ms):
        self.deleted.append(expiry_ms)


class _TimerValues:
    def __init__(self, wm_ms):
        self._wm = wm_ms

    def getCurrentWatermarkInMs(self):
        return self._wm


class _ExpiredInfo:
    def __init__(self, expiry_ms):
        self._ms = expiry_ms

    def getExpiryTimeInMs(self):
        return self._ms


def _batch(*rows):
    """rows: (user_id, ts_s, event_id, event_type) tuples -> one pdf."""
    return iter([pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts_us": [r[1] * 1_000_000 for r in rows],
        "event_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
    })]) if rows else iter([])


def _mk(ttl_s):
    proc = BucketedAsofProcessorTTL(ttl_s=ttl_s)
    handle = _FakeHandle()
    proc.init(handle)
    return proc, handle


def test_eviction_deletes_armed_timer():
    proc, handle = _mk(ttl_s=10)
    # batch 1: one view at t=100s, watermark 0 -> timer armed at 110s
    list(proc.handleInputRows((1,), _batch((1, 100, 7, "view")),
                              _TimerValues(0)))
    assert handle.registered == [110_000]
    assert proc._timer.get() == (110_000,)
    # batch 2: watermark jumped past the horizon, no new rows ->
    # born-expired eviction must delete the ARMED timer, not only
    # clear the tracking state
    list(proc.handleInputRows((1,), _batch(), _TimerValues(200_000)))
    assert 110_000 in handle.deleted, \
        "eviction left the event-time timer armed (orphaned-timer hole)"
    assert proc._timer.get() is None
    assert proc._views.get() == []


def test_stale_timer_fire_does_not_evict_repopulated_bucket():
    proc, handle = _mk(ttl_s=10)
    list(proc.handleInputRows((1,), _batch((1, 100, 7, "view")),
                              _TimerValues(0)))
    # eviction at wm=200s drops state and deletes the 110s timer...
    list(proc.handleInputRows((1,), _batch(), _TimerValues(200_000)))
    # ...bucket repopulates within the new horizon (timer at 311s)
    list(proc.handleInputRows(
        (1,), _batch((1, 300, 8, "view"), (1, 301, 9, "purchase")),
        _TimerValues(200_000)))
    assert proc._timer.get() == (311_000,)
    assert len(proc._views.get()) == 1
    # the ORPHANED 110s timer fires late (engine ordering hazard):
    # it no longer matches the tracked timer -> must be a no-op
    list(proc.handleExpiredTimer((1,), _TimerValues(200_000),
                                 _ExpiredInfo(110_000)))
    assert len(proc._views.get()) == 1, \
        "stale timer evicted a repopulated bucket"
    assert proc._timer.get() == (311_000,)
    # the MATCHING timer firing does evict
    list(proc.handleExpiredTimer((1,), _TimerValues(320_000),
                                 _ExpiredInfo(311_000)))
    assert proc._views.get() == []
    assert proc._timer.get() is None


def test_born_expired_emits_before_clearing():
    # ttl_s=0: a row AT the watermark passes the live filter
    # (ts_ms >= wm) yet its horizon is already closed (ts_ms + 0 <=
    # wm) — the fold must still emit the batch's output (matching the
    # GroupState twin) before dropping the state
    proc, handle = _mk(ttl_s=0)
    out = list(proc.handleInputRows(
        (1,), _batch((1, 100, 5, "purchase")), _TimerValues(100_000)))
    assert out and len(out[0]) == 1, \
        "born-expired branch swallowed the batch's emission"
    assert out[0]["purchase_id"].iloc[0] == 5
    assert proc._purchases.get() == []
    assert proc._timer.get() is None
