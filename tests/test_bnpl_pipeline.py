"""Golden replay tests for the BNPL pipeline (FIXTURES.md A3): readme
steps A/B/C as a deterministic event sequence, plus the failure modes
the reference gets wrong — duplicate delivery (v1), payment-before-bill
reordering (v2), unpaid second user (v3) — and streaming parity with
restart recovery (the consumer/consumer.go:64 fix)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from event_streaming_bnpl_demo_spark.streaming.pipeline import BnplPipeline

T0 = "2026-01-01T00:00:00.000Z"

GOLDEN = [
    {"event_type": "PurchaseCompletedEvent", "order_id": "order-u01",
     "user_id": "u01", "amount": 5000, "ingest_ts": T0},
    {"event_type": "PaymentPromiseCreatedEvent", "promise_id": "pr-001",
     "order_id": "order-u01", "user_id": "u01", "due_date": "2026-01-31",
     "payment_mode": "月まとめ払い", "ingest_ts": T0},
    {"event_type": "MemberBillCreatedEvent", "bill_id": "b-001",
     "promise_id": "pr-001", "user_id": "u01", "amount": 5000,
     "issued_date": "2026-01-01", "ingest_ts": T0},
    {"event_type": "PaymentCompletedEvent", "bill_id": "b-001",
     "user_id": "u01", "amount": 5000, "paid_date": "2026-01-02",
     "ingest_ts": "2026-01-02T00:00:00.000Z"},
]

EXTRA_USER = [
    {"event_type": "MemberBillCreatedEvent", "bill_id": "b-002",
     "promise_id": "pr-002", "user_id": "u02", "amount": 700,
     "issued_date": "2026-01-03", "ingest_ts": "2026-01-03T00:00:00.000Z"},
]


def write_events(path: str, events: list[dict], name: str = "part-0.jsonl"):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w", encoding="utf-8") as f:
        for e in events:
            f.write(json.dumps(e, ensure_ascii=False) + "\n")


def assert_golden_state(pipe: BnplPipeline):
    promises = {r["id"]: r.asDict() for r in pipe.promises().collect()}
    bills = {r["id"]: r.asDict() for r in pipe.bills().collect()}
    # explicit promise event + the flattened purchase-derived promise
    assert "pr-001" in promises
    p = promises["pr-001"]
    assert p["user_id"] == "u01"
    assert str(p["due_date"]) == "2026-01-31"
    assert p["payment_mode"] == "月まとめ払い"  # UTF-8 enum survives round-trip
    derived = [v for v in promises.values() if v["order_id"] == "order-u01"
               and v["id"] != "pr-001"]
    assert len(derived) == 1
    assert derived[0]["amount"] == 5000  # amount carried, not 3500
    b = bills["b-001"]
    assert b["status"] == "paid"
    assert str(b["paid_date"]) == "2026-01-02"
    assert b["amount"] == 5000
    assert b["promise_id"] == "pr-001"


def test_batch_replay_golden(spark, tmp_path):
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    write_events(in_dir, GOLDEN + EXTRA_USER)
    pipe = BnplPipeline(spark, in_dir, out_dir)
    pipe.replay_batch()
    assert_golden_state(pipe)
    # v3: second user's bill stays unpaid, paid_date NULL
    b2 = [r for r in pipe.bills().collect() if r["id"] == "b-002"][0]
    assert b2["status"] == "unpaid" and b2["paid_date"] is None


def test_duplicate_delivery_idempotent(spark, tmp_path):
    """v1: every event delivered twice -> projections unchanged (the
    reference inserts duplicate rows; we dedup on content hash)."""
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    write_events(in_dir, GOLDEN + GOLDEN)
    pipe = BnplPipeline(spark, in_dir, out_dir)
    pipe.replay_batch()
    assert_golden_state(pipe)
    assert pipe.promises().filter("id = 'pr-001'").count() == 1
    assert pipe.bills().filter("id = 'b-001'").count() == 1


def test_replay_parity_no_cascade(spark, tmp_path):
    """derive_cascade=False: replaying a log that already contains the
    cascaded promise event yields EXACTLY the reference's MySQL state —
    one promise row (the explicit pr-001), no derived twin."""
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    write_events(in_dir, GOLDEN)
    pipe = BnplPipeline(spark, in_dir, out_dir, derive_cascade=False)
    pipe.replay_batch()
    promises = pipe.promises().collect()
    assert [r["id"] for r in promises] == ["pr-001"]
    assert pipe.bills().filter("id = 'b-001'").count() == 1


def test_payment_before_bill_converges(spark, tmp_path):
    """v2: reordered delivery (payment first) still converges to
    status='paid' — the reference's UPDATE would have hit no row."""
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    write_events(in_dir, list(reversed(GOLDEN)))
    pipe = BnplPipeline(spark, in_dir, out_dir)
    pipe.replay_batch()
    assert_golden_state(pipe)


def test_streaming_matches_batch(spark, tmp_path):
    """The same transforms under readStream + checkpoint produce the
    same final projections as batch replay."""
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    write_events(in_dir, GOLDEN)
    pipe = BnplPipeline(spark, in_dir, out_dir)
    pipe.run_stream(available_now=True)
    assert_golden_state(pipe)


def test_streaming_restart_no_loss(spark, tmp_path):
    """Restart recovery: stop after batch 1, add more files, resume from
    checkpoint — nothing lost, nothing double-processed (the exact
    failure of the reference's Latest iterator)."""
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    write_events(in_dir, GOLDEN[:2], "a.jsonl")
    pipe = BnplPipeline(spark, in_dir, out_dir)
    pipe.run_stream(available_now=True)
    assert pipe.bills().count() == 0
    # "restart": new pipeline object, same checkpoint; new data arrives
    write_events(in_dir, GOLDEN[2:], "b.jsonl")
    pipe2 = BnplPipeline(spark, in_dir, out_dir)
    pipe2.run_stream(available_now=True)
    assert_golden_state(pipe2)
    # log has exactly the 4 distinct events + 1 derived promise
    assert pipe2.read_log().count() == 5


def _final_state(pipe: BnplPipeline):
    promises = sorted(
        (r["id"], r["order_id"], r["user_id"], r["amount"],
         str(r["due_date"]), r["payment_mode"])
        for r in pipe.promises().collect())
    bills = sorted(
        (r["id"], r["promise_id"], r["user_id"], r["amount"], r["status"],
         str(r["issued_date"]), str(r["paid_date"]))
        for r in pipe.bills().collect())
    return promises, bills


def test_incremental_equals_recompute(spark, tmp_path):
    """The incremental (fold-partial-aggregates) projection mode must
    produce exactly the recompute-from-log state — including under
    duplicate delivery, reordering, and a checkpointed restart — since
    every combiner is associative, commutative, and idempotent."""
    events = list(reversed(GOLDEN)) + EXTRA_USER + GOLDEN  # reorder + dupes
    in_dir = str(tmp_path / "in")
    write_events(in_dir, events[:4], "a.jsonl")
    write_events(in_dir, events[4:], "b.jsonl")

    pipes = {}
    for mode in ("recompute", "incremental"):
        out = str(tmp_path / f"out_{mode}")
        pipe = BnplPipeline(spark, in_dir, out, projection_mode=mode)
        pipe.run_stream(available_now=True)
        pipes[mode] = pipe
    assert _final_state(pipes["incremental"]) == _final_state(pipes["recompute"])
    assert_golden_state(pipes["incremental"])

    # restart: late third file, resume both from their checkpoints
    write_events(in_dir, [{
        "event_type": "MemberBillCreatedEvent", "bill_id": "b-003",
        "promise_id": "pr-001", "user_id": "u01", "amount": 250,
        "issued_date": "2026-01-05", "ingest_ts": "2026-01-05T00:00:00.000Z",
    }], "c.jsonl")
    for mode in ("recompute", "incremental"):
        pipe = BnplPipeline(spark, in_dir, str(tmp_path / f"out_{mode}"),
                            projection_mode=mode)
        pipe.run_stream(available_now=True)
        pipes[mode] = pipe
    assert _final_state(pipes["incremental"]) == _final_state(pipes["recompute"])
    b3 = [r for r in pipes["incremental"].bills().collect()
          if r["id"] == "b-003"][0]
    assert b3["status"] == "unpaid" and b3["amount"] == 250


def _has_protobuf() -> bool:
    try:
        import importlib.util
        return importlib.util.find_spec("google.protobuf") is not None
    except (ImportError, ModuleNotFoundError):
        return False


@pytest.mark.parametrize("reorder", [False, True])
@pytest.mark.parametrize("api", [
    "group_state",
    pytest.param("transform_with_state", marks=pytest.mark.skipif(
        not _has_protobuf(),
        reason="transformWithState's driver worker imports google.protobuf "
               "(state-server protocol); conftest's _pb_shim normally "
               "provides it — skip only if even the shim is unavailable")),
])
def test_state_machine_stream(spark, tmp_path, reorder, api):
    """Bill lifecycle over a file stream on BOTH stateful APIs
    (applyInPandasWithState and Spark 4 transformWithStateInPandas):
    create→pay (and pay→create reordered) both end 'paid'."""
    import contextlib

    from event_streaming_bnpl_demo_spark.sources.events import read_event_stream
    from event_streaming_bnpl_demo_spark.streaming.state import (
        bill_state_stream, bill_state_stream_tws, rocksdb_state_store)

    impl = bill_state_stream if api == "group_state" else bill_state_stream_tws
    events = GOLDEN[2:4]
    if reorder:
        events = list(reversed(events))
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "state_out")
    write_events(in_dir, events)
    stream = read_event_stream(spark, in_dir)
    # transformWithState requires the RocksDB provider — scoped to this
    # query start so the session default is untouched afterwards
    provider = (rocksdb_state_store(spark) if api == "transform_with_state"
                else contextlib.nullcontext())
    with provider:
        q = (impl(stream).writeStream
             .format("memory").queryName(f"bill_state_{api}")
             .outputMode("update")
             .option("checkpointLocation", out)
             .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = {r["bill_id"]: r.asDict()
            for r in spark.sql(f"select * from bill_state_{api}").collect()}
    assert rows["b-001"]["status"] == "paid"
    assert rows["b-001"]["paid_date"] == "2026-01-02"
    assert rows["b-001"]["amount"] == 5000


def _purchase(uid: str, amount: int, ts: str) -> dict:
    return {"event_type": "PurchaseCompletedEvent",
            "order_id": f"order-{uid}", "user_id": uid,
            "amount": amount, "ingest_ts": ts}


def test_compact_log_preserves_rows(spark, tmp_path):
    """compact_log rewrites the many per-micro-batch archive files into
    few, preserves the exact event multiset, and streaming appends keep
    working afterwards (the source checkpoint is untouched)."""
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    for f in range(3):   # 3 files -> 3 micro-batches of small writes
        write_events(in_dir, [
            _purchase(f"u{f}-{i}", 100 + i, ts=f"2026-01-01T00:0{f}:{i:02d}Z")
            for i in range(5)], name=f"f{f}.jsonl")
    pipe = BnplPipeline(spark, in_dir, out_dir)
    pipe.run_stream(available_now=True)
    before = sorted(r["event_data"]
                    for r in pipe.read_log().select("event_data").collect())

    stats = pipe.compact_log(target_rows_per_file=1_000_000)
    assert stats["files_after"] < stats["files_before"]
    after = sorted(r["event_data"]
                   for r in pipe.read_log().select("event_data").collect())
    assert after == before

    # the stream continues from its checkpoint onto the compacted log
    write_events(in_dir, [_purchase("u9", 999, ts="2026-01-01T00:09:00Z")],
                 name="f9.jsonl")
    BnplPipeline(spark, in_dir, out_dir).run_stream(available_now=True)
    final = BnplPipeline(spark, in_dir, out_dir).read_log()
    assert final.filter(F.col("user_id") == "u9").count() > 0
    # +2: the new purchase archives itself AND its flattened derived promise
    assert final.select("event_data").distinct().count() == len(before) + 2


def test_observe_quality_metrics(spark, tmp_path):
    """df.observe quality metrics accumulate during the pipeline's own
    action — no second scan: counts, malformed rows, negative amounts."""
    from event_streaming_bnpl_demo_spark.schemas import BNPL_ENVELOPE
    from event_streaming_bnpl_demo_spark.streaming.transforms import (
        observe_quality)

    in_dir = str(tmp_path / "in")
    rows = [_purchase("u1", 100, ts="2026-01-01T00:00:00Z"),
            _purchase("u2", -5, ts="2026-01-01T00:00:01Z"),
            {"order_id": "o-bad"}]  # no event_type
    write_events(in_dir, rows)
    df = spark.read.schema(BNPL_ENVELOPE).json(in_dir)
    observed, obs = observe_quality(df)
    assert observed.count() == 3     # the action the metrics ride on
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_missing_type"] == 1
    assert got["n_negative_amount"] == 1


def test_tws_initial_state_bootstraps_batch_history(spark, tmp_path):
    """Warm-start migration path: the batch last-event-wins state is
    handed to the streaming query as transformWithState initialState;
    the stream then processes ONLY a payment event, and the output
    carries the promise/issue fields that existed solely in the batch
    bootstrap — backfill once, stream forever, no replay."""
    if not _has_protobuf():
        pytest.skip("transformWithState needs the protobuf shim")
    from event_streaming_bnpl_demo_spark.sources.events import (
        read_event_stream,
    )
    from event_streaming_bnpl_demo_spark.streaming.state import (
        bill_state_stream_tws, rocksdb_state_store,
    )

    from event_streaming_bnpl_demo_spark.sources.events import (
        read_event_batch,
    )
    from event_streaming_bnpl_demo_spark.streaming.state import (
        bill_bootstrap_frame,
    )
    from event_streaming_bnpl_demo_spark.streaming.transforms import (
        project_bills,
    )

    # batch phase: the REAL history projection (not a hand-built
    # frame) adapted through the production bootstrap glue
    hist_dir = str(tmp_path / "hist")
    write_events(hist_dir, [
        {"event_type": "MemberBillCreatedEvent", "bill_id": "b-009",
         "promise_id": "pr-009", "user_id": "u09", "amount": 1200,
         "issued_date": "2026-01-01",
         "ingest_ts": "2026-01-01T00:00:00.000Z"},
    ])
    boot = bill_bootstrap_frame(
        project_bills(read_event_batch(spark, hist_dir)))
    in_dir = str(tmp_path / "in")
    write_events(in_dir, [
        {"event_type": "PaymentCompletedEvent", "bill_id": "b-009",
         "user_id": "u09", "amount": 1200, "paid_date": "2026-01-05",
         "ingest_ts": "2026-01-05T00:00:00.000Z"},
    ])
    stream = read_event_stream(spark, in_dir)
    with rocksdb_state_store(spark):
        q = (bill_state_stream_tws(stream, initial_state=boot)
             .writeStream.format("memory").queryName("tws_boot")
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
    row = {r["bill_id"]: r.asDict()
           for r in spark.sql("select * from tws_boot").collect()}["b-009"]
    assert row["status"] == "paid" and row["paid_date"] == "2026-01-05"
    # these fields never appeared in the stream — bootstrap knowledge
    assert row["promise_id"] == "pr-009"
    assert row["issued_date"] == "2026-01-01"
    assert row["amount"] == 1200
