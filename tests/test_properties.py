"""Property-based convergence tests (hypothesis): the BNPL projections
are recomputes over the event log, so they must be invariant under the
two stream pathologies the reference mishandles — duplicate delivery
(consumer/consumer.go:187: fresh UUID per insert makes dupes
undetectable) and reordering (consumer/consumer.go:214-220: UPDATE
before INSERT hits no row). For ANY event sequence, any permutation +
duplication of it must project to the same bills state."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from event_streaming_bnpl_demo_spark.schemas import BNPL_ENVELOPE
from event_streaming_bnpl_demo_spark.streaming import transforms

BILLS = ["b1", "b2", "b3"]


def _create(bill, i):
    return {"event_type": "MemberBillCreatedEvent", "bill_id": bill,
            "promise_id": f"pr-{bill}", "user_id": "u1", "amount": 100 + i,
            "issued_date": "2026-01-01",
            "ingest_ts": f"2026-01-01T00:00:{i:02d}Z"}


def _pay(bill, i):
    return {"event_type": "PaymentCompletedEvent", "bill_id": bill,
            "user_id": "u1", "amount": 100 + i, "paid_date": "2026-01-02",
            "ingest_ts": f"2026-01-02T00:00:{i:02d}Z"}


events_strategy = st.lists(
    st.tuples(st.sampled_from(BILLS), st.booleans()),
    min_size=1, max_size=6,
).map(lambda pairs: [
    (_pay(b, i) if is_pay else _create(b, i))
    for i, (b, is_pay) in enumerate(pairs)
])


def _project(spark, events):
    import datetime as dt

    rows_in = []
    for e in events:
        r = {f.name: e.get(f.name) for f in BNPL_ENVELOPE.fields}
        r["ingest_ts"] = dt.datetime.fromisoformat(
            e["ingest_ts"].replace("Z", "+00:00"))
        rows_in.append(r)
    df = spark.createDataFrame(rows_in, schema=BNPL_ENVELOPE)
    rows = transforms.project_bills(df).collect()
    return sorted((r["id"], r["status"], str(r["paid_date"]),
                   r["amount"], r["promise_id"]) for r in rows)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=events_strategy, seed=st.randoms(use_true_random=False))
def test_bills_projection_order_and_duplicate_invariant(spark, events, seed):
    baseline = _project(spark, events)
    shuffled = list(events) + [seed.choice(events)]  # duplicate one
    seed.shuffle(shuffled)
    assert _project(spark, shuffled) == baseline
