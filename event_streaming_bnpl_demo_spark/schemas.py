"""Declared StructTypes — the engine's schema registry.

Two families:

1. The BNPL event-sourcing domain from the reference
   (``producer/events/events.go:4-38``, MySQL DDL ``readme:65-93``):
   a single *envelope* schema that is the union of the four event types
   (discriminated by ``event_type``, absent fields NULL) plus the two
   projection schemas. Batch and streaming share these StructTypes — the
   same transform code runs under ``spark.read`` and ``spark.readStream``.

2. The driver-generated analytics tables (``FIXTURES.md §B``), declared
   explicitly so streaming file sources (which require a schema) and
   tests never rely on inference.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# BNPL event envelope: union of PurchaseCompletedEvent /
# PaymentPromiseCreatedEvent / MemberBillCreatedEvent /
# PaymentCompletedEvent (producer/events/events.go:4-38).
# --------------------------------------------------------------------------
EVENT_TYPES = (
    "PurchaseCompletedEvent",
    "PaymentPromiseCreatedEvent",
    "MemberBillCreatedEvent",
    "PaymentCompletedEvent",
)

#: payment_mode closed vocabulary (producer/events/events.go:18) — UTF-8
#: values must survive every serialization edge.
PAYMENT_MODES = ("すぐ払い", "月まとめ払い")

BNPL_ENVELOPE = T.StructType([
    T.StructField("event_type", T.StringType(), False),
    T.StructField("order_id", T.StringType(), True),
    T.StructField("user_id", T.StringType(), True),
    T.StructField("amount", T.LongType(), True),
    T.StructField("promise_id", T.StringType(), True),
    T.StructField("bill_id", T.StringType(), True),
    T.StructField("due_date", T.StringType(), True),     # yyyy-MM-dd on the wire
    T.StructField("payment_mode", T.StringType(), True),
    T.StructField("issued_date", T.StringType(), True),  # yyyy-MM-dd on the wire
    T.StructField("paid_date", T.StringType(), True),    # yyyy-MM-dd on the wire
    # assigned by the engine at ingestion (readme:69 created_at analog);
    # optional on input fixtures.
    T.StructField("ingest_ts", T.TimestampType(), True),
])

#: payment_promises projection (readme:73-81)
PAYMENT_PROMISES = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("order_id", T.StringType(), True),
    T.StructField("user_id", T.StringType(), False),
    T.StructField("amount", T.LongType(), True),
    T.StructField("due_date", T.DateType(), True),
    T.StructField("payment_mode", T.StringType(), True),
    T.StructField("created_at", T.TimestampType(), True),
])

#: member_bills projection (readme:84-93)
MEMBER_BILLS = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("promise_id", T.StringType(), True),
    T.StructField("user_id", T.StringType(), False),
    T.StructField("amount", T.LongType(), True),
    T.StructField("status", T.StringType(), False),      # 'unpaid' | 'paid'
    T.StructField("issued_date", T.DateType(), True),
    T.StructField("paid_date", T.DateType(), True),      # NULL until payment
    T.StructField("created_at", T.TimestampType(), True),
])

#: events_log append-only archive (readme:65-70)
EVENTS_LOG = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("event_type", T.StringType(), False),
    T.StructField("event_data", T.StringType(), False),  # raw JSON document
    T.StructField("created_at", T.TimestampType(), False),
])

# --------------------------------------------------------------------------
# Driver-generated analytics tables (FIXTURES.md §B) — explicit schemas.
# --------------------------------------------------------------------------
ANALYTICS_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]),
    "events": T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]),
    "documents": T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]),
}

TABLE_NAMES = tuple(ANALYTICS_SCHEMAS)
