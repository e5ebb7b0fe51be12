"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): a
deterministic synthetic BNPL purchase-event generator exposing BOTH a
partitioned batch reader and a checkpointable streaming reader from one
implementation — the engine's demonstration of Spark's user-defined
source extension point (the reference hard-wires its one source to the
Kinesis SDK, consumer/consumer.go:52-96; here a new source is a small
Python class away, registered per-session).

Every row is a pure function of its global index, so the source is
exactly-once replayable by construction (``readBetweenOffsets`` simply
regenerates the range) and the batch output is oracle-checkable against
a DuckDB ``generate_series`` query computing the identical integer
arithmetic.

Scale posture: generation is embarrassingly parallel (one task per
index range, no coordination); this is an integration/ingest surface,
not an analytic hot path — Python-side row generation is the cost of
the extension point and is confined to the source boundary, exactly
where Spark puts connector code.
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)

#: Knuth multiplicative-hash constant / MINSTD multiplier — fixed
#: public constants so the oracle SQL reproduces rows bit-for-bit.
_MULT_USER = 2654435761
_MULT_AMT = 48271
_EVENT_TYPES = ("purchase", "bill", "payment", "refund")

SCHEMA = "event_id BIGINT, user_id BIGINT, event_type STRING, amount BIGINT"


def _row(i: int) -> tuple:
    return (i, (i * _MULT_USER) % 1000, _EVENT_TYPES[i % 4],
            (i * _MULT_AMT) % 10000)


def oracle_sql(rows: int) -> str:
    """DuckDB SQL generating the identical row set."""
    return f"""
    SELECT i AS event_id,
           (i * {_MULT_USER}) % 1000 AS user_id,
           CASE i % 4 WHEN 0 THEN 'purchase' WHEN 1 THEN 'bill'
                      WHEN 2 THEN 'payment' ELSE 'refund' END AS event_type,
           (i * {_MULT_AMT}) % 10000 AS amount
    FROM generate_series(0, {rows - 1}) t(i)
    """


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 10000))
        self.numParts = int(options.get("partitions", 8))

    def partitions(self):
        step = -(-self.rows // self.numParts)
        return [_RangePartition(s, min(s + step, self.rows))
                for s in range(0, self.rows, step)]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class _StreamReader(SimpleDataSourceStreamReader):
    """Offset = next global index; each micro-batch serves a fixed
    range, so restart/replay between any two committed offsets
    regenerates the same rows (exactly-once by determinism)."""

    def __init__(self, options):
        self.per_batch = int(options.get("rowsPerBatch", 100))

    def initialOffset(self):
        return {"index": 0}

    def read(self, start):
        s = start["index"]
        end = {"index": s + self.per_batch}
        return ([_row(i) for i in range(s, s + self.per_batch)], end)

    def readBetweenOffsets(self, start, end):
        return [_row(i) for i in range(start["index"], end["index"])]

    def commit(self, end):
        pass  # nothing external to clean up; rows are regenerable


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("bnpl_synthetic")`` /
    ``spark.readStream.format("bnpl_synthetic")`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``.

    Options: ``rows`` (batch total, default 10000), ``partitions``
    (batch split, default 8), ``rowsPerBatch`` (streaming, default 100).
    """

    @classmethod
    def name(cls):
        return "bnpl_synthetic"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _StreamReader(self.options)


def register_datasource(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
