"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): a
deterministic synthetic BNPL purchase-event generator exposing all four
connector surfaces from one class — partitioned batch reader,
checkpointable streaming reader, two-phase-commit batch writer, and
per-epoch idempotent streaming writer. This is the engine's
demonstration of Spark's user-defined connector extension point (the
reference hard-wires its one source to the Kinesis SDK,
consumer/consumer.go:52-96, and its one sink to non-idempotent MySQL
INSERTs, consumer/consumer.go:185-191; here both ends are a small
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

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamWriter, DataSourceWriter,
                                    InputPartition,
                                    SimpleDataSourceStreamReader,
                                    WriterCommitMessage)

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


@dataclass
class _FileCommit(WriterCommitMessage):
    path: str
    rows: int


class _JsonlWriter(DataSourceWriter):
    """Task-side write to a uniquely-named temp file; the driver-side
    ``commit`` atomically renames every task's file into place — the
    standard two-phase commit of a Spark sink, in ~30 lines. ``abort``
    leaves only ``.tmp-`` files, which a re-run ignores."""

    def __init__(self, options, overwrite: bool = False):
        self.path = options.get("path")
        self.overwrite = overwrite
        if not self.path:
            raise ValueError("bnpl_synthetic writer requires option 'path'")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(path=tmp, rows=n)

    def commit(self, messages):
        committed = set()
        for m in messages:
            # rename only the basename: a parent directory containing
            # '.tmp-' must not be rewritten by a whole-path replace
            d, base = os.path.split(m.path)
            new = base.replace(".tmp-", "part-", 1)
            os.rename(m.path, os.path.join(d, new))
            committed.add(new)
        if self.overwrite and os.path.isdir(self.path):
            # remove prior committed output AFTER this job's files are
            # in place (uuid basenames cannot collide with old parts),
            # so a crash mid-commit never leaves the directory with the
            # old output destroyed and nothing committed; isdir guards
            # the zero-task job where no write() created the directory
            for name in os.listdir(self.path):
                if (name.startswith("part-") and name.endswith(".jsonl")
                        and name not in committed):
                    os.remove(os.path.join(self.path, name))

    def abort(self, messages):
        for m in messages:
            if os.path.exists(m.path):
                os.remove(m.path)


class _JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming flavor: one committed directory per epoch (micro
    batch), so a replayed epoch overwrites its own output instead of
    appending twice — idempotent commit, the property the reference's
    non-idempotent INSERT sink lacks (consumer/consumer.go:185-191)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("bnpl_synthetic writer requires option 'path'")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(path=tmp, rows=n)

    def commit(self, messages, batchId):
        epoch = os.path.join(self.path, f"epoch={batchId}")
        os.makedirs(epoch, exist_ok=True)
        for f in os.listdir(epoch):      # replayed epoch: clear first
            os.remove(os.path.join(epoch, f))
        for i, m in enumerate(messages):
            os.rename(m.path, os.path.join(epoch, f"part-{i:05d}.jsonl"))

    def abort(self, messages, batchId):
        for m in messages:
            if os.path.exists(m.path):
                os.remove(m.path)


class SyntheticEventsDataSource(DataSource):
    """``spark.read`` / ``spark.readStream`` / ``df.write`` /
    ``writeStream`` with ``format("bnpl_synthetic")`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)`` — all four
    connector surfaces from one class.

    Read options: ``rows`` (batch total, default 10000), ``partitions``
    (batch split, default 8), ``rowsPerBatch`` (streaming, default
    100). Write options: ``path`` (JSON-lines output; batch = two-phase
    temp-file + rename commit, streaming = one idempotent directory per
    epoch).
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

    def writer(self, schema, overwrite):
        return _JsonlWriter(self.options, overwrite=overwrite)

    def streamWriter(self, schema, overwrite):
        return _JsonlStreamWriter(self.options)


def register_datasource(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
