"""Event-stream sources — the Spark-first replacement for the reference's
Kinesis consumer (``consumer/consumer.go:52-96``: shard discovery,
``GetShardIterator(Latest)``, 1 s poll loop).

Structured Streaming replaces all of that machinery:

- the poll loop       -> micro-batch trigger (``Trigger.ProcessingTime``)
- shard iterator      -> source offsets tracked in the checkpoint
  (fixes the reference's restart data loss at ``consumer/consumer.go:64``)
- single shard 0      -> partitioned source, one task per partition
- ``json.Unmarshal`` to ``map[string]interface{}``
  (``consumer/consumer.go:112-119``) -> ``from_json`` with the declared
  envelope StructType (§1 of SURVEY.md), absent fields NULL.

Sources are file-based (JSON-lines / parquet directories) because no
broker exists in this environment; the read is format-parameterized so a
Kafka source (``format("kafka")`` + identical ``from_json`` parse) drops
in without touching downstream transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import BNPL_ENVELOPE


def _parse_envelope(raw: DataFrame) -> DataFrame:
    """value:string -> typed envelope columns (dynamic-parse analog of
    consumer/consumer.go:112-119, done once, vectorized, JVM-side)."""
    return (
        raw.select(
            F.col("value").alias("event_data"),
            F.from_json("value", BNPL_ENVELOPE).alias("e"),
        )
        .select("event_data", "e.*")
        .withColumn("ingest_ts", F.coalesce("ingest_ts", F.current_timestamp()))
    )


def read_event_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch replay of a JSON-lines event log (text -> envelope)."""
    raw = spark.read.text(path).withColumnRenamed("value", "value")
    return _parse_envelope(raw)


def read_kafka_stream(spark: SparkSession, bootstrap_servers: str,
                      topic: str, starting_offsets: str = "earliest",
                      max_offsets_per_trigger: int | None = None) -> DataFrame:
    """Kafka event source (SURVEY §2.2 'Kafka source'): identical
    downstream envelope to the file source — swap the reader, keep every
    transform. Requires the spark-sql-kafka package jar at submit time;
    no broker exists in this environment, so this path is exercised only
    by construction (the parse stage is shared with the tested sources).

    ``startingOffsets='earliest'`` + checkpoint replaces the reference's
    Latest-iterator data loss (consumer/consumer.go:64);
    ``maxOffsetsPerTrigger`` is the backpressure bound the reference
    lacked (consumer/consumer.go:76-78).
    """
    reader = (spark.readStream.format("kafka")
              .option("kafka.bootstrap.servers", bootstrap_servers)
              .option("subscribe", topic)
              .option("startingOffsets", starting_offsets))
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    raw = reader.load().select(F.col("value").cast("string").alias("value"))
    return _parse_envelope(raw)


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = 1) -> DataFrame:
    """Streaming read of a JSON-lines event directory.

    ``maxFilesPerTrigger`` is the backpressure knob the reference lacked
    (unbounded ``GetRecords``, consumer/consumer.go:76-78).
    """
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(path)
    return _parse_envelope(raw)
