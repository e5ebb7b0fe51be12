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


def kafka_source_options(bootstrap_servers: str, topic: str,
                         starting_offsets: str = "earliest",
                         max_offsets_per_trigger: int | None = None,
                         ) -> dict[str, str]:
    """Reader options for the Kafka source, exposed as a pure function
    so the contract is pinned by test without a live broker:

    - ``startingOffsets='earliest'`` + checkpoint replaces the
      reference's Latest-iterator restart data loss
      (consumer/consumer.go:64);
    - ``maxOffsetsPerTrigger`` is the backpressure bound the reference
      lacked (consumer/consumer.go:76-78) — serialized as a string, the
      form the DataStreamReader option API requires.
    """
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_records_to_envelope(raw: DataFrame) -> DataFrame:
    """Kafka wire records -> typed envelope: the post-``load()`` stage of
    the Kafka path, shared-by-code (not by convention) with the file
    sources. Takes any DataFrame having Kafka's binary ``value`` column
    (key/topic/partition/offset/timestamp ride along and are dropped),
    casts to string, and applies the same ``_parse_envelope`` every
    other source uses — so a contract test can feed it a batch
    DataFrame with the Kafka wire schema and assert the output schema
    is byte-identical to ``read_event_batch``'s, no broker needed.
    """
    return _parse_envelope(
        raw.select(F.col("value").cast("string").alias("value")))


def read_kafka_stream(spark: SparkSession, bootstrap_servers: str,
                      topic: str, starting_offsets: str = "earliest",
                      max_offsets_per_trigger: int | None = None) -> DataFrame:
    """Kafka event source (SURVEY §2.2 'Kafka source'): identical
    downstream envelope to the file source — swap the reader, keep every
    transform. Requires the spark-sql-kafka package jar at submit time;
    no broker exists in this environment, so ``load()`` itself is
    exercised only by construction — but the reader options
    (``kafka_source_options``) and the post-load parse
    (``kafka_records_to_envelope``) are both pinned by contract tests.
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
            bootstrap_servers, topic, starting_offsets,
            max_offsets_per_trigger).items():
        reader = reader.option(k, v)
    return kafka_records_to_envelope(reader.load())


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
