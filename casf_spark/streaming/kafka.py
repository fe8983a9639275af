"""Kafka source/sink wiring for the events stream.

The reference is batch-only (SURVEY.md §2.9); in production the events
pipeline (streaming/events.py) reads from Kafka rather than a landing
directory. This module wires that seam:

* ``parse_kafka_events`` — pure DataFrame transform from Kafka's fixed wire
  schema (key/value binary, topic, partition, offset, timestamp) to typed
  event rows. Works on batch OR streaming frames, so it is unit-testable
  without a broker: tests feed a batch DataFrame with the same wire schema.
* ``read_events_kafka`` / ``write_events_kafka`` — the connector calls.
  The spark-sql-kafka package is not in this environment (no broker either),
  so these raise a clear error if the connector is absent; the option
  plumbing itself is exercised by tests via ``kafka_reader_options``.

At scale: one Kafka partition maps to one Spark input partition — size the
topic's partition count to the executor core budget. ``maxOffsetsPerTrigger``
bounds micro-batch size; watermarks (events.tumbling_counts) bound state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: JSON payload schema for one event message (matches the events table
#: produced by sources.tables.load_table, minus the nanos shim).
EVENT_PAYLOAD = T.StructType([
    T.StructField("event_id", T.LongType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("payload", T.StringType(), True),
])


def kafka_reader_options(bootstrap_servers: str, topic: str,
                         starting_offsets: str = "earliest",
                         max_offsets_per_trigger: int | None = 100_000,
                         fail_on_data_loss: bool = False) -> dict[str, str]:
    """Connector options for a Kafka readStream, as a plain dict so tests
    (and spark-submit conf files) can inspect them without a broker."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def parse_kafka_events(kafka_df: DataFrame,
                       payload_schema: T.StructType = EVENT_PAYLOAD) -> DataFrame:
    """Kafka wire rows -> typed event rows.

    Input must carry Kafka's fixed columns (``value`` binary at minimum;
    ``topic``/``partition``/``offset`` kept for exactly-once bookkeeping).
    Malformed JSON yields a row of nulls in ``event`` (PERMISSIVE mode) —
    filtered here so a poison message never kills the stream; production
    pipelines fork the null branch to a dead-letter sink instead.
    """
    cols = kafka_df.columns
    meta = [c for c in ("topic", "partition", "offset") if c in cols]
    parsed = kafka_df.select(
        F.from_json(F.col("value").cast("string"), payload_schema).alias("event"),
        *meta)
    return (parsed
            .where(F.col("event.event_id").isNotNull())
            .select("event.*", *meta))


def read_events_kafka(spark: SparkSession, bootstrap_servers: str,
                      topic: str, **options) -> DataFrame:
    """readStream from Kafka -> parsed event rows.

    Requires the ``spark-sql-kafka-0-10`` connector on the classpath
    (``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>``).
    Raises RuntimeError with that hint when the connector is missing.
    """
    opts = kafka_reader_options(bootstrap_servers, topic, **options)
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except Exception as e:  # connector jar absent -> actionable error
        raise RuntimeError(
            "Kafka connector not available; launch with --packages "
            "org.apache.spark:spark-sql-kafka-0-10_<scala>:<spark-version>"
        ) from e
    return parse_kafka_events(raw)


def write_events_kafka(df: DataFrame, bootstrap_servers: str, topic: str,
                       checkpoint: str, key_col: str = "event_id"):
    """writeStream to Kafka: rows serialize as (key = key_col, value = JSON
    of all columns). Returns the StreamingQuery. Same connector requirement
    as read_events_kafka."""
    payload = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"))
    try:
        return (payload.writeStream.format("kafka")
                .option("kafka.bootstrap.servers", bootstrap_servers)
                .option("topic", topic)
                .option("checkpointLocation", checkpoint)
                .start())
    except Exception as e:
        raise RuntimeError(
            "Kafka connector not available; launch with --packages "
            "org.apache.spark:spark-sql-kafka-0-10_<scala>:<spark-version>"
        ) from e


def events_as_kafka_wire(events: DataFrame) -> DataFrame:
    """Batch helper (tests/demos): wrap event rows in Kafka's wire schema —
    the exact inverse of parse_kafka_events, so round-trip tests pin both
    directions without a broker."""
    return events.select(
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*events.columns)).cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        (F.monotonically_increasing_id()).alias("offset"),
    )


__all__ = [
    "EVENT_PAYLOAD", "kafka_reader_options", "parse_kafka_events",
    "read_events_kafka", "write_events_kafka", "events_as_kafka_wire",
]
