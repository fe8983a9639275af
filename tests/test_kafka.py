"""Kafka wiring tests — no broker in this environment, so the parse/serialize
transforms are exercised on batch DataFrames carrying Kafka's wire schema,
and the connector path is checked for its actionable error."""

import pytest
from pyspark.sql import functions as F

from casf_spark.streaming import kafka as K


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        [(1, 10, "click", "2024-01-01 00:10:00", 1.5, '{"p": 1}'),
         (2, 11, "view", "2024-01-01 00:20:00", 2.0, '{"p": 2}'),
         (3, 10, "click", "2024-01-01 00:55:00", 0.5, '{"p": 3}')],
        "event_id long, user_id long, event_type string, ts string, "
        "value double, payload string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_wire_round_trip(events):
    wire = K.events_as_kafka_wire(events)
    assert set(wire.columns) == {"key", "value", "topic", "partition", "offset"}
    parsed = K.parse_kafka_events(wire)
    back = parsed.select(*events.columns).orderBy("event_id").collect()
    assert back == events.orderBy("event_id").collect()
    # kafka bookkeeping columns survive for exactly-once sinks
    assert {"topic", "partition", "offset"} <= set(parsed.columns)


def test_poison_messages_dropped(events, spark):
    wire = K.events_as_kafka_wire(events)
    poison = spark.createDataFrame(
        [("k", b"not json at all", "events", 0, 99),
         ("k", b'{"half": ', "events", 0, 100)],
        "key string, value binary, topic string, partition int, offset long",
    ).withColumn("key", F.col("key").cast("binary"))
    parsed = K.parse_kafka_events(wire.unionByName(poison))
    assert parsed.count() == 3  # poison rows filtered, stream survives


def test_reader_options():
    opts = K.kafka_reader_options("broker:9092", "events",
                                  max_offsets_per_trigger=5000)
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == "events"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "5000"
    assert opts["failOnDataLoss"] == "false"
    assert "maxOffsetsPerTrigger" not in K.kafka_reader_options(
        "b:9092", "t", max_offsets_per_trigger=None)


def test_missing_connector_raises_actionable_error(spark):
    with pytest.raises(RuntimeError, match="--packages"):
        K.read_events_kafka(spark, "localhost:9092", "events")
