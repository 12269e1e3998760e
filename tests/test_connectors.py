"""Broker connector path (S1/S3/S4): the Kafka reader/writer branches exist
as real code and the wire codec round-trips on Kafka-shaped records.

No broker (and no spark-sql-kafka jar) in the sandbox, so the decode/encode
transforms are exercised on *batch* frames with the exact Kafka wire schema
(binary key/value, string topic, timestamp), and the reader/writer builders
are checked for their configured options; `.load()`/`.start()` needing the
connector jar is asserted to fail with the missing-data-source error rather
than silently doing something else."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cupertino_nvr_spark.streaming.codec import encode_event_wire
from cupertino_nvr_spark.streaming.sinks import kafka_sink_options, kafka_topic_writer
from cupertino_nvr_spark.streaming.sources import (
    DEFAULT_SUBSCRIBE_PATTERN,
    broker_options,
    broker_reader,
    decode_broker_records,
)

TS = datetime.datetime(2026, 1, 1, 12, 0, 0)

GOOD = (
    '{"instance_id":"p-0","source_id":3,"frame_id":42,'
    '"timestamp":"2026-01-01T12:00:00.000Z","model_id":"m1",'
    '"inference_time_ms":10.5,"detections":[],"fps":25.0,"latency_ms":33.0}'
)


def kafka_shaped(spark, rows):
    """Batch frame with the Kafka source's wire schema."""
    df = spark.createDataFrame(
        [Row(topic=t, value=v, timestamp=TS) for t, v in rows]
    )
    return df.select(
        F.col("topic"),
        F.col("value").cast("binary").alias("value"),
        F.lit(None).cast("binary").alias("key"),
        F.col("timestamp"),
    )


def test_decode_broker_records_splits_good_and_bad(spark):
    raw = kafka_shaped(
        spark,
        [
            ("nvr/detections/3", GOOD),
            ("nvr/detections/4", "{not json"),          # unparseable payload
            ("nvr/detections/cam", GOOD),               # non-integer topic leaf
        ],
    )
    ok, quarantine = decode_broker_records(raw)
    ok_rows = ok.collect()
    assert len(ok_rows) == 1
    row = ok_rows[0]
    assert row["source_id"] == 3 and row["topic_source_id"] == 3
    assert row["frame_id"] == 42 and row["model_id"] == "m1"
    assert row["broker_ts"] == TS  # broker append time rides along (T1)
    bad = {r["reason"] for r in quarantine.collect()}
    assert bad == {"unparseable_payload", "bad_topic"}


def test_wire_roundtrip_through_kafka_shape(spark):
    """events -> encode_event_wire -> kafka wire -> decode -> same events."""
    ok, _ = decode_broker_records(
        kafka_shaped(spark, [("nvr/detections/3", GOOD)])
    )
    events = ok.drop("topic_source_id", "broker_ts")
    wire = encode_event_wire(events).select(
        "topic", F.col("value").cast("binary").alias("value"), F.lit(TS).alias("timestamp")
    )
    ok2, quarantine2 = decode_broker_records(wire)
    assert quarantine2.count() == 0
    r = ok2.collect()[0]
    assert (r["source_id"], r["frame_id"], r["model_id"]) == (3, 42, "m1")


def test_broker_options_configured():
    opts = broker_options("broker-0:9092,broker-1:9092", max_offsets_per_trigger=100_000)
    assert opts["kafka.bootstrap.servers"] == "broker-0:9092,broker-1:9092"
    assert opts["subscribePattern"] == DEFAULT_SUBSCRIBE_PATTERN
    assert opts["failOnDataLoss"] == "false"
    assert opts["maxOffsetsPerTrigger"] == "100000"
    assert opts["startingOffsets"] == "latest"


def test_broker_reader_load_requires_connector(spark):
    """Without the spark-sql-kafka jar, .load() must fail with the
    missing-data-source error (if the jar IS present, the source resolves
    and the stream has the Kafka wire schema)."""
    reader = broker_reader(spark, "localhost:9092")
    try:
        df = reader.load()
    except Exception as exc:  # missing connector jar
        assert "kafka" in str(exc).lower()
    else:
        cols = set(df.columns)
        assert {"key", "value", "topic", "timestamp"} <= cols


def test_kafka_sink_options_configured():
    opts = kafka_sink_options("localhost:9092", checkpoint_dir="/tmp/ckpt-kafka-test")
    assert opts["kafka.bootstrap.servers"] == "localhost:9092"
    assert opts["checkpointLocation"] == "/tmp/ckpt-kafka-test"


def test_kafka_topic_writer_builds_wire_stream(spark):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(
            F.lit("p-0").alias("instance_id"),
            (F.col("value") % 4).cast("int").alias("source_id"),
            F.col("value").alias("frame_id"),
            F.col("timestamp"),
            F.lit("m1").alias("model_id"),
            F.lit(1.0).alias("inference_time_ms"),
            F.array().cast("array<struct<class_name:string,confidence:double,x:double,y:double,width:double,height:double,tracker_id:bigint>>").alias("detections"),
            F.lit(25.0).alias("fps"),
            F.lit(10.0).alias("latency_ms"),
        )
    )
    writer = kafka_topic_writer(stream, "localhost:9092", checkpoint_dir="/tmp/ckpt-kafka-test")
    with pytest.raises(Exception, match="(?i)kafka"):
        q = writer.start()  # no connector jar in sandbox
        q.stop()
