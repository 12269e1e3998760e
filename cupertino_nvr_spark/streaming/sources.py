"""Streaming sources (SURVEY §2.1 S1/S2/S4).

The reference ingests N RTSP camera streams and an MQTT event stream
(reference ``cupertino_nvr/processor/pipeline_manager.py:92-98``,
``cupertino_nvr/wall/mqtt_listener.py:59-69``). Locally there is no broker,
so two source shapes stand in, both cluster-honest:

- **file replay** — ``readStream.format("parquet")`` over a directory; in
  production this is the Kafka/MQTT topic (`subscribePattern`) with the
  same downstream plan.
- **rate-synthesized** — the `rate` source mapped through deterministic
  column arithmetic into frames / detection events; used by tests that need
  an unbounded stream (state timeouts, pause/resume).

``source_id`` derives from the partition key exactly as the reference's
topic protocol encodes it (``events/protocol.py:11-28``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cupertino_nvr_spark.schemas import DETECTION_EVENT_SCHEMA, EVENTS_SCHEMA

#: default subscription — matches every per-source detection topic the sink
#: publishes (reference subscribes ``{prefix}/#`` via MQTT wildcard,
#: ``wall/config.py`` topic pattern; Kafka's regex form of the same).
DEFAULT_SUBSCRIBE_PATTERN = "nvr/detections/.*"


def replay_events_stream(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """File-replay of an events directory as an unbounded stream.

    ``maxFilesPerTrigger=1`` makes each input file one micro-batch so tests
    observe multi-batch behavior; the production swap is
    ``readStream.format("kafka")`` + the codec in ``streaming.codec``.
    """
    return (
        spark.readStream.schema(schema or EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def broker_options(
    bootstrap_servers: str,
    subscribe_pattern: str = DEFAULT_SUBSCRIBE_PATTERN,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Kafka source options as plain data (testable without the connector
    jar; PySpark does not expose a reader's accumulated options)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribePattern": subscribe_pattern,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",  # QoS-0 plane: gaps are documented loss
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def broker_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe_pattern: str = DEFAULT_SUBSCRIBE_PATTERN,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
):
    """Configured Kafka ``DataStreamReader`` — the production S1/S4 ingest.

    The reference's listener subscribes one broker with a topic *pattern*
    and fans every per-source topic into one callback
    (``wall/mqtt_listener.py:59-69``); here that is
    ``format("kafka") + subscribePattern`` — one source, all partitions of
    all matching topics, parallelism = topic partitions, no per-camera
    plumbing. ``maxOffsetsPerTrigger`` bounds micro-batch size so a restart
    after downtime cannot produce an unboundedly large first batch.

    Returned unloaded: ``.load()`` requires the spark-sql-kafka connector
    on the classpath (absent in the sandbox — ``kafka_events_stream`` is
    the full path, exercised by plan-construction tests either way).
    """
    return spark.readStream.format("kafka").options(
        **broker_options(
            bootstrap_servers, subscribe_pattern, starting_offsets, max_offsets_per_trigger
        )
    )


def decode_broker_records(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Kafka wire rows (binary key/value, topic, timestamp) ->
    (events, quarantine), via the same codec the file-replay path uses.

    ``broker_ts`` (the broker's append time) rides along into the event
    frame for T1 processing-time vs event-time derivations.
    """
    from cupertino_nvr_spark.streaming.codec import parse_event_wire

    wire = raw.select(
        F.col("topic"),
        F.col("value").cast("string").alias("value"),
        F.col("timestamp").alias("broker_ts"),
    )
    return parse_event_wire(wire, passthrough=("broker_ts",))


def kafka_events_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe_pattern: str = DEFAULT_SUBSCRIBE_PATTERN,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """S1/S4 broker ingest: subscribe-pattern Kafka source -> decoded
    (events, quarantine) streams. Same downstream plan as
    ``replay_events_stream`` — swapping file replay for the broker is this
    one call."""
    raw = broker_reader(
        spark, bootstrap_servers, subscribe_pattern, starting_offsets, max_offsets_per_trigger
    ).load()
    return decode_broker_records(raw)


def synthetic_frames_stream(
    spark: SparkSession, n_sources: int = 4, rows_per_second: int = 100
) -> DataFrame:
    """Unbounded VideoFrame-metadata stream (FRAME_SCHEMA) from the rate
    source: frame pixels are out of scope (BASELINE north star); the
    metadata tuple matches reference ``interfaces.py:135-152``."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        (F.col("value") % n_sources).cast("int").alias("source_id"),
        (F.col("value") / n_sources).cast("long").alias("frame_id"),
        F.col("timestamp").alias("frame_ts"),
        F.lit(640).alias("width"),
        F.lit(480).alias("height"),
    )


def synthetic_detection_stream(
    spark: SparkSession, n_sources: int = 4, rows_per_second: int = 100
) -> DataFrame:
    """Unbounded DetectionEvent stream: rate source + the deterministic
    synthetic detector (U1), already in the nested event schema."""
    from cupertino_nvr_spark.streaming.inference import with_synthetic_detections

    frames = synthetic_frames_stream(spark, n_sources, rows_per_second)
    detected = with_synthetic_detections(frames)
    return detected.select(
        F.lit("synthetic-0").alias("instance_id"),
        "source_id",
        "frame_id",
        F.col("frame_ts").alias("timestamp"),
        F.lit("synthetic-detector-v1").alias("model_id"),
        (F.col("frame_id") % 50 + 5.0).alias("inference_time_ms"),
        "detections",
        F.lit(25.0).alias("fps"),
        (F.col("frame_id") % 120 + 30.0).alias("latency_ms"),
    )


__all__ = [
    "replay_events_stream",
    "broker_options",
    "broker_reader",
    "decode_broker_records",
    "kafka_events_stream",
    "synthetic_frames_stream",
    "synthetic_detection_stream",
    "DEFAULT_SUBSCRIBE_PATTERN",
    "DETECTION_EVENT_SCHEMA",
]
