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
    "synthetic_frames_stream",
    "synthetic_detection_stream",
    "DETECTION_EVENT_SCHEMA",
]
