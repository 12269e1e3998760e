"""Wire codec: typed event <-> JSON payload + topic key (SURVEY §2.2 P6/P9/P10).

Mirrors the reference's sink/listener pair: ``model_dump_json`` before
publish (``cupertino_nvr/processor/mqtt_sink.py:110``) and
``model_validate_json`` on receive with log-and-drop on parse failure
(``cupertino_nvr/wall/mqtt_listener.py:86-96``). In Spark the drop policy
becomes an explicit quarantine split so malformed payloads are observable,
never silently lost and never fatal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cupertino_nvr_spark.functions.protocol import parse_source_id, topic_for_source
from cupertino_nvr_spark.schemas import DETECTION_EVENT_SCHEMA


def encode_event_wire(events: DataFrame, topic_prefix: str = "nvr/detections") -> DataFrame:
    """Event rows -> (topic, key, value) wire rows for a keyed sink.

    Kafka-shaped output columns: the per-source topic is the partition
    address exactly as ``events/protocol.py:11-28`` encodes it.
    """
    return events.select(
        topic_for_source(F.col("source_id"), topic_prefix).alias("topic"),
        F.col("source_id").cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(f.name) for f in DETECTION_EVENT_SCHEMA.fields])).alias(
            "value"
        ),
    )


def parse_event_wire(
    wire: DataFrame,
    value_col: str = "value",
    topic_col: str = "topic",
    passthrough: tuple[str, ...] = (),
):
    """(topic, value) wire rows -> (events, quarantine) DataFrames.

    ``from_json`` yields NULL on corrupt rows (the engine's analog of the
    reference's log-and-drop, ``mqtt_listener.py:95-96``); rows whose
    payload fails to parse, or whose topic does not yield a source id, land
    in the quarantine frame with the raw payload intact. ``passthrough``
    columns (e.g. the broker append timestamp) ride into the event frame.
    """
    parsed = wire.withColumn("event", F.from_json(F.col(value_col), DETECTION_EVENT_SCHEMA))
    parsed = parsed.withColumn("topic_source_id", parse_source_id(F.col(topic_col)))
    # from_json (PERMISSIVE) yields an all-null struct for malformed JSON,
    # not a NULL struct — "required fields present" is the real validity
    # check, mirroring Pydantic's required-field rejection (schema.py:32-48)
    valid_event = (
        F.col("event.instance_id").isNotNull()
        & F.col("event.source_id").isNotNull()
        & F.col("event.frame_id").isNotNull()
        & F.col("event.timestamp").isNotNull()
    )
    ok = parsed.filter(valid_event & F.col("topic_source_id").isNotNull()).select(
        "event.*", "topic_source_id", *passthrough
    )
    quarantine = parsed.filter(~valid_event | F.col("topic_source_id").isNull()).select(
        F.col(topic_col).alias("topic"),
        F.col(value_col).alias("raw_value"),
        F.when(~valid_event, F.lit("unparseable_payload"))
        .otherwise(F.lit("bad_topic"))
        .alias("reason"),
    )
    return ok, quarantine


__all__ = ["encode_event_wire", "parse_event_wire"]
