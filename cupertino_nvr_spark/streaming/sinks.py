"""foreachBatch sinks (SURVEY §2.1 S3/S5/S6, §2.9 T8).

Three delivery semantics from the reference, made explicit:

- **at-most-once data plane** (MQTT QoS 0, fire-and-forget: publish
  failures are logged and dropped, never retried —
  ``cupertino_nvr/processor/mqtt_sink.py:112-121``)
- **retained last value** (status topics publish with ``retain=True`` so
  late subscribers see the latest row per key —
  ``control_plane.py:419-421``): a keyed compact-upsert store
- **at-least-once control plane** (QoS 1): Structured Streaming's default
  foreachBatch replay, paired with an idempotent upsert

The retained store collects to the driver deliberately: it models the
*status/control* plane whose cardinality is the number of pipeline
instances — tiny by design. The 100 TB data plane never passes through it
(it goes to Kafka/parquet sinks with partitioned writes).
"""

from __future__ import annotations

import logging
import threading
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


class RetainedLatestStore:
    """Latest-row-per-key upsert store (compacted-topic / MERGE semantics).

    ``__call__`` is a foreachBatch handler. Replayed batches (at-least-once)
    are harmless: the timestamp guard makes the upsert idempotent.
    """

    def __init__(self, key_cols: tuple[str, ...], ts_col: str) -> None:
        self.key_cols = key_cols
        self.ts_col = ts_col
        self._rows: dict[tuple, dict[str, Any]] = {}
        self._lock = threading.Lock()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # compact within the batch executor-side first; only the per-key
        # winners cross to the driver
        latest = (
            batch_df.groupBy(*self.key_cols)
            .agg(F.max_by(F.struct("*"), F.col(self.ts_col)).alias("row"))
            .select("row.*")
        )
        with self._lock:
            for row in latest.collect():
                d = row.asDict(recursive=True)
                key = tuple(d[k] for k in self.key_cols)
                cur = self._rows.get(key)
                if cur is None or d[self.ts_col] >= cur[self.ts_col]:
                    self._rows[key] = d

    def snapshot(self) -> dict[tuple, dict[str, Any]]:
        with self._lock:
            return dict(self._rows)


class AtMostOnceSink:
    """QoS-0 fire-and-forget wrapper: a failing publish drops the batch and
    continues (never retries, never raises), with an optional pause gate
    giving the reference's two-level pause its *immediate* first level
    (``mqtt_sink.py:178-192``: gate the sink now, drain the source later).

    A gated/failed batch is still marked complete in the checkpoint — that
    IS at-most-once; the difference vs default foreachBatch (at-least-once)
    is documented loss, matching QoS 0.
    """

    def __init__(self, publish: Callable[[DataFrame, int], None]) -> None:
        self._publish = publish
        self._gate_open = threading.Event()
        self._gate_open.set()
        self.dropped_batches = 0
        self.published_batches = 0

    def pause(self) -> None:
        self._gate_open.clear()

    def resume(self) -> None:
        self._gate_open.set()

    @property
    def paused(self) -> bool:
        return not self._gate_open.is_set()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if not self._gate_open.is_set():
            self.dropped_batches += 1
            return
        try:
            self._publish(batch_df, batch_id)
            self.published_batches += 1
        except Exception:
            logger.exception("publish failed for batch %s; dropping (QoS 0)", batch_id)
            self.dropped_batches += 1


def kafka_sink_options(
    bootstrap_servers: str, checkpoint_dir: str | None = None
) -> dict[str, str]:
    """Kafka sink options as plain data (testable without the connector jar)."""
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    if checkpoint_dir is not None:
        opts["checkpointLocation"] = checkpoint_dir
    return opts


def kafka_topic_writer(
    events: DataFrame,
    bootstrap_servers: str,
    topic_prefix: str = "nvr/detections",
    checkpoint_dir: str | None = None,
):
    """Configured Kafka ``DataStreamWriter`` — the production S3 keyed sink.

    Encodes events onto the wire exactly as the reference publishes them:
    one topic per source (``processor/mqtt_sink.py:108-110`` via
    ``events/protocol.py:11-28``), JSON payload, source_id as the message
    key. The Kafka sink routes each row by its ``topic`` column, so one
    writer serves every per-source topic — no per-camera fan-out code; the
    key keeps a source's events in one partition (per-key ordering, the
    broker-side analog of the reference's per-topic ordering).

    Returned unstarted: ``.start()`` requires the spark-sql-kafka connector
    jar (absent in the sandbox); the wire encoding itself is
    batch-testable via ``codec.encode_event_wire``.
    """
    from cupertino_nvr_spark.streaming.codec import encode_event_wire

    wire = encode_event_wire(events, topic_prefix)
    return (
        wire.writeStream.format("kafka")
        .options(**kafka_sink_options(bootstrap_servers, checkpoint_dir))
        .outputMode("append")
    )


def parquet_append_sink(path: str, partition_by: tuple[str, ...] = ()) -> Callable[[DataFrame, int], None]:
    """Partitioned append publisher for the data plane — the local stand-in
    for a Kafka/object-store sink; at scale ``partition_by`` is the key that
    co-locates downstream reads."""

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        writer = batch_df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

    return publish


__all__ = [
    "RetainedLatestStore",
    "AtMostOnceSink",
    "kafka_sink_options",
    "kafka_topic_writer",
    "parquet_append_sink",
]
