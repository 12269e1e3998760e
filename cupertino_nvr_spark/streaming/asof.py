"""Stream-stream as-of overlay join, streaming dedup, rate limiting
(SURVEY §2.4 J1, §2.9 T2/T3).

J1 is the wall's core semantics: for each live frame, the latest detection
event of the same ``source_id`` no older than TTL, else render without
overlay (reference ``cupertino_nvr/wall/wall.py:122-127``,
``wall/detection_cache.py:48-69``, TTL default 1.0 s
``wall/config.py:50-51``). In Spark that is a watermarked left-outer
time-interval join — state on both sides is bounded by watermark + the
interval condition, so it holds at any scale — followed by
last-event-per-frame reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_overlay_stream(
    frames: DataFrame,
    events: DataFrame,
    ttl_seconds: float = 1.0,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Left-outer interval join frames->events + latest-event reduction.

    Frames with no event within (frame_ts - TTL, frame_ts] keep NULL event
    columns — the reference's "render without overlay" path
    (``wall.py:124-127``). The follow-up max_by aggregation implements
    "latest, not all, events in the window" (``detection_cache.py:48-57``
    keeps one event per key). Chained stateful operators (join then agg)
    require Spark >= 3.5 watermark propagation.
    """
    f = frames.withWatermark("frame_ts", watermark).alias("f")
    e = (
        events.withWatermark("timestamp", watermark)
        .select(
            F.col("source_id").alias("ev_source_id"),
            F.col("frame_id").alias("ev_frame_id"),
            F.col("timestamp").alias("ev_ts"),
            F.col("detections").alias("ev_detections"),
        )
        .alias("e")
    )
    ttl_expr = f"INTERVAL {ttl_seconds} SECONDS"
    joined = f.join(
        e,
        F.expr(
            f"""
            f.source_id = e.ev_source_id
            AND e.ev_ts <= f.frame_ts
            AND e.ev_ts >= f.frame_ts - {ttl_expr}
            """
        ),
        "leftOuter",
    )
    return (
        joined.groupBy("f.source_id", "f.frame_id", "f.frame_ts")
        .agg(
            F.max_by(
                F.struct("ev_frame_id", "ev_ts", "ev_detections"), F.col("ev_ts")
            ).alias("ev"),
            F.count(F.col("ev_ts")).alias("n_candidate_events"),
        )
        .select(
            "source_id",
            "frame_id",
            "frame_ts",
            F.col("ev.ev_frame_id").alias("ev_frame_id"),
            F.col("ev.ev_ts").alias("ev_ts"),
            F.col("ev.ev_detections").alias("ev_detections"),
            "n_candidate_events",
        )
    )


def dedup_events_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("source_id", "frame_id"),
    ts_col: str = "timestamp",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Exactly-once-per-key view of an at-least-once stream.

    The reference's data plane is QoS 0 (at-most-once, no dups possible,
    ``mqtt_sink.py:112``); a Kafka-backed deployment is at-least-once, so
    replays must be dropped. ``dropDuplicatesWithinWatermark`` bounds state
    to the watermark horizon instead of keeping every key forever.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))


def rate_limit_frames(
    frames: DataFrame,
    max_fps: float = 1.0,
    ts_col: str = "frame_ts",
    watermark: str = "10 seconds",
) -> DataFrame:
    """max_fps cap per source by *dropping* (not queueing) — keep only the
    latest frame per (source, 1/max_fps window), matching the reference's
    frame-drop rate limiting (``processor/config.py:55-56``,
    ``pipeline_manager.py:122-126``; fractional fps supported, e.g. 0.2 =
    one frame per 5 s)."""
    period_s = 1.0 / max_fps
    win = F.window(F.col(ts_col), f"{period_s} seconds").alias("win")
    return (
        frames.withWatermark(ts_col, watermark)
        .groupBy(win, F.col("source_id"))
        .agg(F.max_by(F.struct("frame_id", ts_col, "width", "height"), F.col(ts_col)).alias("fr"))
        .select(
            "source_id",
            F.col("fr.frame_id").alias("frame_id"),
            F.col(f"fr.{ts_col}").alias(ts_col),
            F.col("fr.width").alias("width"),
            F.col("fr.height").alias("height"),
        )
    )


__all__ = ["asof_overlay_stream", "dedup_events_stream", "rate_limit_frames"]
