"""Watermarked windowed aggregations (SURVEY §2.5 A1-A3, §2.9 T1/T2/T4).

The reference's MetricsReporter emits a snapshot every 10 s: inference
throughput across sources plus per-source latency breakdowns
(``cupertino_nvr/processor/metrics_reporter.py:129-212``). Here those are
event-time tumbling windows with a watermark standing in for the reporter
timer — late events beyond the watermark are dropped, the streaming analog
of the reference's TTL staleness cutoff (``wall/detection_cache.py:59-69``).

All aggregates are built-ins (JVM partial+final, map-side combine); state
is bounded by the watermark. At 100 TB the shuffle key is
(window, source_id) — high cardinality, no skew hotspot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_metrics_stream(
    events: DataFrame,
    ts_col: str = "timestamp",
    window_duration: str = "10 seconds",
    watermark: str = "10 seconds",
    min_throughput: float | None = None,
) -> DataFrame:
    """Per-(window, source) metrics: event count, throughput/sec, mean
    latencies rounded to 2 as the reference reports them
    (``metrics_reporter.py:136-141``, round at :198).

    ``min_throughput`` is the publish-worthiness gate (F5): the reference
    skips the periodic publish when ``inference_throughput`` is 0
    (``metrics_reporter.py:170-172``) — pass 0.0 for that exact behavior.
    """
    seconds = _duration_seconds(window_duration)
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("win"), F.col("source_id"))
        .agg(
            F.count("*").alias("n_events"),
            (F.count("*") / F.lit(seconds)).alias("inference_throughput"),
            F.round(F.avg("inference_time_ms"), 2).alias("avg_inference_ms"),
            F.round(F.avg("latency_ms"), 2).alias("avg_latency_ms"),
            F.round(F.avg("fps"), 2).alias("avg_fps"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "source_id",
            "n_events",
            "inference_throughput",
            "avg_inference_ms",
            "avg_latency_ms",
            "avg_fps",
        )
    )
    if min_throughput is not None:
        out = out.filter(F.col("inference_throughput") > min_throughput)
    return out


def sliding_throughput_stream(
    events: DataFrame,
    ts_col: str = "timestamp",
    window_duration: str = "30 seconds",
    slide: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Cross-source sliding throughput — the reporter's whole-instance
    ``inference_throughput`` (``metrics_reporter.py:132,203``) smoothed over
    a sliding window."""
    seconds = _duration_seconds(window_duration)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration, slide).alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            (F.count("*") / F.lit(seconds)).alias("inference_throughput"),
            F.approx_count_distinct("source_id").alias("n_sources"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            "inference_throughput",
            "n_sources",
        )
    )


def session_windows_stream(
    events: DataFrame,
    key_col: str = "source_id",
    ts_col: str = "timestamp",
    gap: str = "30 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Activity sessions per key: gap-based session windows (capability the
    reference lacks but SURVEY §2.9 requires for parity)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def _duration_seconds(duration: str) -> float:
    qty, unit = duration.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60, "hour": 3600, "hours": 3600}
    return float(qty) * mult[unit]


__all__ = [
    "tumbling_metrics_stream",
    "sliding_throughput_stream",
    "session_windows_stream",
]


def windowed_distinct_count_stream(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_duration: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """EXACT distinct-key count per tumbling window — the streaming
    pattern for a metric Structured Streaming cannot express directly
    (COUNT(DISTINCT) is unsupported on streams): watermark-scoped
    ``dropDuplicates`` on (window, key) feeds a windowed COUNT, two
    CHAINED stateful operators in append mode (supported since Spark
    3.5's multiple-stateful-operator support). Dedup state holds one
    entry per live (window, key) and expires with the watermark; the
    count is an ordinary windowed aggregate over the deduped stream.
    ``approx_count_distinct`` (sliding_throughput_stream) remains the
    constant-memory alternative when exactness isn't required.
    """
    deduped = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.window(ts_col, window_duration).alias("win"),
            F.col(ts_col),
            F.col(key_col),
        )
        .dropDuplicates(["win", key_col])
    )
    return (
        deduped.groupBy("win")
        .agg(F.count("*").alias("n_distinct"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_distinct",
        )
    )
