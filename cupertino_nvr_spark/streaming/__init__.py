"""Structured Streaming layer (SURVEY §2.9, §7.3 M3-M4).

The reference's streaming dataflow — keyed event streams, TTL as-of
overlay join, tumbling metrics, rate limiting, control plane — re-expressed
as watermarked Structured Streaming programs. Batch and streaming share the
same column logic (functions/, operators/); this package adds the
time/state semantics that only exist in streaming.
"""

from cupertino_nvr_spark.streaming.asof import (
    asof_overlay_stream,
    dedup_events_stream,
    rate_limit_frames,
)
from cupertino_nvr_spark.streaming.codec import (
    encode_event_wire,
    parse_event_wire,
)
from cupertino_nvr_spark.streaming.sources import (
    replay_events_stream,
    synthetic_detection_stream,
    synthetic_frames_stream,
)
from cupertino_nvr_spark.streaming.control import (
    ControlPlane,
    EngineConfig,
    attach_metrics_listener,
    targeted,
)
from cupertino_nvr_spark.streaming.inference import (
    synthetic_detect,
    with_synthetic_detections,
)
from cupertino_nvr_spark.streaming.sinks import (
    AtMostOnceSink,
    RetainedLatestStore,
    parquet_append_sink,
)
from cupertino_nvr_spark.streaming.state import ttl_latest_per_key
from cupertino_nvr_spark.streaming.windows import (
    session_windows_stream,
    sliding_throughput_stream,
    tumbling_metrics_stream,
)

__all__ = [
    "ControlPlane",
    "EngineConfig",
    "attach_metrics_listener",
    "targeted",
    "synthetic_detect",
    "with_synthetic_detections",
    "AtMostOnceSink",
    "RetainedLatestStore",
    "parquet_append_sink",
    "ttl_latest_per_key",
    "asof_overlay_stream",
    "dedup_events_stream",
    "rate_limit_frames",
    "encode_event_wire",
    "parse_event_wire",
    "replay_events_stream",
    "synthetic_detection_stream",
    "synthetic_frames_stream",
    "session_windows_stream",
    "sliding_throughput_stream",
    "tumbling_metrics_stream",
]
