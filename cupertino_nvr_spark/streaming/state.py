"""Custom keyed state: TTL latest-per-key cache (SURVEY §2.9 T5, §4.3.1).

Replicates the wall's ``DetectionCache`` semantics (reference
``cupertino_nvr/wall/detection_cache.py:33-79``): one latest event per
``source_id``; entries older than TTL are expired and never served. The
reference expires lazily on read under a lock; in Structured Streaming the
cache is partitioned keyed state inside ``applyInPandasWithState`` — no
shared mutable state, no lock, and expiry is a per-key timeout that also
*emits* an expiry marker so downstream can drop its overlay (the NULL
render path, ``wall/wall.py:124-127``).

State size is O(live keys), exactly like the reference's dict; at 100 TB /
millions of keys it shards across executors by the groupBy key.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "source_id int, frame_id bigint, ts timestamp, n_detections int, expired boolean"
)
STATE_SCHEMA = "frame_id bigint, ts_micros bigint, n_detections int"


def ttl_latest_per_key(
    events: DataFrame,
    ttl_seconds: float = 1.0,
    key_col: str = "source_id",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Streaming latest-event-per-key view with TTL expiry markers.

    Emits one row per key per micro-batch that touches it: the newest event
    so far (``expired=false``), or a tombstone (``expired=true``) when the
    key sees no update for TTL (processing-time timeout — the reference's
    TTL clock is also the consumer's wall clock,
    ``detection_cache.py:46,65``). Out-of-order events within a batch or
    across batches never regress the cache: only a strictly newer timestamp
    overwrites, matching dict-overwrite-with-latest semantics
    (``detection_cache.py:38-46`` under at-most-once delivery).
    """
    ttl_ms = int(ttl_seconds * 1000)

    def update_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        source_id = key[0]
        if state.hasTimedOut:
            frame_id, ts_micros, n_det = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "source_id": source_id,
                        "frame_id": frame_id,
                        "ts": pd.Timestamp(ts_micros, unit="us"),
                        "n_detections": n_det,
                        "expired": True,
                    }
                ]
            )
            return

        best_ts = None
        best_frame = None
        best_n = None
        if state.exists:
            best_frame, best_ts, best_n = state.get
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            idx = pdf[ts_col].values.argmax()
            ts_micros = int(pdf[ts_col].values[idx].astype("datetime64[us]").astype("int64"))
            if best_ts is None or ts_micros > best_ts:
                best_ts = ts_micros
                best_frame = int(pdf["frame_id"].values[idx])
                best_n = int(len(pdf["detections"].values[idx]))
        state.update((best_frame, best_ts, best_n))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            [
                {
                    "source_id": source_id,
                    "frame_id": best_frame,
                    "ts": pd.Timestamp(best_ts, unit="us"),
                    "n_detections": best_n,
                    "expired": False,
                }
            ]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


__all__ = ["ttl_latest_per_key", "OUTPUT_SCHEMA", "STATE_SCHEMA"]
