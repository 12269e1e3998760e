"""Flagship query — SURVEY §7.2.

The reference's J1+A4 semantics (``wall/wall.py:122-127`` +
``wall/detection_cache.py:48-69``) expressed on the batch ``events`` table:
probe rows (frames) fetch the latest qualifying event for their key within
a TTL, else NULL. Probes are 'view' events (every 7th); the detection side
is click/purchase events passing a confidence-style value filter; TTL is
6 hours (scaled to the test data's per-user event density — the reference's
1.0 s TTL at camera frame rates is the same ratio of TTL to event gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cupertino_nvr_spark.operators.joins import asof_join
from cupertino_nvr_spark.plans.registry import register
from cupertino_nvr_spark.sources.tables import load_table

TTL_SECONDS = 6 * 3600

FLAGSHIP_ORACLE = """
WITH probes AS (
  SELECT event_id AS probe_id, user_id, ts AS probe_ts
  FROM events WHERE event_type = 'view' AND event_id % 7 = 0
),
cand AS (
  SELECT p.probe_id,
         e.event_id AS ev_event_id, e.ts AS ev_ts,
         e.event_type AS ev_event_type, e.value AS ev_value,
         row_number() OVER (PARTITION BY p.probe_id
                            ORDER BY e.ts DESC, e.event_id DESC) AS rn
  FROM probes p
  JOIN events e
    ON e.user_id = p.user_id
   AND e.event_type IN ('click', 'purchase')
   AND e.value >= 10.0
   AND e.ts <= p.probe_ts
   AND e.ts >= p.probe_ts - INTERVAL 6 HOUR
)
SELECT p.user_id, p.probe_id, p.probe_ts,
       c.ev_event_id, c.ev_ts, c.ev_event_type, c.ev_value
FROM probes p
LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c USING (probe_id)
"""


@register(
    "asof_ttl_overlay",
    FLAGSHIP_ORACLE,
    doc="J1 as-of/TTL overlay join (union-sweep, one shuffle on key)",
)
def asof_ttl_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    probes = events.filter(
        (F.col("event_type") == "view") & (F.col("event_id") % 7 == 0)
    ).select(
        F.col("event_id").alias("probe_id"),
        "user_id",
        F.col("ts").alias("probe_ts"),
    )
    detections = events.filter(
        F.col("event_type").isin("click", "purchase") & (F.col("value") >= 10.0)
    ).select("user_id", "event_id", "ts", "event_type", "value")
    return asof_join(
        probes,
        detections,
        key="user_id",
        probe_ts="probe_ts",
        event_ts="ts",
        ttl_seconds=TTL_SECONDS,
        tiebreak="event_id",
    )
