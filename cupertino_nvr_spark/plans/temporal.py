"""Temporal / sessionization queries (SURVEY §2.5 A1-A3, §2.9 T4, §2.6).

Batch analogs of the reference's windowed metrics (10 s tumbling metrics,
``metrics_reporter.py:164-182``) and the session-window capability, at the
test data's time density (days instead of seconds — same operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cupertino_nvr_spark.plans.registry import register
from cupertino_nvr_spark.sources.tables import load_table


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


@register(
    "tumbling_daily_metrics",
    """
    SELECT date_trunc('day', ts) AS win_start, event_type,
           COUNT(*) AS n_events,
           COUNT(*) / 86400.0 AS events_per_sec,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events
    GROUP BY date_trunc('day', ts), event_type
    """,
    doc="T4 tumbling-window metrics: count + throughput + null-skipping avg per window",
)
def tumbling_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    # F.window == epoch-aligned tumbling bucket; for 1-day width that is
    # date_trunc('day'), which the oracle can express.
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.count("*") / 86400.0).alias("events_per_sec"),
            (F.sum(_dec("value")).cast("double") / F.count("*")).alias("avg_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "events_per_sec", "avg_value")
    )


@register(
    "sessionize_events",
    """
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 21600000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tagged AS (
      SELECT user_id, ts, event_id,
             -- CAST: DuckDB types this window SUM as HUGEINT, which pandas
             -- renders as float ('1.0'); Spark emits BIGINT ('1'). The
             -- driver's canonicalized hash diverged on exactly this
             -- (CORRECTNESS_r01 hash_match false with rows/schema green).
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM seq
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           round((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0, 6) AS duration_sec
    FROM tagged
    GROUP BY user_id, session_id
    """,
    doc="batch sessionization (6 h inactivity gap): lag → cumulative flag-sum → per-session agg",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap_us = 6 * 3600 * 1000000
    is_new = F.when(
        F.lag("ts").over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us), 1
    ).otherwise(0)
    tagged = ev.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return tagged.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1000000.0, 6
        ).alias("duration_sec"),
    )


@register(
    "datetime_functions",
    """
    SELECT event_id,
           date_trunc('hour', ts) AS ts_hour,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(day(ts) AS INT) AS d,
           CAST(hour(ts) AS INT) AS h,
           epoch_us(ts) AS ts_us,
           strftime(ts, '%Y-%m-%d') AS ymd
    FROM events
    WHERE event_id % 11 = 0
    """,
    doc="§2.8 date/time scalar surface: trunc, parts, epoch micros, formatting",
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") % 11 == 0)
    return ev.select(
        "event_id",
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.date_format("ts", "yyyy-MM-dd").alias("ymd"),
    )


@register(
    "uptime_and_latency_metrics",
    """
    SELECT user_id AS instance_key,
           (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0 AS uptime_sec,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 1000, 2) AS avg_latency_ms,
           COUNT(*) AS n_samples
    FROM events
    WHERE event_type <> 'error'
    GROUP BY user_id
    """,
    doc="A2/A5 metrics shaping: uptime, mean latency x1000 rounded 2 (metrics_reporter.py:196-198)",
)
def uptime_and_latency_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_type") != "error")
    return ev.groupBy(F.col("user_id").alias("instance_key")).agg(
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1000000.0
        ).alias("uptime_sec"),
        F.round(F.sum(_dec("value")).cast("double") / F.count("*") * 1000, 2).alias(
            "avg_latency_ms"
        ),
        F.count("*").alias("n_samples"),
    )


@register(
    "rate_limited_events",
    """
    SELECT user_id, bucket_start, event_id AS kept_event_id, n_dropped FROM (
      SELECT user_id, date_trunc('hour', ts) AS bucket_start, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, date_trunc('hour', ts)) - 1 AS n_dropped
      FROM events) WHERE rn = 1
    """,
    doc="T3 rate limiting, batch form: keep only the LATEST record per "
    "(key, period) — frame *dropping*, not queueing (pipeline_manager.py:122-126); "
    "one shuffle on the (key, bucket) pair",
)
def rate_limited_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of streaming.asof.rate_limit_frames at the test data's
    time density (1 event/key/hour instead of max_fps per second)."""
    ev = load_table(spark, "events", sf_dir)
    bucket = F.window("ts", "1 hour")["start"].alias("bucket_start")
    w = Window.partitionBy("user_id", "bucket_start").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select("user_id", bucket, "event_id", "ts")
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_dropped",
            F.count("*").over(Window.partitionBy("user_id", "bucket_start")) - 1,
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "bucket_start", F.col("event_id").alias("kept_event_id"), "n_dropped")
    )
