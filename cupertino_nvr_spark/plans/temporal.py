"""Temporal / sessionization queries (SURVEY §2.5 A1-A3, §2.9 T4, §2.6).

Batch analogs of the reference's windowed metrics (10 s tumbling metrics,
``metrics_reporter.py:164-182``) and the session-window capability, at the
test data's time density (days instead of seconds — same operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cupertino_nvr_spark.plans.registry import REGISTRY, register
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


def funnel_user_flags(ev: DataFrame) -> DataFrame:
    """Per-user funnel reach flags (rv/rc/rp), the shared core of the batch
    funnel query and the streaming state machine's equality test
    (``streaming/funnel.py``): a click qualifies only strictly after a view,
    a purchase only strictly after a qualified click, in (ts, event_id)
    arrival order."""
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
        .over(wp)
        .alias("seen_view_prev"),
    )
    seq2 = seq.withColumn(
        "qual_click_ts",
        F.when(
            (F.col("event_type") == "click") & F.col("seen_view_prev").isNotNull(),
            F.col("ts"),
        ),
    )
    seq3 = seq2.withColumn("seen_qclick_prev", F.min("qual_click_ts").over(wp))
    return seq3.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("rv"),
        F.max(F.when(F.col("qual_click_ts").isNotNull(), 1).otherwise(0)).alias("rc"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("seen_qclick_prev").isNotNull(),
                1,
            ).otherwise(0)
        ).alias("rp"),
    )


@register(
    "events_funnel",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen_view_prev
      FROM events
    ), seq2 AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN event_type = 'click' AND seen_view_prev IS NOT NULL
                  THEN ts END AS qual_click_ts
      FROM seq
    ), seq3 AS (
      SELECT user_id, event_type, qual_click_ts,
             MIN(qual_click_ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen_qclick_prev
      FROM seq2
    ), per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS rv,
             MAX(CASE WHEN qual_click_ts IS NOT NULL THEN 1 ELSE 0 END) AS rc,
             MAX(CASE WHEN event_type = 'purchase'
                       AND seen_qclick_prev IS NOT NULL THEN 1 ELSE 0 END) AS rp
      FROM seq3 GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(rv) AS BIGINT) AS n_reached_view,
           CAST(SUM(rc) AS BIGINT) AS n_reached_click,
           CAST(SUM(rp) AS BIGINT) AS n_reached_purchase,
           round(CAST(SUM(rc) AS BIGINT) / nullif(CAST(SUM(rv) AS BIGINT), 0), 6)
             AS view_to_click_rate,
           round(CAST(SUM(rp) AS BIGINT) / nullif(CAST(SUM(rc) AS BIGINT), 0), 6)
             AS click_to_purchase_rate
    FROM per_user
    """,
    doc="ordered funnel view->click->purchase: a click counts only after a "
    "view, a purchase only after a qualified click (strictly-earlier rows "
    "via ROWS ... 1 PRECEDING frames). Both window levels and the per-user "
    "agg share the single user_id shuffle; the final one-row rollup is "
    "map-side partial",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-order funnel over the event stream. Both engines order
    steps by (ts, event_id) so concurrent-timestamp ties are deterministic;
    the 'strictly earlier' rule is the frame bound (1 PRECEDING), not a
    timestamp comparison, so equal-ts chains still count in arrival order.
    """
    ev = load_table(spark, "events", sf_dir)
    per_user = funnel_user_flags(ev)
    rv, rc, rp = (F.sum(c).cast("bigint") for c in ("rv", "rc", "rp"))
    return per_user.agg(
        F.count("*").alias("n_users"),
        rv.alias("n_reached_view"),
        rc.alias("n_reached_click"),
        rp.alias("n_reached_purchase"),
        F.round(F.try_divide(rc, F.nullif(rv, F.lit(0))), 6).alias(
            "view_to_click_rate"
        ),
        F.round(F.try_divide(rp, F.nullif(rc, F.lit(0))), 6).alias(
            "click_to_purchase_rate"
        ),
    )


@register(
    "events_retention_cohorts",
    """
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS activity_day FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(activity_day) AS cohort_day FROM act GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_day, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort_day
    ),
    joined AS (
      SELECT f.cohort_day,
             CAST(date_diff('day', f.cohort_day, a.activity_day) AS INT) AS day_offset
      FROM act a JOIN firsts f USING (user_id)
    ),
    per AS (
      SELECT cohort_day, day_offset, COUNT(*) AS n_active
      FROM joined GROUP BY cohort_day, day_offset
    )
    SELECT p.cohort_day, p.day_offset, p.n_active, s.cohort_size,
           round(p.n_active * 1.0 / s.cohort_size, 6) AS retention
    FROM per p JOIN sizes s USING (cohort_day)
    """,
    doc="cohort retention matrix: users bucketed by first-active day, "
    "distinct-active counts at each day offset, rate vs cohort size. The "
    "distinct, first-day agg and act-to-firsts join all share the user_id "
    "key (no re-shuffle between them under AQE); sizes is days-sized and "
    "broadcast",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    act = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("activity_day")
    ).distinct()
    firsts = act.groupBy("user_id").agg(F.min("activity_day").alias("cohort_day"))
    sizes = firsts.groupBy("cohort_day").agg(F.count("*").alias("cohort_size"))
    joined = act.join(firsts, "user_id").select(
        "cohort_day",
        F.datediff("activity_day", "cohort_day").alias("day_offset"),
    )
    per = joined.groupBy("cohort_day", "day_offset").agg(
        F.count("*").alias("n_active")
    )
    return per.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") * 1.0 / F.col("cohort_size"), 6).alias("retention"),
    )


@register(
    "events_sliding_throughput",
    """
    SELECT date_trunc('day', ts) - k * INTERVAL 1 DAY AS win_start,
           date_trunc('day', ts) - k * INTERVAL 1 DAY + INTERVAL 2 DAY AS win_end,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           round(COUNT(*) / 48.0, 6) AS events_per_hour
    FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) offs
    GROUP BY 1, 2
    """,
    doc="sliding-window throughput (2-day window, 1-day slide): each event "
    "lands in exactly width/slide = 2 epoch-aligned buckets, so the "
    "expansion factor is a compile-time constant, the groupBy partial-"
    "aggregates map-side, and the shuffle carries #windows rows per "
    "partition — the standard sliding-window posture (T4's batch analog "
    "with overlap)",
)
def events_sliding_throughput(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.window with a slide assigns each row to width/slide buckets; the
    oracle replays that as an explicit 2-row offset cross join against the
    same epoch-aligned day truncation."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.count("*") / 48.0, 6).alias("events_per_hour"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
            "n_users",
            "events_per_hour",
        )
    )


@register(
    "events_path_signatures",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           array_to_string(
             list_slice(list(event_type ORDER BY ts, event_id), 1, 5), '>')
             AS path_head,
           md5(string_agg(event_type, '>' ORDER BY ts, event_id)) AS path_sig,
           first(event_type ORDER BY ts, event_id) AS first_type,
           last(event_type ORDER BY ts, event_id) AS last_type
    FROM events GROUP BY user_id
    """,
    doc="per-user behavioral path: ordered event-type sequence fingerprint "
    "(md5 of the full path), first-5-step head, entry/exit types. Order "
    "determinism comes from sorting structs keyed (ts, event_id) — "
    "collect_list alone is partition-order-dependent and would never "
    "hash-match. One user_id shuffle; per-key state bounded by "
    "events-per-user (inherent to sequence analysis)",
)
def events_path_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    seq = F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type")))
    types = F.transform(F.col("seq"), lambda s: s["event_type"])
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), seq.alias("seq"))
        .select(
            "user_id",
            "n_events",
            F.array_join(F.slice(types, 1, 5), ">").alias("path_head"),
            F.md5(F.array_join(types, ">")).alias("path_sig"),
            F.element_at(types, 1).alias("first_type"),
            F.element_at(types, -1).alias("last_type"),
        )
    )


@register(
    "events_anomaly_zscore",
    """
    WITH stats AS (
      SELECT event_id, user_id, ts, value,
             COUNT(CAST(value AS DECIMAL(18,2))) OVER w AS n_prev,
             SUM(CAST(value AS DECIMAL(18,2))) OVER w AS s1,
             SUM(CAST(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4)))
               OVER w AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    ), scored AS (
      SELECT event_id, user_id, ts, value, n_prev,
             round(CAST(s1 AS DOUBLE) / n_prev, 6) AS mean_w,
             CASE WHEN (CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_prev)
                       / (n_prev - 1) > 0
                  THEN (value - CAST(s1 AS DOUBLE) / n_prev)
                       / SQRT((CAST(s2 AS DOUBLE)
                               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_prev)
                              / (n_prev - 1)) END AS z
      FROM stats WHERE n_prev >= 8
    )
    SELECT event_id, user_id, ts, value, n_prev, mean_w, round(z, 6) AS z
    FROM scored WHERE abs(z) >= 3.0
    """,
    doc="trailing z-score anomaly detection: each event scored against its "
    "user's previous <=20 values (strictly-earlier ROWS frame), flagged at "
    "|z| >= 3. Window sums ride exact decimals (sum + sum-of-squares "
    "identity) so both engines compute bit-identical doubles — stddev_samp "
    "directly would diverge because the two engines use different "
    "streaming-moment algorithms. One user_id shuffle, frame state is 20 "
    "rows per key",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    dec = F.col("value").cast("decimal(18,2)")
    n_prev = F.count(dec).over(w)
    s1 = F.sum(dec).over(w).cast("double")
    s2 = F.sum((dec * dec).cast("decimal(38,4)")).over(w).cast("double")
    stats = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        n_prev.alias("n_prev"),
        s1.alias("s1"),
        s2.alias("s2"),
    ).filter(F.col("n_prev") >= 8)
    mean = F.col("s1") / F.col("n_prev")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_prev")) / (
        F.col("n_prev") - 1
    )
    # var > 0 guard: a zero-variance trailing window (>= 9 identical
    # decimal values is exact after the cast) would make this division
    # raise DIVIDE_BY_ZERO under Spark 4's default ANSI mode, while DuckDB
    # emits +-inf — guarding in BOTH engines makes the semantics explicit
    # and identical (no z for a degenerate window)
    z = F.when(var > 0, (F.col("value") - mean) / F.sqrt(var))
    return (
        stats.select(
            "event_id",
            "user_id",
            "ts",
            "value",
            "n_prev",
            F.round(mean, 6).alias("mean_w"),
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) >= 3.0)
        .select(
            "event_id", "user_id", "ts", "value", "n_prev", "mean_w",
            F.round(F.col("z"), 6).alias("z"),
        )
    )


@register(
    "events_rfm_segments",
    """
    WITH per_user AS (
      SELECT user_id,
             MAX(ts) AS last_ts,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS frequency,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                    THEN CAST(value AS DECIMAL(18,2)) END),
                           0) AS DOUBLE) AS monetary
      FROM events GROUP BY user_id
    ),
    gmax AS (SELECT MAX(ts) AS global_max FROM events),
    scored AS (
      SELECT user_id,
             CAST(date_diff('day', CAST(last_ts AS DATE), CAST(global_max AS DATE)) AS INT)
               AS recency_days,
             frequency, monetary
      FROM per_user CROSS JOIN gmax
    ),
    thr AS (
      SELECT
        ROUND(quantile_cont(recency_days, 0.25), 6) AS r1,
        ROUND(quantile_cont(recency_days, 0.50), 6) AS r2,
        ROUND(quantile_cont(recency_days, 0.75), 6) AS r3,
        ROUND(quantile_cont(frequency, 0.25), 6) AS f1,
        ROUND(quantile_cont(frequency, 0.50), 6) AS f2,
        ROUND(quantile_cont(frequency, 0.75), 6) AS f3,
        ROUND(quantile_cont(monetary, 0.25), 6) AS m1,
        ROUND(quantile_cont(monetary, 0.50), 6) AS m2,
        ROUND(quantile_cont(monetary, 0.75), 6) AS m3
      FROM scored
    )
    SELECT user_id, recency_days, frequency, monetary,
           1 + CASE WHEN recency_days > r1 THEN 1 ELSE 0 END
             + CASE WHEN recency_days > r2 THEN 1 ELSE 0 END
             + CASE WHEN recency_days > r3 THEN 1 ELSE 0 END AS r_bucket,
           1 + CASE WHEN frequency > f1 THEN 1 ELSE 0 END
             + CASE WHEN frequency > f2 THEN 1 ELSE 0 END
             + CASE WHEN frequency > f3 THEN 1 ELSE 0 END AS f_bucket,
           1 + CASE WHEN monetary > m1 THEN 1 ELSE 0 END
             + CASE WHEN monetary > m2 THEN 1 ELSE 0 END
             + CASE WHEN monetary > m3 THEN 1 ELSE 0 END AS m_bucket
    FROM scored CROSS JOIN thr
    """,
    doc="RFM customer segmentation: per-user recency/frequency/monetary "
    "quartile buckets. Quartile THRESHOLDS come from one interpolated-"
    "percentile aggregate broadcast back as a single row — the naive "
    "NTILE(4) over all users is an unpartitioned window (single-task "
    "global sort, the docs_vocab_topk scale-killer shape); threshold "
    "comparison needs no sort at all. One user_id shuffle + two 1-row "
    "attaches; thresholds rounded to 6 in both engines so boundary "
    "users bucket identically",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("frequency"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", _dec("value"))),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("monetary"),
    )
    gmax = ev.agg(F.max("ts").alias("global_max"))
    scored = per_user.crossJoin(F.broadcast(gmax)).select(
        "user_id",
        F.datediff(F.col("global_max"), F.col("last_ts")).alias("recency_days"),
        "frequency",
        "monetary",
    )
    pct = lambda c, p: F.round(F.percentile(F.col(c), F.lit(p)), 6)  # noqa: E731
    thr = scored.agg(
        pct("recency_days", 0.25).alias("r1"),
        pct("recency_days", 0.50).alias("r2"),
        pct("recency_days", 0.75).alias("r3"),
        pct("frequency", 0.25).alias("f1"),
        pct("frequency", 0.50).alias("f2"),
        pct("frequency", 0.75).alias("f3"),
        pct("monetary", 0.25).alias("m1"),
        pct("monetary", 0.50).alias("m2"),
        pct("monetary", 0.75).alias("m3"),
    )

    def bucket(col: str, q: tuple[str, str, str]) -> F.Column:
        out = F.lit(1)
        for t in q:
            out = out + F.when(F.col(col) > F.col(t), 1).otherwise(0)
        return out

    return scored.crossJoin(F.broadcast(thr)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        bucket("recency_days", ("r1", "r2", "r3")).alias("r_bucket"),
        bucket("frequency", ("f1", "f2", "f3")).alias("f_bucket"),
        bucket("monetary", ("m1", "m2", "m3")).alias("m_bucket"),
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


@register(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    counts AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    totals AS (
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS total
      FROM counts GROUP BY from_type
    )
    SELECT c.from_type, c.to_type, c.n, t.total,
           round(c.n * 1.0 / t.total, 6) AS p
    FROM counts c JOIN totals t USING (from_type)
    """,
    doc="first-order Markov transition matrix over per-user event "
    "sequences: P(next event type | current), the behavioral-model "
    "companion to the funnel and path queries. LEAD runs inside the one "
    "user_id shuffle; the count and normalizer aggregates are "
    "#types^2-sized, and the totals side broadcasts",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    totals = counts.groupBy("from_type").agg(
        F.sum("n").cast("bigint").alias("total")
    )
    return counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        "total",
        F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("p"),
    )


@register(
    "events_user_lifecycle",
    """
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    ),
    seq AS (
      SELECT user_id, week,
             MIN(week) OVER (PARTITION BY user_id) AS first_week,
             LAG(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
             LEAD(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week
      FROM act
    ),
    classed AS (
      SELECT week,
             CASE WHEN week = first_week THEN 'new'
                  WHEN prev_week = week - INTERVAL 7 DAY THEN 'retained'
                  ELSE 'resurrected' END AS cls
      FROM seq
      UNION ALL
      SELECT week + INTERVAL 7 DAY AS week, 'churned' AS cls
      FROM seq
      WHERE next_week IS NULL OR next_week > week + INTERVAL 7 DAY
    )
    SELECT week,
           CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
           CAST(SUM(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
    FROM classed GROUP BY week
    """,
    doc="weekly user-lifecycle accounting (growth accounting): every "
    "user-week is classified new / retained (active the week before) / "
    "resurrected (a gap), and a churn row is emitted for the week AFTER a "
    "user's activity lapses (including the phantom week past the data "
    "end — churn is only observable one week late, in both engines "
    "identically). The distinct, all three windows, and the class "
    "derivation share ONE user_id shuffle; the final count runs over the "
    "weeks-sized domain with map-side combine. Conditional counts cast "
    "BIGINT on both sides (the DuckDB HUGEINT hash trap).",
)
def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    act = ev.select("user_id", F.date_trunc("week", "ts").alias("week")).distinct()
    w_all = Window.partitionBy("user_id")
    w_ord = w_all.orderBy("week")
    seq = act.select(
        "user_id",
        "week",
        F.min("week").over(w_all).alias("first_week"),
        F.lag("week").over(w_ord).alias("prev_week"),
        F.lead("week").over(w_ord).alias("next_week"),
    )
    week_plus_7 = F.col("week") + F.expr("INTERVAL 7 DAYS")
    # One row can yield two ledger entries (its class + a churn marker one
    # week later). A UNION of two selects over `seq` re-executes the whole
    # upstream chain per branch (two scans, two distincts, two user_id
    # shuffles — verified in the physical plan); building both entries in
    # one array and exploding keeps it a single pass.
    cls = (
        F.when(F.col("week") == F.col("first_week"), F.lit("new"))
        .when(
            F.col("prev_week") == F.col("week") - F.expr("INTERVAL 7 DAYS"),
            F.lit("retained"),
        )
        .otherwise(F.lit("resurrected"))
    )
    churn_cls = F.when(
        F.col("next_week").isNull() | (F.col("next_week") > week_plus_7),
        F.lit("churned"),
    )
    classed = (
        seq.select(
            F.explode(
                F.array(
                    F.struct(F.col("week").alias("week"), cls.alias("cls")),
                    F.struct(week_plus_7.alias("week"), churn_cls.alias("cls")),
                )
            ).alias("e")
        )
        .filter(F.col("e.cls").isNotNull())
        .select(F.col("e.week").alias("week"), F.col("e.cls").alias("cls"))
    )

    def _n(c: str) -> F.Column:
        return F.sum(F.when(F.col("cls") == c, 1).otherwise(0)).cast("bigint")

    return classed.groupBy("week").agg(
        _n("new").alias("n_new"),
        _n("retained").alias("n_retained"),
        _n("resurrected").alias("n_resurrected"),
        _n("churned").alias("n_churned"),
    )


@register(
    "events_stickiness_weekly",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    ),
    weekly AS (
      SELECT date_trunc('week', ts) AS week, COUNT(DISTINCT user_id) AS wau
      FROM events GROUP BY 1
    ),
    dsum AS (
      SELECT date_trunc('week', day) AS week,
             CAST(SUM(dau) AS BIGINT) AS dau_sum
      FROM daily GROUP BY 1
    )
    SELECT w.week, w.wau, d.dau_sum,
           round(d.dau_sum / 7.0, 6) AS avg_dau,
           round(d.dau_sum / 7.0 / w.wau, 6) AS stickiness
    FROM weekly w JOIN dsum d USING (week)
    """,
    doc="DAU/WAU stickiness per week: daily and weekly distinct-user "
    "counts (two partial-aggregated count-distincts over the same scan "
    "lineage), daily sums rolled to weeks, ratio of average DAU (over the "
    "fixed 7-day denominator, so empty days count as zero in both "
    "engines) to WAU. All aggregates land on day/week-sized domains; the "
    "final join is weeks-sized.",
)
def events_stickiness_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count_distinct("user_id").alias("dau")
    )
    weekly = ev.groupBy(F.date_trunc("week", "ts").alias("week")).agg(
        F.count_distinct("user_id").alias("wau")
    )
    dsum = daily.groupBy(F.date_trunc("week", "day").alias("week")).agg(
        F.sum("dau").cast("bigint").alias("dau_sum")
    )
    avg_dau = F.col("dau_sum") / 7.0
    return weekly.join(dsum, "week").select(
        "week",
        "wau",
        "dau_sum",
        F.round(avg_dau, 6).alias("avg_dau"),
        F.round(avg_dau / F.col("wau"), 6).alias("stickiness"),
    )


@register(
    "events_last_touch_attribution",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      FROM events
    ),
    purch AS (
      SELECT date_trunc('day', ts) AS day,
             CASE WHEN last_click_ts IS NOT NULL
                       AND date_diff('microsecond', last_click_ts, ts)
                           <= 86400000000 THEN 1 ELSE 0 END AS attributed
      FROM seq WHERE event_type = 'purchase'
    )
    SELECT day,
           COUNT(*) AS n_purchases,
           CAST(SUM(attributed) AS BIGINT) AS n_attributed,
           round(CAST(SUM(attributed) AS BIGINT) * 1.0 / COUNT(*), 6)
             AS attribution_rate
    FROM purch GROUP BY day
    """,
    doc="last-touch attribution: each purchase is attributed to the "
    "user's most recent STRICTLY-earlier click within a 24 h lookback "
    "(running MAX over a 1-PRECEDING frame — the events_funnel "
    "ordering rule, ties broken by event_id; the age test is an exact "
    "integer microsecond difference in both engines). One user_id "
    "shuffle for the window, then a days-sized conditional rollup with "
    "map-side combine; BIGINT casts on the conditional sums.",
)
def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "event_type",
        "ts",
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w).alias(
            "last_click_ts"
        ),
    )
    attributed = (
        F.col("last_click_ts").isNotNull()
        & (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_click_ts"))
            <= F.lit(86400000000)
        )
    ).cast("int")
    purch = seq.filter(F.col("event_type") == "purchase").select(
        F.date_trunc("day", "ts").alias("day"), attributed.alias("attributed")
    )
    n_attr = F.sum("attributed").cast("bigint")
    return purch.groupBy("day").agg(
        F.count("*").alias("n_purchases"),
        n_attr.alias("n_attributed"),
        F.round(n_attr * 1.0 / F.count("*"), 6).alias("attribution_rate"),
    )


@register(
    "events_heavy_hitters",
    """
    WITH counts AS (
      SELECT event_type, user_id, COUNT(*) AS n
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type, user_id, n, rank FROM (
      SELECT event_type, user_id, n,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY n DESC, user_id) AS rank
      FROM counts) WHERE rank <= 5
    """,
    doc="exact top-5 heavy users per event type: the (type, user) count "
    "partial-aggregates map-side, and the rank window runs over the "
    "AGGREGATE (one row per live (type, user) pair), never the event "
    "stream. This is the exact batch twin of the bounded-state streaming "
    "Misra-Gries summary (`streaming/heavy_hitters.py`), which the "
    "stream-vs-batch test pins against it.",
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), "user_id")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("event_type", "user_id", "n", "rank")
    )


@register(
    "daily_revenue_gapfill",
    """
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    joined AS (
      SELECT s.day, d.n_orders, d.revenue FROM spine s LEFT JOIN daily d USING (day)
    )
    SELECT day,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(revenue, 0.0) AS revenue,
           last_value(revenue IGNORE NULLS) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS revenue_ffill
    FROM joined
    """,
    doc="time-series regularization: a complete daily date spine "
    "(sequence-exploded from the 1-row min/max bounds) left-joined to "
    "per-day revenue, missing days zero-filled AND forward-filled "
    "(last-non-null carry, the last-observation-carried-forward rule). "
    "Every frame after the first aggregate is DAYS-sized — the spine, "
    "the join, and the unpartitioned ordered window all run over the "
    "calendar domain, never the fact table, which is what makes the "
    "global window acceptable; the fact table contributes one "
    "map-side-combined groupBy.",
)
def daily_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    daily = orders.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.count("*").alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    joined = spine.join(daily, "day", "left")
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "day",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("revenue"), F.lit(0.0)).alias("revenue"),
        F.last("revenue", ignorenulls=True).over(w).alias("revenue_ffill"),
    )


@register(
    "events_conversion_latency",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT e.user_id,
             MIN(epoch_us(e.ts) - epoch_us(f.first_signup)) AS latency_us
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase'
        AND f.first_signup IS NOT NULL
        AND e.ts >= f.first_signup
      GROUP BY e.user_id
    )
    SELECT COUNT(*) AS n_converted,
           ROUND(quantile_cont(latency_us / 3600000000.0, 0.5), 6) AS p50_hours,
           ROUND(quantile_cont(latency_us / 3600000000.0, 0.9), 6) AS p90_hours,
           ROUND(CAST(MIN(latency_us) AS DOUBLE) / 3600000000.0, 6) AS min_hours,
           ROUND(CAST(MAX(latency_us) AS DOUBLE) / 3600000000.0, 6) AS max_hours
    FROM conv
    """,
    doc="time-to-conversion distribution: per user, the first purchase at "
    "or after their first signup, reported as exact interpolated "
    "p50/p90/min/max hours (the user_value_exact_stats percentile-parity "
    "rule). The per-user firsts and the conversion join share one "
    "user_id partitioning; latencies are exact integer microseconds "
    "until the final five-number summary over the users-sized frame.",
)
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        )
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .filter(
            F.col("first_signup").isNotNull()
            & (F.col("ts") >= F.col("first_signup"))
        )
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("first_signup"))
            ).alias("latency_us")
        )
    )
    hours = F.col("latency_us") / 3600000000.0
    return conv.select("latency_us", hours.alias("h")).agg(
        F.count("*").alias("n_converted"),
        F.round(F.expr("percentile(h, 0.5)"), 6).alias("p50_hours"),
        F.round(F.expr("percentile(h, 0.9)"), 6).alias("p90_hours"),
        F.round(F.min("latency_us").cast("double") / 3600000000.0, 6).alias(
            "min_hours"
        ),
        F.round(F.max("latency_us").cast("double") / 3600000000.0, 6).alias(
            "max_hours"
        ),
    )


@register(
    "events_hourly_profile",
    """
    WITH cells AS (
      SELECT CAST(hour(ts) AS INT) AS hour_of_day, event_type,
             COUNT(*) AS n
      FROM events GROUP BY CAST(hour(ts) AS INT), event_type
    ),
    tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_type FROM cells GROUP BY event_type)
    SELECT c.hour_of_day, c.event_type, c.n,
           round(CAST(c.n AS DOUBLE) / t.n_type, 6) AS frac_of_type
    FROM cells c JOIN tot t USING (event_type)
    """,
    doc="temporal activity heatmap: hour-of-day x event-type counts with "
    "each cell's share of its type — the diurnal-profile query behind "
    "every traffic dashboard. One map-side-combined aggregate onto the "
    "24 x #types domain; type totals derive from the cell table (no "
    "second corpus pass) and broadcast back.",
)
def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    cells = ev.groupBy(
        F.hour("ts").alias("hour_of_day"), "event_type"
    ).agg(F.count("*").alias("n"))
    tot = cells.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n_type")
    )
    return cells.join(F.broadcast(tot), "event_type").select(
        "hour_of_day",
        "event_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_type"), 6).alias(
            "frac_of_type"
        ),
    )


@register(
    "orders_seasonality",
    """
    WITH monthly AS (
      SELECT CAST(month(o_orderdate) AS INT) AS month_of_year,
             COUNT(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders GROUP BY CAST(month(o_orderdate) AS INT)
    ),
    tot AS (SELECT SUM(rev_dec) AS tot_dec FROM monthly)
    SELECT month_of_year, n_orders,
           CAST(rev_dec AS DOUBLE) AS revenue,
           round(CAST(rev_dec AS DOUBLE) / CAST(tot_dec AS DOUBLE), 6)
             AS revenue_share
    FROM monthly, tot
    """,
    doc="seasonality profile: month-of-year order counts and revenue "
    "share pooled across years (the calendar-profile complement of "
    "nation_yearly_growth's trend view). Exact decimal revenue; one "
    "fact aggregate onto the 12-row month domain; the 1-row total "
    "derives from the month table and cross-joins back.",
)
def orders_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    monthly = orders.groupBy(
        F.month("o_orderdate").alias("month_of_year")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(_dec("o_totalprice")).alias("rev_dec"),
    )
    tot = monthly.agg(F.sum("rev_dec").alias("tot_dec"))
    rev_d = F.col("rev_dec").cast("double")
    tot_d = F.col("tot_dec").cast("double")
    return monthly.join(F.broadcast(tot)).select(
        "month_of_year",
        "n_orders",
        rev_d.alias("revenue"),
        F.round(rev_d / tot_d, 6).alias("revenue_share"),
    )


@register(
    "events_value_mad",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, m.med, abs(e.value - m.med) AS ad
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, MAX(med) AS med, quantile_cont(ad, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           round(MAX(s.med), 6) AS value_median,
           round(MAX(s.mad), 6) AS value_mad,
           CAST(SUM(CASE WHEN round(d.ad, 9) > 3 * round(s.mad, 9)
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           COUNT(*) AS n_events
    FROM dev d JOIN mad s USING (event_type)
    GROUP BY d.event_type
    """,
    doc=(
        "robust dispersion + outlier gate per event type: median, median "
        "absolute deviation, and the count of |x - median| > 3*MAD "
        "outliers — the robust-statistics alternative to the z-score "
        "family (a single wild value moves a z-score threshold but not "
        "a MAD one). Two exact per-group percentile aggregations with a "
        "types-sized broadcast between them, then one counting pass — "
        "every corpus-sized stage is a map-side-combinable aggregate or "
        "a broadcast join, no user-keyed shuffle at all. Spark "
        "`percentile` and DuckDB `quantile_cont` interpolate at the "
        "same rank but may differ by a ULP, so the outlier gate "
        "compares at fixed precision (round(ad,9) > 3*round(mad,9) on "
        "both engines) — a borderline row flipping would shift the "
        "integer count by 1 and fail the hash oracle. "
        "At 100 TB the exact percentiles swap for the KLL sketch path "
        "(operators/incremental.py) at the cost of rank error."
    ),
)
def events_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(
        F.max("med").alias("med"),
        F.expr("percentile(ad, 0.5)").alias("mad"),
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 6).alias("value_median"),
            F.round(F.max("mad"), 6).alias("value_mad"),
            # fixed-precision compare on BOTH engines: med/mad come from
            # Spark `percentile` vs DuckDB `quantile_cont`, and a single
            # ULP of interpolation difference would flip borderline rows
            # and fail the hash oracle by an integer count that the
            # round(...,6) on the other columns cannot mask.
            F.sum(
                F.when(
                    F.round(F.col("ad"), 9) > 3 * F.round(F.col("mad"), 9), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "events_activity_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    grp AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day) AS INT) AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, COUNT(*) AS len FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           COUNT(*) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
    doc=(
        "gaps-and-islands: consecutive-day activity streaks per user via "
        "the date-minus-row-number anchor trick — consecutive days share "
        "one anchor, so streaks fall out of a plain groupBy with NO "
        "self-join or lag-chain materialization. One user-keyed window "
        "shuffle (which the distinct day set and both aggregations "
        "reuse), state bounded by active days per user. The pattern "
        "behind every 'longest streak' product metric; the companion "
        "lifecycle view is events_user_lifecycle."
    ),
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn("anchor", F.date_sub("day", F.row_number().over(w)))
    streaks = grp.groupBy("user_id", "anchor").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
    )


@register(
    "events_state_intervals",
    """
    WITH flagged AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, event_type, ts,
             CAST(SUM(chg) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS run_id
      FROM flagged
    )
    SELECT user_id, event_type AS state, run_id,
           MIN(ts) AS valid_from, MAX(ts) AS last_seen,
           COUNT(*) AS n_observations
    FROM runs GROUP BY user_id, event_type, run_id
    """,
    doc=(
        "SCD2-style state history: consecutive identical event types per "
        "user collapse into validity intervals (valid_from, last_seen, "
        "observation count) — the change-detect (LAG) + change-count "
        "prefix sum + group-by-run pattern, i.e. run-length encoding "
        "over time, the standard way to build a slowly-changing-"
        "dimension history from an observation stream. All three window "
        "passes and the final aggregation share ONE user-keyed "
        "shuffle/sort; no self-join, no interval materialization "
        "before the group. The (ts, event_id) total order makes run "
        "boundaries deterministic under timestamp ties."
    ),
)
def events_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("chg"),
    )
    runs = flagged.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("run_id"),
    )
    return runs.groupBy(
        "user_id", F.col("event_type").alias("state"), "run_id"
    ).agg(
        F.min("ts").alias("valid_from"),
        F.max("ts").alias("last_seen"),
        F.count("*").alias("n_observations"),
    )


@register(
    "events_type_hour_chisq",
    """
    WITH obs AS (
      SELECT event_type, CAST(hour(ts) AS INT) AS hr, COUNT(*) AS o
      FROM events GROUP BY event_type, hour(ts)
    ),
    rowt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt FROM obs GROUP BY event_type),
    colt AS (SELECT hr, CAST(SUM(o) AS BIGINT) AS ct FROM obs GROUP BY hr),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    cells AS (
      SELECT o.event_type, o.hr, o.o,
             CAST(rt AS DOUBLE) * ct / n AS expected
      FROM obs o JOIN rowt USING (event_type) JOIN colt USING (hr)
      CROSS JOIN tot
    )
    SELECT event_type,
           CAST(SUM(o) AS BIGINT) AS n_events,
           round(SUM((o - expected) * (o - expected) / expected), 6)
             AS chisq_contrib
    FROM cells GROUP BY event_type
    """,
    doc=(
        "independence diagnostics: the chi-square statistic of the "
        "event-type x hour-of-day contingency table, reported as "
        "per-type contributions (their sum is the full statistic; "
        "degrees of freedom = (types-1)*(23)). The corpus collapses to "
        "the types x 24 cell table in ONE map-side-combined aggregate; "
        "margins and the grand total derive from the cell table itself "
        "(three tiny aggregates, broadcast back), so no second corpus "
        "pass. The expected-count formula is deterministic IEEE on "
        "exact integer margins, hash-stable after rounding."
    ),
)
def events_type_hour_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    obs = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count("*").alias("o"))
    rowt = obs.groupBy("event_type").agg(F.sum("o").cast("bigint").alias("rt"))
    colt = obs.groupBy("hr").agg(F.sum("o").cast("bigint").alias("ct"))
    tot = obs.agg(F.sum("o").cast("bigint").alias("n"))
    cells = (
        obs.join(F.broadcast(rowt), "event_type")
        .join(F.broadcast(colt), "hr")
        .join(F.broadcast(tot))
        .withColumn(
            # rt is cast to double BEFORE the multiply: a bigint*bigint
            # product wraps silently in non-ANSI Spark once both margins
            # exceed ~3e9 (possible at the 100 TB posture); the double
            # product is exact for margins < 2^26 each and IEEE-identical
            # to the oracle's CAST(rt AS DOUBLE) * ct / n either way.
            "expected",
            F.col("rt").cast("double") * F.col("ct") / F.col("n"),
        )
    )
    return cells.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("n_events"),
        F.round(
            F.sum(
                (F.col("o") - F.col("expected"))
                * (F.col("o") - F.col("expected"))
                / F.col("expected")
            ),
            6,
        ).alias("chisq_contrib"),
    )


# A/B experiment analysis. Variant assignment is the deterministic hash
# both engines reproduce (md5-derived integer, seed 23, mod 2) — the
# same bucketing a real experimentation system derives from
# (user_id, experiment_id). Per (event_type, user, variant) the metric
# is the user's total value; variants are compared with a two-sample
# Welch z on per-user totals, all sums riding exact decimals so the
# statistic is bit-identical across engines and partitionings.
_AB_SEED = 23


@register(
    "events_ab_test",
    f"""
    WITH assigned AS (
      SELECT event_type, user_id, value,
             CAST(('0x' || substr(md5('{_AB_SEED}:' || CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) % 2 AS variant
      FROM events
    ),
    per_user AS (
      SELECT event_type, variant, user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS user_total
      FROM assigned GROUP BY event_type, variant, user_id
    ),
    per_variant AS (
      SELECT event_type, variant,
             COUNT(*) AS n_users,
             CAST(SUM(CAST(ROUND(user_total, 2) AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(ROUND(user_total * user_total, 4) AS DECIMAL(38,4))) AS DOUBLE) AS s2
      FROM per_user GROUP BY event_type, variant
    ),
    wide AS (
      SELECT a.event_type,
             a.n_users AS n0, b.n_users AS n1,
             a.s1 / a.n_users AS mean0, b.s1 / b.n_users AS mean1,
             (a.s2 / a.n_users - (a.s1 / a.n_users) * (a.s1 / a.n_users)) AS var0,
             (b.s2 / b.n_users - (b.s1 / b.n_users) * (b.s1 / b.n_users)) AS var1
      FROM per_variant a JOIN per_variant b
        ON a.event_type = b.event_type AND a.variant = 0 AND b.variant = 1
    )
    SELECT event_type, n0, n1,
           ROUND(mean0, 6) AS mean0, ROUND(mean1, 6) AS mean1,
           ROUND(mean1 - mean0, 6) AS lift,
           ROUND((mean1 - mean0) / sqrt(var0 / n0 + var1 / n1), 6) AS z_stat
    FROM wide
    """,
    doc=(
        "A/B experiment analysis: deterministic md5 hash-mod-2 variant "
        "assignment (the (user, experiment) bucketing an experimentation "
        "platform uses), per-user value totals, two-sample Welch z per "
        "event_type on per-user means. Two keyed aggregations (user "
        "grain, then variant grain - both map-side combined) and a "
        "2-row-per-type self-join; sums ride exact decimals (the "
        "anomaly-zscore rule) so the statistic is bit-identical across "
        "engines and partitionings. Linear at any event volume; the "
        "variant summary is 2 rows per event_type regardless of corpus."
    ),
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cupertino_nvr_spark.llm.dedup import md5_int

    ev = load_table(spark, "events", sf_dir)
    assigned = ev.select(
        "event_type",
        "user_id",
        "value",
        (md5_int(F.col("user_id").cast("string"), seed=_AB_SEED) % 2).alias(
            "variant"
        ),
    )
    per_user = assigned.groupBy("event_type", "variant", "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("user_total")
    )
    per_variant = per_user.groupBy("event_type", "variant").agg(
        F.count("*").alias("n_users"),
        F.sum(F.round(F.col("user_total"), 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("s1"),
        F.sum(
            F.round(F.col("user_total") * F.col("user_total"), 4).cast(
                "decimal(38,4)"
            )
        )
        .cast("double")
        .alias("s2"),
    )
    a = per_variant.filter(F.col("variant") == 0).select(
        "event_type",
        F.col("n_users").alias("n0"),
        (F.col("s1") / F.col("n_users")).alias("mean0"),
        (F.col("s2") / F.col("n_users") - (F.col("s1") / F.col("n_users")) * (F.col("s1") / F.col("n_users"))).alias("var0"),
    )
    b = per_variant.filter(F.col("variant") == 1).select(
        "event_type",
        F.col("n_users").alias("n1"),
        (F.col("s1") / F.col("n_users")).alias("mean1"),
        (F.col("s2") / F.col("n_users") - (F.col("s1") / F.col("n_users")) * (F.col("s1") / F.col("n_users"))).alias("var1"),
    )
    wide = a.join(b, "event_type")
    return wide.select(
        "event_type",
        "n0",
        "n1",
        F.round("mean0", 6).alias("mean0"),
        F.round("mean1", 6).alias("mean1"),
        F.round(F.col("mean1") - F.col("mean0"), 6).alias("lift"),
        F.round(
            (F.col("mean1") - F.col("mean0"))
            / F.sqrt(F.col("var0") / F.col("n0") + F.col("var1") / F.col("n1")),
            6,
        ).alias("z_stat"),
    )


# CUPED variance reduction (Deng et al. 2013): the experiment metric is
# the user's POST-period total, the covariate its PRE-period total;
# theta = cov(x,y)/var(x) pooled across variants, adjusted mean per
# variant = mean(y) - theta*(mean(x) - pooled mean(x)). All moments ride
# exact decimal sums of 2/4-decimal-rounded user totals, so theta, the
# adjusted lift, and the variance-reduction factor are bit-identical
# across engines and partitionings.
_CUPED_SPLIT = "2024-01-16"


@register(
    "events_cuped",
    f"""
    WITH per_user AS (
      SELECT event_type,
             CAST(('0x' || substr(md5('{_AB_SEED}:' || CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) % 2 AS variant,
             user_id,
             CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                                    THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS x,
             CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                                    THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2, 3
    ),
    pooled AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(x, 2) AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ROUND(y, 2) AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(x * x, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ROUND(y * y, 4) AS DECIMAL(38,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(ROUND(x * y, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sxy
      FROM per_user GROUP BY event_type
    ),
    theta AS (
      SELECT event_type, n, sx / n AS mx,
             (sxy / n - (sx / n) * (sy / n))
               / (sxx / n - (sx / n) * (sx / n)) AS th,
             (syy / n - (sy / n) * (sy / n))
               - (sxy / n - (sx / n) * (sy / n)) * (sxy / n - (sx / n) * (sy / n))
                 / (sxx / n - (sx / n) * (sx / n)) AS var_cv,
             (sxy / n - (sx / n) * (sy / n)) * (sxy / n - (sx / n) * (sy / n))
               / ((sxx / n - (sx / n) * (sx / n)) * (syy / n - (sy / n) * (sy / n))) AS vr
      FROM pooled
    ),
    per_variant AS (
      SELECT event_type, variant, COUNT(*) AS nv,
             CAST(SUM(CAST(ROUND(x, 2) AS DECIMAL(18,2))) AS DOUBLE) AS svx,
             CAST(SUM(CAST(ROUND(y, 2) AS DECIMAL(18,2))) AS DOUBLE) AS svy
      FROM per_user GROUP BY event_type, variant
    ),
    adj AS (
      SELECT v.event_type, v.variant, v.nv,
             v.svy / v.nv - t.th * (v.svx / v.nv - t.mx) AS adj_mean,
             t.th, t.var_cv, t.vr
      FROM per_variant v JOIN theta t ON v.event_type = t.event_type
    )
    SELECT a.event_type, a.nv AS n0, b.nv AS n1,
           ROUND(a.adj_mean, 6) AS adj_mean0, ROUND(b.adj_mean, 6) AS adj_mean1,
           ROUND(b.adj_mean - a.adj_mean, 6) AS adj_lift,
           ROUND(a.th, 6) AS theta,
           ROUND(a.vr, 6) AS var_reduction,
           ROUND((b.adj_mean - a.adj_mean)
                 / sqrt(a.var_cv / a.nv + a.var_cv / b.nv), 6) AS z_cuped
    FROM adj a JOIN adj b
      ON a.event_type = b.event_type AND a.variant = 0 AND b.variant = 1
    """,
    doc=(
        "CUPED variance-reduced A/B analysis (Deng et al. 2013): "
        "pre-period user totals as the covariate, pooled theta = "
        "cov(x,y)/var(x), per-variant adjusted means, adjusted lift, the "
        "variance-reduction factor (= pre/post corr^2), and the z on the "
        "CUPED-adjusted variance. One user-grain conditional aggregation "
        "+ two tiny keyed aggregations + 2-row joins; every moment is an "
        "exact decimal sum (the events_ab_test rule), linear at any "
        "event volume."
    ),
)
def events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cupertino_nvr_spark.llm.dedup import md5_int

    ev = load_table(spark, "events", sf_dir)
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    dec2 = lambda c: c.cast("decimal(18,2)")  # noqa: E731
    per_user = (
        ev.select(
            "event_type",
            (md5_int(F.col("user_id").cast("string"), seed=_AB_SEED) % 2).alias(
                "variant"
            ),
            "user_id",
            "ts",
            "value",
        )
        .groupBy("event_type", "variant", "user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("ts") < split, dec2(F.col("value")))),
                F.lit(0).cast("decimal(18,2)"),
            )
            .cast("double")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(F.col("ts") >= split, dec2(F.col("value")))),
                F.lit(0).cast("decimal(18,2)"),
            )
            .cast("double")
            .alias("y"),
        )
    )
    sum2 = lambda c: F.sum(F.round(c, 2).cast("decimal(18,2)")).cast("double")  # noqa: E731
    sum4 = lambda c: F.sum(F.round(c, 4).cast("decimal(38,4)")).cast("double")  # noqa: E731
    pooled = per_user.groupBy("event_type").agg(
        F.count("*").alias("n"),
        sum2(F.col("x")).alias("sx"),
        sum2(F.col("y")).alias("sy"),
        sum4(F.col("x") * F.col("x")).alias("sxx"),
        sum4(F.col("y") * F.col("y")).alias("syy"),
        sum4(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy"))
    covxy = sxy / n - (sx / n) * (sy / n)
    varx = sxx / n - (sx / n) * (sx / n)
    vary = syy / n - (sy / n) * (sy / n)
    theta = pooled.select(
        "event_type",
        "n",
        (sx / n).alias("mx"),
        (covxy / varx).alias("th"),
        (vary - covxy * covxy / varx).alias("var_cv"),
        (covxy * covxy / (varx * vary)).alias("vr"),
    )
    per_variant = per_user.groupBy("event_type", "variant").agg(
        F.count("*").alias("nv"),
        sum2(F.col("x")).alias("svx"),
        sum2(F.col("y")).alias("svy"),
    )
    adj = per_variant.join(theta, "event_type").select(
        "event_type",
        "variant",
        "nv",
        (
            F.col("svy") / F.col("nv")
            - F.col("th") * (F.col("svx") / F.col("nv") - F.col("mx"))
        ).alias("adj_mean"),
        "th",
        "var_cv",
        "vr",
    )
    a = adj.filter(F.col("variant") == 0).select(
        "event_type",
        F.col("nv").alias("n0"),
        F.col("adj_mean").alias("am0"),
        "th",
        "var_cv",
        "vr",
    )
    b = adj.filter(F.col("variant") == 1).select(
        "event_type", F.col("nv").alias("n1"), F.col("adj_mean").alias("am1")
    )
    return a.join(b, "event_type").select(
        "event_type",
        "n0",
        "n1",
        F.round("am0", 6).alias("adj_mean0"),
        F.round("am1", 6).alias("adj_mean1"),
        F.round(F.col("am1") - F.col("am0"), 6).alias("adj_lift"),
        F.round("th", 6).alias("theta"),
        F.round("vr", 6).alias("var_reduction"),
        F.round(
            (F.col("am1") - F.col("am0"))
            / F.sqrt(F.col("var_cv") / F.col("n0") + F.col("var_cv") / F.col("n1")),
            6,
        ).alias("z_cuped"),
    )


# EWMA-residual anomaly detection on the per-type daily series (the
# forecasting-residual companion to events_anomaly_zscore's trailing
# z-score). alpha = 0.3 => weight (1-alpha)^(k-1) on the k-th prior day,
# 13-day lookback (the weight floor ~0.01 makes a longer tail noise).
_EWMA_DECAY = 0.7
_EWMA_LOOKBACK = 13
_EWMA_THRESHOLD = 0.5


@register(
    "events_ewma_anomaly",
    f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2
    ),
    trail AS (
      SELECT d1.event_type, d1.day, d1.total_value,
             COUNT(d2.day) AS n_prev,
             CAST(SUM(CAST(round(power({_EWMA_DECAY}, date_diff('day', d2.day, d1.day) - 1)
                                 * d2.total_value, 4) AS DECIMAL(38,4))) AS DOUBLE) AS wsum,
             CAST(SUM(CAST(round(power({_EWMA_DECAY}, date_diff('day', d2.day, d1.day) - 1), 9)
                           AS DECIMAL(18,9))) AS DOUBLE) AS wtot
      FROM daily d1 LEFT JOIN daily d2
        ON d2.event_type = d1.event_type
       AND d2.day >= d1.day - INTERVAL {_EWMA_LOOKBACK} DAY AND d2.day < d1.day
      GROUP BY 1, 2, 3
    )
    SELECT event_type, day, total_value, n_prev,
           round(wsum / wtot, 6) AS ewma_prev,
           CASE WHEN wsum <> 0
                THEN round((total_value - wsum / wtot) / (wsum / wtot), 6)
           END AS pct_dev,
           CASE WHEN wsum <> 0
                THEN CAST(abs((total_value - wsum / wtot) / (wsum / wtot))
                          > {_EWMA_THRESHOLD} AS INT)
                ELSE CAST(total_value <> 0 AS INT)
           END AS is_anomaly
    FROM trail WHERE n_prev > 0
    """,
    doc=(
        "EWMA-forecast-residual anomaly detection per event type: each "
        "day's total is compared to the exponentially weighted mean of "
        "the 13 strictly-prior days (decay 0.7 per day of age, weights "
        "normalized over the days actually present), flagging days that "
        "deviate more than 50% from their own type's forecast. The fact "
        "table contributes ONE map-side-combined daily aggregate; the "
        "EWMA itself is a bounded self-range-join over the (type x day) "
        "aggregate — days-sized, never event-sized — so the plan is "
        "linear in events at any scale and the window state never grows "
        "past the 13-day frame. Weighted sums ride fixed-point DECIMAL "
        "(round 4/9) so the iteratively-weighted forecast hash-matches "
        "across engines; streaming twin: streaming/ewma.py's keyed "
        "day-grid monitor (weight table frozen through THIS plan's own "
        "pow expression, roundings replayed via Decimal(repr) — final "
        "emission pinned exactly equal under arbitrary chopping)."
    ),
)
def events_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value")
    )
    d1 = daily.alias("d1")
    d2 = daily.alias("d2")
    age = F.datediff(F.col("d1.day"), F.col("d2.day"))
    w = F.pow(F.lit(_EWMA_DECAY), age - 1)
    joined = d1.join(
        d2,
        (F.col("d2.event_type") == F.col("d1.event_type"))
        & (
            F.col("d2.day")
            >= F.col("d1.day") - F.expr(f"INTERVAL {_EWMA_LOOKBACK} DAY")
        )
        & (F.col("d2.day") < F.col("d1.day")),
        "left",
    )
    trail = joined.groupBy(
        F.col("d1.event_type").alias("event_type"),
        F.col("d1.day").alias("day"),
        F.col("d1.total_value").alias("total_value"),
    ).agg(
        F.count(F.col("d2.day")).alias("n_prev"),
        F.sum(
            F.round(w * F.col("d2.total_value"), 4).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("wsum"),
        F.sum(F.round(w, 9).cast("decimal(18,9)")).cast("double").alias("wtot"),
    )
    ewma = F.col("wsum") / F.col("wtot")
    # zero-forecast guard: ewma == 0 iff wsum == 0 (wtot > 0 whenever
    # n_prev > 0). Rounding an infinite double raises in Spark (BigDecimal
    # cannot represent Infinity), and the streaming twin must be able to
    # emit the identical row on a degenerate all-zero trailing window —
    # contract: pct_dev NULL, is_anomaly = (total_value != 0).
    nz = F.col("wsum") != 0
    dev = (F.col("total_value") - ewma) / ewma
    return trail.filter(F.col("n_prev") > 0).select(
        "event_type",
        "day",
        "total_value",
        "n_prev",
        F.round(ewma, 6).alias("ewma_prev"),
        F.when(nz, F.round(dev, 6)).alias("pct_dev"),
        F.when(nz, (F.abs(dev) > _EWMA_THRESHOLD).cast("int"))
        .otherwise((F.col("total_value") != 0).cast("int"))
        .alias("is_anomaly"),
    )


# Additive Holt-Winters (level + trend + weekly seasonality) forecast-
# residual anomaly detection on the per-type daily series — the seasonal
# upgrade of events_ewma_anomaly (a weekly-cycled metric false-alarms
# every weekend under a level-only forecast). Smoothing constants are
# exact binary fractions (1/2, 1/4) and every recurrence step runs in
# EXACT DECIMAL arithmetic quantized to 6 decimals (HALF_UP both
# engines), so the sequential triple (level, trend, seasonal) replays
# bit-for-bit; the only float ops are the two init means and the final
# pct_dev division (IEEE-identical given identical inputs).
_HW_M = 7
_HW_MIN_DAYS = 2 * _HW_M + 1


def _hw_kernel(pdf):
    """Per-type Holt-Winters recurrence over the days-bounded daily frame
    (the Markov-kernel pattern: sequential arithmetic on a domain-bounded
    frame, exact fixed-point so the SQL oracle replays it)."""
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    q = Decimal("0.000001")

    def q6(d: Decimal) -> Decimal:
        return d.quantize(q, ROUND_HALF_UP)

    def rrepr(x: float) -> float:
        # Spark/DuckDB round(double, 6): HALF_UP on the shortest repr
        return float(Decimal(repr(x)).quantize(q, ROUND_HALF_UP))

    pdf = pdf.sort_values("day").reset_index(drop=True)
    if len(pdf) < _HW_MIN_DAYS:
        return pd.DataFrame(
            columns=[
                "event_type", "day", "total_value", "idx", "level", "trend",
                "seasonal", "forecast", "resid", "pct_dev", "is_anomaly",
            ]
        )
    xs = [Decimal(int(c)) / 100 for c in pdf["cents"]]
    m = _HW_M
    alpha, beta, gamma1 = Decimal("0.5"), Decimal("0.25"), Decimal("0.75")
    level = Decimal(repr(rrepr(float(sum(xs[:m], Decimal(0))) / m)))
    trend = Decimal(
        repr(
            rrepr(
                (
                    float(sum(xs[m : 2 * m], Decimal(0)))
                    - float(sum(xs[:m], Decimal(0)))
                )
                / (m * m)
            )
        )
    )
    sh = [q6(x - level) for x in xs[:m]]
    rows = []
    for i in range(m, len(xs)):
        x = xs[i]
        s_tm = sh[0]
        forecast = level + trend + s_tm
        lnew = q6(alpha * (x - s_tm) + alpha * (level + trend))
        bnew = q6(beta * (lnew - level) + gamma1 * trend)
        snew = q6(beta * (x - lnew) + gamma1 * s_tm)
        resid = x - forecast
        fc_f = float(forecast)
        if fc_f != 0.0:
            pct = rrepr(float(resid) / fc_f)
        else:  # mirror IEEE double division
            rf = float(resid)
            pct = float("inf") if rf > 0 else float("-inf") if rf < 0 else float("nan")
        rows.append(
            (
                pdf["event_type"].iloc[0],
                pdf["day"].iloc[i],
                float(x),
                i + 1,
                float(lnew),
                float(bnew),
                float(snew),
                float(forecast),
                float(resid),
                pct,
                int(2 * abs(resid) > abs(forecast)),
            )
        )
        level, trend = lnew, bnew
        sh = sh[1:] + [snew]
    return pd.DataFrame(
        rows,
        columns=[
            "event_type", "day", "total_value", "idx", "level", "trend",
            "seasonal", "forecast", "resid", "pct_dev", "is_anomaly",
        ],
    )


@register(
    "events_holt_winters",
    f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(24,6)) AS x
      FROM events GROUP BY 1, 2
    ),
    seq AS (
      SELECT event_type, day, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS idx,
             COUNT(*) OVER (PARTITION BY event_type) AS n_days
      FROM daily
    ),
    elig AS (SELECT * FROM seq WHERE n_days >= {_HW_MIN_DAYS}),
    init AS (
      SELECT event_type,
             CAST(round(CAST(SUM(CASE WHEN idx <= {_HW_M} THEN x END) AS DOUBLE)
                        / {_HW_M}, 6) AS DECIMAL(24,6)) AS l0,
             CAST(round((CAST(SUM(CASE WHEN idx BETWEEN {_HW_M + 1} AND {2 * _HW_M} THEN x END) AS DOUBLE)
                         - CAST(SUM(CASE WHEN idx <= {_HW_M} THEN x END) AS DOUBLE))
                        / {_HW_M * _HW_M}, 6) AS DECIMAL(24,6)) AS b0
      FROM elig WHERE idx <= {2 * _HW_M} GROUP BY event_type
    ),
    s0 AS (
      SELECT e.event_type, list(CAST(e.x - i.l0 AS DECIMAL(24,6)) ORDER BY e.idx) AS sh
      FROM elig e JOIN init i USING (event_type) WHERE e.idx <= {_HW_M}
      GROUP BY e.event_type
    ),
    hw AS (
      SELECT i.event_type, CAST({_HW_M} AS BIGINT) AS idx, i.l0 AS l, i.b0 AS b,
             s.sh AS sh, CAST(NULL AS DECIMAL(24,6)) AS x,
             CAST(NULL AS TIMESTAMP) AS day,
             CAST(NULL AS DECIMAL(24,6)) AS forecast
      FROM init i JOIN s0 s USING (event_type)
      UNION ALL
      SELECT event_type, idx, lnew AS l,
             CAST(round(0.25 * (lnew - l) + 0.75 * b, 6) AS DECIMAL(24,6)) AS b,
             sh[2:] || [CAST(round(0.25 * (x - lnew) + 0.75 * sh[1], 6) AS DECIMAL(24,6))] AS sh,
             x, day,
             CAST(l + b + sh[1] AS DECIMAL(24,6)) AS forecast
      FROM (
        SELECT h.event_type, e.idx,
               CAST(round(0.5 * (e.x - h.sh[1]) + 0.5 * (h.l + h.b), 6) AS DECIMAL(24,6)) AS lnew,
               h.l AS l, h.b AS b, h.sh AS sh, e.x AS x, e.day AS day
        FROM hw h JOIN elig e ON e.event_type = h.event_type AND e.idx = h.idx + 1
      )
    )
    SELECT event_type, day, CAST(x AS DOUBLE) AS total_value, idx,
           CAST(l AS DOUBLE) AS level, CAST(b AS DOUBLE) AS trend,
           CAST(sh[{_HW_M}] AS DOUBLE) AS seasonal,
           CAST(forecast AS DOUBLE) AS forecast,
           CAST(x - forecast AS DOUBLE) AS resid,
           round(CAST(x - forecast AS DOUBLE) / CAST(forecast AS DOUBLE), 6) AS pct_dev,
           CAST(2 * abs(x - forecast) > abs(forecast) AS INT) AS is_anomaly
    FROM hw WHERE idx > {_HW_M}
    """,
    doc=(
        "Additive Holt-Winters forecast-residual anomaly detection per "
        "event type: level + trend + weekly (m=7) seasonality, the "
        "seasonal upgrade of events_ewma_anomaly. The fact table "
        "contributes ONE map-side-combined daily rollup; the sequential "
        "triple-recurrence runs as an Arrow-batched kernel over the "
        "(type x day) frame — bounded by the time domain, never the "
        "corpus (the Markov-kernel pattern). Smoothing constants are "
        "exact binary fractions and every step is exact DECIMAL "
        "quantized to 6 (HALF_UP both engines), so level/trend/seasonal "
        "replay bit-for-bit; the oracle unrolls the recurrence as a "
        "recursive CTE carrying the m-slot seasonal ring as a DECIMAL "
        "list. Types with fewer than 2m+1 observed days are skipped "
        "(insufficient initialization window); anomaly = |residual| > "
        "50% of |forecast| as an exact decimal comparison. Streaming "
        "twin: streaming/ewma.py::holt_winters_stream shares THIS "
        "plan's recurrence kernel over the same keyed day-grid state — "
        "final emission pinned exactly equal under arbitrary chopping."
    ),
)
def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    schema = (
        "event_type string, day timestamp, total_value double, idx bigint, "
        "level double, trend double, seasonal double, forecast double, "
        "resid double, pct_dev double, is_anomaly int"
    )
    return daily.groupBy("event_type").applyInPandas(_hw_kernel, schema)


# CUSUM changepoint detection (Page 1954; tabular two-sided form per
# Montgomery / NIST-SEMATECH) on the per-type daily series — completing
# the monitoring family: EWMA (level residuals) -> Holt-Winters
# (seasonal residuals) -> CUSUM (sustained small shifts neither catches
# quickly). Reference mean/sigma are the type's own full-series moments
# (the standard offline phase-I estimate; a production run would freeze
# them from a calibration window). Slack k = sigma/2, decision interval
# h = 4*sigma — the textbook (0.5, 4) design tuned for ~1-sigma shifts.
# Both CUSUM sums reset to 0 after an alarm, so alarms SEGMENT the
# series (changepoints) rather than re-firing every day after a shift.
#
# Cross-engine exactness: x rides exact DECIMAL (from integer cents);
# mu/k/h are each ONE rounded double (round 6 = HALF_UP on the shortest
# repr, replayed via Decimal(repr)); the recurrence itself is pure
# decimal addition and max against exact 6-decimal quantities — no
# accumulating float error, so the sequential sums replay bit-for-bit
# and the oracle carries them through a recursive CTE.


def _cusum_kernel(pdf):
    """Per-type two-sided tabular CUSUM over the days-bounded daily frame
    (the Markov-kernel pattern shared with _hw_kernel)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    q = Decimal("0.000001")

    def rrepr6(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(q, ROUND_HALF_UP)

    cols = [
        "event_type", "day", "total_value", "idx", "cusum_pos",
        "cusum_neg", "is_changepoint", "direction",
    ]
    pdf = pdf.sort_values("day").reset_index(drop=True)
    if not len(pdf):
        return pd.DataFrame(columns=cols)
    xs = [Decimal(int(c)) / 100 for c in pdf["cents"]]
    n = len(xs)
    sx = sum(xs, Decimal(0))
    sxx = sum((x * x for x in xs), Decimal(0))
    mu_d = float(sx) / n
    var_d = max(float(sxx) / n - mu_d * mu_d, 0.0)
    sig = math.sqrt(var_d)
    mu = rrepr6(mu_d)
    kslack = rrepr6(sig / 2)
    h = rrepr6(4 * sig)
    zero = Decimal(0)
    cpos = cneg = zero
    rows = []
    for i, x in enumerate(xs):
        cp = max(zero, cpos + (x - mu - kslack))
        cn = max(zero, cneg + (mu - x - kslack))
        up = cp > h
        dn = cn > h
        is_cp = up or dn
        rows.append(
            (
                pdf["event_type"].iloc[0],
                pdf["day"].iloc[i],
                float(x),
                i + 1,
                float(cp),
                float(cn),
                int(is_cp),
                "up" if up else ("down" if dn else None),
            )
        )
        cpos, cneg = (zero, zero) if is_cp else (cp, cn)
    return pd.DataFrame(rows, columns=cols)


@register(
    "events_cusum_changepoints",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(24,6)) AS x
      FROM events GROUP BY 1, 2
    ),
    seq AS (
      SELECT event_type, day, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS idx
      FROM daily
    ),
    stats AS (
      SELECT event_type,
             CAST(round(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6)
                  AS DECIMAL(24,6)) AS mu,
             CAST(round(sqrt(greatest(
                    CAST(SUM(x*x) AS DOUBLE) / COUNT(*)
                    - (CAST(SUM(x) AS DOUBLE) / COUNT(*))
                      * (CAST(SUM(x) AS DOUBLE) / COUNT(*)), 0)) / 2, 6)
                  AS DECIMAL(24,6)) AS kslack,
             CAST(round(4 * sqrt(greatest(
                    CAST(SUM(x*x) AS DOUBLE) / COUNT(*)
                    - (CAST(SUM(x) AS DOUBLE) / COUNT(*))
                      * (CAST(SUM(x) AS DOUBLE) / COUNT(*)), 0)), 6)
                  AS DECIMAL(24,6)) AS h
      FROM seq GROUP BY event_type
    ),
    cs AS (
      SELECT event_type, CAST(0 AS BIGINT) AS idx,
             CAST(0 AS DECIMAL(24,6)) AS cpos,
             CAST(0 AS DECIMAL(24,6)) AS cneg,
             CAST(NULL AS DECIMAL(24,6)) AS x,
             CAST(NULL AS TIMESTAMP) AS day,
             CAST(NULL AS DECIMAL(24,6)) AS cpos_out,
             CAST(NULL AS DECIMAL(24,6)) AS cneg_out,
             0 AS is_cp, CAST(NULL AS VARCHAR) AS direction
      FROM stats
      UNION ALL
      SELECT event_type, idx,
             CASE WHEN is_cp = 1 THEN CAST(0 AS DECIMAL(24,6)) ELSE cpos_out END,
             CASE WHEN is_cp = 1 THEN CAST(0 AS DECIMAL(24,6)) ELSE cneg_out END,
             x, day, cpos_out, cneg_out, is_cp,
             CASE WHEN up THEN 'up' WHEN dn THEN 'down' END AS direction
      FROM (
        SELECT *, CAST(up OR dn AS INT) AS is_cp FROM (
          SELECT *, cpos_out > h AS up, cneg_out > h AS dn FROM (
            SELECT c.event_type, e.idx, e.x, e.day, st.h,
                   CAST(greatest(CAST(0 AS DECIMAL(24,6)),
                        c.cpos + (e.x - st.mu - st.kslack))
                        AS DECIMAL(24,6)) AS cpos_out,
                   CAST(greatest(CAST(0 AS DECIMAL(24,6)),
                        c.cneg + (st.mu - e.x - st.kslack))
                        AS DECIMAL(24,6)) AS cneg_out
            FROM cs c
            JOIN seq e ON e.event_type = c.event_type AND e.idx = c.idx + 1
            JOIN stats st ON st.event_type = c.event_type
          )
        )
      )
    )
    SELECT event_type, day, CAST(x AS DOUBLE) AS total_value, idx,
           CAST(cpos_out AS DOUBLE) AS cusum_pos,
           CAST(cneg_out AS DOUBLE) AS cusum_neg,
           is_cp AS is_changepoint, direction
    FROM cs WHERE idx > 0
    """,
    doc=(
        "Two-sided tabular CUSUM changepoint detection per event type "
        "(Page 1954; k = sigma/2, h = 4*sigma, the textbook design): "
        "each day's total accumulates its slack-adjusted deviation from "
        "the type's reference mean into one-sided upper/lower sums; a "
        "sum crossing the decision interval flags a changepoint and "
        "resets both sums, segmenting the series. Completes the "
        "monitoring family (EWMA level residuals, Holt-Winters seasonal "
        "residuals, CUSUM sustained small shifts). The fact table "
        "contributes ONE map-side-combined daily rollup; the recurrence "
        "runs as an Arrow-batched kernel over the (type x day) frame — "
        "bounded by the time domain, never the corpus. Reference "
        "moments ride exact decimal sums with ONE rounded double each "
        "for mu/k/h; the recurrence itself is exact decimal addition, "
        "so the sequential sums replay bit-for-bit and the oracle "
        "unrolls them as a recursive CTE. Streaming twin: "
        "streaming/ewma.py::cusum_stream shares THIS kernel over the "
        "shared keyed day-grid state — pinned exactly equal under "
        "arbitrary chopping."
    ),
)
def events_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    schema = (
        "event_type string, day timestamp, total_value double, idx bigint, "
        "cusum_pos double, cusum_neg double, is_changepoint int, "
        "direction string"
    )
    return daily.groupBy("event_type").applyInPandas(_cusum_kernel, schema)


_CUSUM_SQL = REGISTRY["events_cusum_changepoints"].oracle


@register(
    "events_cusum_segments",
    f"""
    WITH cpz AS ({_CUSUM_SQL}),
    segged AS (
      SELECT event_type, day, total_value, is_changepoint, direction,
             1 + COALESCE(SUM(is_changepoint) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS segment_id
      FROM cpz
    )
    SELECT event_type, CAST(segment_id AS BIGINT) AS segment_id,
           MIN(day) AS start_day, MAX(day) AS end_day,
           COUNT(*) AS n_days,
           round(CAST(SUM(CAST(total_value AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 6) AS seg_mean,
           MAX(CASE WHEN is_changepoint = 1 THEN direction END) AS ended_by
    FROM segged
    GROUP BY event_type, segment_id
    """,
    doc=(
        "Per-segment statistics between CUSUM changepoints — the "
        "consumer a segmentation exists for: each (type, segment) with "
        "its day span, length, mean daily total (exact-decimal sum, one "
        "rounded division), and the alarm direction that CLOSED it "
        "(NULL for the trailing open segment). Segment id = 1 + number "
        "of changepoints strictly before the day, so an alarm day "
        "closes the segment it ends. Reuses the events_cusum_changepoints "
        "chain verbatim (the alarm semantics cannot drift between the "
        "flag query and its summary); the additions are one "
        "domain-bounded window over the (type x day) frame and one "
        "segment-keyed aggregate — the fact table still contributes a "
        "single map-side-combined daily rollup."
    ),
)
def events_cusum_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cp = events_cusum_changepoints(spark, sf_dir)
    wseg = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    segged = cp.select(
        "event_type",
        "day",
        "total_value",
        "is_changepoint",
        "direction",
        (
            F.lit(1)
            + F.coalesce(F.sum("is_changepoint").over(wseg), F.lit(0))
        ).alias("segment_id"),
    )
    return segged.groupBy(
        "event_type", F.col("segment_id").cast("bigint").alias("segment_id")
    ).agg(
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
        F.count("*").alias("n_days"),
        F.round(
            F.sum(F.col("total_value").cast("decimal(18,2)")).cast("double")
            / F.count("*"),
            6,
        ).alias("seg_mean"),
        F.max(F.when(F.col("is_changepoint") == 1, F.col("direction"))).alias(
            "ended_by"
        ),
    )


# Markov-chain attribution by removal effect (Anderl et al. 2014, the
# standard data-driven alternative to last-touch): build the first-order
# journey chain (START -> channels -> CONV/NULL, truncated at the first
# conversion), then for each channel measure how much 16-step absorption
# probability in CONV is lost when that channel's in-edges are redirected
# to NULL. The channel set is the pinned non-conversion event-type domain
# (a production run derives it from the type catalog, a bounded dim).
_MRE_CHANNELS = ("click", "error", "signup", "view")
_MRE_ROUNDS = 16


def markov_absorb(
    edges: list[tuple[str, str, float]], rounds: int = _MRE_ROUNDS
) -> dict[str, float]:
    """Pure fixed-point chain-propagation kernel: start mass 1.0 on
    ``__start__``, ``rounds`` steps of new[t] = sum round(mass[f]*p, 12)
    accumulated as exact Decimal (order-independent; Python repr(float)
    is the same shortest-round-trip decimalization as Java
    Double.toString, so the quantize matches Spark round(x, 12)
    bit-exactly). Module-level so the property suite can drive it on
    arbitrary row-stochastic chains."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal("1E-12")
    mass = {"__start__": 1.0}
    for _ in range(rounds):
        acc: dict[str, Decimal] = {}
        for f, t, p in edges:
            m = mass.get(f)
            if m is None:
                continue
            d = Decimal(repr(m * p)).quantize(q, ROUND_HALF_UP)
            acc[t] = acc.get(t, Decimal(0)) + d
        mass = {t: float(d) for t, d in acc.items()}
    return mass


def _mre_round_sql(i: int) -> str:
    prev = f"v{i - 1}"
    return f"""v{i} AS (
      SELECT v.scenario, p.to_state AS state,
             CAST(SUM(CAST(round(v.mass * p.p, 12) AS DECIMAL(28,12))) AS DOUBLE) AS mass
      FROM {prev} v JOIN pmat p
        ON p.scenario = v.scenario AND p.from_state = v.state
      GROUP BY v.scenario, p.to_state
    )"""


@register(
    "events_markov_removal_effect",
    f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    fp AS (
      SELECT user_id, MIN(rn) AS prn FROM ordered
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    j AS (
      SELECT o.user_id, o.rn, o.event_type
      FROM ordered o LEFT JOIN fp ON o.user_id = fp.user_id
      WHERE fp.prn IS NULL OR o.rn <= fp.prn
    ),
    trans AS (
      SELECT user_id, rn, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS nxt
      FROM j
    ),
    edges AS (
      SELECT '__start__' AS from_state,
             CASE WHEN event_type = 'purchase' THEN '__conv__' ELSE event_type END AS to_state
      FROM trans WHERE rn = 1
      UNION ALL
      SELECT event_type,
             CASE WHEN nxt = 'purchase' THEN '__conv__' ELSE nxt END
      FROM trans WHERE nxt IS NOT NULL
      UNION ALL
      SELECT event_type, '__null__'
      FROM trans WHERE nxt IS NULL AND event_type <> 'purchase'
    ),
    base AS (
      SELECT from_state, to_state, COUNT(*) AS n FROM edges GROUP BY 1, 2
    ),
    probs AS (
      SELECT from_state, to_state,
             round(n * 1.0 / SUM(n) OVER (PARTITION BY from_state), 9) AS p
      FROM base
    ),
    scen AS (SELECT unnest(['full', {", ".join(f"'{c}'" for c in _MRE_CHANNELS)}]) AS scenario),
    pmat0 AS (
      SELECT s.scenario, p.from_state,
             CASE WHEN s.scenario <> 'full' AND p.to_state = s.scenario
                  THEN '__null__' ELSE p.to_state END AS to_state,
             p.p
      FROM probs p CROSS JOIN scen s
      WHERE NOT (s.scenario <> 'full' AND p.from_state = s.scenario)
    ),
    pmat1 AS (
      SELECT scenario, from_state, to_state,
             CAST(SUM(CAST(round(p, 9) AS DECIMAL(18,9))) AS DOUBLE) AS p
      FROM pmat0 GROUP BY 1, 2, 3
    ),
    pmat AS (
      SELECT * FROM pmat1
      UNION ALL
      SELECT scenario, st, st, 1.0
      FROM scen CROSS JOIN (SELECT unnest(['__conv__', '__null__']) AS st)
    ),
    v0 AS (SELECT scenario, '__start__' AS state, 1.0 AS mass FROM scen),
    {", ".join(_mre_round_sql(i) for i in range(1, _MRE_ROUNDS + 1))},
    res AS (SELECT scenario, mass FROM v{_MRE_ROUNDS} WHERE state = '__conv__'),
    fullp AS (SELECT mass AS p_full FROM res WHERE scenario = 'full'),
    eff AS (
      SELECT r.scenario AS channel, f.p_full, r.mass,
             1.0 - r.mass / f.p_full AS e
      FROM res r CROSS JOIN fullp f WHERE r.scenario <> 'full'
    ),
    tote AS (
      SELECT CAST(SUM(CAST(round(e, 9) AS DECIMAL(18,9))) AS DOUBLE) AS te FROM eff
    )
    SELECT channel, round(p_full, 6) AS p_conv, round(mass, 6) AS p_conv_removed,
           round(e, 6) AS removal_effect, round(e / te, 6) AS attribution_share
    FROM eff CROSS JOIN tote
    """,
    doc=(
        "Markov-chain attribution by removal effect: per-user journeys "
        "(ordered by ts, truncated at the first conversion) become a "
        "START -> channels -> CONV/NULL first-order chain; each channel's "
        "credit is the relative loss in 16-step START->CONV absorption "
        "probability when its in-edges are redirected to NULL (no "
        "renormalization — the chain stays row-stochastic by "
        "construction). The fact table contributes ONE user-keyed window "
        "pass and one edge-count aggregate; everything after is "
        "(scenario x state)-sized — at most (1 + #channels) x #states "
        "rows (~40) through 16 propagation rounds, so the iterative part "
        "costs nothing at any corpus scale (the pagerank rule: "
        "checkpointed tiny frames, fixed-point DECIMAL sums so the "
        "multi-round result hash-matches across engines)."
    ),
)
def events_markov_removal_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cupertino_nvr_spark.operators.checkpoint import reliable_checkpoint

    ev = load_table(spark, "events", sf_dir)
    w_rn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.row_number().over(w_rn).alias("rn")
    )
    fp = (
        ordered.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    j = (
        ordered.join(fp, "user_id", "left")
        .filter(F.col("prn").isNull() | (F.col("rn") <= F.col("prn")))
    )
    w_seq = Window.partitionBy("user_id").orderBy("rn")
    trans = j.select(
        "rn", "event_type", F.lead("event_type").over(w_seq).alias("nxt")
    )
    conv_map = lambda c: F.when(c == "purchase", F.lit("__conv__")).otherwise(c)  # noqa: E731
    start_e = trans.filter(F.col("rn") == 1).select(
        F.lit("__start__").alias("from_state"),
        conv_map(F.col("event_type")).alias("to_state"),
    )
    mid_e = trans.filter(F.col("nxt").isNotNull()).select(
        F.col("event_type").alias("from_state"),
        conv_map(F.col("nxt")).alias("to_state"),
    )
    term_e = trans.filter(
        F.col("nxt").isNull() & (F.col("event_type") != "purchase")
    ).select(
        F.col("event_type").alias("from_state"), F.lit("__null__").alias("to_state")
    )
    base = (
        start_e.unionAll(mid_e)
        .unionAll(term_e)
        .groupBy("from_state", "to_state")
        .agg(F.count("*").alias("n"))
    )
    wt = Window.partitionBy("from_state")
    probs = base.select(
        "from_state",
        "to_state",
        F.round(F.col("n") * F.lit(1.0) / F.sum("n").over(wt), 9).alias("p"),
    )
    scen = spark.createDataFrame(
        [(s,) for s in ("full",) + _MRE_CHANNELS], "scenario string"
    )
    pmat0 = (
        probs.crossJoin(F.broadcast(scen))
        .filter(
            ~(
                (F.col("scenario") != "full")
                & (F.col("from_state") == F.col("scenario"))
            )
        )
        .select(
            "scenario",
            "from_state",
            F.when(
                (F.col("scenario") != "full")
                & (F.col("to_state") == F.col("scenario")),
                F.lit("__null__"),
            )
            .otherwise(F.col("to_state"))
            .alias("to_state"),
            "p",
        )
    )
    pmat1 = pmat0.groupBy("scenario", "from_state", "to_state").agg(
        F.sum(F.round(F.col("p"), 9).cast("decimal(18,9)")).cast("double").alias("p")
    )
    # built as ONE local relation: a crossJoin of two createDataFrame
    # frames plans as a cartesian over defaultParallelism-sized partition
    # sets — ~1000 scheduler tasks for 10 rows (measured ~15 s of the
    # original 21 s at sf0.1)
    absorb = spark.createDataFrame(
        [
            (s, st, st, 1.0)
            for s in ("full",) + _MRE_CHANNELS
            for st in ("__conv__", "__null__")
        ],
        "scenario string, from_state string, to_state string, p double",
    )
    pmat = pmat1.unionAll(absorb)
    # The 16 propagation rounds run inside ONE Arrow-batched mapInPandas
    # pass over the 5-row (scenario, edge-list) frame. A join+groupBy per
    # round is ~2 scheduler-bound stages of <=40 rows each, and chaining
    # them makes Catalyst re-optimize an ever-deeper tree (measured
    # 19-33 s at sf0.1 across checkpointing variants, vs ~4 s here); the
    # matrix power over a state-vocabulary-bounded frame is exactly the
    # "built-ins can't express it efficiently" case the Pandas-UDF
    # fallback exists for. Fixed-point arithmetic replicates the
    # oracle's per-round form bit-exactly: Python repr(float) is the
    # same shortest-round-trip decimalization as Java Double.toString,
    # so Decimal(repr(x)).quantize(1e-12, HALF_UP) == Spark
    # round(x, 12), and the exact-Decimal sum is order-independent.
    per_scen = pmat.groupBy("scenario").agg(
        F.collect_list(
            F.struct(
                F.col("from_state").alias("f"),
                F.col("to_state").alias("t"),
                F.col("p").alias("p"),
            )
        ).alias("edges")
    )

    def _absorb(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                edges = [(e["f"], e["t"], float(e["p"])) for e in row["edges"]]
                mass = markov_absorb(edges)
                out.append((row["scenario"], mass.get("__conv__")))
            yield pd.DataFrame(out, columns=["scenario", "mass"])

    res = reliable_checkpoint(
        per_scen.mapInPandas(_absorb, "scenario string, mass double")
    )
    fullp = res.filter(F.col("scenario") == "full").select(
        F.col("mass").alias("p_full")
    )
    eff = (
        res.filter(F.col("scenario") != "full")
        .crossJoin(F.broadcast(fullp))
        .select(
            F.col("scenario").alias("channel"),
            "p_full",
            "mass",
            (F.lit(1.0) - F.col("mass") / F.col("p_full")).alias("e"),
        )
    )
    tote = eff.agg(
        F.sum(F.round(F.col("e"), 9).cast("decimal(18,9)"))
        .cast("double")
        .alias("te")
    )
    return eff.crossJoin(F.broadcast(tote)).select(
        "channel",
        F.round("p_full", 6).alias("p_conv"),
        F.round("mass", 6).alias("p_conv_removed"),
        F.round("e", 6).alias("removal_effect"),
        F.round(F.col("e") / F.col("te"), 6).alias("attribution_share"),
    )


# Population Stability Index drift monitor (the standard production data-
# drift metric): value distributions per event_type compared between a
# reference period (first half of the month) and the current period,
# over deciles of the REFERENCE distribution. Decile edges are discrete
# quantiles derived by pure integer threshold-crossing arithmetic on a
# 0.1-granular value grid, so both engines reproduce them exactly — no
# interpolated-percentile cross-engine hazard.
_PSI_SPLIT = "2024-01-16"


def psi_grid_cum(ev: DataFrame) -> DataFrame:
    """Shared PSI fragment: the 0.1-granular (event_type, v) histogram
    with per-period counts and the reference cumulative/total columns.
    Both the batch plan and the streaming twin's reference-profile build
    (``streaming/drift.py``) go through this — the grid rounding and the
    period split cannot fork between them."""
    split = F.lit(_PSI_SPLIT).cast("timestamp")
    grid = ev.groupBy("event_type", F.round(F.col("value"), 1).alias("v")).agg(
        F.count(F.when(F.col("ts") < split, 1)).alias("ref_c"),
        F.count(F.when(F.col("ts") >= split, 1)).alias("cur_c"),
    )
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("v")
    return grid.select(
        "event_type",
        "v",
        "ref_c",
        "cur_c",
        F.sum("ref_c").over(wo).alias("cum_ref"),
        F.sum("ref_c").over(wt).alias("n_ref"),
        F.sum("cur_c").over(wt).alias("n_cur"),
    )


def psi_edges(cum: DataFrame) -> DataFrame:
    """Shared PSI fragment: reference decile edges by integer threshold
    crossing over the cumulative grid (exact discrete quantiles)."""
    ks = cum.sparkSession.range(1, 10).select(F.col("id").alias("k"))
    return (
        cum.crossJoin(F.broadcast(ks))
        .filter(
            (F.col("cum_ref") * 10 >= F.col("k") * F.col("n_ref"))
            & ((F.col("cum_ref") - F.col("ref_c")) * 10 < F.col("k") * F.col("n_ref"))
        )
        .select("event_type", "k", F.col("v").alias("edge"))
    )


@register(
    "events_psi_drift",
    f"""
    WITH grid AS (
      SELECT event_type, round(value, 1) AS v,
             COUNT(CASE WHEN ts <  TIMESTAMP '{_PSI_SPLIT}' THEN 1 END) AS ref_c,
             COUNT(CASE WHEN ts >= TIMESTAMP '{_PSI_SPLIT}' THEN 1 END) AS cur_c
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT *,
             SUM(ref_c) OVER (PARTITION BY event_type ORDER BY v) AS cum_ref,
             SUM(ref_c) OVER (PARTITION BY event_type) AS n_ref,
             SUM(cur_c) OVER (PARTITION BY event_type) AS n_cur
      FROM grid
    ),
    edges AS (
      SELECT c.event_type, k.k, c.v AS edge
      FROM cum c CROSS JOIN (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS k) k
      WHERE c.cum_ref * 10 >= k.k * c.n_ref
        AND (c.cum_ref - c.ref_c) * 10 < k.k * c.n_ref
    ),
    bucketed AS (
      SELECT c.event_type, c.v, c.ref_c, c.cur_c, c.n_ref, c.n_cur,
             COUNT(CASE WHEN c.v > e.edge THEN 1 END) AS bucket
      FROM cum c JOIN edges e ON c.event_type = e.event_type
      GROUP BY 1, 2, 3, 4, 5, 6
    ),
    bk AS (
      SELECT event_type, bucket,
             CAST(SUM(ref_c) AS BIGINT) AS ref_n,
             CAST(SUM(cur_c) AS BIGINT) AS cur_n,
             MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur
      FROM bucketed GROUP BY 1, 2
    ),
    spine AS (
      -- only types with reference mass: a type with n_ref = 0 has no
      -- decile profile to drift FROM (and the streaming twin drops it),
      -- so both twins agree on the type set by construction
      SELECT t.event_type, b.bucket
      FROM (SELECT DISTINCT event_type FROM cum WHERE n_ref > 0) t
      CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6,7,8,9]) AS bucket) b
    ),
    full_bk AS (
      SELECT s.event_type, s.bucket,
             COALESCE(bk.ref_n, 0) AS ref_n,
             COALESCE(bk.cur_n, 0) AS cur_n,
             MAX(bk.n_ref) OVER (PARTITION BY s.event_type) AS n_ref,
             MAX(bk.n_cur) OVER (PARTITION BY s.event_type) AS n_cur
      FROM spine s LEFT JOIN bk
        ON s.event_type = bk.event_type AND s.bucket = bk.bucket
    ),
    contrib AS (
      SELECT event_type, bucket, ref_n, cur_n,
             (ref_n + 0.5) / (n_ref + 5.0) AS p_ref,
             (cur_n + 0.5) / (n_cur + 5.0) AS p_cur
      FROM full_bk
    )
    SELECT event_type, CAST(bucket AS INT) AS bucket, ref_n, cur_n,
           round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
           round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_contrib,
           round(SUM((p_cur - p_ref) * ln(p_cur / p_ref))
                 OVER (PARTITION BY event_type), 6) AS psi_total
    FROM contrib
    """,
    doc=(
        "PSI distribution-drift monitor: per event_type, current-period "
        "value distribution vs the reference period over reference-"
        "decile buckets, Laplace-smoothed proportions, per-bucket PSI "
        "contribution and the per-type total. Scale shape: the fact "
        "table contributes ONE map-side-combined groupBy onto the 0.1-"
        "granular value grid (bounded by the value domain, never the "
        "corpus — ~5.6k cells/type here); the cumulative windows, the "
        "integer threshold-crossing decile edges (exact discrete "
        "quantiles, no interpolated-percentile cross-engine hazard), the "
        "9-edge bucket assignment, and the 10-row-per-type PSI all run "
        "on that bounded grid. Production swaps the 0.1 grid for "
        "whatever binning the feature store uses."
    ),
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    cum = psi_grid_cum(ev)
    edges = psi_edges(cum)
    bucketed = (
        cum.join(F.broadcast(edges), "event_type")
        .groupBy("event_type", "v", "ref_c", "cur_c", "n_ref", "n_cur")
        .agg(F.count(F.when(F.col("v") > F.col("edge"), 1)).alias("bucket"))
    )
    bk = bucketed.groupBy("event_type", "bucket").agg(
        F.sum("ref_c").cast("bigint").alias("ref_n"),
        F.sum("cur_c").cast("bigint").alias("cur_n"),
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
    )
    # complete 10-bucket spine: PSI's smoothed formula assumes the full
    # decile partition — a bucket two duplicated edges leave empty must
    # still contribute its smoothed mass (and the streaming twin always
    # emits all 10). Restricted to types with reference mass: a type with
    # n_ref = 0 has no decile profile to drift FROM, and the streaming
    # twin (streaming/drift.py) drops such types — filtering here makes
    # the twins agree on the type set by construction.
    spine = (
        cum.filter(F.col("n_ref") > 0)
        .select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(0, 10).select(F.col("id").alias("bucket")))
        )
    )
    wt = Window.partitionBy("event_type")
    full_bk = spine.join(bk, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce(F.col("ref_n"), F.lit(0)).alias("ref_n"),
        F.coalesce(F.col("cur_n"), F.lit(0)).alias("cur_n"),
        F.max("n_ref").over(wt).alias("n_ref"),
        F.max("n_cur").over(wt).alias("n_cur"),
    )
    contrib = full_bk.select(
        "event_type",
        "bucket",
        "ref_n",
        "cur_n",
        ((F.col("ref_n") + 0.5) / (F.col("n_ref") + 5.0)).alias("p_ref"),
        ((F.col("cur_n") + 0.5) / (F.col("n_cur") + 5.0)).alias("p_cur"),
    )
    piece = (F.col("p_cur") - F.col("p_ref")) * F.log(
        F.col("p_cur") / F.col("p_ref")
    )
    return contrib.select(
        "event_type",
        F.col("bucket").cast("int").alias("bucket"),
        "ref_n",
        "cur_n",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round(piece, 6).alias("psi_contrib"),
        F.round(F.sum(piece).over(Window.partitionBy("event_type")), 6).alias(
            "psi_total"
        ),
    )


# Two-sample Kolmogorov-Smirnov test between the A/B variants — the
# distribution-free companion to events_ab_test's Welch z (a lift test
# misses variance/shape changes; KS catches any CDF divergence). The
# supremum runs over the same bounded 0.1-granular value grid as
# events_psi_drift, and the D numerator stays in exact DECIMAL integer
# arithmetic (|cum0*n1 - cum1*n0|) so argmax selection cannot wobble on
# float division.
@register(
    "events_ks_test",
    f"""
    WITH grid AS (
      SELECT event_type, round(value, 1) AS v,
             COUNT(CASE WHEN CAST(('0x' || substr(md5('{_AB_SEED}:' || CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) % 2 = 0 THEN 1 END) AS c0,
             COUNT(CASE WHEN CAST(('0x' || substr(md5('{_AB_SEED}:' || CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) % 2 = 1 THEN 1 END) AS c1
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type,
             SUM(c0) OVER (PARTITION BY event_type ORDER BY v) AS cum0,
             SUM(c1) OVER (PARTITION BY event_type ORDER BY v) AS cum1,
             SUM(c0) OVER (PARTITION BY event_type) AS n0,
             SUM(c1) OVER (PARTITION BY event_type) AS n1
      FROM grid
    ),
    agg AS (
      SELECT event_type, MAX(n0) AS n0, MAX(n1) AS n1,
             MAX(abs(CAST(cum0 AS DECIMAL(38,0)) * n1
                     - CAST(cum1 AS DECIMAL(38,0)) * n0)) AS d_num
      FROM cum GROUP BY event_type
    )
    SELECT event_type, CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           round(CAST(d_num AS DOUBLE) / (n0 * n1), 6) AS d_stat,
           round(CAST(d_num AS DOUBLE) / (n0 * n1)
                 * sqrt(CAST(n0 AS DOUBLE) * n1 / (n0 + n1)), 6) AS ks_stat,
           round(least(1.0, 2 * exp(-2 * (CAST(d_num AS DOUBLE) / (n0 * n1))
                                        * (CAST(d_num AS DOUBLE) / (n0 * n1))
                                        * (CAST(n0 AS DOUBLE) * n1 / (n0 + n1)))), 6)
             AS p_approx
    FROM agg
    """,
    doc=(
        "Two-sample Kolmogorov-Smirnov between the deterministic A/B "
        "variants per event_type: D = sup |CDF0 - CDF1| over the bounded "
        "0.1-granular value grid (the events_psi_drift grid — the fact "
        "table contributes one map-side-combined groupBy; the CDFs, the "
        "exact-DECIMAL |cum0*n1 - cum1*n0| supremum numerator, and the "
        "asymptotic one-term p-value all run on grid-sized frames). The "
        "distribution-free companion to events_ab_test: a Welch z misses "
        "variance/shape-only drift, KS flags any CDF divergence."
    ),
)
def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cupertino_nvr_spark.llm.dedup import md5_int

    ev = load_table(spark, "events", sf_dir)
    variant = md5_int(F.col("user_id").cast("string"), seed=_AB_SEED) % 2
    grid = ev.groupBy(
        "event_type", F.round(F.col("value"), 1).alias("v")
    ).agg(
        F.count(F.when(variant == 0, 1)).alias("c0"),
        F.count(F.when(variant == 1, 1)).alias("c1"),
    )
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("v")
    cum = grid.select(
        "event_type",
        F.sum("c0").over(wo).alias("cum0"),
        F.sum("c1").over(wo).alias("cum1"),
        F.sum("c0").over(wt).alias("n0"),
        F.sum("c1").over(wt).alias("n1"),
    )
    agg = cum.groupBy("event_type").agg(
        F.max("n0").alias("n0"),
        F.max("n1").alias("n1"),
        F.max(
            F.abs(
                F.col("cum0").cast("decimal(38,0)") * F.col("n1")
                - F.col("cum1").cast("decimal(38,0)") * F.col("n0")
            )
        ).alias("d_num"),
    )
    d = F.col("d_num").cast("double") / (F.col("n0") * F.col("n1"))
    m = F.col("n0").cast("double") * F.col("n1") / (F.col("n0") + F.col("n1"))
    return agg.select(
        "event_type",
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.round(d, 6).alias("d_stat"),
        F.round(d * F.sqrt(m), 6).alias("ks_stat"),
        F.round(F.least(F.lit(1.0), 2 * F.exp(-2 * d * d * m)), 6).alias(
            "p_approx"
        ),
    )


# k-anonymity audit (Sweeney 2002) — the privacy check a dataset
# release runs before events leave the platform: rows whose
# quasi-identifier tuple (event type, hour-of-day, value decade) is
# shared by fewer than k users are re-identifiable. Reports each
# equivalence class with its user count, row count and k-anonymity
# flag, plus the per-type fraction of rows in violating classes — the
# number a release gate thresholds on.
_KANON_K = 5


@register(
    "events_k_anonymity",
    f"""
    WITH classes AS (
      SELECT event_type,
             CAST(EXTRACT(hour FROM ts) AS INT) AS hour_of_day,
             CAST(FLOOR(value / 10.0) AS BIGINT) AS value_decade,
             COUNT(DISTINCT user_id) AS n_users,
             COUNT(*) AS n_rows
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, hour_of_day, value_decade,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_users < {_KANON_K} AS INT) AS violates_k,
           round(SUM(CASE WHEN n_users < {_KANON_K} THEN n_rows ELSE 0 END)
                   OVER (PARTITION BY event_type) * 1.0
                 / SUM(n_rows) OVER (PARTITION BY event_type), 6)
             AS type_violation_frac
    FROM classes
    """,
    doc=(
        "k-anonymity audit over the (event_type, hour-of-day, value-"
        "decade) quasi-identifier: per equivalence class the distinct-"
        "user count, row count, k<5 violation flag, and the per-type "
        "fraction of rows in violating classes (the release-gate "
        "number). Scale shape: one map-side-combined groupBy onto the "
        "bounded quasi-identifier grid (types x 24 hours x value "
        "decades — the domain, never the corpus; the COUNT DISTINCT "
        "shuffles (class, user) pairs once), then windows over the "
        "grid-sized frame. Production swaps the literal k and the "
        "identifier tuple for the release policy's."
    ),
)
def events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    classes = ev.groupBy(
        "event_type",
        F.hour("ts").cast("int").alias("hour_of_day"),
        F.floor(F.col("value") / 10.0).cast("bigint").alias("value_decade"),
    ).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_rows"),
    )
    wt = Window.partitionBy("event_type")
    viol_rows = F.sum(
        F.when(F.col("n_users") < _KANON_K, F.col("n_rows")).otherwise(F.lit(0))
    ).over(wt)
    return classes.select(
        "event_type",
        "hour_of_day",
        "value_decade",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("n_users") < _KANON_K).cast("int").alias("violates_k"),
        F.round(
            viol_rows * F.lit(1.0) / F.sum("n_rows").over(wt), 6
        ).alias("type_violation_frac"),
    )


# Lag-k autocorrelation of the per-type daily value series — the
# temporal-dependence profile read before choosing forecast/anomaly
# baselines (lag 1: day-over-day persistence; lag 7: weekly
# seasonality). Pairs align by CALENDAR lag (a self-join on day+k, so
# date gaps drop pairs instead of silently misaligning a row-number
# lag), and Pearson rides the exact decimal co-moment rule
# (quantity_price_correlation) so the statistic is bit-identical
# across engines and partitionings.
_ACF_LAGS = (1, 7)


@register(
    "events_daily_acf",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2
    ),
    lags AS (SELECT unnest([{", ".join(str(x) for x in _ACF_LAGS)}]) AS lag),
    pairs AS (
      SELECT a.event_type, l.lag,
             CAST(round(a.total, 2) AS DECIMAL(18,2)) AS x,
             CAST(round(b.total, 2) AS DECIMAL(18,2)) AS y
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.event_type = a.event_type
                  AND b.d = a.d + CAST(l.lag AS INTEGER)
    ),
    agg AS (
      SELECT event_type, lag, COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
             AS acf
    FROM agg
    """,
    doc=(
        "Lag-1/lag-7 autocorrelation of each event type's daily value "
        "total: calendar-lag self-join (gaps drop pairs, never "
        "misalign), Pearson from exact decimal co-moment sums (the "
        "quantity_price_correlation rule, bit-identical across engines/"
        "partitionings). Scale shape: the fact table contributes ONE "
        "map-side-combined daily rollup; the lag spine is 2 broadcast "
        "rows and the self-join/moments run on the #days-bounded daily "
        "frame — nothing downstream scales with the corpus."
    ),
)
def events_daily_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total")
    )
    lags = spark.createDataFrame([(x,) for x in _ACF_LAGS], "lag int")
    a = daily.crossJoin(F.broadcast(lags))
    b = daily.select(
        F.col("event_type").alias("b_event_type"),
        F.col("d").alias("b_d"),
        F.col("total").alias("b_total"),
    )
    dec = lambda c: F.round(c, 2).cast("decimal(18,2)")  # noqa: E731
    pairs = a.join(
        b,
        (F.col("b_event_type") == F.col("event_type"))
        & (F.col("b_d") == F.date_add(F.col("d"), F.col("lag"))),
    ).select(
        "event_type",
        "lag",
        dec(F.col("total")).alias("x"),
        dec(F.col("b_total")).alias("y"),
    )
    agg = pairs.groupBy("event_type", "lag").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n = F.col("n")
    return agg.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            9,
        ).alias("acf"),
    )


# Kaplan-Meier survival curve over session durations — the churn/
# engagement-analysis estimator (how long do sessions survive?), with
# right-censoring for sessions still open at the data horizon (a
# session ending within one inactivity gap of the corpus max timestamp
# may not have ended). Durations land on a whole-second grid so the
# event-time table is bounded; the product-limit estimator rides a
# cumulative ln-sum over that deterministic order.
_KM_GAP_US = 21600000000  # the sessionize_events 6 h inactivity gap


@register(
    "events_session_survival",
    f"""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {_KM_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tagged AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM seq
    ), sessions AS (
      SELECT user_id, session_id,
             CAST(FLOOR((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0) AS BIGINT) AS dur,
             MAX(ts) AS session_end
      FROM tagged GROUP BY user_id, session_id
    ), horizon AS (SELECT MAX(ts) AS max_ts FROM events),
    marked AS (
      SELECT s.dur,
             CASE WHEN epoch_us(h.max_ts) - epoch_us(s.session_end) < {_KM_GAP_US}
                  THEN 1 ELSE 0 END AS censored
      FROM sessions s CROSS JOIN horizon h
    ),
    grid AS (
      SELECT dur,
             COUNT(CASE WHEN censored = 0 THEN 1 END) AS n_events,
             COUNT(CASE WHEN censored = 1 THEN 1 END) AS n_censored
      FROM marked GROUP BY dur
    ),
    cum AS (
      SELECT *,
             SUM(n_events + n_censored) OVER (ORDER BY dur) AS cum_all,
             SUM(n_events + n_censored) OVER () AS total
      FROM grid
    ),
    km AS (
      SELECT dur, n_events, n_censored,
             total - (cum_all - n_events - n_censored) AS n_at_risk,
             -- once d == n the curve is exactly 0 and stays there;
             -- keep ln() away from zero (DuckDB raises, Spark nulls)
             SUM(CASE WHEN n_events > 0
                       AND n_events < total - (cum_all - n_events - n_censored)
                      THEN ln(1.0 - n_events * 1.0
                              / (total - (cum_all - n_events - n_censored)))
                      ELSE 0.0 END) OVER (ORDER BY dur) AS log_s,
             MAX(CASE WHEN n_events >= total - (cum_all - n_events - n_censored)
                      THEN 1 ELSE 0 END) OVER (ORDER BY dur) AS zeroed
      FROM cum
    )
    SELECT CAST(dur AS BIGINT) AS t_sec,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_censored AS BIGINT) AS n_censored,
           CASE WHEN zeroed = 1 THEN 0.0 ELSE round(exp(log_s), 6) END AS survival
    FROM km WHERE n_events > 0
    """,
    doc=(
        "Kaplan-Meier session-survival curve: sessions from the "
        "sessionize_events chain (shared definition), whole-second "
        "durations, right-censoring for sessions ending within one "
        "inactivity gap of the corpus horizon, product-limit survival "
        "via a cumulative ln-sum in deterministic duration order. Scale "
        "shape: one user-keyed sessionization pass (the sessionize_"
        "events posture), a 1-row horizon attach, then everything runs "
        "on the duration grid — bounded by the observed whole-second "
        "duration domain, never the corpus."
    ),
)
def events_session_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = sessionize_events(spark, sf_dir).select(
        F.floor(F.col("duration_sec")).cast("bigint").alias("dur"),
        "session_end",
    )
    ev = load_table(spark, "events", sf_dir)
    horizon = ev.agg(F.max("ts").alias("max_ts"))
    marked = sessions.crossJoin(F.broadcast(horizon)).select(
        "dur",
        F.when(
            F.unix_micros(F.col("max_ts")) - F.unix_micros(F.col("session_end"))
            < _KM_GAP_US,
            1,
        )
        .otherwise(0)
        .alias("censored"),
    )
    grid = marked.groupBy("dur").agg(
        F.count(F.when(F.col("censored") == 0, 1)).alias("n_events"),
        F.count(F.when(F.col("censored") == 1, 1)).alias("n_censored"),
    )
    wo = Window.orderBy("dur")
    wt = Window.partitionBy()
    both = F.col("n_events") + F.col("n_censored")
    cum = grid.select(
        "dur",
        "n_events",
        "n_censored",
        F.sum(both).over(wo).alias("cum_all"),
        F.sum(both).over(wt).alias("total"),
    )
    at_risk = F.col("total") - (
        F.col("cum_all") - F.col("n_events") - F.col("n_censored")
    )
    km = cum.select(
        "dur",
        "n_events",
        "n_censored",
        at_risk.alias("n_at_risk"),
        F.sum(
            F.when(
                (F.col("n_events") > 0) & (F.col("n_events") < at_risk),
                F.log(
                    F.lit(1.0) - F.col("n_events") * F.lit(1.0) / at_risk
                ),
            ).otherwise(F.lit(0.0))
        )
        .over(wo)
        .alias("log_s"),
        F.max(
            F.when(F.col("n_events") >= at_risk, 1).otherwise(0)
        )
        .over(wo)
        .alias("zeroed"),
    )
    return km.filter(F.col("n_events") > 0).select(
        F.col("dur").cast("bigint").alias("t_sec"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("n_censored").cast("bigint").alias("n_censored"),
        F.when(F.col("zeroed") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("log_s"), 6))
        .alias("survival"),
    )
