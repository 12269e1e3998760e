"""Event-domain queries — the reference's processor/wall projection chain
(SURVEY §2.2-2.3, §5.2.2) on deterministic synthetic detection events.

The detection-event fixtures (FIXTURES.md §B1) are derived from the
``events`` table with pure column arithmetic, so the DuckDB oracle can
reproduce them exactly: every value is a deterministic IEEE expression of
``event_id`` / ``user_id`` / ``value``. The Spark side builds the *nested*
DetectionEvent (array of detection structs, as the real engine would) and
flattens at the end; the oracle computes the flat columns directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cupertino_nvr_spark.functions.geometry import bbox_corners
from cupertino_nvr_spark.functions.labels import detection_label
from cupertino_nvr_spark.functions.protocol import parse_source_id, topic_for_source
from cupertino_nvr_spark.operators.joins import latest_per_key
from cupertino_nvr_spark.plans.registry import register
from cupertino_nvr_spark.sources.tables import load_table

# class mapping: event_type -> detection class (deterministic enrichment,
# the synthetic stand-in for U1 model inference)
CLASS_MAP = {
    "view": "person",
    "click": "car",
    "purchase": "truck",
    "signup": "bicycle",
    "error": "dog",
}

_CLASS_CASE_SQL = (
    "CASE event_type WHEN 'view' THEN 'person' WHEN 'click' THEN 'car' "
    "WHEN 'purchase' THEN 'truck' WHEN 'signup' THEN 'bicycle' ELSE 'dog' END"
)


def synthetic_detection_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table -> nested DetectionEvent rows (schema of SURVEY §1.2).

    One event per row with a single-element detections array; the
    multi-detection variant is built where a query needs it.
    """
    ev = load_table(spark, "events", sf_dir)
    class_name = F.coalesce(
        *[F.when(F.col("event_type") == k, F.lit(v)) for k, v in CLASS_MAP.items()]
    )
    # integer/100 -> exact 2-decimal double: %.2f formatting can never hit
    # a rounding tie (Java shortest-repr vs C exact-binary disagree on ties)
    confidence = (F.col("event_id") % 101) / 100.0
    bbox = F.struct(
        (100.0 + F.col("value") % 500).alias("x"),
        (150.0 + F.col("value") % 300).alias("y"),
        (80.0 + F.col("value") % 40).alias("width"),
        (200.0 + F.col("value") % 100).alias("height"),
    )
    tracker_id = F.when(
        F.col("event_id") % 3 != 0, (F.col("event_id") % 1000).cast("int")
    )
    detection = F.struct(
        class_name.alias("class_name"),
        confidence.alias("confidence"),
        bbox.alias("bbox"),
        tracker_id.alias("tracker_id"),
    )
    return ev.select(
        F.concat(F.lit("processor-"), F.lpad((F.col("user_id") % 4).cast("string"), 2, "0")).alias("instance_id"),
        (F.col("user_id") % 8).cast("int").alias("source_id"),
        F.col("event_id").alias("frame_id"),
        F.col("ts").alias("timestamp"),
        F.lit("yolov8x-640").alias("model_id"),
        (F.col("value") / 10.0).alias("inference_time_ms"),
        F.array(detection).alias("detections"),
        F.when(F.col("event_id") % 5 != 0, 25.0 + F.col("value") % 10).alias("fps"),
        F.col("value").alias("latency_ms"),
    )


# Shared oracle prefix deriving the same flat values.
_SYNTH_SQL = f"""
  SELECT event_id AS frame_id,
         'processor-' || lpad(CAST(user_id % 4 AS VARCHAR), 2, '0') AS instance_id,
         CAST(user_id % 8 AS INT) AS source_id,
         ts AS "timestamp",
         'yolov8x-640' AS model_id,
         value / 10.0 AS inference_time_ms,
         {_CLASS_CASE_SQL} AS class_name,
         (event_id % 101) / 100.0 AS confidence,
         100.0 + value % 500 AS bx,
         150.0 + value % 300 AS by,
         80.0 + value % 40 AS bw,
         200.0 + value % 100 AS bh,
         CASE WHEN event_id % 3 <> 0 THEN CAST(event_id % 1000 AS INT) END AS tracker_id,
         CASE WHEN event_id % 5 <> 0 THEN 25.0 + value % 10 END AS fps,
         value AS latency_ms
  FROM events
"""


@register(
    "detection_projection",
    f"""
    WITH synth AS ({_SYNTH_SQL})
    SELECT frame_id, instance_id, source_id, "timestamp", model_id,
           inference_time_ms, class_name, confidence, tracker_id,
           bx - bw/2 AS x1, by - bh/2 AS y1,
           bx + bw/2 AS x2, by + bh/2 AS y2,
           CASE WHEN tracker_id IS NOT NULL
                THEN printf('%s %.2f #%d', class_name, confidence, tracker_id)
                ELSE printf('%s %.2f', class_name, confidence) END AS label,
           'nvr/detections/' || CAST(source_id AS VARCHAR) AS topic
    FROM synth
    """,
    doc="P1+P3+P5+P6 chain: prediction→event projection, bbox corners, label synthesis, topic encode",
)
def detection_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    de = synthetic_detection_events(spark, sf_dir)
    d = F.col("det")
    exploded = de.select(
        "frame_id",
        "instance_id",
        "source_id",
        "timestamp",
        "model_id",
        "inference_time_ms",
        F.explode("detections").alias("det"),
    )
    corners = bbox_corners(d["bbox"])
    return exploded.select(
        "frame_id",
        "instance_id",
        "source_id",
        "timestamp",
        "model_id",
        "inference_time_ms",
        d["class_name"].alias("class_name"),
        d["confidence"].alias("confidence"),
        d["tracker_id"].alias("tracker_id"),
        corners["x1"].alias("x1"),
        corners["y1"].alias("y1"),
        corners["x2"].alias("x2"),
        corners["y2"].alias("y2"),
        detection_label(d["class_name"], d["confidence"], d["tracker_id"]).alias("label"),
        topic_for_source(F.col("source_id")).alias("topic"),
    )


@register(
    "topic_codec",
    """
    WITH topics AS (
      SELECT event_id,
             CASE WHEN event_id % 4 <> 0
                  THEN 'nvr/detections/' || CAST(CAST(user_id % 8 AS INT) AS VARCHAR)
                  ELSE 'nvr/detections/' || event_type END AS topic
      FROM events
    )
    SELECT event_id, topic,
           TRY_CAST(string_split(topic, '/')[-1] AS INT) AS parsed_source_id
    FROM topics
    """,
    doc="P6 topic encode/decode inverse incl. failure→NULL (protocol.py:49-55 semantics)",
)
def topic_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    topic = F.when(
        F.col("event_id") % 4 != 0,
        topic_for_source((F.col("user_id") % 8).cast("int")),
    ).otherwise(F.concat(F.lit("nvr/detections/"), F.col("event_type")))
    return ev.select(
        "event_id",
        topic.alias("topic"),
    ).withColumn("parsed_source_id", parse_source_id(F.col("topic")))


@register(
    "validation_dead_letter",
    f"""
    WITH synth AS ({_SYNTH_SQL}),
    checked AS (
      SELECT frame_id,
             confidence * 1.3 AS conf2,
             CASE WHEN frame_id % 17 = 0 THEN -1 ELSE source_id END AS src,
             CASE WHEN frame_id % 23 = 0 THEN '' ELSE model_id END AS mid
      FROM synth
    )
    SELECT frame_id,
           CASE
             WHEN conf2 < 0 OR conf2 > 1 THEN 'confidence_out_of_range'
             WHEN src < 0 THEN 'negative_source_id'
             WHEN trim(mid) = '' THEN 'empty_model_id'
           END AS reject_reason,
           (conf2 >= 0 AND conf2 <= 1 AND src >= 0 AND trim(mid) <> '') AS is_valid
    FROM checked
    """,
    doc="F6 schema-validation predicates with dead-letter reason (validators.py tables)",
)
def validation_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    de = synthetic_detection_events(spark, sf_dir)
    checked = de.select(
        "frame_id",
        (F.element_at("detections", 1)["confidence"] * 1.3).alias("conf2"),
        F.when(F.col("frame_id") % 17 == 0, F.lit(-1))
        .otherwise(F.col("source_id"))
        .alias("src"),
        F.when(F.col("frame_id") % 23 == 0, F.lit("")).otherwise(F.col("model_id")).alias("mid"),
    )
    reason = (
        F.when(
            (F.col("conf2") < 0) | (F.col("conf2") > 1), "confidence_out_of_range"
        )
        .when(F.col("src") < 0, "negative_source_id")
        .when(F.trim(F.col("mid")) == "", "empty_model_id")
    )
    valid = (
        (F.col("conf2") >= 0)
        & (F.col("conf2") <= 1)
        & (F.col("src") >= 0)
        & (F.trim(F.col("mid")) != "")
    )
    return checked.select(
        "frame_id", reason.alias("reject_reason"), valid.alias("is_valid")
    )


@register(
    "confidence_array_filter",
    """
    SELECT event_id,
           CAST((CASE WHEN (value % 100) / 100.0 >= 0.5 THEN 1 ELSE 0 END)
              + (CASE WHEN ((value * 2) % 100) / 100.0 >= 0.5 THEN 1 ELSE 0 END)
              + (CASE WHEN ((value * 3) % 100) / 100.0 >= 0.5 THEN 1 ELSE 0 END) AS INT) AS n_kept,
           3 AS n_total
    FROM events
    """,
    doc="F1 per-element confidence threshold via array filter() (no explode, no shuffle)",
)
def confidence_array_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    dets = F.array(
        *[
            F.struct(((F.col("value") * m) % 100 / 100.0).alias("confidence"))
            for m in (1, 2, 3)
        ]
    )
    kept = F.filter(dets, lambda d: d["confidence"] >= 0.5)
    return ev.select(
        "event_id",
        F.size(kept).alias("n_kept"),
        F.size(dets).alias("n_total"),
    )


@register(
    "command_target_filter",
    """
    SELECT event_id,
           CAST(to_json(CASE event_id % 4
             WHEN 0 THEN ['*']
             WHEN 1 THEN []
             WHEN 2 THEN ['processor-00', 'processor-01']
             ELSE ['other'] END) AS VARCHAR) AS target_instances,
           (event_id % 4 IN (0, 1)
            OR list_contains(CASE event_id % 4
                 WHEN 2 THEN ['processor-00', 'processor-01']
                 ELSE ['other'] END, 'processor-01')) AS should_process
    FROM events WHERE event_id % 6 = 0
    """,
    doc="F4 command target filter: broadcast ['*'] / empty / membership (control_plane.py:341-356). "
    "target_instances is emitted as its JSON rendering: the driver's result "
    "canonicalizer cannot sort raw array columns (CORRECTNESS_r01 harness err).",
)
def command_target_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") % 6 == 0)
    targets: Column = (
        F.when(F.col("event_id") % 4 == 0, F.array(F.lit("*")))
        .when(F.col("event_id") % 4 == 1, F.array().cast("array<string>"))
        .when(
            F.col("event_id") % 4 == 2,
            F.array(F.lit("processor-00"), F.lit("processor-01")),
        )
        .otherwise(F.array(F.lit("other")))
    )
    me = F.lit("processor-01")
    tagged = ev.select("event_id", targets.alias("_targets"))
    should = (
        F.array_contains("_targets", "*")
        | (F.size("_targets") == 0)
        | F.array_contains("_targets", me)
    )
    return tagged.select(
        "event_id",
        F.to_json("_targets").alias("target_instances"),
        should.alias("should_process"),
    )


@register(
    "source_id_remap",
    """
    WITH mapping(idx, actual) AS (VALUES (0, 100), (1, 101), (2, 102), (3, 103)),
    synth AS (SELECT event_id, CAST(user_id % 8 AS INT) AS source_idx FROM events)
    SELECT s.event_id, s.source_idx,
           coalesce(m.actual, s.source_idx) AS mapped_source_id
    FROM synth s LEFT JOIN mapping m ON s.source_idx = m.idx
    """,
    doc="P2/J2 positional source-id remap: broadcast dim join with identity fallback (mqtt_sink.py:123-135)",
)
def source_id_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    mapping = spark.createDataFrame(
        [(0, 100), (1, 101), (2, 102), (3, 103)], ["idx", "actual"]
    )
    synth = ev.select(
        "event_id", (F.col("user_id") % 8).cast("int").alias("source_idx")
    )
    return (
        synth.join(F.broadcast(mapping), synth.source_idx == mapping.idx, "left")
        .select(
            "event_id",
            "source_idx",
            F.coalesce(F.col("actual"), F.col("source_idx")).alias("mapped_source_id"),
        )
    )


@register(
    "per_source_latest_metrics",
    f"""
    WITH synth AS ({_SYNTH_SQL}),
    latest AS (
      SELECT source_id, fps, latency_ms FROM (
        SELECT source_id, fps, latency_ms,
               ROW_NUMBER() OVER (PARTITION BY source_id ORDER BY "timestamp" DESC, frame_id DESC) AS rn
        FROM synth) WHERE rn = 1
    ),
    stats AS (
      SELECT source_id,
             round(CAST(SUM(CAST(inference_time_ms AS DECIMAL(18,3))) AS DOUBLE) / COUNT(*), 2) AS avg_inference_ms,
             COUNT(*) AS n_frames
      FROM synth GROUP BY source_id
    )
    SELECT s.source_id, s.avg_inference_ms, s.n_frames, l.fps AS last_fps,
           l.latency_ms AS last_latency_ms,
           printf('%dx%d', 640 * (1 + s.source_id % 2), 360 * (1 + s.source_id % 2)) AS resolution
    FROM stats s JOIN latest l ON s.source_id = l.source_id
    """,
    doc="A3 per-source latest metrics + rounded averages + WxH resolution string (metrics_reporter.py:129-158)",
)
def per_source_latest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    de = synthetic_detection_events(spark, sf_dir)
    # inference_time_ms = value/10 has 3 decimals exactly -> decimal(18,3) exact
    stats = de.groupBy("source_id").agg(
        F.round(
            F.sum(F.col("inference_time_ms").cast("decimal(18,3)")).cast("double")
            / F.count("*"),
            2,
        ).alias("avg_inference_ms"),
        F.count("*").alias("n_frames"),
    )
    latest = latest_per_key(
        de.select("source_id", "timestamp", "frame_id", "fps", "latency_ms"),
        key="source_id",
        ts="timestamp",
        tiebreak="frame_id",
    ).select(
        "source_id",
        F.col("fps").alias("last_fps"),
        F.col("latency_ms").alias("last_latency_ms"),
    )
    res = F.format_string(
        "%dx%d",
        (640 * (1 + F.col("source_id") % 2)).cast("int"),
        (360 * (1 + F.col("source_id") % 2)).cast("int"),
    )
    return (
        stats.join(latest, "source_id")
        .withColumn("resolution", res)
        .select(
            "source_id",
            "avg_inference_ms",
            "n_frames",
            "last_fps",
            "last_latency_ms",
            "resolution",
        )
    )


@register(
    "events_cdc_apply",
    """
    WITH ranked AS (
      SELECT user_id, event_type, value, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id) AS BIGINT) AS n_deletes,
             COUNT(*) OVER (PARTITION BY user_id) AS n_ops
      FROM events)
    SELECT user_id, n_ops, n_deletes, value AS last_value, ts AS last_ts
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
    doc=(
        "CDC/MERGE apply — the lakehouse upsert-and-delete pattern the "
        "incremental-maintenance family needs upstream of it: the events "
        "stream is read as a change log keyed by user_id ('error' rows "
        "are tombstones, everything else an upsert), applied in "
        "(ts, event_id) order, producing the final table state — "
        "surviving keys with their last payload plus op/tombstone "
        "counts. One user-keyed window (ROW_NUMBER + two frame-free "
        "window aggregates share a single sort/shuffle), then a filter: "
        "O(n) with one Exchange, the exact shape a MERGE INTO compiles "
        "to when the change log fits one pass. A key whose LAST op is a "
        "tombstone vanishes from the output — delete-wins semantics, "
        "checked by the oracle row count."
    ),
)
def events_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    wk = Window.partitionBy("user_id")
    wo = wk.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = ev.select(
        "user_id",
        "event_type",
        "value",
        "ts",
        F.row_number().over(wo).alias("rn"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(wk)
        .cast("bigint")
        .alias("n_deletes"),
        F.count("*").over(wk).alias("n_ops"),
    )
    return ranked.filter(
        (F.col("rn") == 1) & (F.col("event_type") != "error")
    ).select(
        "user_id",
        "n_ops",
        "n_deletes",
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


@register(
    "event_type_user_overlap",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    cnt AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS users_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, users_both,
           round(users_both * 1.0 / (ca.n + cb.n - users_both), 6) AS jaccard
    FROM p
    JOIN cnt ca ON type_a = ca.event_type
    JOIN cnt cb ON type_b = cb.event_type
    """,
    doc=(
        "audience-overlap matrix: for every unordered pair of event "
        "types, the number of distinct users doing BOTH, plus the "
        "Jaccard overlap of the two audiences — the exact companion to "
        "what a theta-sketch intersection estimates at 100 TB. The "
        "self-join is keyed on user_id and the per-user type set is "
        "bounded by the (small, fixed) type vocabulary, so the join "
        "output is at most |users| * C(|types|, 2) rows with C a "
        "constant — O(n), one user-keyed shuffle after a map-side "
        "distinct; the per-type totals are a types-sized broadcast."
    ),
)
def event_type_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    ut = ev.select("user_id", "event_type").distinct()
    cnt = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("users_both"))
    )
    ca = F.broadcast(cnt.select(F.col("event_type").alias("type_a"), F.col("n").alias("na")))
    cb = F.broadcast(cnt.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb")))
    return (
        pairs.join(ca, "type_a")
        .join(cb, "type_b")
        .select(
            "type_a",
            "type_b",
            "users_both",
            F.round(
                F.col("users_both")
                / (F.col("na") + F.col("nb") - F.col("users_both")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "event_type_user_overlap_sketch",
    None,  # sketch estimates are impl-defined (HLL register layout), so no
    # cross-engine hash oracle — bench_only like user_value_sketches; the
    # error bound vs the exact overlap matrix is pinned in
    # tests/test_sketches.py, and event_type_user_overlap is the
    # oracle-checked exact companion.
    doc=(
        "audience-overlap matrix on sketches — the 100 TB form of "
        "event_type_user_overlap: ONE corpus pass builds a per-type HLL "
        "sketch of the user audience (constant memory per type), then "
        "the |types|-sized sketch table self-joins (25 pairs) and "
        "|A∩B| comes from inclusion-exclusion over hll_union — no "
        "user-keyed shuffle, no per-user rows after the first "
        "aggregation. Spark ships no sketch-intersection builtin; "
        "union + inclusion-exclusion is the standard identity, with "
        "error growing toward small intersections (documented "
        "DataSketches behavior — the exact twin is the answer when the "
        "overlap itself is tiny)."
    ),
    bench_only=True,
)
def event_type_user_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n_est"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n_est").alias("na"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n_est").alias("nb"),
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    union_est = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    both = F.greatest(F.col("na") + F.col("nb") - union_est, F.lit(0))
    return pairs.select(
        "type_a",
        "type_b",
        both.alias("users_both_est"),
        F.round(both / union_est, 6).alias("jaccard_est"),
    )


# --- wall grid layout (reference wall/wall.py:129-164) -----------------------

_WALL_STREAMS = 14  # configured stream_uris (slots 12-13 never produce events)
_WALL_COLS = 4  # VideoWallConfig.grid_columns default (wall/config.py:40)
_WALL_TILE_W, _WALL_TILE_H = 480, 360  # tile_size default (wall/config.py:37)
_WALL_TILES = -(-_WALL_STREAMS // _WALL_COLS) * _WALL_COLS  # last row padded


@register(
    "wall_grid_plan",
    f"""
    WITH live AS (
      SELECT CAST(user_id % 12 AS INT) AS source_id,
             COUNT(*) AS n_events
      FROM events GROUP BY 1
    )
    SELECT t.tile_idx,
           CASE WHEN t.tile_idx < {_WALL_STREAMS}
                THEN t.tile_idx END AS source_id,
           CAST(t.tile_idx // {_WALL_COLS} AS INT) AS grid_row,
           CAST(t.tile_idx % {_WALL_COLS} AS INT) AS grid_col,
           CAST(t.tile_idx % {_WALL_COLS} * {_WALL_TILE_W} AS INT) AS px_x,
           CAST(t.tile_idx // {_WALL_COLS} * {_WALL_TILE_H} AS INT) AS px_y,
           CASE WHEN t.tile_idx >= {_WALL_STREAMS} THEN 'pad'
                WHEN l.source_id IS NULL THEN 'black'
                ELSE 'live' END AS status,
           CAST(COALESCE(l.n_events, 0) AS BIGINT) AS n_events
    FROM (SELECT CAST(unnest(range({_WALL_TILES})) AS INT) AS tile_idx) t
    LEFT JOIN live l ON l.source_id = t.tile_idx
    ORDER BY t.tile_idx
    """,
    doc=(
        "the video wall's grid-assignment metadata (reference "
        "wall/wall.py:129-164, wall/config.py:37-40): each configured "
        "stream idx renders at tile (idx // grid_columns, idx % "
        "grid_columns) with pixel origin (col*tile_w, row*tile_h); "
        "configured sources with no frames become black tiles, and the "
        "last grid row is padded to full width with pure-pad tiles — "
        "exactly the reference's two padding kinds (_render_frame_batch "
        "fills to n_streams, _create_grid fills the final row). Live "
        "sources derive as user_id % 12 against 14 configured slots, so "
        "slots 12-13 are deterministically 'black' at every sf. The "
        "layout domain is a 16-row spark.range; the corpus collapses to "
        "a 12-row live set in one map-side-combined aggregate that "
        "broadcasts onto the domain — O(corpus) scan, O(1) everything "
        "else, at any scale."
    ),
)
def wall_grid_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    live = ev.groupBy(
        (F.col("user_id") % 12).cast("int").alias("source_id")
    ).agg(F.count("*").alias("n_events"))
    tiles = spark.range(_WALL_TILES).select(F.col("id").cast("int").alias("tile_idx"))
    t = F.col("tile_idx")
    return (
        tiles.join(F.broadcast(live), live.source_id == t, "left")
        .select(
            "tile_idx",
            F.when(t < _WALL_STREAMS, t).alias("source_id"),
            (t / _WALL_COLS).cast("int").alias("grid_row"),
            (t % _WALL_COLS).cast("int").alias("grid_col"),
            (t % _WALL_COLS * _WALL_TILE_W).cast("int").alias("px_x"),
            ((t / _WALL_COLS).cast("int") * _WALL_TILE_H).cast("int").alias("px_y"),
            F.when(t >= _WALL_STREAMS, "pad")
            .when(live.source_id.isNull(), "black")
            .otherwise("live")
            .alias("status"),
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        )
        .orderBy("tile_idx")
    )
