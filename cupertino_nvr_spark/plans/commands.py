"""Bulk command validation — the full validator rule table as one scan
(SURVEY §2.3 F6, reference ``processor/validators.py:49-180`` +
``processor/config.py:99-150``).

The reference validates one command at a time in Python; at engine scale
the same rules run as column predicates over a command-audit stream: one
projection, no shuffle, no Python. The synthetic command corpus below is
derived from the ``events`` table with integer-only arithmetic (doubles
never cast to string) so the DuckDB oracle reproduces every raw value
byte-for-byte.

Per-rule verdict columns expose the whole table; ``reject_reason`` applies
only the rules the command actually uses, in the reference's check order
(first failure wins, exactly like its sequential ``raise``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cupertino_nvr_spark.functions import validation as V
from cupertino_nvr_spark.plans.registry import register
from cupertino_nvr_spark.sources.tables import load_table

_COMMANDS = ["change_model", "set_fps", "add_stream", "remove_stream", "update_config"]

_SYNTH_SQL = f"""
  SELECT event_id AS cmd_id,
         CASE event_id % 5
           WHEN 0 THEN 'change_model' WHEN 1 THEN 'set_fps'
           WHEN 2 THEN 'add_stream' WHEN 3 THEN 'remove_stream'
           ELSE 'update_config' END AS command,
         CASE event_id % 7
           WHEN 0 THEN '' WHEN 1 THEN '  yolov11x-640  '
           WHEN 2 THEN NULL
           ELSE 'yolov8x-' || CAST(event_id % 5 AS VARCHAR) END AS raw_model_id,
         CASE event_id % 6
           WHEN 0 THEN '0' WHEN 1 THEN '-1.5' WHEN 2 THEN 'not a number'
           WHEN 3 THEN '0.5' WHEN 4 THEN '5'
           ELSE CAST(CAST(user_id % 30 + 1 AS INT) AS VARCHAR) END AS raw_fps,
         CASE event_id % 8
           WHEN 0 THEN '-1' WHEN 1 THEN 'x9' WHEN 2 THEN '3.99'
           WHEN 3 THEN 'NaN' WHEN 4 THEN 'inf' WHEN 5 THEN '3e9'
           ELSE CAST(CAST(user_id % 16 AS INT) AS VARCHAR) END AS raw_source_id,
         CASE event_id % 5
           WHEN 0 THEN 'rtsp://localhost:8554/live/3' WHEN 1 THEN 'not a uri'
           WHEN 2 THEN 'rtsp://' WHEN 3 THEN 'file:///tmp/clip.mp4'
           ELSE 'rtsp://go2rtc:8554/' || CAST(CAST(user_id % 16 AS INT) AS VARCHAR)
           END AS raw_uri,
         CASE event_id % 9
           WHEN 0 THEN '0' WHEN 1 THEN '70000' WHEN 2 THEN 'abc'
           ELSE CAST(1880 + CAST(user_id % 8 AS INT) AS VARCHAR) END AS raw_port,
         CASE event_id % 8
           WHEN 0 THEN '1.5' WHEN 1 THEN '-0.1' WHEN 2 THEN 'oops'
           WHEN 3 THEN '0' WHEN 4 THEN '1' ELSE '0.5' END AS raw_confidence
  FROM events WHERE event_id % 3 = 0
"""


@register(
    "command_validation",
    f"""
    WITH cmds AS ({_SYNTH_SQL}),
    checked AS (
      SELECT *,
             (raw_model_id IS NOT NULL AND trim(raw_model_id) <> '') AS model_id_ok,
             TRY_CAST(raw_fps AS DOUBLE) AS fps_num,
             -- TRUNC, not a bare int cast: DuckDB's double->int cast ROUNDS
             -- while Spark's truncates toward zero like Python int(). NaN
             -- and +/-inf are nulled first (DuckDB's bigint cast ERRORS on
             -- them; Spark's non-ANSI cast silently maps NaN to 0) — the
             -- guard matches functions/validation.py:source_id_trunc.
             CASE WHEN TRY_CAST(raw_source_id AS DOUBLE) IS NOT NULL
                   AND NOT isnan(TRY_CAST(raw_source_id AS DOUBLE))
                   AND TRY_CAST(raw_source_id AS DOUBLE)
                       BETWEEN -9.223372036854775e18 AND 9.223372036854775e18
                  THEN CAST(TRUNC(TRY_CAST(raw_source_id AS DOUBLE)) AS BIGINT)
             END AS sid_trunc,
             (raw_uri IS NOT NULL
              AND regexp_matches(raw_uri, '{V.URI_REGEX}')) AS uri_ok,
             TRY_CAST(raw_port AS INT) AS port_num,
             TRY_CAST(raw_confidence AS DOUBLE) AS conf_num
      FROM cmds
    ),
    verdicts AS (
      SELECT cmd_id, command, model_id_ok,
             CASE WHEN model_id_ok THEN trim(raw_model_id) END AS model_id,
             (fps_num IS NOT NULL AND fps_num > 0) AS fps_ok,
             CASE WHEN fps_num IS NOT NULL AND fps_num > 0 THEN fps_num END AS max_fps,
             (sid_trunc IS NOT NULL AND sid_trunc >= 0) AS source_id_ok,
             CASE WHEN sid_trunc IS NOT NULL AND sid_trunc >= 0
                  THEN sid_trunc END AS source_id,
             uri_ok,
             (port_num IS NOT NULL AND port_num BETWEEN 1 AND 65535) AS port_ok,
             (conf_num IS NOT NULL AND conf_num BETWEEN 0 AND 1) AS confidence_ok,
             fps_num, sid_trunc
      FROM checked
    )
    SELECT cmd_id, command, model_id_ok, model_id, fps_ok, max_fps,
           source_id_ok, source_id, uri_ok, port_ok, confidence_ok,
           CASE command
             WHEN 'change_model' THEN
               CASE WHEN NOT model_id_ok THEN 'invalid_model_id' END
             WHEN 'set_fps' THEN
               CASE WHEN fps_num IS NULL THEN 'fps_not_numeric'
                    WHEN fps_num <= 0 THEN 'fps_not_positive' END
             WHEN 'add_stream' THEN
               CASE WHEN sid_trunc IS NULL THEN 'source_id_not_numeric'
                    WHEN sid_trunc < 0 THEN 'source_id_negative'
                    WHEN NOT uri_ok THEN 'invalid_stream_uri' END
             WHEN 'remove_stream' THEN
               CASE WHEN sid_trunc IS NULL THEN 'source_id_not_numeric'
                    WHEN sid_trunc < 0 THEN 'source_id_negative' END
             ELSE
               CASE WHEN NOT port_ok THEN 'invalid_port'
                    WHEN NOT confidence_ok THEN 'confidence_out_of_range' END
           END AS reject_reason,
           CASE command
             WHEN 'change_model' THEN model_id_ok
             WHEN 'set_fps' THEN fps_ok
             WHEN 'add_stream' THEN source_id_ok AND uri_ok
             WHEN 'remove_stream' THEN source_id_ok
             ELSE port_ok AND confidence_ok
           END AS is_valid
    FROM verdicts
    """,
    doc="F6/U3 full validator rule table as columnar predicates "
    "(validators.py:49-180, config.py:99-150): per-rule verdicts, "
    "normalized values, first-failure reject reason per command",
)
def command_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") % 3 == 0)

    m5 = F.col("event_id") % 5
    m7 = F.col("event_id") % 7
    m6 = F.col("event_id") % 6
    m4s = F.col("event_id") % 8
    m9 = F.col("event_id") % 9
    m8 = F.col("event_id") % 8
    u = lambda mod: (F.col("user_id") % mod).cast("int").cast("string")  # noqa: E731

    command = (
        F.when(m5 == 0, "change_model")
        .when(m5 == 1, "set_fps")
        .when(m5 == 2, "add_stream")
        .when(m5 == 3, "remove_stream")
        .otherwise("update_config")
    )
    raw_model_id = (
        F.when(m7 == 0, "")
        .when(m7 == 1, "  yolov11x-640  ")
        .when(m7 == 2, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("yolov8x-"), m5.cast("string")))
    )
    raw_fps = (
        F.when(m6 == 0, "0")
        .when(m6 == 1, "-1.5")
        .when(m6 == 2, "not a number")
        .when(m6 == 3, "0.5")
        .when(m6 == 4, "5")
        .otherwise((F.col("user_id") % 30 + 1).cast("int").cast("string"))
    )
    raw_source_id = (
        F.when(m4s == 0, "-1")
        .when(m4s == 1, "x9")
        .when(m4s == 2, "3.99")
        .when(m4s == 3, "NaN")
        .when(m4s == 4, "inf")
        .when(m4s == 5, "3e9")
        .otherwise(u(16))
    )
    raw_uri = (
        F.when(m5 == 0, "rtsp://localhost:8554/live/3")
        .when(m5 == 1, "not a uri")
        .when(m5 == 2, "rtsp://")
        .when(m5 == 3, "file:///tmp/clip.mp4")
        .otherwise(F.concat(F.lit("rtsp://go2rtc:8554/"), u(16)))
    )
    raw_port = (
        F.when(m9 == 0, "0")
        .when(m9 == 1, "70000")
        .when(m9 == 2, "abc")
        .otherwise((F.lit(1880) + (F.col("user_id") % 8).cast("int")).cast("string"))
    )
    raw_confidence = (
        F.when(m8 == 0, "1.5")
        .when(m8 == 1, "-0.1")
        .when(m8 == 2, "oops")
        .when(m8 == 3, "0")
        .when(m8 == 4, "1")
        .otherwise("0.5")
    )

    cmds = ev.select(
        F.col("event_id").alias("cmd_id"),
        command.alias("command"),
        raw_model_id.alias("raw_model_id"),
        raw_fps.alias("raw_fps"),
        raw_source_id.alias("raw_source_id"),
        raw_uri.alias("raw_uri"),
        raw_port.alias("raw_port"),
        raw_confidence.alias("raw_confidence"),
    )

    checked = cmds.select(
        "cmd_id",
        "command",
        V.model_id_ok(F.col("raw_model_id")).alias("model_id_ok"),
        V.model_id_norm(F.col("raw_model_id")).alias("model_id"),
        V.fps_ok(F.col("raw_fps")).alias("fps_ok"),
        F.when(V.fps_ok(F.col("raw_fps")), V.fps_num(F.col("raw_fps"))).alias("max_fps"),
        V.source_id_ok(F.col("raw_source_id")).alias("source_id_ok"),
        V.source_id_norm(F.col("raw_source_id")).alias("source_id"),
        V.uri_ok(F.col("raw_uri")).alias("uri_ok"),
        V.port_ok(F.col("raw_port")).alias("port_ok"),
        V.confidence_ok(F.col("raw_confidence")).alias("confidence_ok"),
        V.fps_num(F.col("raw_fps")).alias("_fps_num"),
        V.source_id_trunc(F.col("raw_source_id")).alias("_sid_trunc"),
    )

    reject = (
        F.when(
            F.col("command") == "change_model",
            F.when(~F.col("model_id_ok"), "invalid_model_id"),
        )
        .when(
            F.col("command") == "set_fps",
            F.when(F.col("_fps_num").isNull(), "fps_not_numeric").when(
                F.col("_fps_num") <= 0, "fps_not_positive"
            ),
        )
        .when(
            F.col("command") == "add_stream",
            F.when(F.col("_sid_trunc").isNull(), "source_id_not_numeric")
            .when(F.col("_sid_trunc") < 0, "source_id_negative")
            .when(~F.col("uri_ok"), "invalid_stream_uri"),
        )
        .when(
            F.col("command") == "remove_stream",
            F.when(F.col("_sid_trunc").isNull(), "source_id_not_numeric").when(
                F.col("_sid_trunc") < 0, "source_id_negative"
            ),
        )
        .otherwise(
            F.when(~F.col("port_ok"), "invalid_port").when(
                ~F.col("confidence_ok"), "confidence_out_of_range"
            )
        )
    )
    is_valid = (
        F.when(F.col("command") == "change_model", F.col("model_id_ok"))
        .when(F.col("command") == "set_fps", F.col("fps_ok"))
        .when(
            F.col("command") == "add_stream", F.col("source_id_ok") & F.col("uri_ok")
        )
        .when(F.col("command") == "remove_stream", F.col("source_id_ok"))
        .otherwise(F.col("port_ok") & F.col("confidence_ok"))
    )

    return checked.select(
        "cmd_id",
        "command",
        "model_id_ok",
        "model_id",
        "fps_ok",
        "max_fps",
        "source_id_ok",
        "source_id",
        "uri_ok",
        "port_ok",
        "confidence_ok",
        reject.alias("reject_reason"),
        is_valid.alias("is_valid"),
    )
