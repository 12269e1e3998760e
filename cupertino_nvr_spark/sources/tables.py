"""Batch table access over the driver's parquet test data.

Plain ``spark.read.parquet`` — no options that defeat Catalyst. Filters and
projections applied by callers are pushed into the scan (verify with
``df.explain``: ``PushedFilters`` / ``ReadSchema``). At 100 TB these paths
would be partitioned directories or an Iceberg/Delta table; the loader is
the single seam where that swap happens.
"""

from __future__ import annotations

import os
import warnings

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from cupertino_nvr_spark.schemas import BATCH_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """Read the events table, adapting to whichever physical ``ts`` encoding
    the parquet files carry.

    Observed formats across driver data generations:

    * ``timestamp[us]`` (current) — Spark reads it natively as
      TIMESTAMP/TIMESTAMP_NTZ, identical to DuckDB. No conversion.
    * parquet TIMESTAMP(NANOS) (older) — Spark refuses it unless
      ``spark.sql.legacy.parquet.nanosAsLong`` is set, which surfaces it as
      int64 nanos; truncate to micros (integer div, lossless for micros)
      exactly as DuckDB does so both engines agree.
    * plain ``int64`` nanos — same conversion, no conf needed.

    The branch keys off the ACTUAL column dtype, never an assumed one, so a
    future format change degrades to "no conversion" instead of an
    AnalysisException that takes down every events query.
    """
    try:
        df = spark.read.parquet(path)
    except AnalysisException as exc:
        # Older driver data: parquet TIMESTAMP(NANOS) fails schema inference
        # unless the legacy conf maps it to long. Retry once with it set —
        # but ONLY for that exact failure class (an AnalysisException naming
        # NANOS): an unrelated error (missing/corrupt file, IO) must surface
        # as itself, not as the retry's error, and must not mutate session
        # config as a side effect.
        if "NANOS" not in str(exc).upper():
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
        except Exception:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            raise exc
    if "ts" in df.columns:
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # integer div — float division would lose precision on int64 nanos
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # Normalize to TIMESTAMP so the full scalar surface
            # (unix_micros, to_utc_timestamp, ...) resolves. Under the UTC
            # session tz load_table pins, the cast maps each naive value to
            # the same UTC instant DuckDB's naive read implies, keeping the
            # two engines (and the pre-NTZ round-2 behavior) value-identical.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one named table from a scale-factor directory.

    Pins the session timezone to UTC on EVERY call — not just for events —
    so timestamp literals, date functions, and the NTZ->TIMESTAMP cast all
    resolve identically to DuckDB's timezone-naive reads regardless of the
    order in which tables are loaded or what tz the caller's session was
    built with. (An events-only pin would make unrelated queries' results
    depend on whether events had been loaded earlier in the session.)
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in BATCH_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {BATCH_TABLES}")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _read_events(spark, path)
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in BATCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so SQL-form operators can run.

    Failure-isolated per table: one table's format change must not take down
    SQL queries that never touch it (round 3 lost three pure-orders queries
    to an events-only schema change). A query that does need the broken
    table still fails — with TABLE_OR_VIEW_NOT_FOUND — at its own call site.
    """
    for name in BATCH_TABLES:
        try:
            load_table(spark, name, sf_dir).createOrReplaceTempView(name)
        except Exception as exc:  # pragma: no cover - defensive isolation
            warnings.warn(f"register_views: skipping table {name!r}: {exc}")
