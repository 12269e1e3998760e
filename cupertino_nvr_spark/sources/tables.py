"""Batch table access over the driver's parquet test data.

Plain ``spark.read.parquet`` — no options that defeat Catalyst. Filters and
projections applied by callers are pushed into the scan (verify with
``df.explain``: ``PushedFilters`` / ``ReadSchema``). At 100 TB these paths
would be partitioned directories or an Iceberg/Delta table; the loader is
the single seam where that swap happens.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cupertino_nvr_spark.schemas import BATCH_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one named table from a scale-factor directory."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in BATCH_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {BATCH_TABLES}")
    if name == "events":
        # must hold for any caller-supplied session (the driver builds its
        # own), not just sessions from get_spark()
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) → read as long via
        # spark.sql.legacy.parquet.nanosAsLong; truncate to micros exactly
        # as DuckDB does so both engines see identical timestamps.
        # integer div — float division would lose precision on int64 nanos
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in BATCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so SQL-form operators can run."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
