"""Bucketed co-located joins: pre-shuffle once, join forever shuffle-free
(SURVEY §7.4, 100 TB posture).

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides. Bucketing (`DataFrameWriter.bucketBy`) materializes each table
hash-partitioned by the join key; Catalyst then plans a sort-merge join
with NO Exchange on either side — the shuffle was paid once at write time
and amortizes over every subsequent join/aggregation on that key.

This module is the engine's seam for that layout decision, mirroring how
``sources.tables.load_table`` is the seam for the storage format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    ``n_buckets`` should match downstream ``spark.sql.shuffle.partitions``
    scale-wise; sorted buckets additionally drop the per-task sort from
    sort-merge joins.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the plan
    contains no Exchange (verify via ``.explain``)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


__all__ = ["write_bucketed", "bucketed_join"]
