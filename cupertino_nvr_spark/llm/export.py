"""Training-shard materialization: the sink side of ``shard_pack``.

``docs_train_shards`` (plans/llm.py) computes a deterministic packing
*assignment*; this module writes the packed corpus to disk in the layout
a training loader consumes: ``split=train/bucket=3/shard=12/part-*``.
Parquet for columnar pipelines, JSONL (Spark's ``json`` writer is
line-delimited) for text-loader pipelines.

Scale posture: the only shuffle is the explicit repartition on the
partition columns — it co-locates each shard into one task so each shard
directory holds one file (a training loader wants ~shard-sized files,
not 32 slivers per shard). Everything else is the write itself. At 100 TB
raise ``n_buckets`` (shard_pack's parallelism knob) with the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cupertino_nvr_spark.llm.pipeline import shard_pack


def write_train_shards(
    docs: DataFrame,
    out_dir: str,
    fmt: str = "parquet",
    id_col: str = "doc_id",
    text_col: str = "text",
    token_budget: int = 2048,
    n_buckets: int = 16,
) -> DataFrame:
    """Pack ``docs`` into token-budget shards and write them partitioned by
    (split, bucket, shard). Returns the per-(split, bucket, shard) manifest
    DataFrame (doc count + token total) so callers can record or validate
    the layout without re-listing the filesystem.
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be 'parquet' or 'json', got {fmt!r}")
    assign = shard_pack(
        docs,
        text_col=text_col,
        id_col=id_col,
        token_budget=token_budget,
        n_buckets=n_buckets,
    )
    packed = docs.join(
        assign.select(
            id_col,
            "split",
            "bucket",
            F.col("shard_in_bucket").alias("shard"),
            "n_tokens",
        ), id_col
    )
    (
        packed.repartition("split", "bucket", "shard")
        .write.format(fmt)
        .partitionBy("split", "bucket", "shard")
        .mode("overwrite")
        .save(out_dir)
    )
    # manifest from the assignment alone: every aggregated column lives in
    # `assign`, so going through `packed` would re-execute the text-bearing
    # docs join a second time when the caller collects the manifest
    return (
        assign.groupBy(
            "split", "bucket", F.col("shard_in_bucket").alias("shard")
        ).agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


def curation_materialize(
    docs: DataFrame,
    out_dir: str,
    fmt: str = "parquet",
    id_col: str = "doc_id",
    text_col: str = "text",
    token_budget: int = 2048,
    n_buckets: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """The full curation funnel materialized on ONE DAG: exact-dedup
    keepers -> benchmark exclusion -> quality gate -> 5-gram
    decontamination (``llm.pipeline.curation_flags`` — the SAME flag
    chain ``docs_curation_report`` aggregates, so the written shards can
    never drift from the report) -> token-budget shard export.

    Returns (stage_counts, shard_manifest). The flag frame is persisted
    once and feeds BOTH the clean-doc filter under the shard write and
    the stage-count aggregate — one flag DAG with no per-stage recompute
    plus one payload scan under the shard write, never one scan per
    stage; at 100 TB this is the difference between a 2-pass job and a
    5-pass one. The caller owns unpersisting the cached flag frame: call
    ``spark.catalog.clearCache()`` or collect the returned stage_counts
    and then ``stage_counts.sparkSession.catalog.clearCache()`` once both
    returned frames have been consumed (the manifest and the counts both
    read it lazily, so unpersisting inside would defeat the sharing).
    """
    from cupertino_nvr_spark.llm.pipeline import (
        curation_flags,
        curation_stage_counts,
    )

    flags = curation_flags(docs, id_col=id_col, text_col=text_col).persist()
    clean = docs.join(
        flags.filter(F.col("is_clean")).select(id_col), id_col
    )
    manifest = write_train_shards(
        clean,
        out_dir,
        fmt=fmt,
        id_col=id_col,
        text_col=text_col,
        token_budget=token_budget,
        n_buckets=n_buckets,
    )
    return curation_stage_counts(flags), manifest


__all__ = ["write_train_shards", "curation_materialize"]
