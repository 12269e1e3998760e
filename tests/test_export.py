"""Shard-export sink: packed layout on disk round-trips losslessly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cupertino_nvr_spark.llm.export import write_train_shards

DOCS = [(i, " ".join(f"tok{i}w{j}" for j in range(1 + i % 40))) for i in range(200)]


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("fmt", ["parquet", "json"])
def test_shard_export_roundtrip(spark, docs_df, tmp_path, fmt):
    out = str(tmp_path / fmt)
    manifest = write_train_shards(
        docs_df, out, fmt=fmt, token_budget=128, n_buckets=4
    ).collect()

    # hive-partitioned layout a loader can glob
    splits = sorted(d for d in os.listdir(out) if d.startswith("split="))
    assert "split=train" in splits

    back = spark.read.format(fmt).load(out)
    assert back.count() == len(DOCS)
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == sorted(
        d for d, _ in DOCS
    )
    # partition columns come back as columns; text survives byte-identical
    got_text = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got_text == dict(DOCS)

    # manifest matches what landed on disk per shard
    disk = {
        (r["split"], r["bucket"], r["shard"]): r["n"]
        for r in back.groupBy("split", "bucket", "shard")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {(r["split"], r["bucket"], r["shard"]): r["n_docs"] for r in manifest} == disk

    # greedy budget invariant: a shard overflows by at most its last doc
    for r in manifest:
        assert r["total_tokens"] <= 128 + 40


def test_shard_export_rejects_unknown_format(spark, docs_df, tmp_path):
    with pytest.raises(ValueError):
        write_train_shards(docs_df, str(tmp_path / "x"), fmt="csv")
