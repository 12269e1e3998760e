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


def test_curation_materialize_pins_report(spark, tmp_path):
    """The single-DAG funnel materialization must agree with the
    oracle-checked docs_curation_report on every stage count, and the
    written shards must contain exactly the clean survivors (manifest
    round-trips against the files on disk)."""
    from cupertino_nvr_spark.llm.export import curation_materialize
    from cupertino_nvr_spark.llm.pipeline import curation_flags
    from cupertino_nvr_spark.plans import REGISTRY
    from cupertino_nvr_spark.plans.llm import augmented_docs

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "curated")
    docs = augmented_docs(spark, sf)
    counts, manifest = curation_materialize(docs, out, token_budget=512, n_buckets=4)

    got = counts.collect()[0].asDict()
    want = REGISTRY["docs_curation_report"].spark(spark, sf).collect()[0].asDict()
    assert got == want

    mani = manifest.collect()
    assert sum(r["n_docs"] for r in mani) == want["n_clean"]

    back = spark.read.parquet(out)
    disk_ids = sorted(r["doc_id"] for r in back.select("doc_id").collect())
    clean_ids = sorted(
        r["doc_id"]
        for r in curation_flags(docs).filter("is_clean").select("doc_id").collect()
    )
    assert disk_ids == clean_ids
    # the funnel actually filtered (aug corpus carries planted dups,
    # benchmark rows, and repetition failures)
    assert want["n_clean"] < want["n_raw"]
    # manifest matches disk per shard
    import pyspark.sql.functions as F  # noqa: N812

    disk = {
        (r["split"], r["bucket"], r["shard"]): r["n"]
        for r in back.groupBy("split", "bucket", "shard")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {
        (r["split"], r["bucket"], r["shard"]): r["n_docs"] for r in mani
    } == disk


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_dup_clusters_materialize_pins_all_consumers(spark, tmp_path):
    """Cluster once, consume three times: the REPORT, DECISION, and
    QUALITY frames derived from the persisted cluster frame must be
    row-identical to their standalone oracle-checked registry twins —
    the materialize-once operating mode cannot drift from the queries
    the driver verifies."""
    from cupertino_nvr_spark.llm.export import dup_clusters_materialize
    from cupertino_nvr_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    mat, survivors, bcubed = dup_clusters_materialize(
        spark, sf, str(tmp_path / "clusters")
    )
    assert _rows(mat) == _rows(REGISTRY["docs_dup_clusters"].spark(spark, sf))
    assert _rows(survivors) == _rows(
        REGISTRY["docs_dedup_survivors"].spark(spark, sf)
    )
    assert _rows(bcubed) == _rows(
        REGISTRY["docs_cluster_bcubed"].spark(spark, sf)
    )


def test_media_doc_components_materialize_pins_both_consumers(spark, tmp_path):
    """The cross-modal component frame persisted once must feed a cluster
    report and a dedup decision row-identical to the standalone
    media_doc_dup_clusters / media_doc_dedup_survivors queries."""
    from cupertino_nvr_spark.llm.export import media_doc_components_materialize
    from cupertino_nvr_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    comp, clusters, survivors = media_doc_components_materialize(
        spark, sf, str(tmp_path / "components")
    )
    assert comp.count() > 0
    assert _rows(clusters) == _rows(
        REGISTRY["media_doc_dup_clusters"].spark(spark, sf)
    )
    assert _rows(survivors) == _rows(
        REGISTRY["media_doc_dedup_survivors"].spark(spark, sf)
    )


def test_curation_materialize_demo_roundtrip(spark, tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from curation_pipeline_demo import run_curation_materialize

    report = run_curation_materialize(
        spark, "/root/testdata/sf0.001", str(tmp_path / "demo")
    )
    assert report["shard_docs_total"] == report["n_clean"]
    assert report["n_shards"] > 0
    assert 0 < report["retention_pct"] < 100
