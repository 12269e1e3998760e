"""Salting and bucketing: answers unchanged, plans improved.

These are the two explicit scale levers beyond what Catalyst/AQE do
automatically; each test checks BOTH the value semantics (same result as
the naive formulation) and the plan property that makes it worth doing.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from cupertino_nvr_spark.operators.bucketing import bucketed_join, write_bucketed
from cupertino_nvr_spark.operators.skew import salted_join
from cupertino_nvr_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def physical_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark):
    # events.user_id vs a small user dim: the archetypal hot-key join
    ev = load_table(spark, "events", SF).select("event_id", "user_id", "value")
    dim = (
        load_table(spark, "events", SF)
        .groupBy("user_id")
        .agg(F.count("*").alias("user_events"))
    )
    plain = ev.join(dim, on=["user_id"]).select("event_id", "user_id", "user_events")
    salted = salted_join(ev, dim, on=["user_id"], n_salts=8).select(
        "event_id", "user_id", "user_events"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    ev = load_table(spark, "events", SF).select("event_id", "user_id")
    dim = (
        load_table(spark, "events", SF)
        .filter(F.col("user_id") % 2 == 0)  # half the users missing from dim
        .select("user_id")
        .distinct()
        .withColumn("flag", F.lit(1))
    )
    plain = ev.join(dim, on=["user_id"], how="left")
    salted = salted_join(ev, dim, on=["user_id"], how="left", n_salts=8)
    assert plain.count() == salted.count() == ev.count()
    assert (
        plain.filter(F.col("flag").isNull()).count()
        == salted.filter(F.col("flag").isNull()).count()
    )


def test_salted_join_rejects_full_outer(spark):
    ev = load_table(spark, "events", SF)
    with pytest.raises(ValueError):
        salted_join(ev, ev, on=["user_id"], how="full")


def test_bucketed_join_eliminates_exchange(spark):
    # managed tables land in ./spark-warehouse (static conf; gitignored)
    orders = load_table(spark, "orders", SF)
    lineitem = load_table(spark, "lineitem", SF).withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], n_buckets=8)
    # at sf0.001 both sides fit the broadcast threshold and the planner
    # ignores buckets; disable broadcast to get the fact-fact sort-merge
    # shape bucketing exists for (at 100 TB neither side broadcasts)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", on=["o_orderkey"])
        plan = physical_plan(joined)
        # the whole point: a sort-merge join with NO shuffle on either side
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, (
            "bucketed join still shuffles"
        )
        # and the answer matches the shuffled join
        plain = orders.join(lineitem, on=["o_orderkey"])
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_embedding_neardup_full_recall(spark):
    """IVF-cell blocking must not lose any injected near-dup group: exact
    copies (vec_id%9 -> +1M, sim 1.0) and perturbed copies (vec_id%5 -> +2M,
    sim ~0.9996) both land in their source's cell."""
    from cupertino_nvr_spark.plans.llm import augmented_embeddings
    from cupertino_nvr_spark.llm.dedup import embedding_neardup_pairs

    sf = "/root/testdata/sf0.001"
    aug = augmented_embeddings(spark, sf)
    pairs = {
        (r.id_a, r.id_b): r.sim
        for r in embedding_neardup_pairs(aug, threshold=0.99).collect()
    }
    ids = [r.vec_id for r in aug.select("vec_id").collect() if r.vec_id < 1000000]
    assert ids, "corpus empty"
    for i in ids:
        if i % 9 == 0:
            assert pairs.get((i, i + 1000000)) == 1.0, f"exact copy of {i} missed"
        if i % 5 == 0:
            assert pairs.get((i, i + 2000000), 0.0) >= 0.99, f"perturbed copy of {i} missed"
    # and nothing in the natural corpus is a false near-dup of itself
    natural = [(a, b) for (a, b) in pairs if a < 1000000 and b < 1000000]
    assert natural == []


def test_reliable_checkpoint_local_fallback(spark):
    """Under a local master with no checkpoint dir, reliable_checkpoint
    falls back to localCheckpoint: lineage truncated, values unchanged."""
    from cupertino_nvr_spark.operators.checkpoint import reliable_checkpoint

    assert spark.sparkContext.getCheckpointDir() is None
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = reliable_checkpoint(df)
    assert [r.v for r in out.orderBy("id").collect()] == [2 * i for i in range(100)]
    # lineage is truncated: the checkpointed frame scans a materialized RDD
    assert "ExistingRDD" in physical_plan(out)


def test_reliable_checkpoint_uses_reliable_dir(spark, tmp_path):
    """With spark.cupertino.checkpoint.dir set, blocks go to the reliable
    store (DataFrame.checkpoint), surviving executor loss on a cluster."""
    from cupertino_nvr_spark.operators.checkpoint import (
        CHECKPOINT_DIR_CONF,
        reliable_checkpoint,
    )

    ckdir = str(tmp_path / "ck")
    spark.conf.set(CHECKPOINT_DIR_CONF, ckdir)
    try:
        df = spark.range(50).withColumn("v", F.col("id") + 1)
        out = reliable_checkpoint(df)
        assert "ExistingRDD" in physical_plan(out)
        import os

        assert any(os.scandir(ckdir)), "no files written to the reliable dir"
        assert out.count() == 50
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)
        # clear the session-wide dir so later tests see the local fallback
        jsc = spark.sparkContext._jsc.sc()
        getattr(jsc, "checkpointDir_$eq")(
            spark.sparkContext._jvm.scala.Option.apply(None)
        )
