"""Incremental view maintenance: merging per-batch aggregates must be
EXACTLY equivalent to recomputing from all facts — for any batch split,
including new keys, untouched keys, and multi-batch chains."""

from __future__ import annotations

from pyspark.sql import functions as F

from cupertino_nvr_spark.operators.incremental import aggregate_base, merge_additive
from cupertino_nvr_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"

KW = dict(
    keys=["o_custkey"], sums=["o_totalprice"], counts=True,
    mins=["o_orderdate"], maxs=["o_orderdate"],
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_equals_full_recompute(spark):
    orders = load_table(spark, "orders", SF)
    # history = first 80% of orders by key hash; delta = the rest
    # (guarantees overlap keys, delta-only keys, and history-only keys)
    history = orders.filter(F.crc32(F.col("o_orderkey").cast("string")) % 5 != 0)
    delta = orders.filter(F.crc32(F.col("o_orderkey").cast("string")) % 5 == 0)

    current = aggregate_base(history, **KW)
    merged = merge_additive(current, aggregate_base(delta, **KW), **KW)
    full = aggregate_base(orders, **KW)
    assert _rows(merged) == _rows(full)


def test_merge_chain_three_batches(spark):
    orders = load_table(spark, "orders", SF)
    parts = [
        orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)
    ]
    state = aggregate_base(parts[0], **KW)
    for p in parts[1:]:
        state = merge_additive(state, aggregate_base(p, **KW), **KW)
    assert _rows(state) == _rows(aggregate_base(orders, **KW))


def test_merge_join_is_keyed_not_cartesian(spark):
    orders = load_table(spark, "orders", SF)
    cur = aggregate_base(orders.limit(100), **KW)
    dlt = aggregate_base(orders.limit(50), **KW)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        merge_additive(cur, dlt, **KW).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


SKW = dict(keys=["o_custkey"], sums=(), counts=True,
           approx_distincts=["o_orderpriority"], approx_quantiles=["o_totalprice"])


def test_sketch_merge_equals_full_recompute(spark):
    """Mergeable-sketch maintenance: HLL union is register-wise max, so
    the merged view's estimates are IDENTICAL to a one-shot aggregate
    over all facts — the property that makes approx distinct/quantiles
    maintainable at O(|delta|) where their exact forms are not."""
    from cupertino_nvr_spark.operators.incremental import finalize

    orders = load_table(spark, "orders", SF)
    parts = [orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    state = aggregate_base(parts[0], **SKW)
    for p in parts[1:]:
        state = merge_additive(state, aggregate_base(p, **SKW), **SKW)
    fin = dict(approx_distincts=SKW["approx_distincts"],
               approx_quantiles=SKW["approx_quantiles"])
    merged = finalize(state, **fin, quantiles=(0.5, 0.9))
    full = finalize(aggregate_base(orders, **SKW), **fin, quantiles=(0.5, 0.9))
    assert _rows(merged) == _rows(full)


def test_sketch_estimates_near_exact(spark):
    """The served estimates stay within sketch error of the exact values
    (HLL default lgK=12: well under 1% at these cardinalities; KLL
    k=200: rank error ~1.65%)."""
    from cupertino_nvr_spark.operators.incremental import finalize

    orders = load_table(spark, "orders", SF)
    view = finalize(
        aggregate_base(orders, keys=["o_orderstatus"],
                       approx_distincts=["o_custkey"],
                       approx_quantiles=["o_totalprice"]),
        approx_distincts=["o_custkey"], approx_quantiles=["o_totalprice"],
        quantiles=(0.5,),
    )
    exact = orders.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("n"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.count("*").alias("cnt"),
    )
    j = {r["o_orderstatus"]: r for r in exact.collect()}
    for r in view.collect():
        e = j[r["o_orderstatus"]]
        assert abs(r["approx_o_custkey"] - e["n"]) <= max(0.03 * e["n"], 2)
        # KLL guarantees RANK error, not value error: check the estimated
        # median's rank sits within ~2% of the true median rank
        n_below = orders.filter(
            (F.col("o_orderstatus") == r["o_orderstatus"])
            & (F.col("o_totalprice") <= r["o_totalprice_p50"])
        ).count()
        assert abs(n_below / e["cnt"] - 0.5) <= 0.03
