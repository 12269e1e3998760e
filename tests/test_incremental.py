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
