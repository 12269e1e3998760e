"""Sketch aggregates have no cross-engine oracle (impl-defined results);
their correctness statement is an error bound against the exact answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from cupertino_nvr_spark.plans import REGISTRY
from cupertino_nvr_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_sketches_within_error_bounds(spark):
    got = {r["event_type"]: r for r in REGISTRY["user_value_sketches"].spark(spark, SF).collect()}
    ev = load_table(spark, "events", SF)
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.percentile("value", F.array(F.lit(0.5), F.lit(0.9))).alias("q"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, g in got.items():
        e = exact[et]
        # HLL at rsd=0.02: allow 3 sigma
        assert abs(g["approx_users"] - e["users"]) <= max(3, 0.06 * e["users"])
        for approx_q, exact_q in zip((g["value_p50"], g["value_p90"]), e["q"]):
            assert abs(approx_q - exact_q) <= max(1.0, 0.05 * abs(exact_q))
