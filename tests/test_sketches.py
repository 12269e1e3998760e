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


def test_overlap_sketch_tracks_exact_matrix(spark):
    """The HLL inclusion-exclusion overlap stays within sketch error of
    the exact audience-overlap matrix (its oracle-checked twin). The
    inclusion-exclusion estimate compounds three HLL estimates (default
    lgK=12, ~0.8 % rsd each), so allow a bound on the UNION scale: the
    absolute error of |A|+|B|-|A∪B| is bounded by the sum of the three
    absolute errors, each proportional to its own cardinality."""
    est = {
        (r["type_a"], r["type_b"]): r
        for r in REGISTRY["event_type_user_overlap_sketch"].spark(spark, SF).collect()
    }
    exact = {
        (r["type_a"], r["type_b"]): r
        for r in REGISTRY["event_type_user_overlap"].spark(spark, SF).collect()
    }
    assert set(est) == set(exact)
    ev = load_table(spark, "events", SF)
    audiences = {
        r["event_type"]: r["n"]
        for r in ev.select("user_id", "event_type")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for (ta, tb), g in est.items():
        e = exact[(ta, tb)]
        union_size = audiences[ta] + audiences[tb] - e["users_both"]
        # 3 estimates x ~0.8% rsd x 3 sigma, on the union scale
        bound = max(5, 0.075 * union_size)
        assert abs(g["users_both_est"] - e["users_both"]) <= bound, (ta, tb)
