"""Semantics pin for the additive Holt-Winters anomaly detector: on a
strongly weekly-cycled series the seasonal forecast must adapt (weekend
troughs are NOT anomalies once a full cycle is learned), while a genuine
level break IS flagged — the exact failure mode a level-only EWMA
forecast has on weekly-cycled metrics. Plus structural pins: one row per
(type, day) past the init window, short types skipped."""

from __future__ import annotations

from datetime import datetime

from cupertino_nvr_spark.plans import REGISTRY
from cupertino_nvr_spark.plans.llm import _UNI_MAXW  # noqa: F401  (import sanity)
from cupertino_nvr_spark.plans.temporal import _HW_M, _HW_MIN_DAYS


def _mk_events(spark, sf_dir, rows):
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).write.parquet(f"{sf_dir}/events.parquet")


def test_holt_winters_learns_weekly_cycle(spark, tmp_path):
    sf_dir = str(tmp_path)
    rows = []
    eid = 0
    # 28 days: weekdays 100, weekends 10 — perfectly weekly; day 24
    # (dow 3, a weekday) collapses to 5.0: the genuine break
    for d in range(28):
        dow = d % 7
        base = 10.0 if dow >= 5 else 100.0
        if d == 24:
            base = 5.0
        eid += 1
        rows.append((eid, datetime(2024, 1, 1 + d), 1, "click", base, "{}"))
    # a short type: only 5 days -> below the 2m+1 init window, skipped
    for d in range(5):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1 + d), 2, "rare", 1.0, "{}"))
    _mk_events(spark, sf_dir, rows)

    out = {
        int(r["idx"]): r
        for r in REGISTRY["events_holt_winters"].spark(spark, sf_dir).collect()
        if r["event_type"] == "click"
    }
    # one row per day past the init window, short type absent entirely
    assert sorted(out) == list(range(_HW_M + 1, 29))
    all_rows = REGISTRY["events_holt_winters"].spark(spark, sf_dir).collect()
    assert {r["event_type"] for r in all_rows} == {"click"}
    assert _HW_MIN_DAYS == 2 * _HW_M + 1

    # once a full cycle is learned (idx > 14), the repeating weekend
    # trough is forecast, not flagged — the level-only EWMA would alarm.
    # Only pre-break days qualify: the idx-25 shock legitimately
    # contaminates the level/trend for the recovery days after it.
    steady = [out[i] for i in range(2 * _HW_M + 1, 25)]
    assert steady, "need post-learning pre-break rows"
    assert all(r["is_anomaly"] == 0 for r in steady), [
        (r["idx"], r["pct_dev"]) for r in steady if r["is_anomaly"]
    ]
    # the genuine weekday break (idx 25 = day 24, dow 3) IS flagged
    assert out[25]["is_anomaly"] == 1
    assert out[25]["total_value"] == 5.0
    # seasonal components carry sign: weekend seasonals negative,
    # weekday positive, once learned
    assert out[27]["seasonal"] < 0 or out[26]["seasonal"] < 0
