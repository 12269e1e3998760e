"""CUSUM changepoint semantics pins: a sustained mean shift alarms (and
the alarm direction matches the shift), a constant series never alarms,
noise within the slack never alarms, and the post-alarm reset segments a
double-shift series into two changepoints rather than a run of
re-alarms."""

from __future__ import annotations

import pandas as pd

from cupertino_nvr_spark.plans.temporal import _cusum_kernel


def _grid(cents):
    return pd.DataFrame(
        {
            "event_type": "t",
            "day": pd.to_datetime(range(len(cents)), unit="D"),
            "cents": cents,
        }
    )


def test_constant_series_never_alarms():
    out = _cusum_kernel(_grid([10_000] * 30))
    assert len(out) == 30
    assert out["is_changepoint"].sum() == 0
    assert (out["cusum_pos"] == 0).all() and (out["cusum_neg"] == 0).all()


def test_step_up_alarms_by_segment_and_resets():
    # 20 days at 100.00, then 10 days at 130.00. The reference mean is
    # the POOLED full-series mean (110 — the documented offline phase-I
    # estimate), so BOTH segments deviate from it: the long low segment
    # alarms 'down', the shifted high segment alarms 'up'; each alarm
    # resets the sums, so alarms are sparse, not a run.
    cents = [10_000] * 20 + [13_000] * 10
    out = _cusum_kernel(_grid(cents))
    cps = out[out["is_changepoint"] == 1]
    pre = cps[cps["idx"] <= 20]
    post = cps[cps["idx"] > 20]
    assert len(post) >= 1 and (post["direction"] == "up").all()
    assert (pre["direction"] == "down").all()
    # reset segments: strictly fewer alarms than days per segment
    assert len(post) < 10 and len(pre) < 20


def test_step_down_alarms_down_after_shift():
    cents = [10_000] * 20 + [7_000] * 10
    out = _cusum_kernel(_grid(cents))
    cps = out[out["is_changepoint"] == 1]
    post = cps[cps["idx"] > 20]
    assert len(post) >= 1 and (post["direction"] == "down").all()
    assert (cps[cps["idx"] <= 20]["direction"] == "up").all()


def test_small_noise_never_alarms():
    # alternating +/- 1 sigma noise: each step's excursion past the
    # slack (0.25 here) cancels on the next step, so the sums oscillate
    # near zero and never approach the h = 4*sigma decision interval
    cents = [10_000, 10_100] * 15
    out = _cusum_kernel(_grid(cents))
    assert out["is_changepoint"].sum() == 0
    assert out["cusum_pos"].max() < 1 and out["cusum_neg"].max() < 1


def test_double_shift_segments_both_directions():
    cents = [10_000] * 15 + [14_000] * 15 + [6_000] * 15
    out = _cusum_kernel(_grid(cents))
    dirs = list(out[out["is_changepoint"] == 1]["direction"])
    assert "up" in dirs and "down" in dirs


def test_empty_and_single_day_frames():
    assert len(_cusum_kernel(_grid([]))) == 0
    one = _cusum_kernel(_grid([12_345]))
    # single day: sigma = 0, x == mu, both sums 0, no alarm
    assert len(one) == 1
    assert one["is_changepoint"].iloc[0] == 0
