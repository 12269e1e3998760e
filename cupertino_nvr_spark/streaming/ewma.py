"""Streaming EWMA forecast-residual anomaly monitor — the streaming twin
of the batch ``events_ewma_anomaly`` plan (plans/temporal.py).

The batch form scores each (event_type, day) total against the
exponentially weighted mean of its 13 strictly-prior days. The twin keeps
per-type keyed state of the daily totals (exact integer cents, so the sum
is chop-order-insensitive) and re-emits the full recomputed EWMA frame
for a type after every micro-batch that touches it — the PSI twin's
emission contract. The weight table is frozen ONCE through the batch
plan's own expression (``ewma_weights`` runs pow(decay, age-1) in Spark,
not Python — the twins cannot fork on a libm ulp), and every float
rounding replays Spark's round(x, n) via ``Decimal(repr(x))`` HALF_UP
(both are shortest-round-trip decimalizations — the Markov-kernel rule),
so the final emission matches the batch rows bit-for-bit.

State: 2 bigints per (event_type, day) — bounded by the time domain, not
the stream. Production prunes days older than the lookback behind the
watermark (emit-on-close), capping state at lookback+1 entries per type;
kept whole here because the twin re-emits the complete frame like the
PSI monitor.

Reference analog: none (north-star §2.11 family; batch twin
``events_ewma_anomaly``).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from datetime import date, timedelta
from decimal import ROUND_HALF_UP, Decimal
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cupertino_nvr_spark.plans.temporal import (
    _EWMA_DECAY,
    _EWMA_LOOKBACK,
    _EWMA_THRESHOLD,
)

EWMA_OUTPUT_SCHEMA = (
    "event_type string, day date, total_value double, n_prev bigint, "
    "ewma_prev double, pct_dev double, is_anomaly int"
)
EWMA_STATE_SCHEMA = "days array<int>, cents array<long>"

_Q4 = Decimal("0.0001")
_Q6 = Decimal("0.000001")
_Q9 = Decimal("0.000000001")


def ewma_daily_grid(events: DataFrame) -> DataFrame:
    """Shared stream-input projection: the batch plan's own daily-grid
    units — (event_type, day_epoch = days since 1970-01-01 of
    date_trunc('day', ts), cents = value cast decimal(18,2) x 100). Both
    the day rule and the cent quantization are Spark expressions, so the
    twins cannot fork on them."""
    return events.select(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("day_epoch"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )


def ewma_weights(spark: SparkSession) -> list[float]:
    """Per-age weights frozen through the batch plan's own pow expression
    (one bounded calibration action, 13 rows): weights[age-1] =
    pow(decay, age-1) exactly as the batch query computes it."""
    rows = (
        spark.range(1, _EWMA_LOOKBACK + 1)
        .select("id", F.pow(F.lit(_EWMA_DECAY), F.col("id") - 1).alias("w"))
        .orderBy("id")
        .collect()
    )
    return [float(r["w"]) for r in rows]


def _round_repr(x: float, q: Decimal) -> Decimal:
    # Spark round(x, n): HALF_UP on the double's shortest decimal repr
    return Decimal(repr(x)).quantize(q, ROUND_HALF_UP)


def _ewma_rows(
    event_type: str, days: list[int], cents: list[int], weights: list[float]
) -> list[tuple]:
    wtot9 = [_round_repr(w, _Q9) for w in weights]
    by_day = dict(zip(days, cents))
    out = []
    for d in sorted(by_day):
        wsum = Decimal(0)
        wtot = Decimal(0)
        n_prev = 0
        for d2 in range(d - _EWMA_LOOKBACK, d):
            c2 = by_day.get(d2)
            if c2 is None:
                continue
            age = d - d2
            tv2 = float(Decimal(c2) / 100)
            wsum += _round_repr(weights[age - 1] * tv2, _Q4)
            wtot += wtot9[age - 1]
            n_prev += 1
        if n_prev == 0:
            continue
        tv = float(Decimal(by_day[d]) / 100)
        ewma = float(wsum) / float(wtot)
        # zero-forecast contract shared with the batch plan (which cannot
        # round an infinite double): pct_dev NULL, anomaly iff actual != 0
        if ewma != 0.0:
            dev = (tv - ewma) / ewma
            pct = float(_round_repr(dev, _Q6))
            anom = int(abs(dev) > _EWMA_THRESHOLD)
        else:
            pct = None
            anom = int(tv != 0.0)
        out.append(
            (
                event_type,
                date(1970, 1, 1) + timedelta(days=d),
                tv,
                n_prev,
                float(_round_repr(ewma, _Q6)),
                pct,
                anom,
            )
        )
    return out


def ewma_anomaly_stream(events: DataFrame, weights: list[float]) -> DataFrame:
    """(event_type, day_epoch, cents) stream -> per-micro-batch re-emission
    of the type's full daily EWMA anomaly frame. Build the input with
    ``ewma_daily_grid`` and the weights with ``ewma_weights`` — both ride
    the batch plan's own expressions. Day totals accumulate as exact
    integer cents in keyed state (order-insensitive under any chopping);
    the EWMA recompute per emission touches only the days-sized state."""

    def update_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        days, cents = state.get if state.exists else ([], [])
        acc = dict(zip(list(days), list(cents)))
        seen = False
        for pdf in pdfs:
            for d, c in zip(pdf["day_epoch"].values, pdf["cents"].values):
                acc[int(d)] = acc.get(int(d), 0) + int(c)
                seen = True
        if not seen and not state.exists:
            return
        ds = sorted(acc)
        state.update((ds, [acc[d] for d in ds]))
        rows = _ewma_rows(event_type, ds, [acc[d] for d in ds], weights)
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "event_type",
                    "day",
                    "total_value",
                    "n_prev",
                    "ewma_prev",
                    "pct_dev",
                    "is_anomaly",
                ],
            )

    return events.groupBy("event_type").applyInPandasWithState(
        update_fn,
        EWMA_OUTPUT_SCHEMA,
        EWMA_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


HW_OUTPUT_SCHEMA = (
    "event_type string, day timestamp, total_value double, idx bigint, "
    "level double, trend double, seasonal double, forecast double, "
    "resid double, pct_dev double, is_anomaly int"
)


def holt_winters_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``events_holt_winters`` plan: the SAME
    keyed day-grid state as ``ewma_anomaly_stream`` (exact integer cents
    per (type, day) — order-insensitive under any chopping), re-running
    the batch plan's OWN recurrence kernel (``plans/temporal.py::
    _hw_kernel`` — level/trend/seasonal cannot fork between the twins)
    over the accumulated grid after every micro-batch and re-emitting the
    type's full anomaly frame. Build the input with ``ewma_daily_grid``.

    State: 2 bigints per (type, day), bounded by the time domain;
    production prunes closed days behind watermark-lookback exactly like
    the EWMA twin."""
    from cupertino_nvr_spark.plans.temporal import _hw_kernel

    def update_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        days, cents = state.get if state.exists else ([], [])
        acc = dict(zip(list(days), list(cents)))
        seen = False
        for pdf in pdfs:
            for d, c in zip(pdf["day_epoch"].values, pdf["cents"].values):
                acc[int(d)] = acc.get(int(d), 0) + int(c)
                seen = True
        if not seen and not state.exists:
            return
        ds = sorted(acc)
        state.update((ds, [acc[d] for d in ds]))
        grid = pd.DataFrame(
            {
                "event_type": event_type,
                "day": pd.to_datetime(ds, unit="D"),
                "cents": [acc[d] for d in ds],
            }
        )
        out = _hw_kernel(grid)
        if len(out):
            yield out

    return events.groupBy("event_type").applyInPandasWithState(
        update_fn,
        HW_OUTPUT_SCHEMA,
        EWMA_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


CUSUM_OUTPUT_SCHEMA = (
    "event_type string, day timestamp, total_value double, idx bigint, "
    "cusum_pos double, cusum_neg double, is_changepoint int, "
    "direction string"
)


def cusum_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``events_cusum_changepoints`` plan:
    the SAME keyed day-grid state as the EWMA/Holt-Winters twins (exact
    integer cents per (type, day) — order-insensitive under any
    chopping), re-running the batch plan's OWN recurrence kernel
    (``plans/temporal.py::_cusum_kernel``) over the accumulated grid
    after every micro-batch and re-emitting the type's full changepoint
    frame. Build the input with ``ewma_daily_grid``. Note the phase-I
    reference moments recompute over the grid as it grows (the batch
    plan's full-series semantics) — a production monitor would freeze
    them from a calibration window; the twin pins the BATCH contract."""
    from cupertino_nvr_spark.plans.temporal import _cusum_kernel

    def update_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        days, cents = state.get if state.exists else ([], [])
        acc = dict(zip(list(days), list(cents)))
        seen = False
        for pdf in pdfs:
            for d, c in zip(pdf["day_epoch"].values, pdf["cents"].values):
                acc[int(d)] = acc.get(int(d), 0) + int(c)
                seen = True
        if not seen and not state.exists:
            return
        ds = sorted(acc)
        state.update((ds, [acc[d] for d in ds]))
        grid = pd.DataFrame(
            {
                "event_type": event_type,
                "day": pd.to_datetime(ds, unit="D"),
                "cents": [acc[d] for d in ds],
            }
        )
        out = _cusum_kernel(grid)
        if len(out):
            yield out

    return events.groupBy("event_type").applyInPandasWithState(
        update_fn,
        CUSUM_OUTPUT_SCHEMA,
        EWMA_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


__all__ = [
    "cusum_stream",
    "ewma_anomaly_stream",
    "ewma_daily_grid",
    "ewma_weights",
    "holt_winters_stream",
    "CUSUM_OUTPUT_SCHEMA",
    "EWMA_OUTPUT_SCHEMA",
    "HW_OUTPUT_SCHEMA",
]
