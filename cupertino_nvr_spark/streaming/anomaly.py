"""Stateful streaming anomaly scoring: trailing-window z-score per key
(the streaming form of the batch ``events_anomaly_zscore`` query,
``plans/temporal.py``).

Each key's state is the ring buffer of its last ``window`` values — the
exact frame the batch query's ``ROWS BETWEEN 20 PRECEDING AND 1
PRECEDING`` window sees — so an event is scored against strictly-earlier
values only, then pushed into the buffer. applyInPandasWithState because
no built-in streaming aggregate exposes a per-event trailing frame:
windowed aggs emit per-window rows, not per-event scores.

Scale posture: state is O(live keys) x ``window`` doubles, sharded by the
groupBy key; scoring is vectorized per batch (cumulative sums over the
batch extended with the carried buffer), no per-row Python loop.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, event_id bigint, ts timestamp, value double, "
    "n_prev int, mean_w double, z double, is_anomaly boolean"
)
STATE_SCHEMA = "buf array<double>"


def anomaly_zscore_stream(
    events: DataFrame,
    window: int = 20,
    min_prev: int = 8,
    threshold: float = 3.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Score every event against its key's trailing ``window`` values and
    flag |z| >= ``threshold``; events with fewer than ``min_prev`` prior
    values emit z = NULL (still updating the buffer). Emits one row per
    input event — an enrichment, not an aggregate — so downstream can
    route anomalies to an alert sink and the rest to storage.
    """

    def update_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        (buf,) = state.get if state.exists else ([],)
        buf = list(buf)
        # one group arrives as MULTIPLE Arrow chunks in shuffle order —
        # concat and sort ONCE, or a >chunk-size micro-batch is scored out
        # of (ts, order) order and the carried buffer is permanently wrong.
        # Null values are dropped entirely: the batch query's COUNT/SUM
        # skip them, and to_numpy(float64) would turn them into NaN, which
        # poisons the cumulative sums AND the persisted buffer forever.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            pdf = pdf[pdf[value_col].notna()]
            pdf = pdf.sort_values([ts_col, order_col], kind="mergesort").reset_index(
                drop=True
            )
            vals = pdf[value_col].to_numpy(dtype=np.float64)
            # seq = carried buffer + this batch; prefix sums give each
            # event its trailing-window stats in O(batch) vectorized work
            seq = np.concatenate([np.asarray(buf, dtype=np.float64), vals])
            c1 = np.concatenate([[0.0], np.cumsum(seq)])
            c2 = np.concatenate([[0.0], np.cumsum(seq * seq)])
            n0 = len(buf)
            idx = np.arange(n0, n0 + len(vals))
            lo = np.maximum(idx - window, 0)
            n_prev = (idx - lo).astype(np.int64)
            s1 = c1[idx] - c1[lo]
            s2 = c2[idx] - c2[lo]
            with np.errstate(invalid="ignore", divide="ignore"):
                mean = s1 / n_prev
                var = (s2 - s1 * s1 / n_prev) / (n_prev - 1)
                z = (vals - mean) / np.sqrt(var)
            ok = n_prev >= min_prev
            out = pd.DataFrame(
                {
                    "user_id": key[0],
                    "event_id": pdf[order_col].values,
                    "ts": pdf[ts_col].values,
                    "value": vals,
                    "n_prev": n_prev,
                    "mean_w": np.where(ok, mean, np.nan),
                    "z": np.where(ok, z, np.nan),
                }
            )
            out["is_anomaly"] = ok & np.isfinite(z) & (np.abs(z) >= threshold)
            out["mean_w"] = out["mean_w"].where(ok)
            out["z"] = out["z"].where(ok & np.isfinite(z))
            yield out
            # plain Python floats: the state serializer can't pickle
            # numpy scalar types
            buf = [float(x) for x in seq[-window:]]
        state.update((buf,))

    return events.groupBy(key_col).applyInPandasWithState(
        update_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


__all__ = ["anomaly_zscore_stream", "OUTPUT_SCHEMA", "STATE_SCHEMA"]
