"""Stateful streaming funnel: per-key ordered-step state machine (the
streaming form of the batch ``events_funnel`` query, ``plans/temporal.py``).

Each key carries one integer of state — the highest funnel stage reached —
and advances it when the next expected step type arrives strictly after the
previous advance in (ts, order_col) arrival order. This is the
`applyInPandasWithState` pattern SURVEY §4.3.1 reserves for semantics the
built-in operators can't express: the step dependency is sequential per
key, so no windowed aggregate reproduces it incrementally.

Scale posture: state is O(live keys) x one (int, long) tuple, sharded by
the groupBy key across executors; per-batch work per key is
O(#steps x batch rows for that key) via vectorized pandas masks, never a
Python row loop. Arrival order across micro-batches is source order —
the same at-most-once, in-order assumption the reference's QoS0 event
plane makes (``cupertino_nvr/processor/mqtt_sink.py:112``).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_STEPS = ("view", "click", "purchase")

OUTPUT_SCHEMA = "user_id bigint, stage int, stage_name string, stage_ts timestamp"
STATE_SCHEMA = "stage int, stage_ts_micros bigint"


def funnel_stage_stream(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Emit, per key per micro-batch that touches it, the highest funnel
    stage reached so far (0 = none, len(steps) = completed) and the event
    time of the last advance.

    ``stage >= s`` here is equivalent to the batch query's reach flags:
    stage 1 iff any 'view', stage 2 iff a 'click' strictly after the first
    qualifying 'view', stage 3 iff a 'purchase' strictly after the first
    qualifying 'click' — advancing on the FIRST qualifying occurrence is
    enough because reach flags are monotone in arrival order
    (``tests/test_streaming.py::test_funnel_stream_matches_batch`` pins the
    equivalence against ``plans.temporal.funnel_user_flags``).
    """
    n_steps = len(steps)

    def update_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        stage, stage_ts_micros = (state.get if state.exists else (0, None))
        # applyInPandasWithState delivers a group as MULTIPLE Arrow chunks
        # (split at arrow.maxRecordsPerBatch) in shuffle order — sorting
        # each chunk independently would process a >chunk-size batch out
        # of (ts, order) order and miss/wrongly grant advances. Concat the
        # whole group's batch first, sort once. Memory is bounded by the
        # key's per-micro-batch volume (inherent to ordered-sequence ops).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            pdf = batch.sort_values([ts_col, order_col], kind="mergesort").reset_index(
                drop=True
            )
            # positions strictly after the last advance within this batch;
            # state from prior batches is position -1 (everything qualifies)
            last_pos = -1
            while stage < n_steps:
                mask = (pdf[type_col].values == steps[stage]) & (
                    pd.RangeIndex(len(pdf)).values > last_pos
                )
                if not mask.any():
                    break
                pos = int(mask.argmax())
                stage += 1
                last_pos = pos
                stage_ts_micros = int(
                    pdf[ts_col].values[pos].astype("datetime64[us]").astype("int64")
                )
        state.update((stage, stage_ts_micros))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "stage": stage,
                    "stage_name": steps[stage - 1] if stage > 0 else "none",
                    "stage_ts": (
                        pd.Timestamp(stage_ts_micros, unit="us")
                        if stage_ts_micros is not None
                        else pd.NaT
                    ),
                }
            ]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


__all__ = ["funnel_stage_stream", "FUNNEL_STEPS", "OUTPUT_SCHEMA", "STATE_SCHEMA"]
