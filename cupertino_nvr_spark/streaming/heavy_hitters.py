"""Stateful streaming heavy hitters: a Misra-Gries frequency summary per
key with HARD-BOUNDED state, the streaming companion of the exact batch
``events_heavy_hitters`` query (``plans/temporal.py``).

Why a sketch: the exact per-(key, item) count table grows with the item
domain (users), which is unbounded in a stream. Misra-Gries keeps at most
``capacity`` counters per key and guarantees (classic bound): every item
with true frequency > n/capacity is retained, and each retained estimate
is within [true - n/capacity, true]. With ``capacity`` >= the number of
distinct items actually seen, no decrement ever fires and the counts are
EXACT — which is what the stream-vs-batch equality test pins.

Batch-merge form: within a micro-batch the item counts are computed
vectorized (``value_counts``), merged into the carried summary, then ONE
Misra-Gries reduction applies — subtract the (capacity+1)-th largest
count from everything and drop the non-positives. This is the mergeable-
summaries result (Agarwal et al., PODS'12): merging count maps and
reducing once preserves the per-item error bound, and it replaces the
textbook per-element decrement loop with O(batch + capacity) work, no
Python loop over rows.

Scale posture: state is O(live keys x capacity) longs; each micro-batch
does one vectorized count per key group plus a capacity-sized dict merge.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "items array<bigint>, counts array<bigint>, total bigint"

_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def mg_merge(
    summary: dict[int, int], batch_counts: dict[int, int], capacity: int
) -> dict[int, int]:
    """Merge a batch's exact count map into a Misra-Gries summary and
    apply ONE reduction (subtract the (capacity+1)-th largest count, drop
    non-positives). Pure function so the classical invariants — at most
    ``capacity`` survivors, estimates never exceed true counts, and any
    item with true count > n/capacity retained — are property-testable
    without a streaming harness (tests/test_properties.py)."""
    merged = dict(summary)
    for item, c in batch_counts.items():
        merged[int(item)] = merged.get(int(item), 0) + int(c)
    if len(merged) > capacity:
        cut = sorted(merged.values(), reverse=True)[capacity]
        merged = {k: v - cut for k, v in merged.items() if v - cut > 0}
    return merged


def heavy_hitters_stream(
    events: DataFrame,
    capacity: int = 8,
    key_col: str = "event_type",
    item_col: str = "user_id",
) -> DataFrame:
    """Track the heavy ``item_col`` values per ``key_col`` under a
    ``capacity``-counter Misra-Gries summary. After every micro-batch,
    emits the key's full current summary (one row per retained item,
    ordered by descending estimate then item id) stamped with ``n_total``
    — the monotone number of items absorbed — so downstream can keep the
    freshest summary per key by max ``n_total``.

    Output columns are named after the actual ``key_col`` plus
    (item, est_count, n_total). The key must be a string column and the
    item an integral column (the summary keys are 64-bit counters) —
    validated here so a wrong column fails on the driver, not inside a
    micro-batch.
    """
    types = {f.name: f.dataType.simpleString() for f in events.schema.fields}
    if types.get(key_col) != "string":
        raise TypeError(
            f"key_col {key_col!r} must be string, got {types.get(key_col)!r}"
        )
    if types.get(item_col) not in _INTEGRAL:
        raise TypeError(
            f"item_col {item_col!r} must be integral, got {types.get(item_col)!r}"
        )
    output_schema = f"{key_col} string, item bigint, est_count bigint, n_total bigint"

    def update_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        items, counts, total = (
            state.get if state.exists else ([], [], 0)
        )
        summary = dict(zip(items, counts))
        # chunk order is irrelevant here (counting commutes), but all
        # chunks of the group must be absorbed before the one reduction
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        vals = pdf[item_col].dropna().astype("int64")
        summary = mg_merge(
            summary, {int(k): int(v) for k, v in vals.value_counts().items()}, capacity
        )
        total = int(total) + int(len(vals))
        ordered = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
        state.update(
            ([k for k, _ in ordered], [v for _, v in ordered], total)
        )
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(ordered),
                "item": [k for k, _ in ordered],
                "est_count": [v for _, v in ordered],
                "n_total": [total] * len(ordered),
            }
        )

    return (
        events.select(key_col, item_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update_fn,
            outputStructType=output_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
