"""Streaming CDC apply: the upsert/tombstone change-log consumer
(SURVEY §2.9 T5/T8 composed) — the streaming twin of the batch
``events_cdc_apply`` plan.

A change log keyed by ``user_id`` arrives as a stream ('error' rows are
tombstones, everything else an upsert). Keyed state inside
``applyInPandasWithState`` maintains, per key: op/tombstone counts and
the payload of the newest op so far, ordered by (ts, event_id) — the
same delete-wins total order the batch plan applies in one window pass.
Each micro-batch emits the updated state row for every touched key
(``deleted`` marks keys whose newest op is a tombstone, so a downstream
sink — e.g. ``RetainedLatestStore`` — can drop them), which makes the
stream's retained view converge to EXACTLY the batch result regardless
of how the log is chopped into batches (pinned in
``tests/test_streaming.py``).

Out-of-order delivery is safe: counters are order-independent, and the
payload only overwrites on a strictly newer (ts, event_id), so a
late-arriving old op can never regress the state.

State is O(distinct keys ever seen) by default — tombstoned keys keep
their counter/payload row so a late out-of-order upsert can never
resurrect with reset counters. On a long-running change log where keys
are born and deleted forever, pass ``drop_tombstoned=True`` to
``state.remove()`` a key once its newest op is a tombstone, making
state O(live keys + keys tombstoned this batch) at the documented
cost: an upsert arriving AFTER the tombstone was dropped (i.e. more
out-of-order than one batch) restarts that key's counters from zero.
Sharded by the groupBy key across executors either way — the same
posture as ``ttl_latest_per_key``.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CDC_OUTPUT_SCHEMA = (
    "user_id bigint, n_ops bigint, n_deletes bigint, "
    "last_value double, last_ts timestamp, deleted boolean"
)
CDC_STATE_SCHEMA = (
    "n_ops bigint, n_deletes bigint, last_value double, "
    "last_ts_micros bigint, last_event_id bigint, deleted boolean"
)

TOMBSTONE_TYPE = "error"


def cdc_apply_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    drop_tombstoned: bool = False,
) -> DataFrame:
    """Apply a keyed upsert/tombstone change-log stream; emits the
    current per-key state on every batch that touches the key.

    ``drop_tombstoned=True`` removes a key's state once its newest op is
    a tombstone (after emitting the final ``deleted=True`` row), bounding
    state to live keys on a long-running log — see the module docstring
    for the counter-resurrection tradeoff."""

    def update_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.exists:
            n_ops, n_deletes, last_value, last_ts, last_seq, deleted = state.get
        else:
            n_ops, n_deletes, last_value, last_ts, last_seq, deleted = (
                0, 0, None, None, None, False,
            )
        touched = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            touched = True
            n_ops += len(pdf)
            is_del = pdf["event_type"].values == TOMBSTONE_TYPE
            n_deletes += int(is_del.sum())
            ts_micros = (
                pdf[ts_col].values.astype("datetime64[us]").astype("int64")
            )
            seqs = pdf[seq_col].values.astype("int64")
            # newest op in this chunk under the (ts, seq) total order
            idx = max(range(len(pdf)), key=lambda i: (ts_micros[i], seqs[i]))
            if last_ts is None or (ts_micros[idx], seqs[idx]) > (last_ts, last_seq):
                last_ts = int(ts_micros[idx])
                last_seq = int(seqs[idx])
                deleted = bool(is_del[idx])
                last_value = (
                    None if deleted else float(pdf["value"].values[idx])
                )
        if not touched:
            return
        if drop_tombstoned and deleted:
            if state.exists:
                state.remove()
        else:
            state.update(
                (n_ops, n_deletes, last_value, last_ts, last_seq, deleted)
            )
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_ops": n_ops,
                    "n_deletes": n_deletes,
                    "last_value": last_value,
                    "last_ts": pd.Timestamp(last_ts, unit="us"),
                    "deleted": deleted,
                }
            ]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update_fn,
        CDC_OUTPUT_SCHEMA,
        CDC_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


__all__ = ["cdc_apply_stream", "CDC_OUTPUT_SCHEMA", "CDC_STATE_SCHEMA"]
