"""Streaming sequence-packing assignment — the streaming twin of the
batch ``docs_sequence_packing`` running-sum window.

A pretraining corpus is usually append-only: new crawl snapshots arrive
and must be packed into fixed-length training sequences WITHOUT
re-packing everything already assigned (downstream shards are immutable
once written). Keyed state per shard holds a single token counter; each
arriving document takes the current offset and advances it, so the
assignment a doc receives is final the moment it is emitted and the
concatenation of all emissions equals the batch window's packing plan
for the same arrival order — pinned in ``tests/test_streaming.py`` under
id-ordered replay with arbitrary chopping.

Ordering note (same contract as the batch form): packing is
order-sensitive by definition — the batch plan orders by doc_id within
a shard, so the pinned equality holds when the stream replays in id
order (each micro-batch's docs sorted, batches non-interleaved). Under
out-of-order arrival the stream still packs densely (every token lands
exactly once, no gaps); it just packs in arrival order, which is what an
append-only corpus means by "order" anyway.

State: ONE bigint per shard — the smallest state any streaming operator
here carries; at 100 TB shards hash across executors and the counter
never grows.

Reference analog: none (north-star §2.11 family; batch twin
``docs_sequence_packing``).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PACKING_OUTPUT_SCHEMA = (
    "doc_id bigint, shard bigint, n_tok bigint, "
    "seq_id bigint, seq_offset bigint, n_seqs_spanned bigint"
)
PACKING_STATE_SCHEMA = "tok_so_far bigint"


def packing_stream(docs: DataFrame, seq_len: int = 512) -> DataFrame:
    """(doc_id, shard, n_tok) stream -> packing-assignment stream.

    Build the input with the same (shard, token-count) projection the
    batch plan uses; each emitted row matches the batch window row
    bit-for-bit under id-ordered replay.
    """

    def update_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (tok_so_far,) = state.get if state.exists else (0,)
        (shard,) = key
        rows: list[tuple[int, int, int, int, int, int]] = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ordered = pdf.sort_values("doc_id")
            for doc_id, n_tok in zip(
                ordered["doc_id"].values, ordered["n_tok"].values
            ):
                n_tok = int(n_tok)
                seq_id = tok_so_far // seq_len
                seq_offset = tok_so_far % seq_len
                spanned = (tok_so_far + n_tok - 1) // seq_len - seq_id + 1
                rows.append(
                    (int(doc_id), int(shard), n_tok, seq_id, seq_offset, spanned)
                )
                tok_so_far += n_tok
        if not rows and not state.exists:
            return
        state.update((tok_so_far,))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "shard",
                    "n_tok",
                    "seq_id",
                    "seq_offset",
                    "n_seqs_spanned",
                ],
            )

    return docs.groupBy("shard").applyInPandasWithState(
        update_fn,
        PACKING_OUTPUT_SCHEMA,
        PACKING_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


__all__ = ["packing_stream", "PACKING_OUTPUT_SCHEMA"]
