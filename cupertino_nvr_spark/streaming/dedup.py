"""Streaming exact dedup: first-occurrence filter over a document stream
— the streaming twin of the batch ``docs_exact_dedup`` keeper rule.

An ingestion pipeline dedups documents AS THEY ARRIVE: the first copy of
each normalized digest passes through (it becomes the keeper), every
later copy is dropped but counted. Keyed state inside
``applyInPandasWithState`` holds one (keeper_id, n_copies) row per
digest; a micro-batch touching a digest emits the current cluster row,
so the retained view (latest row per digest) converges to EXACTLY the
batch ``exact_dedup`` result regardless of how the stream is chopped —
pinned in ``tests/test_streaming.py``.

Two deliberate semantic notes vs batch:

- The batch keeper is min(doc_id) over the WHOLE corpus; the stream
  keeper is the first id SEEN. With an id-ordered replay they agree
  (the pinned test's setup); under out-of-order arrival the stream
  keeps the min id seen so far, converging to the batch keeper once the
  true minimum has arrived — the keeper can only decrease, never flap
  upward.
- State is O(distinct digests), the irreducible memory of exact
  streaming dedup; at 100 TB it shards across executors by the digest
  groupBy key, and a production deployment bounds it with either a TTL
  (dedup horizon) or a compact digest (16-byte md5, as here — the state
  row is ~32 bytes, 10B documents ≈ 320 GB sharded cluster-wide).

Reference analog: none (the NVR has no dedup); north-star component per
SURVEY §2.11 (dedup family) — the streaming form the batch family
lacked.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_SCHEMA = "digest string, keeper_id bigint, n_copies bigint"
DEDUP_STATE_SCHEMA = "keeper_id bigint, n_copies bigint"


def normalized_digest(text: Column) -> Column:
    """Case/whitespace-normalized md5 — identical to the batch
    ``fingerprint`` rule (llm/text.py) so stream and batch cluster
    identically."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    digest_col: str = "digest",
) -> DataFrame:
    """First-occurrence dedup over a (digest, id) stream.

    Emits one cluster row per digest per micro-batch that touches it:
    (digest, keeper_id = min id seen, n_copies so far). Downstream keeps
    the latest row per digest (n_copies is strictly monotonic, so
    max-n_copies IS latest) and treats rows with ``keeper_id == id`` as
    the surviving documents.
    """

    def update_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        digest = key[0]
        keeper, n = state.get if state.exists else (None, 0)
        touched = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            touched = True
            ids = pdf[id_col].values
            n += len(ids)
            lo = int(ids.min())
            keeper = lo if keeper is None else min(keeper, lo)
        if not touched:
            return
        state.update((keeper, n))
        yield pd.DataFrame(
            [{"digest": digest, "keeper_id": keeper, "n_copies": n}]
        )

    return docs.groupBy(digest_col).applyInPandasWithState(
        update_fn,
        DEDUP_OUTPUT_SCHEMA,
        DEDUP_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


__all__ = ["dedup_stream", "normalized_digest", "DEDUP_OUTPUT_SCHEMA"]
