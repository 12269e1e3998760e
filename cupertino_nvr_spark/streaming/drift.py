"""Streaming PSI drift monitor — the streaming twin of the batch
``events_psi_drift`` plan.

Drift monitoring is the canonically-streaming analytics job: the
reference profile (decile edges + bucket masses) is FROZEN at
deployment, and the live stream updates per-bucket counters forever,
re-emitting the PSI after every micro-batch. ``psi_reference`` builds
that frozen profile from a batch DataFrame of reference-period events
through the SAME plan fragments the batch query uses
(``plans/temporal.py::psi_grid_cum`` / ``psi_edges`` — the grid
rounding, the period split, and the integer threshold-crossing edge
rule cannot fork between the twins); ``psi_drift_stream`` then runs the
live side with keyed state of exactly 10 bigint counters per
event_type.

Pinned in ``tests/test_streaming.py``: after replaying the
current-period events under arbitrary chopping, the final emission per
(event_type, bucket) equals the batch ``events_psi_drift`` row — counts
exactly, the float columns to the 6-decimal precision both sides round
to.

State: 10 bigints per event_type — bounded by the type vocabulary, not
the stream. The reference profile rides the closure (a broadcast-sized
dict: #types x (9 edges + 10 masses)); at 100 TB it is the same frozen
artifact a production monitor pins at deploy time.

Reference analog: none (north-star §2.11 family; batch twin
``events_psi_drift``).
"""

from __future__ import annotations

import math
from bisect import bisect_left
from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PSI_OUTPUT_SCHEMA = (
    "event_type string, bucket int, ref_n bigint, cur_n bigint, "
    "p_ref double, p_cur double, psi_contrib double, psi_total double"
)
PSI_STATE_SCHEMA = ", ".join(f"b{i} bigint" for i in range(10))

# reference profile: event_type -> (sorted 9 decile edges, 10 ref bucket
# counts, n_ref)
PsiReference = dict[str, tuple[list[float], list[int], int]]


def psi_reference(ev_ref: DataFrame) -> PsiReference:
    """Freeze the reference profile from a batch of reference events.

    Goes through the batch plan's own fragments (``psi_grid_cum`` /
    ``psi_edges``) and the identical ``v > edge`` bucket rule, then
    collects the bounded result (#event_types x 10 rows) — the one-time
    deployment step of a drift monitor, not a per-batch action.
    """
    from cupertino_nvr_spark.plans.temporal import psi_edges, psi_grid_cum

    # two actions (edges + bucketed masses) read the grid aggregate —
    # persist it so calibration scans the reference period once, not twice
    cum = psi_grid_cum(ev_ref).persist()
    try:
        edges = psi_edges(cum)
        bucketed = (
            cum.join(F.broadcast(edges), "event_type")
            .groupBy("event_type", "v", "ref_c")
            .agg(F.count(F.when(F.col("v") > F.col("edge"), 1)).alias("bucket"))
            .groupBy("event_type", "bucket")
            .agg(F.sum("ref_c").cast("bigint").alias("ref_n"))
        )
        edge_rows = edges.collect()
        mass_rows = bucketed.collect()
    finally:
        cum.unpersist()
    out: PsiReference = {}
    for t in {r["event_type"] for r in edge_rows}:
        es = sorted(
            (r["k"], float(r["edge"])) for r in edge_rows if r["event_type"] == t
        )
        masses = [0] * 10
        for r in mass_rows:
            if r["event_type"] == t:
                masses[int(r["bucket"])] = int(r["ref_n"])
        out[t] = ([e for _, e in es], masses, sum(masses))
    return out


def _psi_rows(
    event_type: str,
    edges: list[float],
    ref_masses: list[int],
    n_ref: int,
    counts: list[int],
) -> list[tuple]:
    n_cur = sum(counts)
    rows = []
    pieces = []
    for b in range(10):
        p_ref = (ref_masses[b] + 0.5) / (n_ref + 5.0)
        p_cur = (counts[b] + 0.5) / (n_cur + 5.0)
        pieces.append((p_cur - p_ref) * math.log(p_cur / p_ref))
    total = round(sum(pieces), 6)
    for b in range(10):
        p_ref = (ref_masses[b] + 0.5) / (n_ref + 5.0)
        p_cur = (counts[b] + 0.5) / (n_cur + 5.0)
        rows.append(
            (
                event_type,
                b,
                ref_masses[b],
                counts[b],
                round(p_ref, 6),
                round(p_cur, 6),
                round(pieces[b], 6),
                total,
            )
        )
    return rows


def psi_drift_stream(events: DataFrame, reference: PsiReference) -> DataFrame:
    """(event_type, v) stream -> per-micro-batch PSI emission.

    ``v`` must be the batch plan's grid projection ``F.round(value, 1)``
    (build it Spark-side so the rounding rule is the shared expression,
    never Python's banker's rounding). Arriving values bucket by the
    frozen reference edges with the batch's strict ``v > edge`` rule
    (``bisect_left`` = count of edges strictly below), counters update
    keyed state, and every batch re-emits all 10 bucket rows with the
    refreshed PSI. Types absent from the reference are dropped — a
    production monitor alerts on those separately.
    """

    def update_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        ref = reference.get(event_type)
        if ref is None:
            return
        edges, ref_masses, n_ref = ref
        counts = list(state.get) if state.exists else [0] * 10
        seen = False
        for pdf in pdfs:
            for v in pdf["v"].values:
                counts[bisect_left(edges, float(v))] += 1
                seen = True
        if not seen and not state.exists:
            return
        state.update(tuple(counts))
        yield pd.DataFrame(
            _psi_rows(event_type, edges, ref_masses, n_ref, counts),
            columns=[
                "event_type",
                "bucket",
                "ref_n",
                "cur_n",
                "p_ref",
                "p_cur",
                "psi_contrib",
                "psi_total",
            ],
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update_fn,
        PSI_OUTPUT_SCHEMA,
        PSI_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


__all__ = ["psi_drift_stream", "psi_reference", "PSI_OUTPUT_SCHEMA"]
