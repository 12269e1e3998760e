"""Join operators the reference implies but Spark lacks as single calls.

J1 — the as-of / TTL overlay join: for each probe row (a video frame), the
*latest* event for its key at-or-before the probe time, but only if younger
than a TTL; else NULL (frame rendered without overlay). Reference semantics:
``cupertino_nvr/wall/wall.py:122-127`` (lookup),
``wall/detection_cache.py:48-69`` (latest-per-key + lazy TTL expiry),
``wall/config.py:50-51`` (default TTL 1.0 s).

Scale design: the naive formulation (theta-join on key + time range, then
row_number per probe) shuffles twice and explodes candidate pairs. The
implementation here is the union-sweep as-of join: tag both sides, union,
ONE shuffle on the key, sort by time within the key, and a running
``last(event, ignorenulls=True)`` window picks each probe's predecessor in
a single linear pass — no pair blow-up, state bounded per key. This is the
same algorithm pandas.merge_asof / QuestDB / kdb use, expressed with Spark
windows, and it survives 100 TB because partitioning is purely by key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    events: DataFrame,
    key: str,
    probe_ts: str = "probe_ts",
    event_ts: str = "ts",
    ttl_seconds: float | None = None,
    tiebreak: str | None = None,
    payload_prefix: str = "ev_",
) -> DataFrame:
    """Left as-of join: latest event per key at-or-before each probe time.

    Returns all probe columns plus the matched event's columns (renamed with
    ``payload_prefix``), NULL when no match within ``ttl_seconds``. An event
    exactly at the probe timestamp matches (the reference cache returns an
    entry written at read time).
    """
    ev_cols = [c for c in events.columns if c != key]
    probe_cols = [c for c in probes.columns]

    ev_struct = F.struct(*[F.col(c) for c in ev_cols])
    tagged_events = events.select(
        F.col(key).alias(key),
        F.col(event_ts).alias("_asof_ts"),
        F.lit(0).alias("_is_probe"),
        ev_struct.alias("_ev"),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(f"_p_{c}") for c in probe_cols],
    )
    tagged_probes = probes.select(
        F.col(key).alias(key),
        F.col(probe_ts).alias("_asof_ts"),
        F.lit(1).alias("_is_probe"),
        F.lit(None).cast(tagged_events.schema["_ev"].dataType).alias("_ev"),
        *[F.col(c).alias(f"_p_{c}") for c in probe_cols],
    )

    order_cols: list[Column] = [F.col("_asof_ts"), F.col("_is_probe")]
    if tiebreak is not None:
        # deterministic winner among same-timestamp events
        order_cols.append(F.col("_ev")[tiebreak].asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    swept = tagged_events.unionByName(tagged_probes).withColumn(
        "_last_ev", F.last("_ev", ignorenulls=True).over(w)
    )

    matched = swept.filter(F.col("_is_probe") == 1)
    if ttl_seconds is not None:
        # lazy-expiry semantics: a predecessor older than TTL is as-if absent
        fresh = F.col("_last_ev")[event_ts] >= F.col("_asof_ts") - F.expr(
            f"INTERVAL {ttl_seconds} SECONDS"
        )
        matched = matched.withColumn(
            "_last_ev", F.when(fresh, F.col("_last_ev"))
        )

    out = matched.select(
        F.col(key),
        *[F.col(f"_p_{c}").alias(c) for c in probe_cols if c != key],
        *[F.col("_last_ev")[c].alias(f"{payload_prefix}{c}") for c in ev_cols],
    )
    return out


def latest_per_key(df: DataFrame, key: str, ts: str, tiebreak: str | None = None) -> DataFrame:
    """A4 last-per-key: one row per key, the row with max timestamp.

    Reference ``wall/detection_cache.py:38-46`` (update overwrites, keeping
    the latest entry per source). ``max_by`` aggregates with a map-side
    partial — one shuffle, no window sort.
    """
    ordering = F.struct(
        *([F.col(ts)] + ([F.col(tiebreak)] if tiebreak else []))
    )
    payload = F.struct(*[F.col(c) for c in df.columns])
    out = df.groupBy(key).agg(F.max_by(payload, ordering).alias("_row"))
    return out.select([F.col("_row")[c].alias(c) for c in df.columns])
