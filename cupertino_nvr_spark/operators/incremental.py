"""Incremental view maintenance for additive aggregates.

A 100 TB materialized aggregate (per-customer totals, per-day metrics)
cannot be recomputed from scratch every time a micro-batch of facts
lands. For aggregates valued in a commutative monoid — SUM, COUNT,
MIN, MAX — the delta batch's own aggregate MERGES into the current
materialization with one keyed full-outer join: cost is O(|delta| +
|affected keys|), never O(|history|).

AVG and other ratios are maintained as (sum, count) pairs and derived
at read time; non-decomposable aggregates (exact distinct, exact
percentiles) are exactly the ones the sketch family
(``user_value_sketches``) exists for — their mergeable estimators slot
into the same shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_base(
    facts: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: bool = True,
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
) -> DataFrame:
    """Build the materialization (also used to aggregate each delta):
    per-key SUMs (``sum_<col>``), row COUNT (``n_rows``), MINs/MAXs
    (``min_<col>`` / ``max_<col>``). Sums use DECIMAL(28,6) so repeated
    merges stay exact — float sums would drift run-over-run."""
    aggs = []
    for c in sums:
        aggs.append(F.sum(F.col(c).cast("decimal(28,6)")).alias(f"sum_{c}"))
    if counts:
        aggs.append(F.count("*").alias("n_rows"))
    for c in mins:
        aggs.append(F.min(c).alias(f"min_{c}"))
    for c in maxs:
        aggs.append(F.max(c).alias(f"max_{c}"))
    return facts.groupBy(*keys).agg(*aggs)


def merge_additive(
    current: DataFrame,
    delta_agg: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: bool = True,
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
) -> DataFrame:
    """Merge a delta's aggregate into the current materialization: one
    full-outer equi-join on the keys, then the monoid combine per
    column (+, +, least, greatest — with NULL-skipping coalesce for
    keys present on only one side). New keys appear, untouched keys
    pass through, affected keys combine — the result is EXACTLY
    ``aggregate_base(history + delta)`` (pinned in tests)."""
    cur = current.alias("cur")
    dlt = delta_agg.alias("dlt")
    joined = cur.join(dlt, on=list(keys), how="full_outer")

    def _pair(name: str):
        return F.col(f"cur.{name}"), F.col(f"dlt.{name}")

    out_cols = [F.col(k) for k in keys]
    for c in sums:
        a, b = _pair(f"sum_{c}")
        out_cols.append(
            (F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))).alias(f"sum_{c}")
        )
    if counts:
        a, b = _pair("n_rows")
        out_cols.append(
            (F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))).alias("n_rows")
        )
    for c in mins:
        a, b = _pair(f"min_{c}")
        out_cols.append(F.least(F.coalesce(a, b), F.coalesce(b, a)).alias(f"min_{c}"))
    for c in maxs:
        a, b = _pair(f"max_{c}")
        out_cols.append(
            F.greatest(F.coalesce(a, b), F.coalesce(b, a)).alias(f"max_{c}")
        )
    return joined.select(*out_cols)
