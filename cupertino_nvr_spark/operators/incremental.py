"""Incremental view maintenance for additive aggregates.

A 100 TB materialized aggregate (per-customer totals, per-day metrics)
cannot be recomputed from scratch every time a micro-batch of facts
lands. For aggregates valued in a commutative monoid — SUM, COUNT,
MIN, MAX — the delta batch's own aggregate MERGES into the current
materialization with one keyed full-outer join: cost is O(|delta| +
|affected keys|), never O(|history|).

AVG and other ratios are maintained as (sum, count) pairs and derived
at read time. Non-decomposable aggregates — distinct counts, quantiles
— are maintained as MERGEABLE SKETCH columns: Apache DataSketches HLL
(``hll_sketch_agg`` / ``hll_union``) for cardinality and KLL
(``kll_sketch_agg_double`` / ``kll_sketch_merge_double``) for
quantiles. An HLL union is register-wise max, so a merged sketch is
BIT-IDENTICAL to the sketch of the concatenated facts — the
incremental path loses nothing vs a full recompute, the property the
exact versions of these aggregates fundamentally lack at O(|delta|)
cost. Estimates materialize only at read time (``finalize``); the
stored view keeps the binary sketches so future merges stay exact.
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
    approx_distincts: Sequence[str] = (),
    approx_quantiles: Sequence[str] = (),
) -> DataFrame:
    """Build the materialization (also used to aggregate each delta):
    per-key SUMs (``sum_<col>``), row COUNT (``n_rows``), MINs/MAXs
    (``min_<col>`` / ``max_<col>``), HLL cardinality sketches
    (``hll_<col>``, binary), and KLL quantile sketches (``kll_<col>``,
    binary, double-valued input). Sums use DECIMAL(28,6) so repeated
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
    for c in approx_distincts:
        aggs.append(F.hll_sketch_agg(c).alias(f"hll_{c}"))
    for c in approx_quantiles:
        aggs.append(
            F.kll_sketch_agg_double(F.col(c).cast("double")).alias(f"kll_{c}")
        )
    return facts.groupBy(*keys).agg(*aggs)


def merge_additive(
    current: DataFrame,
    delta_agg: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: bool = True,
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
    approx_distincts: Sequence[str] = (),
    approx_quantiles: Sequence[str] = (),
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
    # sketch columns: the union functions require both sides non-null, so
    # a key present on only one side passes its sketch through untouched
    for c in approx_distincts:
        a, b = _pair(f"hll_{c}")
        out_cols.append(
            F.when(a.isNull(), b)
            .when(b.isNull(), a)
            .otherwise(F.hll_union(a, b))
            .alias(f"hll_{c}")
        )
    for c in approx_quantiles:
        a, b = _pair(f"kll_{c}")
        out_cols.append(
            F.when(a.isNull(), b)
            .when(b.isNull(), a)
            .otherwise(F.kll_sketch_merge_double(a, b))
            .alias(f"kll_{c}")
        )
    return joined.select(*out_cols)


def finalize(
    view: DataFrame,
    approx_distincts: Sequence[str] = (),
    approx_quantiles: Sequence[str] = (),
    quantiles: Sequence[float] = (0.5, 0.9),
) -> DataFrame:
    """Read-time estimates over the stored sketches: ``approx_<col>``
    from each HLL column and ``<col>_p<pct>`` per requested quantile from
    each KLL column. The binary sketch columns are dropped — this is the
    serving projection, not the stored view (store the sketches so the
    NEXT merge stays exact)."""
    out = view
    drop: list[str] = []
    for c in approx_distincts:
        out = out.withColumn(f"approx_{c}", F.hll_sketch_estimate(f"hll_{c}"))
        drop.append(f"hll_{c}")
    for c in approx_quantiles:
        for q in quantiles:
            pct = int(round(q * 100))
            out = out.withColumn(
                f"{c}_p{pct}",
                F.kll_sketch_get_quantile_double(F.col(f"kll_{c}"), F.lit(q)),
            )
        drop.append(f"kll_{c}")
    return out.drop(*drop)
