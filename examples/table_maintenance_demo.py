"""End-to-end table-maintenance demo: the lakehouse upkeep operators
composed into one run over the synthetic events table.

    python examples/table_maintenance_demo.py [sf_dir] [work_dir]

Stages (each operator is unit/oracle-verified; this script is the
wiring a table owner would schedule):

  events change log ──► CDC apply (upsert + tombstone, delete-wins)
      ──► incremental aggregate refresh (3 delta batches: exact
          SUM/COUNT/MAX monoids + a mergeable HLL distinct sketch)
      ──► Z-order layout pass (cluster on user_id x value)
      ──► small-file compaction (bin-packed rewrite)

Prints per-stage row counts, the sketch-vs-exact distinct check, file
counts before/after compaction, and verifies the incremental refresh
equals a from-scratch rebuild — the invariant that makes O(delta)
maintenance trustworthy.
"""

from __future__ import annotations

import glob
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def run_maintenance_demo(sf_dir: str = "/root/testdata/sf0.001", work_dir: str | None = None) -> dict:
    from cupertino_nvr_spark.operators.compaction import compact_parquet
    from cupertino_nvr_spark.operators.incremental import (
        aggregate_base,
        finalize,
        merge_additive,
    )
    from cupertino_nvr_spark.operators.layout import zorder_repartition
    from cupertino_nvr_spark.plans import REGISTRY
    from cupertino_nvr_spark.session import get_spark
    from cupertino_nvr_spark.sources.tables import load_table

    spark = get_spark("table-maintenance-demo")
    work = work_dir or tempfile.mkdtemp(prefix="maint_demo_")
    out: dict = {}

    # 1) CDC apply: change log -> current table state (delete-wins)
    state = REGISTRY["events_cdc_apply"].spark(spark, sf_dir)
    state_path = f"{work}/state"
    state.write.mode("overwrite").parquet(state_path)
    out["cdc_surviving_keys"] = spark.read.parquet(state_path).count()
    print(f"[1/4] CDC apply: {out['cdc_surviving_keys']} surviving keys")

    # 2) incremental refresh: 3 delta batches vs from-scratch rebuild
    ev = load_table(spark, "events", sf_dir)
    kw = dict(
        keys=["user_id"], sums=["value"], maxs=["ts"],
        approx_distincts=["event_type"],
    )
    batches = [ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i) for i in range(3)]
    view = aggregate_base(batches[0], **kw)
    for b in batches[1:]:
        view = merge_additive(view, aggregate_base(b, **kw), **kw)
    fin = finalize(view, approx_distincts=["event_type"])
    rebuilt = finalize(aggregate_base(ev, **kw), approx_distincts=["event_type"])
    mismatches = fin.exceptAll(rebuilt).count() + rebuilt.exceptAll(fin).count()
    out["incremental_mismatches"] = mismatches
    exact = ev.groupBy("user_id").agg(F.count_distinct("event_type").alias("n"))
    worst = (
        fin.join(exact, "user_id")
        .select(F.max(F.abs(F.col("approx_event_type") - F.col("n"))).alias("d"))
        .first()["d"]
    )
    out["sketch_worst_abs_err"] = float(worst)
    print(
        f"[2/4] incremental refresh: {mismatches} mismatches vs rebuild, "
        f"HLL worst abs err {worst} (cardinalities <=5: exact)"
    )

    # 3) Z-order layout pass on the maintained state's source facts
    layout_path = f"{work}/events_zorder"
    zorder_repartition(
        ev.select("event_id", "user_id", "value", "ts"),
        ["user_id", "value"],
        num_files=8,
    ).write.mode("overwrite").parquet(layout_path)
    out["layout_files"] = len(glob.glob(f"{layout_path}/*.parquet"))
    print(f"[3/4] Z-order layout: {out['layout_files']} clustered files")

    # 4) compaction: fragment then compact back
    frag_path = f"{work}/fragmented"
    spark.read.parquet(layout_path).repartition(32).write.mode(
        "overwrite"
    ).parquet(frag_path)
    compact_path = f"{work}/compacted"
    compact_parquet(spark, frag_path, compact_path, target_bytes=4 * 1024 * 1024)
    out["files_before"] = len(glob.glob(f"{frag_path}/*.parquet"))
    out["files_after"] = len(glob.glob(f"{compact_path}/*.parquet"))
    rows_match = (
        spark.read.parquet(compact_path).count()
        == spark.read.parquet(frag_path).count()
    )
    out["compaction_rows_match"] = rows_match
    print(
        f"[4/4] compaction: {out['files_before']} -> {out['files_after']} "
        f"files, rows preserved: {rows_match}"
    )
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wd = sys.argv[2] if len(sys.argv) > 2 else None
    result = run_maintenance_demo(sf, wd)
    assert result["incremental_mismatches"] == 0
    assert result["compaction_rows_match"]
    print("table maintenance demo OK:", result)
