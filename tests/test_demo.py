"""Smoke the end-to-end demo: live rate stream through inference, wire
codec, windowed metrics, under the control plane with a mid-run reconfig."""

from __future__ import annotations

import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from nvr_pipeline_demo import run_demo

pytestmark = pytest.mark.slow  # rehearsal suite: excluded from the default (gate) run, see pytest.ini


def test_demo_pipeline(spark):
    out = run_demo(duration_s=6.0, n_sources=2)
    assert out["metrics_rows"] > 0
    assert set(out["sources_seen"]) <= {0, 1}
    assert ("change_model", "completed") in out["acks"]
    assert out["model_id"] == "synthetic-detector-v2"
    assert out["progress_batches"] > 0
    assert out["statuses"][-1] == "stopped"


def test_table_maintenance_demo(spark, tmp_path):
    from table_maintenance_demo import run_maintenance_demo

    out = run_maintenance_demo(work_dir=str(tmp_path))
    assert out["cdc_surviving_keys"] > 0
    assert out["incremental_mismatches"] == 0
    # event-type cardinality per user is <=5, far under HLL error onset
    assert out["sketch_worst_abs_err"] == 0.0
    assert out["files_after"] < out["files_before"]
    assert out["compaction_rows_match"]
