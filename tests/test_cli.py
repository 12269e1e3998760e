"""Stream-plan CLI parity (reference ``cli.py:101-145``). Pure functions —
no Spark session needed."""

from __future__ import annotations

import json

import pytest

from cupertino_nvr_spark.cli import (
    build_engine_config,
    build_stream_plan,
    compute_stream_indices,
    main,
)
from cupertino_nvr_spark.functions.validation import CommandValidationError


def test_index_precedence_matches_reference():
    # 1. explicit list wins over everything, order preserved (cli.py:115-117)
    assert compute_stream_indices(n=2, start=7, end=9, streams="1,3,6") == [1, 3, 6]
    assert compute_stream_indices(streams=" 4 , 2 ") == [4, 2]
    # 2. start+end inclusive (cli.py:118-120)
    assert compute_stream_indices(start=1, end=4) == [1, 2, 3, 4]
    # 3. start alone takes n from start (cli.py:121-123)
    assert compute_stream_indices(n=3, start=5) == [5, 6, 7]
    # 4. default: first n from 0 (cli.py:124-126)
    assert compute_stream_indices(n=3) == [0, 1, 2]
    assert compute_stream_indices() == [0, 1, 2, 3, 4, 5]


def test_plan_uris_and_mapping(monkeypatch):
    plan = build_stream_plan(streams="1,3", stream_server="rtsp://go2rtc:8554/live")
    assert plan.stream_uris == (
        "rtsp://go2rtc:8554/live/1",
        "rtsp://go2rtc:8554/live/3",
    )
    assert plan.source_id_mapping == (1, 3)  # positional -> actual (cli.py:136)

    # $STREAM_SERVER fallback (cli.py:112-113)
    monkeypatch.setenv("STREAM_SERVER", "rtsp://envhost:8554/live")
    assert build_stream_plan(n=1).stream_uris == ("rtsp://envhost:8554/live/0",)
    monkeypatch.delenv("STREAM_SERVER")
    assert build_stream_plan(n=1).stream_uris == ("rtsp://localhost:8554/live/0",)


def test_config_built_and_validated():
    plan = build_stream_plan(n=2, stream_server="rtsp://s:8554/live")
    cfg = build_engine_config(plan, model="yolov8x-640", max_fps=0.2)
    assert cfg.streams == plan.stream_uris
    assert cfg.max_fps == 0.2  # decimal fps (1 frame / 5 s) accepted, cli.py:62
    with pytest.raises(CommandValidationError):
        build_engine_config(plan, confidence=1.5)
    with pytest.raises(CommandValidationError):
        build_engine_config(plan, max_fps=0.0)


def test_plan_subcommand_prints_json(capsys):
    assert main(["plan", "--streams", "2,5", "--stream-server", "rtsp://x:1/l"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["plan"]["stream_indices"] == [2, 5]
    assert out["config"]["streams"] == ["rtsp://x:1/l/2", "rtsp://x:1/l/5"]


def test_list_queries_covers_registry(capsys):
    from cupertino_nvr_spark.cli import main
    from cupertino_nvr_spark.plans import REGISTRY

    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    lines = [l for l in out.strip().splitlines() if l]
    assert len(lines) == len(REGISTRY)
    assert any(l.startswith("asof_ttl_overlay:") for l in lines)
    assert any("[bench-only]" in l for l in lines)


def test_query_subcommand_runs_and_explains(spark, capsys):
    from cupertino_nvr_spark.cli import main

    assert main(["query", "pricing_summary", "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "l_returnflag" in out and "sum_qty" in out

    assert main(["query", "pricing_summary", "--sf-dir", "/root/testdata/sf0.001", "--explain"]) == 0
    out = capsys.readouterr().out
    assert "AdaptiveSparkPlan" in out or "HashAggregate" in out


def test_query_subcommand_unknown_name():
    import pytest as _pytest

    from cupertino_nvr_spark.cli import main

    with _pytest.raises(SystemExit):
        main(["query", "no_such_query"])
