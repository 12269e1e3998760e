"""Validator rule table (F6/U3): the scalar form pinned to the reference's
own docstring examples (``processor/validators.py:49-180``,
``processor/config.py:99-150``), the columnar form pinned to the scalar
form on the same inputs, and the control plane rejecting bad params with
error acks instead of crashing or mutating config."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cupertino_nvr_spark.functions import validation as V
from cupertino_nvr_spark.streaming.control import ControlPlane, EngineConfig


# -- scalar form: reference docstring examples -------------------------------


def test_model_id_examples():
    assert V.validate_model_id("yolov8x-640") == "yolov8x-640"
    assert V.validate_model_id("  yolov11x-640  ") == "yolov11x-640"
    for bad in ["", "   ", 123, None]:
        with pytest.raises(V.CommandValidationError):
            V.validate_model_id(bad)


def test_fps_examples():
    assert V.validate_fps(1.0) == 1.0
    assert V.validate_fps(5) == 5.0
    assert V.validate_fps("0.5") == 0.5
    for bad in [0, -1.5, "not a number", None]:
        with pytest.raises(V.CommandValidationError):
            V.validate_fps(bad)


def test_source_id_examples():
    assert V.validate_source_id(8) == 8
    assert V.validate_source_id("10") == 10
    assert V.validate_source_id(0) == 0
    assert V.validate_source_id(3.14) == 3
    # int() truncation toward zero runs BEFORE the negativity check, exactly
    # like the reference's int(source_id): -0.5 -> 0, accepted
    assert V.validate_source_id(-0.5) == 0
    for bad in [-1, "not a number", None]:
        with pytest.raises(V.CommandValidationError):
            V.validate_source_id(bad)


def test_uri_shape_examples():
    # "file:/" parses to scheme="file", path="/" — urlparse (reference
    # config.py:145-148) accepts it, so the regex must too
    for ok in ["rtsp://localhost:8554/live/3", "file:///tmp/clip.mp4", "a:b",
               "synthetic://0", "file:/"]:
        assert V.is_valid_uri(ok), ok
    for bad in ["not a uri", "rtsp://", "", None, 7]:
        assert not V.is_valid_uri(bad), bad
    # pin the regex against the reference's actual urlparse predicate on the
    # full corpus of shapes both tests exercise
    from urllib.parse import urlparse

    for uri in ["rtsp://localhost:8554/live/3", "file:///tmp/clip.mp4", "a:b",
                "synthetic://0", "file:/", "not a uri", "rtsp://", "",
                "scheme:", "s:///x", "s://h"]:
        parsed = urlparse(uri)
        assert V.is_valid_uri(uri) == bool(
            parsed.scheme and (parsed.netloc or parsed.path)
        ), uri


def test_port_and_confidence_and_interval():
    assert V.validate_port(1883) == 1883
    for bad in [0, 70000, "abc"]:
        with pytest.raises(V.CommandValidationError):
            V.validate_port(bad)
    assert V.validate_confidence("0.5") == 0.5
    for bad in [1.5, -0.1, "oops"]:
        with pytest.raises(V.CommandValidationError):
            V.validate_confidence(bad)
    assert V.validate_metrics_interval(0) == 0.0
    with pytest.raises(V.CommandValidationError):
        V.validate_metrics_interval(-1)


# -- columnar form agrees with the scalar form -------------------------------


def _scalar_verdict(fn, raw):
    try:
        return fn(raw)
    except V.CommandValidationError:
        return None


def test_columnar_rules_match_scalar(spark):
    """Every raw string the command corpus can produce gets the same
    accept/normalize verdict from the column expressions as from the
    Python validators."""
    raws = [
        "", "  yolov11x-640  ", None, "yolov8x-3",       # model ids
        "0", "-1.5", "not a number", "0.5", "5", "17",   # fps
        "-1", "x9", "3.99", "12", "-0.5", "-0.9",        # source ids
        "NaN", "inf", "-inf", "3e9",                     # non-finite / huge
        "1e19", "-1e19", "9e18",                         # around the 2^63 bound
        "rtsp://localhost:8554/live/3", "not a uri", "rtsp://",
        "file:///tmp/clip.mp4", "rtsp://go2rtc:8554/7", "file:/",  # uris
    ]
    df = spark.createDataFrame([Row(raw=r) for r in raws]).select(
        "raw",
        V.model_id_ok(F.col("raw")).alias("m_ok"),
        V.model_id_norm(F.col("raw")).alias("m_norm"),
        V.fps_ok(F.col("raw")).alias("f_ok"),
        V.source_id_ok(F.col("raw")).alias("s_ok"),
        V.source_id_norm(F.col("raw")).alias("s_norm"),
        V.uri_ok(F.col("raw")).alias("u_ok"),
    )
    for row in df.collect():
        raw = row["raw"]
        m = _scalar_verdict(V.validate_model_id, raw)
        assert row["m_ok"] == (m is not None), f"model_id_ok({raw!r})"
        assert row["m_norm"] == m, f"model_id_norm({raw!r})"
        f = _scalar_verdict(V.validate_fps, raw)
        assert row["f_ok"] == (f is not None), f"fps_ok({raw!r})"
        s = _scalar_verdict(V.validate_source_id, raw)
        assert row["s_ok"] == (s is not None), f"source_id_ok({raw!r})"
        assert row["s_norm"] == s, f"source_id_norm({raw!r})"
        assert row["u_ok"] == V.is_valid_uri(raw), f"uri_ok({raw!r})"


# -- control plane: bad params become error acks, config untouched -----------


def _acks(plane, command):
    return [(a["command"], a["ack_status"]) for a in plane.acks if a["command"] == command]


def test_bad_params_error_ack_config_unchanged():
    plane = ControlPlane("p0", EngineConfig(streams=("rtsp://cam:8554/1",)))
    before = plane.config
    plane.handle_command_row(
        Row(ts=1.0, command="change_model", params={"model_id": "   "}, target_instances=None)
    )
    plane.handle_command_row(
        Row(ts=2.0, command="set_max_fps", params={"max_fps": "-2"}, target_instances=None)
    )
    plane.handle_command_row(
        Row(ts=3.0, command="add_stream", params={"uri": "not a uri"}, target_instances=None)
    )
    assert _acks(plane, "change_model") == [("change_model", "received"), ("change_model", "error")]
    assert _acks(plane, "set_max_fps") == [("set_max_fps", "received"), ("set_max_fps", "error")]
    assert _acks(plane, "add_stream") == [("add_stream", "received"), ("add_stream", "error")]
    assert plane.config == before


def test_change_model_strip_normalizes():
    plane = ControlPlane("p0", EngineConfig(streams=("rtsp://cam:8554/1",)))
    plane.handle_command_row(
        Row(
            ts=1.0,
            command="change_model",
            params={"model_id": "  yolov11x-640  "},
            target_instances=None,
        )
    )
    assert plane.config.model_id == "yolov11x-640"
    assert _acks(plane, "change_model")[-1] == ("change_model", "completed")


def test_config_uri_validation():
    with pytest.raises(ValueError):
        EngineConfig(streams=("not a uri",)).validated()
    EngineConfig(streams=("rtsp://cam:8554/1",)).validated()


def test_config_empty_streams_rejected():
    # reference config.py:107-108: "stream_uris cannot be empty"
    with pytest.raises(ValueError, match="cannot be empty"):
        EngineConfig(streams=()).validated()
