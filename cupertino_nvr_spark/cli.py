"""CLI entry ergonomics (SURVEY §3.1 step 1; reference ``cli.py:101-145``).

The reference's CLI computes a *stream plan* — which camera indices to
open, their RTSP URIs, and the positional→actual source-id mapping — from
``--streams``/``--start``/``--end``/``--n``, then builds the processor
config from it. That plan computation is the reference's "logical plan"
construction, so it is reproduced here as pure functions (testable without
argv) plus a thin argparse front end (stdlib only — no CLI framework in
the sandbox).

Precedence, exactly as the reference resolves it (``cli.py:115-126``):

1. ``streams`` — explicit comma-separated indices, verbatim order;
2. ``start`` + ``end`` — inclusive range;
3. ``start`` alone — ``n`` consecutive indices from ``start``;
4. default — ``n`` indices from 0.

URIs follow the go2rtc pattern ``{server}/{index}`` (``cli.py:131``) and
``source_id_mapping`` is the index list itself (``cli.py:136``).
"""

from __future__ import annotations

import argparse
import json
import os
from dataclasses import asdict, dataclass, field

from cupertino_nvr_spark.streaming.control import EngineConfig

DEFAULT_STREAM_SERVER = "rtsp://localhost:8554/live"


@dataclass(frozen=True)
class StreamPlan:
    """The computed ingest plan: indices, URIs, id mapping."""

    stream_indices: tuple[int, ...]
    stream_uris: tuple[str, ...]
    source_id_mapping: tuple[int, ...]
    stream_server: str = DEFAULT_STREAM_SERVER
    extra: dict = field(default_factory=dict)


def compute_stream_indices(
    n: int = 6,
    start: int | None = None,
    end: int | None = None,
    streams: str | None = None,
) -> list[int]:
    """Index resolution with the reference's exact precedence
    (``cli.py:115-126``)."""
    if streams is not None:
        return [int(s.strip()) for s in streams.split(",")]
    if start is not None and end is not None:
        return list(range(start, end + 1))
    if start is not None:
        return list(range(start, start + n))
    return list(range(n))


def build_stream_plan(
    n: int = 6,
    start: int | None = None,
    end: int | None = None,
    streams: str | None = None,
    stream_server: str | None = None,
) -> StreamPlan:
    """Indices → URIs + id mapping (``cli.py:127-139``). ``stream_server``
    falls back to ``$STREAM_SERVER`` then the go2rtc default, as the
    reference does (``cli.py:112-113``)."""
    if stream_server is None:
        stream_server = os.getenv("STREAM_SERVER", DEFAULT_STREAM_SERVER)
    indices = compute_stream_indices(n, start, end, streams)
    return StreamPlan(
        stream_indices=tuple(indices),
        stream_uris=tuple(f"{stream_server}/{i}" for i in indices),
        source_id_mapping=tuple(indices),
        stream_server=stream_server,
    )


def build_engine_config(
    plan: StreamPlan,
    model: str = "yolov8x-640",
    max_fps: float = 1.0,
    confidence: float = 0.5,
    metrics_interval: float = 10.0,
) -> EngineConfig:
    """Stream plan + knobs → validated engine config (the Spark analog of
    ``StreamProcessorConfig(**config_kwargs)``, ``cli.py:128-148``)."""
    return EngineConfig(
        model_id=model,
        streams=plan.stream_uris,
        confidence_threshold=confidence,
        max_fps=max_fps,
        metrics_interval_s=metrics_interval,
    ).validated()


def _add_stream_options(p: argparse.ArgumentParser) -> None:
    p.add_argument("--n", type=int, default=6, help="number of streams")
    p.add_argument("--start", type=int, default=None, help="start stream index")
    p.add_argument("--end", type=int, default=None, help="end stream index (inclusive)")
    p.add_argument("--streams", type=str, default=None, help="explicit indices, comma-separated")
    p.add_argument("--stream-server", type=str, default=None, help="RTSP server URL")
    p.add_argument("--model", type=str, default="yolov8x-640", help="model id")
    p.add_argument("--max-fps", type=float, default=1.0, help="max FPS per source")
    p.add_argument("--confidence", type=float, default=0.5, help="confidence threshold")
    p.add_argument("--metrics-interval", type=float, default=10.0, help="metrics cadence, seconds")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="cupertino-nvr-spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    plan_p = sub.add_parser("plan", help="print the computed stream plan + engine config as JSON")
    _add_stream_options(plan_p)

    demo_p = sub.add_parser("demo", help="run the end-to-end streaming pipeline demo")
    _add_stream_options(demo_p)

    sub.add_parser("list-queries", help="list every registered query (name + one-line doc)")

    query_p = sub.add_parser("query", help="run a registered query against a scale-factor dir")
    query_p.add_argument("name", help="query name (see list-queries)")
    query_p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="scale-factor directory of parquet tables",
    )
    query_p.add_argument("--limit", type=int, default=20, help="rows to show (0 = all)")
    query_p.add_argument(
        "--explain", action="store_true", help="print the formatted physical plan instead of rows"
    )

    args = parser.parse_args(argv)

    if args.cmd == "list-queries":
        from cupertino_nvr_spark.plans import REGISTRY

        for name, spec in REGISTRY.items():
            tag = " [bench-only]" if spec.bench_only else ""
            first_line = (spec.doc or "").strip().splitlines()[0][:100] if spec.doc else ""
            print(f"{name}{tag}: {first_line}")
        return 0

    if args.cmd == "query":
        from cupertino_nvr_spark.plans import REGISTRY
        from cupertino_nvr_spark.session import get_spark

        if args.name not in REGISTRY:
            parser.error(
                f"unknown query {args.name!r}; run list-queries for the inventory"
            )
        spark = get_spark("cupertino-nvr-spark-cli")
        df = REGISTRY[args.name].spark(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        else:
            df.show(args.limit or df.count(), truncate=False)
        return 0

    plan = build_stream_plan(args.n, args.start, args.end, args.streams, args.stream_server)
    config = build_engine_config(
        plan, args.model, args.max_fps, args.confidence, args.metrics_interval
    )

    if args.cmd == "plan":
        print(json.dumps({"plan": asdict(plan), "config": asdict(config)}, default=list))
        return 0

    # demo: reuse the runnable pipeline example with the computed plan
    from examples.nvr_pipeline_demo import run_demo

    run_demo(n_sources=len(plan.stream_indices))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
