"""Per-query optimization probe (r14): fresh-JVM isolated timing plus
plan capture for the queries under optimization.

Protocol matches bench.py: warm every base table + the Python UDF
workers outside the timed region, then time each query with the noop
sink. Headline entries are timed exec-only, everything else
build-inclusive (iterative operators converge while building). Each
query is timed ``--reps`` times in the same session (min is the number
to compare against BENCH_LOCAL floors; all reps are printed so ambient
drift is visible). ``--explain`` additionally writes
``plans/r14/<query>_<tag>.txt`` with the formatted physical plan.

Usage:
    python tools/opt_probe.py --tag before --explain q1 q2 ...
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/opt_probe.py q1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cupertino_nvr_spark.plans import REGISTRY  # noqa: E402
from cupertino_nvr_spark.session import get_spark  # noqa: E402
from cupertino_nvr_spark.sources.tables import load_table  # noqa: E402

from bench import HEADLINE  # noqa: E402

WARM_TABLES = (
    "events",
    "documents",
    "embeddings",
    "orders",
    "customer",
    "lineitem",
    "part",
    "supplier",
    "nation",
    "region",
    "media",
)


def warm(spark, sf_dir: str) -> None:
    for table in WARM_TABLES:
        try:
            load_table(spark, table, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    w = spark.range(64).selectExpr("id", "cast(id as string) s")
    w.mapInPandas(lambda it: it, w.schema).write.format("noop").mode(
        "overwrite"
    ).save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3, help="0 = explain only")
    ap.add_argument("--tag", default=None, help="plans/<round>/<q>_<tag>.txt")
    ap.add_argument("--round", default="r15", help="plans subdir for --explain dumps")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument(
        "--no-warm",
        action="store_true",
        help="skip the warm pass (explain-only runs need no warm tables)",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-probe")
    if not args.no_warm:
        warm(spark, sf_dir)

    out: dict[str, list[float]] = {}
    plan_dir = Path(__file__).resolve().parent.parent / "plans" / args.round
    for name in args.queries:
        spec = REGISTRY[name]
        include_build = name not in HEADLINE
        spark.sparkContext.setJobDescription(f"opt-probe:{name}")
        reps = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            if not include_build:
                t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - t0, 3))
        out[name] = reps or [-1.0]
        print(f"{name}: {reps} min={min(reps, default=-1)}", flush=True)
        if args.explain and args.tag:
            plan_dir.mkdir(parents=True, exist_ok=True)
            df = spec.spark(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plan_dir / f"{name}_{args.tag}.txt").write_text(txt)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({k: min(v) for k, v in out.items()}))


if __name__ == "__main__":
    main()
