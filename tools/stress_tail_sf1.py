"""One-off exclusive sf1 stress probe for the heaviest NON-headline
queries (VERDICT r6 #7): times each at sf0.1 and sf1 (10x data) in the
same warmed session, build-inclusive (iterative operators converge while
building), and prints one JSON line with the per-query scaling ratio.

Run exclusively — nothing else on the box — or the numbers are noise:
    python tools/stress_tail_sf1.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cupertino_nvr_spark.plans import REGISTRY  # noqa: E402
from cupertino_nvr_spark.session import get_spark  # noqa: E402
from cupertino_nvr_spark.sources.tables import load_table  # noqa: E402

# default probe set (r6/r7 heavy tail); override with argv:
#     python tools/stress_tail_sf1.py q1 q2 ...
TAIL = [
    "docs_dup_clusters",
    "embedding_semdedup",
    "docs_lsh_quality_eval",
    "embedding_pq_ann",
    "parts_copurchase_pagerank",
]

SF_DIRS = {"0.1": "/root/testdata/sf0.1", "1": "/root/repo/.sf1"}


def main() -> None:
    tail = sys.argv[1:] or TAIL
    unknown = [q for q in tail if q not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("cupertino_nvr_spark-stress-tail")
    for sf_dir in SF_DIRS.values():
        for t in ("documents", "embeddings", "orders", "lineitem"):
            load_table(spark, t, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    warm = spark.range(64).selectExpr("id", "cast(id as string) s")
    warm.mapInPandas(lambda it: it, warm.schema).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict[str, float | None]] = {}
    for name in tail:
        row: dict[str, float | None] = {}
        for sf, sf_dir in SF_DIRS.items():
            t0 = time.perf_counter()
            try:
                REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                row[sf] = round(time.perf_counter() - t0, 2)
            except Exception as exc:  # keep probing the rest
                row[sf] = None
                row[f"err_{sf}"] = repr(exc)[:160]  # type: ignore[assignment]
        if row.get("0.1") and row.get("1"):
            row["ratio_10x"] = round(row["1"] / row["0.1"], 2)
        out[name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps({"stress_tail_sf1": out}))


if __name__ == "__main__":
    main()
