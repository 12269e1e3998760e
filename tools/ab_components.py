"""A/B the connected-components deep path: star contraction (r11) vs
the r10 ramped multi-hop propagation, on the four clustering consumers.

Per mode, a FRESH session (stop + new JVM) warms the base tables + the
Python UDF workers, then times each query build-inclusive with a noop
sink (the bench extras protocol — iterative operators do their
convergence work while building). Two passes per mode: the second is
the warm number the round notes table uses.

Usage:
    python tools/ab_components.py [sf_dir ...]   # default /root/testdata/sf0.1
    SPARK_GRAFT_AB_QUERIES=media_doc_dup_clusters python tools/ab_components.py .sf1
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import cupertino_nvr_spark.llm.pipeline as P  # noqa: E402
from cupertino_nvr_spark.plans import REGISTRY  # noqa: E402
from cupertino_nvr_spark.session import get_spark  # noqa: E402
from cupertino_nvr_spark.sources.tables import load_table  # noqa: E402

DEFAULT_QUERIES = [
    "docs_dup_clusters",
    "media_doc_dup_clusters",
    "media_doc_dedup_survivors",
    "docs_cluster_bcubed",
]

_ORIG = P.components_over_keys


def _force_mode(mode: str):
    def forced(*args, **kwargs):
        kwargs["deep_path"] = mode
        return _ORIG(*args, **kwargs)

    P.components_over_keys = forced


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    queries = (
        os.environ["SPARK_GRAFT_AB_QUERIES"].split(",")
        if "SPARK_GRAFT_AB_QUERIES" in os.environ
        else DEFAULT_QUERIES
    )
    passes = int(os.environ.get("SPARK_GRAFT_AB_PASSES", "2"))
    out: dict = {}
    for sf_dir in sf_dirs:
        for mode in ("contract", "multihop"):
            _force_mode(mode)
            spark = get_spark(f"ab-components-{mode}")
            for table in ("documents", "embeddings", "events"):
                load_table(spark, table, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            warm = spark.range(64).selectExpr("id", "cast(id as string) s")
            warm.mapInPandas(lambda it: it, warm.schema).write.format(
                "noop"
            ).mode("overwrite").save()
            for name in queries:
                runs = []
                for _ in range(passes):
                    t0 = time.perf_counter()
                    REGISTRY[name].spark(spark, sf_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    runs.append(round(time.perf_counter() - t0, 2))
                out.setdefault(sf_dir, {}).setdefault(name, {})[mode] = runs
                print(f"{sf_dir} {name} {mode}: {runs}", file=sys.stderr)
            spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
