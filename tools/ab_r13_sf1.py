"""r13 sf1 measurements (run on the manifest-verified .sf1 scratch copy):

A. Scoring-shape A/B on the thresholded embedding near-dup chain: the
   SHIPPED shape (fat cell self-join carrying vectors, cosine per
   cell-pair row, distinct last — the candidate stream stays pipelined
   inside one stage) vs an inline replica of a score-after-distinct
   shape (skinny id join, distinct first, vectors rejoin by id). The
   replica looked 2x better at sf0.1 (broadcast-join regime) and
   measured 4.2x WORSE at sf1 (the full n^1.5 stream pays a distinct plus
   two sort-merge joins with growing vector payloads) — kept here as
   the measured reason the shipped shape stays.
B. Cell-cap knob effect (r12 VERDICT item 6): the same thresholded chain
   at the natural sqrt(n) cell count vs forced max_cells 64 and 16 —
   wall-clock and candidate volume as the cap binds.
C. 10x scaling: the thresholded chain at sf0.1 vs sf1.

Protocol per [[ambient-drift-on-this-box]]: an UNTOUCHED control query
(docs_exact_dedup) interleaves every round, order alternates, min-of-N
is reported; absolute numbers are only comparable within one window.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from cupertino_nvr_spark.llm.dedup import (
    embedding_candidate_ids,
    embedding_neardup_pairs,
)
from cupertino_nvr_spark.llm.similarity import make_cosine
from cupertino_nvr_spark.plans import REGISTRY
from cupertino_nvr_spark.plans.llm import augmented_docs, augmented_embeddings
from cupertino_nvr_spark.session import get_spark

SF1 = str(Path(__file__).resolve().parent.parent / ".sf1")
SF01 = "/root/testdata/sf0.1"
REPS = 3


def post_distinct_pairs(aug, threshold=0.99, max_cells=None):
    """Inline replica of the REJECTED score-after-distinct shape: skinny
    (id, cell) self-join, distinct first, vectors rejoin by id, one
    cosine per distinct pair. Same result set as the shipped path;
    different (worse-at-scale) physical plan."""
    from cupertino_nvr_spark.llm.similarity import as_double

    cosine = make_cosine("hof")
    cand = embedding_candidate_ids(aug, max_cells=max_cells)
    ea = aug.select(F.col("vec_id").alias("id_a"), as_double(F.col("embedding")).alias("avec"))
    eb = aug.select(F.col("vec_id").alias("id_b"), as_double(F.col("embedding")).alias("bvec"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("avec"), F.col("bvec")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = get_spark("ab-r13-sf1")
    aug1 = augmented_embeddings(spark, SF1)
    aug01 = augmented_embeddings(spark, SF01)
    # warm
    timed(aug1)
    timed(augmented_docs(spark, SF1).select("doc_id"))

    control = lambda: REGISTRY["docs_exact_dedup"].spark(spark, SF1)  # noqa: E731
    arms = {
        "ctl_docs_exact_dedup_sf1": control,
        "A_shipped_shape_sf1": lambda: embedding_neardup_pairs(aug1, threshold=0.99),
        "A_post_distinct_sf1": lambda: post_distinct_pairs(aug1),
        "B_cap64_sf1": lambda: embedding_neardup_pairs(
            aug1, threshold=0.99, max_cells=64
        ),
        # cap16 is measured by candidate COUNT only below: its ~84M-pair
        # stream is the past-cap regime's cost made visible, and timing it
        # three times buys no extra information for an hour of wall-clock
        "C_shipped_shape_sf01": lambda: embedding_neardup_pairs(
            aug01, threshold=0.99
        ),
    }
    results: dict[str, list[float]] = {k: [] for k in arms}
    order = list(arms)
    for rep in range(REPS):
        seq = order if rep % 2 == 0 else order[::-1]
        for name in seq:
            results[name].append(timed(arms[name]()))
            print(f"rep{rep} {name}: {results[name][-1]}", flush=True)
    print("\n== min-of-%d ==" % REPS, flush=True)
    for name, ts in results.items():
        print(f"{name}: min={min(ts)} all={ts}", flush=True)
    # candidate volumes for the B arms (one pass, volume is deterministic;
    # the shared embedding_candidate_ids definition, so the count can never
    # drift from the registered blocking)
    for cap in (None, 64, 16):
        n = embedding_candidate_ids(aug1, max_cells=cap).count()
        print(f"candidates sf1 cap={cap}: {n}", flush=True)
    # result-set equality of the two shapes (pair-set compare)
    shipped = {(r.id_a, r.id_b) for r in embedding_neardup_pairs(aug1, threshold=0.99).select("id_a", "id_b").collect()}
    alt = {(r.id_a, r.id_b) for r in post_distinct_pairs(aug1).select("id_a", "id_b").collect()}
    print("shapes_equal:", shipped == alt, "n_pairs:", len(shipped), flush=True)


if __name__ == "__main__":
    main()
