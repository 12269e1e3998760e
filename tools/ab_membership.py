"""A/B the r14 per-row IVF assignment kernels against the legacy
cross-join+window/max_by shapes, interleaved in ONE session (the
protocol ambient drift requires: alternating reps, min-of-N, a control
query timed alongside).

Modes:
  membership — embedding_cell_members (top-2 multi-probe) old vs new,
               timed through the full embedding_cosine_neardup pair
               chain consumer (threshold 0.99) so the comparison
               includes the self-join the membership feeds.
  assign     — ivf_assign (argmax) old vs new through ivf_route_candidates
               + ivf_ann_topk (the embedding_ivf_ann headline chain).

Usage: python tools/ab_membership.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

import cupertino_nvr_spark.llm.dedup as D
import cupertino_nvr_spark.llm.similarity as S
from cupertino_nvr_spark.plans.llm import augmented_embeddings
from cupertino_nvr_spark.plans import REGISTRY
from cupertino_nvr_spark.session import get_spark
from cupertino_nvr_spark.sources.tables import load_table

NEW_MEMBERS = D.embedding_cell_members
NEW_ASSIGN = S.ivf_assign


def old_cell_members(
    vectors, id_col="vec_id", vec_col="embedding", max_cells=None,
    n_assign=2, sim_decimals=6, kernel="hof", n_rows=None,
):
    """The pre-r14 shape, verbatim: broadcast cross join + window top-2."""
    cosine = S.make_cosine(kernel)
    centroids = S.ivf_centroids(
        vectors, id_col,
        S.IVF_MAX_CELLS if max_cells is None else max_cells, n_rows=n_rows,
    )
    cent = centroids.select(
        F.col(id_col).alias("cell_id"), S.as_double(F.col(vec_col)).alias("centvec")
    )
    vecs = S.ensure_min_parallelism(
        vectors.select(
            F.col(id_col).alias("member_id"),
            S.as_double(F.col(vec_col)).alias("mvec"),
        )
    )
    scored = F.broadcast(cent).join(vecs).select(
        "member_id", "mvec", "cell_id",
        F.round(cosine(F.col("mvec"), F.col("centvec")), sim_decimals).alias("csim"),
    )
    wc = Window.partitionBy("member_id").orderBy(
        F.col("csim").desc(), F.col("cell_id")
    )
    return (
        scored.withColumn("r", F.row_number().over(wc))
        .filter(F.col("r") <= n_assign)
        .select("member_id", "mvec", "cell_id")
    )


def old_assign(
    corpus, centroids, id_col="vec_id", vec_col="embedding",
    sim_decimals=6, kernel="hof", keep_vec=False,
):
    cosine = S.make_cosine(kernel)
    cent = centroids.select(
        F.col(id_col).alias("cell_id"), S.as_double(F.col(vec_col)).alias("centvec")
    )
    vecs = S.ensure_min_parallelism(
        corpus.select(
            F.col(id_col).alias("member_id"),
            S.as_double(F.col(vec_col)).alias("mvec"),
        )
    )
    scored = F.broadcast(cent).join(vecs).select(
        "member_id", "mvec", "cell_id",
        F.round(cosine(F.col("mvec"), F.col("centvec")), sim_decimals).alias("csim"),
    )
    aggs = [
        F.max_by(F.col("cell_id"), F.struct(F.col("csim"), -F.col("cell_id"))).alias(
            "cell_id"
        )
    ]
    if keep_vec:
        aggs.append(F.first("mvec").alias("mvec"))
    keep = ["member_id", "mvec"] if keep_vec else ["member_id"]
    return scored.groupBy("member_id").agg(*aggs).select(*keep, "cell_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-membership-r14")
    for t in ("embeddings", "documents", "events"):
        load_table(spark, t, sf_dir).write.format("noop").mode("overwrite").save()

    def run_members(impl):
        D.embedding_cell_members = impl
        df = REGISTRY["embedding_cosine_neardup"].spark(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def run_assign(impl):
        S.ivf_assign = impl
        df = REGISTRY["embedding_ivf_ann"].spark(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def control():
        df = REGISTRY["docs_exact_dedup"].spark(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, list[float]] = {
        "members_old": [], "members_new": [],
        "assign_old": [], "assign_new": [], "control": [],
    }
    for _ in range(reps):
        out["members_old"].append(run_members(old_cell_members))
        out["members_new"].append(run_members(NEW_MEMBERS))
        out["assign_old"].append(run_assign(old_assign))
        out["assign_new"].append(run_assign(NEW_ASSIGN))
        out["control"].append(control())
    D.embedding_cell_members = NEW_MEMBERS
    S.ivf_assign = NEW_ASSIGN
    for k, v in out.items():
        print(f"{k}: {v} min={min(v)}")


if __name__ == "__main__":
    main()
