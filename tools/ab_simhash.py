"""A/B the r14 simhash pairing (checkpointed signature carried through
the banding) against the pre-r14 shape (signature subtree consumed by
four join arms), interleaved in one session with a control.

Usage: python tools/ab_simhash.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import cupertino_nvr_spark.llm.dedup as D
from cupertino_nvr_spark.plans import REGISTRY
from cupertino_nvr_spark.session import get_spark
from cupertino_nvr_spark.sources.tables import load_table

NEW = D.simhash_neardup_pairs


def old_pairs(
    docs, text_col="text", id_col="doc_id", bits=32, n_bands=4, tau=3,
    band_cap=64, hash_fn="md5",
):
    sig = D.simhash(docs, text_col, id_col, bits, hash_fn)
    bands = D.simhash_band_membership(sig, id_col, bits, n_bands)
    if band_cap is None:
        kept = bands
    else:
        hot = (
            bands.groupBy("band_idx", "band_key")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > band_cap)
            .select("band_idx", "band_key")
        )
        kept = bands.join(hot, ["band_idx", "band_key"], "left_anti")
    a = kept.select(F.col(id_col).alias("id_a"), "band_idx", "band_key")
    b = kept.select(F.col(id_col).alias("id_b"), "band_idx", "band_key")
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_b") > F.col("id_a"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", hamming.alias("hamming"),
            (hamming == 0).cast("int").alias("is_sig_exact"),
        )
        .filter(F.col("hamming") <= tau)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-simhash-r14")
    for t in ("documents", "events"):
        load_table(spark, t, sf_dir).write.format("noop").mode("overwrite").save()

    def run(impl, name):
        D.simhash_neardup_pairs = impl
        t0 = time.perf_counter()
        df = REGISTRY[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def control():
        df = REGISTRY["docs_exact_dedup"].spark(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, list[float]] = {
        "uncapped_old": [], "uncapped_new": [],
        "capped_old": [], "capped_new": [], "control": [],
    }
    for _ in range(reps):
        out["uncapped_old"].append(run(old_pairs, "docs_simhash_neardup_uncapped"))
        out["uncapped_new"].append(run(NEW, "docs_simhash_neardup_uncapped"))
        out["capped_old"].append(run(old_pairs, "docs_simhash_neardup"))
        out["capped_new"].append(run(NEW, "docs_simhash_neardup"))
        out["control"].append(control())
    D.simhash_neardup_pairs = NEW
    for k, v in out.items():
        print(f"{k}: {v} min={min(v)}")


if __name__ == "__main__":
    main()
