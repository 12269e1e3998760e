"""End-to-end training-data curation demo: the LLM-pipeline operators
composed into one run over the synthetic corpus.

    python examples/curation_pipeline_demo.py [sf_dir] [out_dir]

Stages (each is a registry-verified operator; this script is the wiring):

  documents ──► PII scrub ──► near-dup clustering (MinHash+LSH)
      ──► survivor selection ──► quality/repetition gates
      ──► decontamination-free keepers ──► token-budget shard export

Prints per-stage retention and the shard manifest. Everything is the
same code the oracle-checked queries run — the demo exists to show the
operators composing as a pipeline, not to redefine them.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from cupertino_nvr_spark.llm.dedup import (
    lsh_band_membership,
    minhash_signature,
)
from cupertino_nvr_spark.llm.export import write_train_shards
from cupertino_nvr_spark.llm.pipeline import (
    dedup_survivors,
    duplicate_clusters,
    redact_pii,
)
from cupertino_nvr_spark.llm.text import repetition_gate, ws_tokens
from cupertino_nvr_spark.session import get_spark
from cupertino_nvr_spark.sources.tables import load_table


def run_curation_materialize(spark, sf_dir: str, out_dir: str) -> dict:
    """The report-pinned funnel materialization: ONE DAG from the
    augmented corpus through exact-dedup -> benchmark exclusion ->
    quality gate -> decontamination -> token-budget shards, returning the
    stage counts (identical by construction to docs_curation_report) and
    the shard manifest totals."""
    from cupertino_nvr_spark.llm.export import curation_materialize
    from cupertino_nvr_spark.plans.llm import augmented_docs

    docs = augmented_docs(spark, sf_dir)
    counts, manifest = curation_materialize(
        docs, out_dir, token_budget=512, n_buckets=4
    )
    report = counts.collect()[0].asDict()
    shards = manifest.collect()
    report["n_shards"] = len(shards)
    report["shard_docs_total"] = sum(r["n_docs"] for r in shards)
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="shards_")
    spark = get_spark("curation-demo")

    docs = load_table(spark, "documents", sf_dir)
    n_raw = docs.count()
    print(f"raw docs: {n_raw}")

    # 1. PII scrub: redact in place, keep the curation columns
    scrubbed = docs.select(
        "doc_id",
        redact_pii(F.col("text")).alias("text"),
        "lang",
        "source",
    ).withColumn("text_len", F.length("text"))

    # 2. near-dup clustering + survivor selection
    sigs = minhash_signature(docs, num_hashes=8, shingle_k=3, hash_fn="md5")
    memb = lsh_band_membership(sigs, num_hashes=8, band_size=2, band_cap=64).select(
        "doc_id",
        F.concat_ws(":", F.col("band_idx"), F.col("band_key")).alias("bkey"),
    )
    clusters = duplicate_clusters(docs, memb, id_col="doc_id", key_col="bkey")
    tagged = dedup_survivors(
        scrubbed.select("doc_id", "text_len"), clusters
    )
    survivors = scrubbed.join(
        tagged.filter("is_survivor").select("doc_id"), "doc_id"
    )
    n_surv = survivors.count()
    print(f"after dedup: {n_surv} ({n_surv * 100 // max(n_raw, 1)}%)")

    # 3. repetition/quality gate (same t/g2 definitions as the
    # docs_repetition_quality / docs_curation_report queries)
    t = ws_tokens(F.lower(F.col("text")))
    g2 = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size(t) - F.lit(1), F.lit(0))
        ),
        lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
    )
    kept = survivors.filter(repetition_gate(t, g2))
    n_kept = kept.count()
    print(f"after quality gates: {n_kept} ({n_kept * 100 // max(n_raw, 1)}%)")

    # 4. shard export with manifest
    manifest = write_train_shards(kept, out_dir, fmt="parquet")
    print(f"shards written to {out_dir}:")
    manifest.orderBy("split", "bucket", "shard").show(12, truncate=False)

    # 5. the report-pinned single-DAG materialization (exact-dedup ->
    # quality -> decontam -> shards, stage counts == docs_curation_report)
    report = run_curation_materialize(spark, sf_dir, out_dir + "_curated")
    print("curation_materialize:", report)
    spark.stop()


if __name__ == "__main__":
    main()
