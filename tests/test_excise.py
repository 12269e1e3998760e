"""Exact-substring excision executor: the cut list applies faithfully
(removed tokens per doc == sum of island lengths), the written corpus
reaches the Lee et al. fixpoint (NO k-token window cross-doc duplicated
in the output), and the iterate-until-clean loop genuinely iterates on a
corpus where one excision pass mints a new duplicate by joining a cut's
flanks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cupertino_nvr_spark.llm.excise import (
    apply_excision,
    excise_materialize,
    excision_islands,
)

K = 8


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@pytest.fixture()
def one_round_docs(spark):
    """doc1/doc2 share one 8-token prefix and one 8-token suffix around
    distinct middles; doc3 is unrelated — one pass reaches the fixpoint."""
    shared_a = " ".join(f"a{j}" for j in range(K))
    shared_b = " ".join(f"b{j}" for j in range(K))
    return _mkdocs(
        spark,
        [
            f"{shared_a} midone {shared_b}",
            f"{shared_a} midtwo {shared_b}",
            " ".join(f"solo{j}" for j in range(20)),
        ],
    )


def test_removed_equals_island_len_sum(spark, one_round_docs):
    islands = excision_islands(one_round_docs, k=K)
    per_doc = {
        r["doc_id"]: r["s"]
        for r in islands.groupBy("doc_id")
        .agg(F.sum("island_len").alias("s"))
        .collect()
    }
    excised = apply_excision(one_round_docs, islands)
    for r in excised.collect():
        assert r["n_removed"] == per_doc.get(r["doc_id"], 0)
        assert r["n_tokens_after"] == r["n_tokens_before"] - r["n_removed"]
        # the kept text really lost the islands: re-tokenized length agrees
        n_toks = len(r["text"].split()) if r["text"] else 0
        assert n_toks == r["n_tokens_after"]


def test_one_round_fixpoint_and_roundtrip(spark, one_round_docs, tmp_path):
    out = str(tmp_path / "excised")
    rounds = excise_materialize(one_round_docs, out, k=K)
    assert [r["round"] for r in rounds] == [1]
    # both shared spans excised from both docs: 16 tokens x 2 docs
    assert rounds[0]["n_docs_cut"] == 2
    assert rounds[0]["n_tokens_removed"] == 2 * 2 * K
    back = spark.read.parquet(out)
    assert back.count() == 3
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got[1] == "midone"
    assert got[2] == "midtwo"
    assert got[3].startswith("solo0")
    # Lee et al. fixpoint: re-running detection on the output finds nothing
    assert excision_islands(back, k=K).count() == 0


def test_flank_join_requires_second_round(spark, tmp_path):
    """doc1 = W[:4] + D + W[4:] where D duplicates with doc3; cutting D
    joins the flanks into W, which duplicates with doc2 — only visible to
    round 2."""
    w = [f"w{j}" for j in range(K)]
    d = " ".join(f"d{j}" for j in range(K))
    doc1 = " ".join(w[:4]) + f" {d} " + " ".join(w[4:])
    doc2 = " ".join(w) + " " + " ".join(f"u{j}" for j in range(K))
    doc3 = d + " " + " ".join(f"v{j}" for j in range(K))
    docs = _mkdocs(spark, [doc1, doc2, doc3])

    # round 1 alone leaves a residual duplicate (W in doc1' and doc2)
    islands1 = excision_islands(docs, k=K)
    after_one = apply_excision(docs, islands1).select("doc_id", "text")
    assert excision_islands(after_one, k=K).count() > 0

    out = str(tmp_path / "excised2")
    rounds = excise_materialize(docs, out, k=K)
    assert [r["round"] for r in rounds] == [1, 2]
    back = spark.read.parquet(out)
    assert excision_islands(back, k=K).count() == 0
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got[1] == ""  # D cut in round 1, W cut in round 2
    assert got[2] == " ".join(f"u{j}" for j in range(K))
    assert got[3] == " ".join(f"v{j}" for j in range(K))


def test_last_allowed_cut_is_credited(spark, tmp_path):
    """max_rounds counts EXCISION passes: a corpus that converges on the
    max_rounds-th cut must succeed (it takes max_rounds + 1 detections
    to see that), and only a corpus still dirty AFTER max_rounds cuts
    raises — the r10 advisor's off-by-one."""
    w = [f"w{j}" for j in range(K)]
    d = " ".join(f"d{j}" for j in range(K))
    doc1 = " ".join(w[:4]) + f" {d} " + " ".join(w[4:])
    doc2 = " ".join(w) + " " + " ".join(f"u{j}" for j in range(K))
    doc3 = d + " " + " ".join(f"v{j}" for j in range(K))
    docs = _mkdocs(spark, [doc1, doc2, doc3])

    # needs exactly 2 cuts: max_rounds=2 must converge...
    rounds = excise_materialize(docs, str(tmp_path / "exact"), k=K, max_rounds=2)
    assert [r["round"] for r in rounds] == [1, 2]
    # ...and max_rounds=1 must raise (still dirty after the only cut)
    with pytest.raises(RuntimeError, match="no fixpoint"):
        excise_materialize(docs, str(tmp_path / "short"), k=K, max_rounds=1)


def test_excised_stats_matches_executor(spark):
    """The declared per-doc stats query and the executor share the chain:
    one excision pass over the augmented corpus must report exactly the
    executor's round-1 removals."""
    from cupertino_nvr_spark.plans.llm import augmented_docs
    from cupertino_nvr_spark.plans.registry import REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    stats = REGISTRY["docs_substring_excised_stats"].spark(spark, sf_dir)
    agg = stats.agg(
        F.sum("n_removed").alias("removed"),
        F.sum((F.col("n_islands") > 0).cast("long")).alias("docs_cut"),
    ).collect()[0]
    islands = excision_islands(augmented_docs(spark, sf_dir), k=K)
    plan = islands.agg(
        F.sum("island_len").alias("removed"),
        F.count_distinct("doc_id").alias("docs_cut"),
    ).collect()[0]
    assert agg["removed"] == plan["removed"]
    assert agg["docs_cut"] == plan["docs_cut"]


def test_excise_materialize_rejects_unknown_format(spark, one_round_docs, tmp_path):
    with pytest.raises(ValueError):
        excise_materialize(one_round_docs, str(tmp_path / "x"), fmt="csv")
