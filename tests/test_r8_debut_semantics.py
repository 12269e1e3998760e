"""Semantic invariants of the r8 debut operators — properties the DuckDB
hash oracle can't state (it would accept two engines being wrong the same
way), pinned directly against the definitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from cupertino_nvr_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_substring_dup_spans_exact_copies_fully_duplicated(spark):
    """An exact copy shares EVERY k-token window with its source, so both
    rows of the pair must have dup_gram_frac == 1.0 (when they have any
    windows at all)."""
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["docs_substring_dup_spans"].spark(spark, SF).collect()
    }
    pairs = [
        (i, i + 1000000)
        for i in rows
        if i < 1000000 and i % 7 == 0 and (i + 1000000) in rows
    ]
    assert pairs
    checked = 0
    for a, b in pairs:
        if rows[a]["n_grams"] > 0:
            assert rows[a]["dup_gram_frac"] == 1.0, a
            assert rows[b]["dup_gram_frac"] == 1.0, b
            assert rows[a]["first_dup_pos"] == 1
            checked += 1
    assert checked > 0


def test_gopher_gate_is_conjunction_of_rules(spark):
    for r in REGISTRY["docs_gopher_quality"].spark(spark, SF).collect():
        expect = int(
            50 <= r["n_words"] <= 100000
            and 3 <= r["mean_word_len"] <= 10
            and r["symbol_ratio"] <= 0.1
            and r["alpha_word_ratio"] >= 0.8
            and r["n_stopwords"] >= 2
        )
        assert r["passes_gopher"] == expect, r


def test_classifier_label_matches_sign_and_prob_is_monotone(spark):
    rows = REGISTRY["docs_classifier_score"].spark(spark, SF).collect()
    for r in rows:
        assert r["label_keep"] == int(r["raw_score"] >= 0)
        assert 0.0 < r["keep_prob"] < 1.0
    by_raw = sorted(rows, key=lambda r: r["raw_score"])
    probs = [r["keep_prob"] for r in by_raw]
    assert probs == sorted(probs), "fast-sigmoid must be monotone in raw_score"


def test_media_text_pairs_top1_and_gate(spark):
    rows = REGISTRY["media_text_pairs"].spark(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["media_id"] % 5 == 0
        assert r["caption_id"] % 5 != 0
        assert r["media_id"] // 20 == r["caption_id"] // 20  # same page
        assert r["sim"] >= 0.1
        assert r["media_id"] not in seen  # one best caption per media
        seen.add(r["media_id"])


def test_hybrid_rrf_ranks_are_dense_and_docs_unique(spark):
    rows = REGISTRY["docs_hybrid_rrf_search"].spark(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {1, 2, 3}
    for q, rs in by_q.items():
        ranks = sorted(r["fused_rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1)), q
        docs = [r["doc_id"] for r in rs]
        assert len(docs) == len(set(docs)), q
        # a doc present in both legs must outscore one with a single,
        # equal-rank contribution — spot-check the rrf formula itself
        for r in rs:
            want = (1 / (60 + r["bm25_rank"]) if r["bm25_rank"] else 0.0) + (
                1 / (60 + r["ann_rank"]) if r["ann_rank"] else 0.0
            )
            assert abs(r["rrf_score"] - want) < 1e-12


def test_ab_test_variants_partition_users(spark):
    from cupertino_nvr_spark.llm.dedup import md5_int
    from cupertino_nvr_spark.sources.tables import load_table

    ab = {
        r["event_type"]: r for r in REGISTRY["events_ab_test"].spark(spark, SF).collect()
    }
    ev = load_table(spark, "events", SF)
    truth = {
        r["event_type"]: (r["n0"], r["n1"])
        for r in ev.select(
            "event_type",
            "user_id",
            (md5_int(F.col("user_id").cast("string"), seed=23) % 2).alias("v"),
        )
        .distinct()
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).alias("n0"),
            F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).alias("n1"),
        )
        .collect()
    }
    for et, r in ab.items():
        assert (r["n0"], r["n1"]) == truth[et], et


def test_knn_label_eval_votes_bounded(spark):
    rows = REGISTRY["embedding_knn_label_eval"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["votes"] <= 5
        assert r["correct"] == int(r["predicted_label"] == r["true_label"])


def test_pc1_is_unit_norm_and_outlier_gate_consistent(spark):
    import math

    pc1 = REGISTRY["embedding_power_iteration_pc1"].spark(spark, SF).collect()
    assert len(pc1) == 64
    norm = math.sqrt(sum(r["loading"] ** 2 for r in pc1))
    assert abs(norm - 1.0) < 1e-6  # loadings rounded to 9 decimals
    out = REGISTRY["embedding_pc1_outliers"].spark(spark, SF).collect()
    for r in out:
        assert r["is_outlier"] == int(abs(r["z"]) >= 2.5) or abs(abs(r["z"]) - 2.5) < 1e-5
    assert any(r["is_outlier"] == 1 for r in out)
