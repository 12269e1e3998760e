"""Semantics pins for the two r9 eval/materialization debuts:

- docs_substring_excise_plan: on a toy corpus with a KNOWN shared token
  run, the interval union must produce exactly the hand-computed islands
  (overlapping windows coalesce, disjoint runs stay separate islands).
- docs_cluster_bcubed: invariants on the augmented corpus (precision and
  recall in (0, 1], recall < 1 — the sub-shingle-width truncated
  variants make perfect recall structurally impossible — and F1 is the
  harmonic mean of the emitted P/R), plus a hand-computed B-cubed on a
  tiny synthetic contingency via the same reduction.
"""

from __future__ import annotations

from cupertino_nvr_spark.plans import REGISTRY
from cupertino_nvr_spark.plans.llm import _SUBSTR_K


def test_excise_plan_islands(spark, tmp_path):
    sf_dir = str(tmp_path)
    # shared run of 10 tokens (k=8 -> windows at pos 1..3 of the run) in
    # two docs, plus a SECOND disjoint shared run of exactly k tokens
    # later in doc 1 only paired with doc 3 -> two separate islands in
    # doc 1. Filler tokens are unique per doc so nothing else collides.
    run_a = " ".join(f"shared{i}" for i in range(10))
    run_b = " ".join(f"other{i}" for i in range(_SUBSTR_K))
    d1 = f"{run_a} u1a u1b u1c u1d {run_b}"
    d2 = f"pre2a pre2b {run_a} post2"
    d3 = f"{run_b} tail3a tail3b"
    spark.createDataFrame(
        [
            (1, d1, "en", "toy", len(d1)),
            (2, d2, "en", "toy", len(d2)),
            (3, d3, "en", "toy", len(d3)),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    rows = {
        (r["doc_id"], r["island_idx"]): r
        for r in REGISTRY["docs_substring_excise_plan"].spark(spark, sf_dir).collect()
        if r["doc_id"] < 1000000  # base corpus rows (aug adds variants)
    }
    # doc 1: island 1 = the 10-token run (tokens 1..10, 3 windows),
    #        island 2 = run_b (tokens 15..22, 1 window)
    i11 = rows[(1, 1)]
    assert (i11["start_tok"], i11["end_tok"], i11["n_windows"]) == (1, 10, 3)
    i12 = rows[(1, 2)]
    assert (i12["start_tok"], i12["end_tok"], i12["n_windows"]) == (15, 22, 1)
    # doc 2: run_a at tokens 3..12
    i21 = rows[(2, 1)]
    assert (i21["start_tok"], i21["end_tok"], i21["island_len"]) == (3, 12, 10)
    # doc 3: run_b at tokens 1..8
    i31 = rows[(3, 1)]
    assert (i31["start_tok"], i31["end_tok"], i31["n_windows"]) == (1, 8, 1)


def test_bcubed_invariants_on_corpus(spark):
    rows = (
        REGISTRY["docs_cluster_bcubed"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["n_elements"] > 0
    assert 0 < r["bcubed_precision"] <= 1
    # the +4M truncated variants have empty shingle sets -> singleton
    # candidate clusters away from their gold source: recall < 1 always
    assert 0 < r["bcubed_recall"] < 1
    p, rr = r["bcubed_precision"], r["bcubed_recall"]
    assert abs(r["bcubed_f1"] - 2 * p * rr / (p + rr)) < 5e-6


def test_bcubed_reduction_matches_definition():
    """The contingency-count reduction used by the query equals the
    element-wise B-cubed definition on a hand-built clustering."""
    # elements: gold classes A={1,2,3}, B={4,5}; clusters C1={1,2,4},
    # C2={3,5}
    clusters = {1: "C1", 2: "C1", 4: "C1", 3: "C2", 5: "C2"}
    gold = {1: "A", 2: "A", 3: "A", 4: "B", 5: "B"}
    els = sorted(clusters)
    # element-wise definition
    def overlap(e):
        c = [x for x in els if clusters[x] == clusters[e]]
        g = [x for x in els if gold[x] == gold[e]]
        both = len([x for x in c if gold[x] == gold[e]])
        return both / len(c), both / len(g)

    p_def = sum(overlap(e)[0] for e in els) / len(els)
    r_def = sum(overlap(e)[1] for e in els) / len(els)
    # contingency reduction (the query's shape)
    from collections import Counter

    nij = Counter((clusters[e], gold[e]) for e in els)
    ci = Counter(clusters[e] for e in els)
    gj = Counter(gold[e] for e in els)
    p_red = sum(n * n / ci[c] for (c, g), n in nij.items()) / len(els)
    r_red = sum(n * n / gj[g] for (c, g), n in nij.items()) / len(els)
    assert abs(p_def - p_red) < 1e-12
    assert abs(r_def - r_red) < 1e-12


def test_media_doc_dedup_survivors_invariants(spark):
    """The cross-modal keep/drop decision: exactly one surviving doc per
    doc-bearing cluster; media survive only alongside their kept page
    (base media share the page's id); media-only clusters keep exactly
    their min-id representative; reasons partition consistently."""
    from cupertino_nvr_spark.plans.registry import REGISTRY

    rows = (
        REGISTRY["media_doc_dedup_survivors"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert rows
    saw_dup_doc = saw_media_of_survivor = False
    for cid, members in by_cluster.items():
        docs = [m for m in members if m["node_kind"] == "doc"]
        media = [m for m in members if m["node_kind"] == "media"]
        kept_docs = [m for m in docs if m["is_kept"]]
        if docs:
            assert len(kept_docs) == 1, cid
            surv = kept_docs[0]["node_id"]
            assert kept_docs[0]["keep_reason"] == "survivor_doc"
            for m in media:
                if m["is_kept"]:
                    assert m["node_id"] == surv
                    assert m["keep_reason"] == "media_of_survivor"
                    saw_media_of_survivor = True
            saw_dup_doc = saw_dup_doc or any(
                d["keep_reason"] == "dup_doc" for d in docs
            )
        else:
            kept_media = [m for m in media if m["is_kept"]]
            assert len(kept_media) == 1, cid
            assert kept_media[0]["node_id"] == min(m["node_id"] for m in media)
            assert kept_media[0]["keep_reason"] == "media_rep"
    # the corpus actually exercises the interesting branches
    assert saw_dup_doc and saw_media_of_survivor


def test_lsh_tuning_profile_monotone(spark):
    """Banding monotonicity: more bands -> lower S-curve threshold and
    at least as many candidate-pair slots (finer blocking can only add
    collisions on this corpus); the 4 factorizations of the 8-hash
    signature are all present with their precomputed tau literals."""
    from cupertino_nvr_spark.plans.llm import _LSH_TAUS
    from cupertino_nvr_spark.plans.registry import REGISTRY

    rows = sorted(
        REGISTRY["docs_lsh_tuning_profile"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r["bands"],
    )
    assert [(r["bands"], r["rows_per_band"]) for r in rows] == [
        (1, 8), (2, 4), (4, 2), (8, 1),
    ]
    for r in rows:
        assert r["tau_threshold"] == _LSH_TAUS[(r["bands"], r["rows_per_band"])]
    taus = [r["tau_threshold"] for r in rows]
    slots = [r["candidate_pair_slots"] for r in rows]
    assert taus == sorted(taus, reverse=True)  # more bands -> lower tau
    assert slots == sorted(slots)  # more bands -> more candidates
