"""Pins the r8 sampled-window composition.

The driver's correctness gate samples list(all_queries())[:50] (verified
r5-r7: the CORRECTNESS key set equals the first-50 slice). The rotation
policy (plans/__init__.py) requires the window to contain, in priority
order: the flagship, every query never driver-sampled in rounds 1-7, the
r6 red-row fix (embedding_int8_quant), and this round's debuts. This test
recomputes "never sampled" from the committed CORRECTNESS_r0*.json files
so the pin can't drift from the actual history.
"""

from __future__ import annotations

import glob
import json
from pathlib import Path

from cupertino_nvr_spark.plans import all_oracles, all_queries

REPO = Path(__file__).resolve().parent.parent

R8_DEBUTS = {
    "media_text_pairs",
    "docs_gopher_quality",
    "docs_substring_dup_spans",
    "docs_classifier_score",
    "docs_sequence_packing",
    "docs_token_budget_sample",
    "docs_hybrid_rrf_search",
    "embedding_power_iteration_pc1",
    "media_phash_neardup",
    "embedding_pc1_outliers",
    "docs_char_ngram_langid",
    "events_ab_test",
    "embedding_knn_label_eval",
    "docs_c4_filters",
    "events_cuped",
    "embedding_silhouette",
    "docs_filter_attribution",
    "docs_retrieval_rbo",
    "docs_packing_efficiency",
    "events_ewma_anomaly",
    "docs_vocab_coverage",
    "events_markov_removal_effect",
    "events_psi_drift",
    "events_ks_test",
    "embedding_hard_negatives",
    "embedding_mmr_rerank",
    "events_k_anonymity",
    "events_daily_acf",
    "docs_pmi_collocations",
    "events_session_survival",
    "orders_benford",
}


def _sampled_before_r8() -> set[str]:
    sampled: set[str] = set()
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r0[1-7].json"))):
        sampled.update(json.load(open(f)).keys())
    return sampled


def test_window_contains_never_sampled_and_debuts():
    """The 50-row window must contain the flagship, every query never
    driver-sampled in r1-r7, the int8 fix, and as many r8 debuts as fit;
    any debut overflow (the required set outgrew 50 late in the round)
    must sit IMMEDIATELY after the window so it is first in line for the
    r9 rotation."""
    order = list(all_queries())
    window = order[:50]
    sampled = _sampled_before_r8()
    never = {q for q in order if q not in sampled} - R8_DEBUTS
    missing = (never | {"embedding_int8_quant", "asof_ttl_overlay"}) - set(window)
    assert not missing, (
        f"r8 window must contain the flagship, every never-driver-sampled "
        f"query, and the int8_quant fix; missing: {sorted(missing)}"
    )
    overflow = R8_DEBUTS - set(window)
    assert set(order[50 : 50 + len(overflow)]) == overflow, (
        f"debuts that no longer fit the 50-row window must directly follow "
        f"it: {sorted(overflow)}"
    )
    # every non-required window slot is spent on a debut
    spare = set(window) - never - {"embedding_int8_quant", "asof_ttl_overlay"}
    assert spare <= R8_DEBUTS


def test_flagship_registers_first():
    assert next(iter(all_queries())) == "asof_ttl_overlay"


def test_window_is_fully_declared():
    """Every sampled row must have an oracle (a declared query without one
    is a guaranteed red row)."""
    oracles = all_oracles()
    for name in list(all_queries())[:50]:
        assert name in oracles, f"sampled query {name} has no oracle"
