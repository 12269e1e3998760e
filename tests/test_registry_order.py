"""Pins the r10 sampled-window composition.

The driver's correctness gate samples list(all_queries())[:50] (verified
r5-r9: the CORRECTNESS key set equals the first-50 slice). The rotation
policy (plans/__init__.py, applied as an ordered VIEW via
registry.WINDOW_PRIORITY — REGISTRY itself keeps registration order)
requires the window to contain, in priority order: the flagship, every
query never driver-sampled in rounds 1-9, this round's debuts and
semantics-modified queries, and the 10 remaining queries whose most
recent driver-green row is r5 (the r9 VERDICT's top punch-list item —
after r10 no declared query's last green row is older than r6); the
remaining slots are filled by the family longest without a driver-green
row (the LLM/ANN/media family, last green r6). This test recomputes
last-green rounds from the committed CORRECTNESS_r0*.json files so the
pin can't drift from the actual history.
"""

from __future__ import annotations

import glob
import json
from pathlib import Path

from cupertino_nvr_spark.plans import REGISTRY, all_oracles, all_queries

REPO = Path(__file__).resolve().parent.parent

# new queries this round PLUS queries whose semantics changed this round
# (docs_tokenizer_fertility grew the WordPiece leg) — both re-verify
# in-window per the debut-in-window policy
R10_DEBUTS = {
    "docs_substring_excised_stats",
    "docs_wordpiece_tokenized_len",
    "events_cusum_changepoints",
    "events_cusum_segments",
    "docs_lsh_tuning_profile",
    "media_doc_dedup_survivors",
    "media_phash_tau_profile",
    "docs_tokenizer_fertility",
}

# the 10 queries whose last driver-green row is r5 — required in the r10
# window so no declared query's confirmation is older than r6 afterwards
R5_STALE = {
    "product_profit",
    "nation_yearly_growth",
    "orders_part_pairs",
    "min_cost_supplier",
    "important_parts",
    "supplier_part_variety",
    "dominant_promo_suppliers",
    "parts_copurchase_pagerank",
    "customer_value_distribution",
    "supplier_concentration_hhi",
}

# fill pool: the family last driver-green r6 (LLM/ANN/media)
R6_FAMILY_GREEN_ROUND = 6


def _green_round_by_query() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r0[1-9].json"))):
        rnd = int(Path(f).stem.split("_r0")[1])
        for name, rec in json.load(open(f)).items():
            ok = (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and not rec.get("err")
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last


def test_history_has_r9():
    """The rotation derives from the committed correctness history — r9's
    record landing in git was the r9 VERDICT's precondition for this
    round's rotation."""
    assert (REPO / "CORRECTNESS_r09.json").exists()


def test_r5_stale_set_matches_history():
    """The hand-pinned R5_STALE set must equal the actual set of queries
    whose last driver-green row is r5."""
    green = _green_round_by_query()
    actual = {q for q, r in green.items() if r <= 5 and q in REGISTRY}
    assert actual == R5_STALE, (
        f"r5-stale drift: pinned-but-not-stale "
        f"{sorted(R5_STALE - actual)}, stale-but-not-pinned "
        f"{sorted(actual - R5_STALE)}"
    )


def test_window_contains_required_rows():
    """The 50-row window must contain the flagship, every query never
    driver-green in r1-r9, every r10 debut/modified query, and every
    r5-stale query; any debut overflow must sit IMMEDIATELY after the
    window (first in line for r11)."""
    order = list(all_queries())
    window = order[:50]
    green = _green_round_by_query()
    never = {q for q in order if q not in green} - R10_DEBUTS
    registered_debuts = R10_DEBUTS & set(order)
    required_in = (never | {"asof_ttl_overlay"} | (R5_STALE & set(order)))
    missing = required_in - set(window)
    assert not missing, (
        f"r10 window must contain the flagship, every never-driver-green "
        f"query, and every r5-stale query; missing: {sorted(missing)}"
    )
    overflow = registered_debuts - set(window)
    assert set(order[50 : 50 + len(overflow)]) == overflow, (
        f"debuts that no longer fit the 50-row window must directly follow "
        f"it: {sorted(overflow)}"
    )


def test_window_fill_is_the_stalest_family():
    """Every non-required window slot is spent on the stalest remaining
    family (last driver-green r6) — the rotation must not waste slots on
    recently-confirmed queries."""
    order = list(all_queries())
    window = order[:50]
    green = _green_round_by_query()
    required = (
        {q for q in order if q not in green}
        | R10_DEBUTS
        | R5_STALE
        | {"asof_ttl_overlay"}
    )
    spare = [q for q in window if q not in required]
    stale = {q for q, r in green.items() if r <= R6_FAMILY_GREEN_ROUND}
    assert set(spare) <= stale, (
        f"window fill must come from the stalest (r6) family; offenders: "
        f"{sorted(set(spare) - stale)}"
    )


def test_flagship_registers_first():
    assert next(iter(all_queries())) == "asof_ttl_overlay"


def test_registry_itself_keeps_registration_order():
    """The rotation is an ordered view (all_queries()), not an in-place
    REGISTRY mutation: the flagship module registers first, so REGISTRY's
    own first key must still be the flagship and REGISTRY must contain
    every declared name (r8 advisor note)."""
    assert set(all_queries()) <= set(REGISTRY)
    assert next(iter(REGISTRY)) == "asof_ttl_overlay"


def test_window_is_fully_declared():
    """Every sampled row must have an oracle (a declared query without one
    is a guaranteed red row)."""
    oracles = all_oracles()
    for name in list(all_queries())[:50]:
        assert name in oracles, f"sampled query {name} has no oracle"
