"""Pins the r11 sampled-window composition.

The driver's correctness gate samples list(all_queries())[:50] (verified
r5-r10: the CORRECTNESS key set equals the first-50 slice). The rotation
policy (plans/__init__.py, applied as an ordered VIEW via
registry.WINDOW_PRIORITY — REGISTRY itself keeps registration order)
requires the window to contain, in priority order: the flagship, every
query never driver-sampled in rounds 1-10, this round's debuts, and the
9 remaining queries whose most recent driver-green row is r6 (the r10
VERDICT's top punch-list item — after r11 no declared query's last
green row is older than r7); the remaining slots are filled by the
family longest without a driver-green row (last green r7), in
deterministic alphabetical order. This test recomputes last-green
rounds from the committed CORRECTNESS_r*.json files so the pin can't
drift from the actual history.
"""

from __future__ import annotations

import glob
import json
import re
from pathlib import Path

from cupertino_nvr_spark.plans import REGISTRY, all_oracles, all_queries

REPO = Path(__file__).resolve().parent.parent

# new queries this round — re-verify in-window per the debut-in-window
# policy
R11_DEBUTS = {
    "docs_curation_inc_report",
    "embedding_margin_pairs",
    "embedding_ivf_pq_ann",
    "embedding_ivf_probe_profile",
    "docs_readability",
    "parts_copurchase_lift",
    "docs_source_quality_report",
    "docs_simhash_neardup",
}

# the 9 queries whose last driver-green row is r6 — required in the r11
# window so no declared query's confirmation is older than r7 afterwards
R6_STALE = {
    "embedding_pq_ann",
    "embedding_pq_quant",
    "embedding_prefix_rerank_ann",
    "embedding_semdedup",
    "events_stratified_sample",
    "media_exact_dedup",
    "media_features",
    "media_frame_plan",
    "media_patch_plan",
}

# fill pool: the family last driver-green r7
R7_FAMILY_GREEN_ROUND = 7


def _green_round_by_query() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", Path(f).stem).group(1))
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


def test_history_has_r10():
    """The rotation derives from the committed correctness history — r10's
    record landing in git was the r10 VERDICT's precondition for this
    round's rotation."""
    assert (REPO / "CORRECTNESS_r10.json").exists()


def test_r6_stale_set_matches_history():
    """The hand-pinned R6_STALE set must equal the actual set of queries
    whose last driver-green row is r6."""
    green = _green_round_by_query()
    actual = {q for q, r in green.items() if r <= 6 and q in REGISTRY}
    assert actual == R6_STALE, (
        f"r6-stale drift: pinned-but-not-stale "
        f"{sorted(R6_STALE - actual)}, stale-but-not-pinned "
        f"{sorted(actual - R6_STALE)}"
    )


def test_window_contains_required_rows():
    """The 50-row window must contain the flagship, every query never
    driver-green in r1-r10, every r11 debut, and every r6-stale query;
    any debut overflow must sit IMMEDIATELY after the window (first in
    line for r12)."""
    order = list(all_queries())
    window = order[:50]
    green = _green_round_by_query()
    never = {q for q in order if q not in green} - R11_DEBUTS
    registered_debuts = R11_DEBUTS & set(order)
    required_in = (
        never
        | {"asof_ttl_overlay"}
        | registered_debuts
        | (R6_STALE & set(order))
    )
    missing = required_in - set(window)
    assert not missing, (
        f"r11 window must contain the flagship, every never-driver-green "
        f"query, every debut, and every r6-stale query; missing: "
        f"{sorted(missing)}"
    )
    overflow = registered_debuts - set(window)
    assert set(order[50 : 50 + len(overflow)]) == overflow, (
        f"debuts that no longer fit the 50-row window must directly follow "
        f"it: {sorted(overflow)}"
    )


def test_window_fill_is_the_stalest_family():
    """Every non-required window slot is spent on the stalest remaining
    family (last driver-green r7) — the rotation must not waste slots on
    recently-confirmed queries."""
    order = list(all_queries())
    window = order[:50]
    green = _green_round_by_query()
    required = (
        {q for q in order if q not in green}
        | R11_DEBUTS
        | R6_STALE
        | {"asof_ttl_overlay"}
    )
    spare = [q for q in window if q not in required]
    stale = {q for q, r in green.items() if r <= R7_FAMILY_GREEN_ROUND}
    assert set(spare) <= stale, (
        f"window fill must come from the stalest (r7) family; offenders: "
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
