"""Pins the r9 sampled-window composition.

The driver's correctness gate samples list(all_queries())[:50] (verified
r5-r8: the CORRECTNESS key set equals the first-50 slice). The rotation
policy (plans/__init__.py, applied as an ordered VIEW via
registry.WINDOW_PRIORITY — REGISTRY itself keeps registration order)
requires the window to contain, in priority order: the flagship, every
query never driver-sampled in rounds 1-8 (exactly ``orders_benford``,
the r8 idx-50 overflow), and this round's debuts; the remaining slots are
filled by the family longest without a driver-green row (relational/
TPC-H, last green r5). This test recomputes "never sampled" from the
committed CORRECTNESS_r0*.json files so the pin can't drift from the
actual history.
"""

from __future__ import annotations

import glob
import json
from pathlib import Path

from cupertino_nvr_spark.plans import REGISTRY, all_oracles, all_queries

REPO = Path(__file__).resolve().parent.parent

R9_DEBUTS = {
    "media_phash_pixels",
    "media_doc_dup_clusters",
    "docs_unigram_lm_train",
    "docs_unigram_segment",
    "docs_tokenizer_fertility",
    "docs_wordpiece_train_merges",
    "events_holt_winters",
    "docs_substring_excise_plan",
    "docs_cluster_bcubed",
}

# relational/TPC-H family: last driver-green r5, the stalest family and
# therefore the r9 fill pool
R5_FAMILY_GREEN_ROUND = 5


def _green_round_by_query() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r0[1-8].json"))):
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


def test_window_contains_never_sampled_and_debuts():
    """The 50-row window must contain the flagship, every query never
    driver-green in r1-r8, and every r9 debut; any debut overflow must
    sit IMMEDIATELY after the window (first in line for r10)."""
    order = list(all_queries())
    window = order[:50]
    green = _green_round_by_query()
    never = {q for q in order if q not in green} - R9_DEBUTS
    registered_debuts = R9_DEBUTS & set(order)
    missing = (never | {"asof_ttl_overlay"}) - set(window)
    assert not missing, (
        f"r9 window must contain the flagship and every never-driver-green "
        f"query; missing: {sorted(missing)}"
    )
    overflow = registered_debuts - set(window)
    assert set(order[50 : 50 + len(overflow)]) == overflow, (
        f"debuts that no longer fit the 50-row window must directly follow "
        f"it: {sorted(overflow)}"
    )


def test_window_fill_is_the_stalest_family():
    """Every non-required window slot is spent on the stalest family
    (relational/TPC-H, last driver-green r5) — the rotation must not waste
    slots on recently-confirmed queries."""
    order = list(all_queries())
    window = order[:50]
    green = _green_round_by_query()
    required = (
        {q for q in order if q not in green} | R9_DEBUTS | {"asof_ttl_overlay"}
    )
    spare = [q for q in window if q not in required]
    stale = {q for q, r in green.items() if r <= R5_FAMILY_GREEN_ROUND}
    assert set(spare) <= stale, (
        f"window fill must come from the stalest (r5) family; offenders: "
        f"{sorted(set(spare) - stale)}"
    )


def test_flagship_registers_first():
    assert next(iter(all_queries())) == "asof_ttl_overlay"


def test_benford_in_window():
    """orders_benford is the ONLY declared query of r8's 189 without a
    driver-green row (r8 idx 50, one past the window) — r9's top punch-
    list item is rotating it in."""
    assert "orders_benford" in list(all_queries())[:50]


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
