"""Pins the r12 sampled-window composition.

The driver's correctness gate samples list(all_queries())[:50] (verified
r5-r11: the CORRECTNESS key set equals the first-50 slice). The rotation
policy (plans/__init__.py, applied as an ordered VIEW via
registry.WINDOW_PRIORITY — REGISTRY itself keeps registration order)
requires the window to contain, in priority order: the flagship, every
query never driver-sampled in rounds 1-11, this round's debuts, and the
17 remaining queries whose most recent driver-green row is r7 (the r11
VERDICT's top punch-list item — after r12 no declared query's last
green row is older than r8); the remaining slots are filled by the
family longest without a driver-green row (last green r8), in
deterministic alphabetical order.

Last-green rounds are recomputed from the CORRECTNESS_r*.json files AS
COMMITTED AT HEAD (`git show`), not the working tree: the r11 round
close showed the working-tree variant fails the moment the driver lands
the NEXT round's artifact mid-handoff (2 red pins on the judged tree),
which is rotation bookkeeping, not a product signal. The committed
history is exactly what the rotation was derived from.
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

from cupertino_nvr_spark.plans import REGISTRY, all_oracles, all_queries

REPO = Path(__file__).resolve().parent.parent

# new queries this round — re-verify in-window per the debut-in-window
# policy
R12_DEBUTS = {
    "embedding_ivf_pq_recall_eval",
    "embedding_margin_cap_profile",
    "docs_neardup_method_agreement",
    "embedding_eval_decontam",
    "docs_classifier_calibration",
}

# the 17 queries whose last driver-green row is r7 — required in the r12
# window so no declared query's confirmation is older than r8 afterwards
R7_STALE = {
    "events_stickiness_weekly",
    "events_type_hour_chisq",
    "events_user_lifecycle",
    "events_value_mad",
    "json_props_extract",
    "math_functions",
    "orders_seasonality",
    "per_source_latest_metrics",
    "rate_limited_events",
    "sessionize_events",
    "source_id_remap",
    "string_functions",
    "topic_codec",
    "tumbling_daily_metrics",
    "uptime_and_latency_metrics",
    "validation_dead_letter",
    "wall_grid_plan",
}

# fill pool: the family last driver-green r8
R8_FAMILY_GREEN_ROUND = 8


def _committed_correctness_files() -> list[str]:
    """CORRECTNESS_r*.json names as committed at HEAD (git show), so a
    driver artifact landing in the working tree mid-round cannot change
    what this suite derives the rotation from."""
    names = subprocess.run(
        ["git", "-C", str(REPO), "ls-tree", "--name-only", "HEAD"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    return sorted(n for n in names if re.fullmatch(r"CORRECTNESS_r\d+\.json", n))


def _green_round_by_query() -> dict[str, int]:
    last: dict[str, int] = {}
    for name in _committed_correctness_files():
        rnd = int(re.search(r"_r(\d+)", name).group(1))
        blob = subprocess.run(
            ["git", "-C", str(REPO), "show", f"HEAD:{name}"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        for qname, rec in json.loads(blob).items():
            ok = (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and not rec.get("err")
            )
            if ok:
                last[qname] = max(last.get(qname, 0), rnd)
    return last


def test_history_has_r11():
    """The rotation derives from the committed correctness history — r11's
    record landing in git was the r11 VERDICT's precondition for this
    round's rotation."""
    assert "CORRECTNESS_r11.json" in _committed_correctness_files()


def test_r7_stale_set_matches_history():
    """The hand-pinned R7_STALE set must equal the actual set of queries
    whose last driver-green row is r7 (per committed history)."""
    green = _green_round_by_query()
    actual = {q for q, r in green.items() if r <= 7 and q in REGISTRY}
    assert actual == R7_STALE, (
        f"r7-stale drift: pinned-but-not-stale "
        f"{sorted(R7_STALE - actual)}, stale-but-not-pinned "
        f"{sorted(actual - R7_STALE)}"
    )


def test_window_contains_required_rows():
    """The 50-row window must contain the flagship, every query never
    driver-green in r1-r11, every r12 debut, and every r7-stale query;
    any debut overflow must sit IMMEDIATELY after the window (first in
    line for r13)."""
    order = list(all_queries())
    window = order[:50]
    green = _green_round_by_query()
    never = {q for q in order if q not in green} - R12_DEBUTS
    registered_debuts = R12_DEBUTS & set(order)
    required_in = (
        never
        | {"asof_ttl_overlay"}
        | registered_debuts
        | (R7_STALE & set(order))
    )
    missing = required_in - set(window)
    assert not missing, (
        f"r12 window must contain the flagship, every never-driver-green "
        f"query, every debut, and every r7-stale query; missing: "
        f"{sorted(missing)}"
    )
    overflow = registered_debuts - set(window)
    assert set(order[50 : 50 + len(overflow)]) == overflow, (
        f"debuts that no longer fit the 50-row window must directly follow "
        f"it: {sorted(overflow)}"
    )


def test_window_fill_is_the_stalest_family():
    """Every non-required window slot is spent on the stalest remaining
    family (last driver-green r8) — the rotation must not waste slots on
    recently-confirmed queries."""
    order = list(all_queries())
    window = order[:50]
    green = _green_round_by_query()
    required = (
        {q for q in order if q not in green}
        | R12_DEBUTS
        | R7_STALE
        | {"asof_ttl_overlay"}
    )
    spare = [q for q in window if q not in required]
    stale = {q for q, r in green.items() if r <= R8_FAMILY_GREEN_ROUND}
    assert set(spare) <= stale, (
        f"window fill must come from the stalest (r8) family; offenders: "
        f"{sorted(set(spare) - stale)}"
    )
    # completeness: EVERY stale-family row must sit inside the priority
    # prefix (window fill + directly following it), not stranded at its
    # raw registration-order position — a row the fill list silently
    # omits would never rotate in (the r12 code-review catch:
    # embedding_hard_negatives dropped by a debut splice)
    n_required = len(required & set(order))
    prefix = set(order[: n_required + len(stale)])
    stranded = stale - prefix
    assert not stranded, (
        f"stale-family rows missing from the rotation priority list "
        f"(stranded at registration order): {sorted(stranded)}"
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
