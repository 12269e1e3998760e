"""Pins the r13 sampled-window composition.

The driver's correctness gate samples list(all_queries())[:50] (verified
r5-r12: the CORRECTNESS key set equals the first-50 slice). The rotation
policy (plans/__init__.py, applied as an ordered VIEW via
registry.WINDOW_PRIORITY — REGISTRY itself keeps registration order)
requires the window to contain, in priority order: the flagship, every
query never driver-sampled in rounds 1-12, this round's debuts, every
CHANGED-DEFINITION query (new r13 policy, the r12 VERDICT's top
punch-list item: a query whose declared result set or schema changed
after its last external green row re-enters the window ahead of
staleness fill, so the gate confirms the definition that actually
shipped), and the 22 remaining queries whose most recent driver-green
row is r8; the remaining slots are filled by the family longest without
a driver-green row (last green r9), in deterministic alphabetical order.

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
R13_DEBUTS = {
    "embedding_ivf_cell_budget_profile",
}

# queries whose DECLARED output (result set or schema) changed after
# their most recent driver-green row — the r13 policy extension: history
# alone cannot see a definition change, so these are hand-pinned per
# round and required in-window ahead of staleness fill.
#   docs_classifier_calibration — r13: explicit underflow/overflow bins
#     (-1/20 with an open NULL side) replaced the edge-bin clamp; last
#     green r12 on the clamped form.
#   embedding_margin_pairs — r12: per-endpoint cand_cap=32 prunes the
#     result set; last green r11 on the uncapped definition.
#   parts_copurchase_lift — r12: schema gained confidence_b_to_a; last
#     green r11 on the one-direction schema.
R13_CHANGED_DEF = {
    "docs_classifier_calibration",
    "embedding_margin_pairs",
    "parts_copurchase_lift",
}

# the 22 queries whose last driver-green row is r8 — required in the r13
# window so no declared query's confirmation is older than r9 afterwards
R8_STALE = {
    "embedding_cosine_neardup_lsh",
    "embedding_hard_negatives",
    "embedding_int8_quant",
    "embedding_knn_label_eval",
    "embedding_mmr_rerank",
    "embedding_pc1_outliers",
    "embedding_power_iteration_pc1",
    "embedding_semdedup_lsh",
    "embedding_silhouette",
    "events_ab_test",
    "events_cuped",
    "events_daily_acf",
    "events_ewma_anomaly",
    "events_k_anonymity",
    "events_ks_test",
    "events_markov_removal_effect",
    "events_psi_drift",
    "events_session_survival",
    "media_phash_neardup",
    "media_resize_plan",
    "media_text_pairs",
    "orders_open_backlog",
}

# fill pool: the family last driver-green r9
R9_FAMILY_GREEN_ROUND = 9


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


def test_history_has_r12():
    """The rotation derives from the committed correctness history — r12's
    record landing in git was the r12 VERDICT's precondition for this
    round's rotation."""
    assert "CORRECTNESS_r12.json" in _committed_correctness_files()


def test_r8_stale_set_matches_history():
    """The hand-pinned R8_STALE set must equal the actual set of queries
    whose last driver-green row is r8 (per committed history)."""
    green = _green_round_by_query()
    actual = {q for q, r in green.items() if r <= 8 and q in REGISTRY}
    assert actual == R8_STALE, (
        f"r8-stale drift: pinned-but-not-stale "
        f"{sorted(R8_STALE - actual)}, stale-but-not-pinned "
        f"{sorted(actual - R8_STALE)}"
    )


def test_changed_def_rows_are_really_pending_reconfirmation():
    """Each changed-definition row must actually have a green row in
    history (else it is a debut, not a re-window) — and must be declared
    with an oracle, or the re-confirmation would be the weaker rows-only
    check."""
    green = _green_round_by_query()
    oracles = all_oracles()
    for q in R13_CHANGED_DEF:
        assert q in green, f"{q} has no prior green row — that's a debut"
        assert oracles.get(q), f"{q} lost its oracle"


def test_window_contains_required_rows():
    """The 50-row window must contain the flagship, every query never
    driver-green in r1-r12, every r13 debut, every changed-definition
    row, and every r8-stale query; any overflow must sit IMMEDIATELY
    after the window (first in line for r14)."""
    order = list(all_queries())
    window = order[:50]
    green = _green_round_by_query()
    never = {q for q in order if q not in green} - R13_DEBUTS
    registered_debuts = R13_DEBUTS & set(order)
    required_in = (
        never
        | {"asof_ttl_overlay"}
        | registered_debuts
        | (R13_CHANGED_DEF & set(order))
        | (R8_STALE & set(order))
    )
    missing = required_in - set(window)
    assert not missing, (
        f"r13 window must contain the flagship, every never-driver-green "
        f"query, every debut, every changed-definition row, and every "
        f"r8-stale query; missing: {sorted(missing)}"
    )
    overflow = registered_debuts - set(window)
    assert set(order[50 : 50 + len(overflow)]) == overflow, (
        f"debuts that no longer fit the 50-row window must directly follow "
        f"it: {sorted(overflow)}"
    )


def test_window_fill_is_the_stalest_family():
    """Every non-required window slot is spent on the stalest remaining
    family (last driver-green r9) — the rotation must not waste slots on
    recently-confirmed queries."""
    order = list(all_queries())
    window = order[:50]
    green = _green_round_by_query()
    required = (
        {q for q in order if q not in green}
        | R13_DEBUTS
        | R13_CHANGED_DEF
        | R8_STALE
        | {"asof_ttl_overlay"}
    )
    spare = [q for q in window if q not in required]
    stale = {
        q
        for q, r in green.items()
        if r <= R9_FAMILY_GREEN_ROUND and q not in required
    }
    assert set(spare) <= stale, (
        f"window fill must come from the stalest (r9) family; offenders: "
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
