"""Pins bench.py's BENCH_LOCAL write contract: the file is "the cheapest
demonstrated cost per query" (the reprobe trigger's prior), so a fresh
sweep must MIN-MERGE into it, never overwrite it (r12 VERDICT item 5 —
one drifted window used to silently replace the floor)."""

from __future__ import annotations

from bench import min_merge_record


def _rec(**kw):
    base = {
        "metric": "headline_queries_total_sec",
        "value": None,
        "unit": "sec",
        "queries": {},
        "variants": {},
        "extras": {},
        "reprobe": {},
        "sf": 0.1,
    }
    base.update(kw)
    return base


def test_drifted_sweep_cannot_raise_the_floor():
    old = _rec(queries={"a": 1.0, "b": 2.0}, extras={"op_x": 2.9}, value=3.0)
    new = _rec(
        queries={"a": 4.5, "b": 1.5},
        extras={"op_x": 11.9},
        value=6.0,
        suspect_machine_state=["a"],
    )
    got = min_merge_record(new, old)
    assert got["queries"] == {"a": 1.0, "b": 1.5}
    assert got["extras"] == {"op_x": 2.9}
    # headline value recomputed from the MERGED mins, not either sweep
    assert got["value"] == 2.5
    # run-specific annotations describe the sweep that just happened
    assert got["suspect_machine_state"] == ["a"]


def test_new_keys_and_dropped_keys_both_survive():
    old = _rec(queries={"a": 1.0}, extras={"gone_query": 0.7})
    new = _rec(queries={"a": 0.9, "debut": 3.0})
    got = min_merge_record(new, old)
    assert got["queries"] == {"a": 0.9, "debut": 3.0}
    # an old-only key is still a valid floor (e.g. a query not swept today)
    assert got["extras"] == {"gone_query": 0.7}
    assert got["value"] == 3.9


def test_retired_headline_keys_cannot_inflate_the_value():
    """The queries section is restricted to the CURRENT headline set: a
    renamed/retired headline entry must not stay in the floor forever and
    be summed into every future recorded value."""
    old = _rec(queries={"renamed_away": 5.0, "a": 1.0}, value=6.0)
    new = _rec(queries={"a": 1.2}, value=1.2)
    got = min_merge_record(new, old)
    assert got["queries"] == {"a": 1.0}
    assert got["value"] == 1.0


def test_partial_flag_tracks_the_merged_record():
    """value-null-iff-partial must hold on the WRITTEN record: a partial
    sweep whose failed query is backfilled by an old floor yields a full
    merged record (partial dropped, value summed); a never-succeeded
    query keeps the merged record partial with a null value."""
    old = _rec(queries={"a": 1.0, "b": 2.0}, value=3.0)
    new = _rec(queries={"a": None, "b": 1.5}, partial=True)
    got = min_merge_record(new, old)
    assert got["queries"] == {"a": 1.0, "b": 1.5}
    assert got["value"] == 2.5 and "partial" not in got
    got2 = min_merge_record(
        _rec(queries={"a": None}, partial=True), _rec(queries={"b": 9.9})
    )
    assert got2["value"] is None and got2["partial"] is True


def test_errored_entries_never_erase_a_floor():
    old = _rec(queries={"a": 1.0}, reprobe={"r": 2.0})
    new = _rec(queries={"a": None}, reprobe={"r": None, "s": 1.1})
    got = min_merge_record(new, old)
    assert got["queries"] == {"a": 1.0}
    assert got["reprobe"] == {"r": 2.0, "s": 1.1}
    # but a query that has NEVER succeeded stays visible as errored
    got2 = min_merge_record(_rec(queries={"z": None}), _rec(queries={}))
    assert got2["queries"] == {"z": None}
    assert got2["value"] is None


def test_other_scale_or_missing_record_is_ignored():
    new = _rec(queries={"a": 5.0}, value=5.0)
    assert min_merge_record(new, None) is new
    old_sf = _rec(queries={"a": 0.1}, sf=0.001)
    assert min_merge_record(new, old_sf) == new
    assert min_merge_record(new, {"sf": "bogus"}) == new
