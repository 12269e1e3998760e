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


def test_changed_definition_drops_the_old_floor(  # r13 ADVICE item 2
):
    """A floor recorded under a query's OLD definition (its stamp — 0
    when unstamped — predates the change round) is unreachable by the
    new one: min-merging across definitions would trip the reprobe/
    suspect path on every future run. The changed-def key's old entry is
    dropped in EVERY section; the new sweep's timing becomes the first
    floor of the new definition, an old-but-unchanged key still
    min-merges normally, and the written record carries the definition
    stamp."""
    old = _rec(
        queries={"a": 1.0},
        extras={"calib": 0.4, "other": 2.0},
        reprobe={"calib": 0.5},
    )
    new = _rec(queries={"a": 1.2}, extras={"calib": 3.0, "other": 2.5})
    got = min_merge_record(new, old, changed_def_rounds={"calib": 14})
    assert got["extras"] == {"calib": 3.0, "other": 2.0}
    assert got["reprobe"] == {}  # old-definition reprobe floor dropped
    assert got["queries"] == {"a": 1.0}
    assert got["def_rounds"] == {"calib": 14}
    # a changed-def key ABSENT from the new sweep vanishes entirely
    got2 = min_merge_record(
        _rec(queries={"a": 1.2}), old, changed_def_rounds={"calib": 14}
    )
    assert "calib" not in got2["extras"] and "calib" not in got2["reprobe"]


def test_changed_definition_drop_is_idempotent():  # r14 review finding
    """The SECOND sweep of a changed round must min-merge against the
    first sweep's new-definition floor, not re-drop it — without the
    def_rounds stamp, the LAST run's timing (not the min) ended the
    round as the recorded floor whenever ambient drift hit a later run,
    breaking the file's cheapest-demonstrated-cost contract."""
    old = _rec(queries={"a": 1.0}, extras={"calib": 0.4})
    run1 = min_merge_record(
        _rec(queries={"a": 1.1}, extras={"calib": 1.2}),
        old,
        changed_def_rounds={"calib": 14},
    )
    assert run1["extras"] == {"calib": 1.2}  # old-definition floor dropped
    run2 = min_merge_record(
        _rec(queries={"a": 1.0}, extras={"calib": 3.5}),  # ambient 3x run
        run1,
        changed_def_rounds={"calib": 14},
    )
    assert run2["extras"] == {"calib": 1.2}  # new-definition floor holds
    assert run2["def_rounds"] == {"calib": 14}
    # a LATER change round drops again, exactly once
    run3 = min_merge_record(
        _rec(queries={"a": 1.0}, extras={"calib": 2.0}),
        run2,
        changed_def_rounds={"calib": 15},
    )
    assert run3["extras"] == {"calib": 2.0}
    assert run3["def_rounds"] == {"calib": 15}


def test_def_round_stamps_survive_every_write_path():
    """Fresh and incomparable-old records are stamped too, so the NEXT
    merge knows which definitions this file's floors were measured
    under; retired keys are pruned from the stamp map by valid_keys; no
    changed defs means no stamp section is invented."""
    new = _rec(queries={"a": 1.0}, extras={"calib": 2.0})
    got = min_merge_record(
        new,
        None,
        changed_def_rounds={"calib": 14, "retired": 9},
        valid_keys={"a", "calib"},
    )
    assert got["def_rounds"] == {"calib": 14}
    got2 = min_merge_record(
        new, _rec(sf=0.001), changed_def_rounds={"calib": 14}
    )
    assert got2["def_rounds"] == {"calib": 14}
    assert "def_rounds" not in min_merge_record(new, None)


def test_valid_keys_prune_retired_floors():
    """Old-record keys no longer in REGISTRY/OPS are pruned from every
    section (previously only the queries section was restricted), so a
    renamed entry's floor cannot persist forever."""
    old = _rec(
        extras={"retired_query": 0.7, "kept": 1.0},
        variants={"retired_variant": 0.2},
        reprobe={"retired_query": 0.6},
    )
    new = _rec(queries={"a": 1.0}, extras={"kept": 1.5})
    got = min_merge_record(new, old, valid_keys={"a", "kept"})
    assert got["extras"] == {"kept": 1.0}
    assert got["variants"] == {} and got["reprobe"] == {}
    # new-side keys always enter (the sweep only times live entries)
    assert got["queries"] == {"a": 1.0}


def test_headline_only_record_keeps_existing_floors():
    """A headline-only sweep (empty variants/extras/reprobe — the sf1
    mode) must be safe to record: min-merge keeps every existing floor
    in the untouched sections and refreshes the headline from the run."""
    old = _rec(
        queries={"a": 2.0, "b": 2.0},
        extras={"x": 1.0},
        variants={"v": 0.5},
        value=4.0,
        sf=1.0,
    )
    new = _rec(queries={"a": 1.5, "b": 2.5}, sf=1.0)
    got = min_merge_record(new, old)
    assert got["queries"] == {"a": 1.5, "b": 2.0}
    assert got["extras"] == {"x": 1.0} and got["variants"] == {"v": 0.5}
    assert got["value"] == 3.5


def test_harvest_priors_respects_stamps_and_skips_them_as_timings(
    tmp_path, monkeypatch
):
    """The reprobe prior harvest over the local floor records must (a)
    NEVER read the def_rounds stamps as timings (a stamp like 14 would
    look like a plausible 14-second floor under the old regex-the-dump
    approach), (b) skip floors whose stamp predates the key's
    definition-change round, and (c) still min across a driver tail and
    the local record."""
    import json as _json

    import bench

    # every key must be a live REGISTRY/OPS name for the harvest filter
    names = list(bench.REGISTRY)
    a, calib = names[0], names[1]
    monkeypatch.setitem(
        __import__(
            "cupertino_nvr_spark.plans.rotation", fromlist=["x"]
        ).CHANGED_DEF_ROUND,
        calib,
        14,
    )
    local = {
        "sf": 0.1,
        "queries": {a: 2.0},
        "extras": {calib: 0.4},
        "def_rounds": {calib: 13},  # old-definition floor -> unusable
    }
    driver = {"sf": 0.1, "tail": _json.dumps({a: 1.5, calib: 9.0})}
    (tmp_path / "BENCH_LOCAL.json").write_text(_json.dumps(local))
    (tmp_path / "BENCH_r14.json").write_text(_json.dumps(driver))
    got = bench.harvest_priors(0.1, here=tmp_path)
    assert got[a] == 1.5  # min(local 2.0, driver-tail 1.5)
    # calib: local floor stamped r13 < change round 14 -> skipped; the
    # r14 driver tail IS usable -> 9.0, and the def_rounds stamp value
    # (13) must never appear as a timing
    assert got[calib] == 9.0


def test_record_extra_floors_shape():
    """The tool-facing sf1 floor write: a synthetic record whose
    queries are {headline: None} must keep every existing headline floor
    and min-merge the tool's extras."""
    from bench import HEADLINE

    new = {
        "metric": "headline_queries_total_sec",
        "value": None,
        "unit": "sec",
        "queries": {name: None for name in HEADLINE},
        "variants": {},
        "extras": {"embedding_margin_pairs": 29.5},
        "reprobe": {},
        "sf": 1.0,
        "partial": True,
    }
    old = _rec(
        queries={name: 9.9 for name in HEADLINE},
        extras={"embedding_margin_pairs": 31.0, "docs_exact_dedup": 2.4},
        value=9.9 * len(HEADLINE),
        sf=1.0,
    )
    got = min_merge_record(new, old)
    assert got["queries"] == {name: 9.9 for name in HEADLINE}
    assert got["extras"] == {
        "embedding_margin_pairs": 29.5,
        "docs_exact_dedup": 2.4,
    }
    assert got["value"] is not None and "partial" not in got
