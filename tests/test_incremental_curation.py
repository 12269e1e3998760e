"""Incremental curation maintenance == full recompute, exactly, under
arbitrary delta splits — including the two retroactive paths: a
smaller-id delta doc taking over a keepership (displaced keeper's flags
all flip False) and a delta benchmark doc whose 5-grams contaminate an
OLD clean doc through the posting index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cupertino_nvr_spark.llm.curation_inc import (
    init_state,
    merge_delta,
    state_counts,
)
from cupertino_nvr_spark.llm.pipeline import curation_flags, curation_stage_counts

FLAG_COLS = ["is_keeper", "is_nonbench", "is_qual", "is_clean"]


def _flags_dict(df):
    return {
        r["doc_id"]: tuple(r[c] for c in FLAG_COLS)
        for r in df.collect()
    }


def _assert_state_matches_full(spark, state, full_docs):
    expected = _flags_dict(curation_flags(full_docs))
    got = _flags_dict(state.flags)
    assert got == expected
    counts = state_counts(state).collect()[0].asDict()
    full_counts = (
        curation_stage_counts(curation_flags(full_docs)).collect()[0].asDict()
    )
    assert counts == full_counts


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# a diverse 8-token text passes the repetition gate
def _txt(seed: str) -> str:
    return " ".join(f"{seed}{j}" for j in range(8))


def test_synthetic_takeover_and_retro_contamination(spark):
    dup_text = _txt("dup")
    victim_text = _txt("vic")  # doc 9 stays clean until the delta lands
    base_rows = [
        (5, _txt("base5")),
        (7, dup_text),  # keeper of the dup digest (min id so far)
        (9, victim_text),
        (30, dup_text),  # duplicate, never keeper
        (46, _txt("bench46")),  # 46 % 23 == 0: benchmark slice
    ]
    # delta: id 3 takes over the dup keepership; id 100 is one more dup;
    # id 115 (= 23*5) is a NEW benchmark doc sharing victim_text's grams
    delta_rows = [
        (3, dup_text),
        (100, dup_text),
        (115, victim_text),
        (101, _txt("fresh")),
    ]
    base = _mk(spark, base_rows)
    delta = _mk(spark, delta_rows)
    full = _mk(spark, base_rows + delta_rows)

    state0 = init_state(base)
    # before the delta: 7 keeps the dup digest, 9 is clean
    f0 = _flags_dict(state0.flags)
    assert f0[7] == (True, True, True, True)
    assert f0[30] == (False, False, False, False)
    assert f0[9] == (True, True, True, True)

    state1 = merge_delta(state0, delta)
    f1 = _flags_dict(state1.flags)
    # takeover: 3 is the new keeper, 7 flipped all-False
    assert f1[3] == (True, True, True, True)
    assert f1[7] == (False, False, False, False)
    # retroactive contamination: 9 is still a qual keeper but no longer
    # clean (115's benchmark grams cover its text)
    assert f1[9] == (True, True, True, False)
    # the benchmark doc duplicates 9's text (9 keeps the digest) and a
    # benchmark doc never passes the non-benchmark stage anyway
    assert f1[115] == (False, False, False, False)

    _assert_state_matches_full(spark, state1, full)


def test_postings_pruned_to_live_clean_docs(spark):
    """Posting-index lifecycle: is_clean is one-way, so the index must
    hold exactly the CURRENTLY-CLEAN docs after every merge — displaced
    keepers and retroactively-contaminated docs lose their postings the
    round they flip, and a long delta sequence accumulates no dead
    postings (the index stays O(live clean docs), never O(history))."""
    dup_text = _txt("dup")
    victim_text = _txt("vic")
    state = init_state(
        _mk(spark, [(7, dup_text), (9, victim_text), (11, _txt("a"))])
    )
    # displacement (3 takes dup digest from 7) + retro contamination
    # (115 benchmarks victim_text, flipping 9)
    state = merge_delta(
        state, _mk(spark, [(3, dup_text), (115, victim_text)])
    )
    state = merge_delta(state, _mk(spark, [(200, _txt("b"))]))
    posted = {r["doc_id"] for r in state.postings.select("doc_id").distinct().collect()}
    clean = {r["doc_id"] for r in state.flags.filter("is_clean").collect()}
    assert posted == clean  # every clean doc indexed, nothing else
    assert 7 not in posted and 9 not in posted  # flipped docs pruned
    # exact bound: index rows == sum of distinct grams over clean docs
    n_grams = (
        _mk(spark, [(3, dup_text), (11, _txt("a")), (200, _txt("b"))])
        .select(F.explode(F.array_distinct(F.split(F.lower("text"), " "))))
        .count()
    )  # 8-token texts -> 4 distinct 5-grams each; sanity via direct count
    assert state.postings.count() == 3 * 4
    assert n_grams == 3 * 8


def test_reseen_delta_ids_raise(spark):
    """merge_delta maintains a grow-only corpus: a delta re-using an id
    already in the state must raise loudly (a silent union would
    duplicate the flag row and skew every count), and check_new_ids=False
    documents the pre-validated opt-out."""
    state = init_state(_mk(spark, [(1, _txt("a")), (2, _txt("b"))]))
    with pytest.raises(ValueError, match="re-uses doc_ids"):
        merge_delta(state, _mk(spark, [(2, _txt("c")), (3, _txt("d"))]))


def test_three_way_split_matches_full(spark):
    rows = [(i, _txt(f"s{i % 11}m")) for i in range(1, 61)] + [
        (200 + i, _txt(f"x{i}")) for i in range(10)
    ]
    full = _mk(spark, rows)
    a, b, c = rows[:20], rows[20:45], rows[45:]
    state = init_state(_mk(spark, a))
    state = merge_delta(state, _mk(spark, b))
    state = merge_delta(state, _mk(spark, c))
    _assert_state_matches_full(spark, state, full)


@pytest.mark.parametrize("frac", [0.33, 0.66])
def test_augmented_corpus_reverse_split_matches_full(spark, frac):
    """The augmented sf0.001 corpus split with the LARGE ids (the
    synthetic duplicate copies) landing FIRST: the originals then arrive
    as a delta of SMALLER ids and take over every duplicated digest —
    the takeover path at corpus scale."""
    from cupertino_nvr_spark.plans.llm import augmented_docs

    docs = augmented_docs(spark, "/root/testdata/sf0.001").select(
        "doc_id", "text"
    )
    cut = int(1000000 * (0.5 + frac))  # splits inside the cloned-id bands
    first = docs.filter(F.col("doc_id") >= cut)
    second = docs.filter(F.col("doc_id") < cut)
    state = merge_delta(init_state(first), second)
    _assert_state_matches_full(spark, state, docs)
