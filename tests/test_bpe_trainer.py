"""Golden test for the distributed BPE trainer: the Spark 6-round result
must equal a straightforward in-memory reference implementation of
Sennrich-style BPE (weighted overlapping pair counts over the word-freq
table, lexicographic tie-break, greedy left-to-right merge application)
on a corpus that includes the overlapping-run trap ("aaaa" must merge to
[aa, aa], not [aa, a, a] — the case the doubled-boundary string-replace
encoding exists to get right)."""

from __future__ import annotations

from collections import Counter

from cupertino_nvr_spark.plans import REGISTRY
from cupertino_nvr_spark.plans.llm import _BPE_MERGES

TOY_TEXT = (
    "low low low low low lower lower "
    "newest newest newest newest newest newest "
    "widest widest widest aaaa aaaa aaaa aaaa aaaa aaaa aaaa"
)


def _reference_bpe(words: dict[str, int], k: int):
    state = {tuple(w): f for w, f in words.items()}
    merges = []
    for _ in range(k):
        counts: Counter = Counter()
        for syms, f in state.items():
            for j in range(len(syms) - 1):
                counts[(syms[j], syms[j + 1])] += f
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, l + r, cnt))
        new_state: dict[tuple, int] = {}
        for syms, f in state.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            key = tuple(out)
            new_state[key] = new_state.get(key, 0) + f
        state = new_state
    return merges


def test_bpe_trainer_matches_reference(spark, tmp_path):
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, TOY_TEXT, "en", "toy", len(TOY_TEXT))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = [
        (r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in REGISTRY["docs_bpe_train_merges"]
        .spark(spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    words = Counter(TOY_TEXT.split())
    expected = _reference_bpe(dict(words), _BPE_MERGES)
    assert got == expected
    # the overlap trap is actually exercised: "aaaa" x7 makes (a, a) the
    # top first merge with OVERLAPPING count 3 per word...
    assert got[0] == ("a", "a", "aa", 21)
    # ...and greedy application leaves [aa, aa], so round 2's (aa, aa)
    # count is 7 — a fold that merged [aa, a, a] would report (aa, a)
    assert ("aa", "aa", "aaaa", 7) in got
