"""Golden test for the distributed WordPiece trainer: the Spark 6-round
result must equal an in-memory reference of the published objective —
merge the adjacent pair maximizing count(xy)/(count(x)count(y)), with the
ratio as fixed-point micro-nats and (l, r) tiebreak — on a corpus where
the likelihood winner DIFFERS from the raw-frequency (BPE) winner, so the
test actually distinguishes the two trainers."""

from __future__ import annotations

import math
from collections import Counter

from cupertino_nvr_spark.plans import REGISTRY
from cupertino_nvr_spark.plans.llm import _WP_MERGES

# 'qz' appears rarely but q and z appear ONLY together -> top WordPiece
# score; 'an' has the highest raw count but a/n occur apart everywhere ->
# BPE's winner, not WordPiece's. "aaaa" keeps the overlap trap exercised.
TOY_TEXT = (
    "banana banana banana bandana an an an an an na na "
    "qz qz qz aaaa aaaa aaaa"
)


def _micro(c: int, a: int, b: int) -> int:
    x = (math.log(c) - math.log(a) - math.log(b)) * 1_000_000
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _reference_wordpiece(words: dict[str, int], k: int):
    state = {tuple(w): f for w, f in words.items()}
    merges = []
    for _ in range(k):
        pair_c: Counter = Counter()
        sym_c: Counter = Counter()
        for syms, f in state.items():
            for s in syms:
                sym_c[s] += f
            for j in range(len(syms) - 1):
                pair_c[(syms[j], syms[j + 1])] += f
        if not pair_c:
            break
        scored = {
            (l, r): _micro(c, sym_c[l], sym_c[r]) for (l, r), c in pair_c.items()
        }
        (l, r), sc = min(
            scored.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, l + r, pair_c[(l, r)], sc))
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


def test_wordpiece_trainer_matches_reference(spark, tmp_path):
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, TOY_TEXT, "en", "toy", len(TOY_TEXT))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = [
        (r.left_sym, r.right_sym, r.merged, r.pair_count, r.score_micro)
        for r in REGISTRY["docs_wordpiece_train_merges"]
        .spark(spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    words = Counter(TOY_TEXT.split())
    expected = _reference_wordpiece(dict(words), _WP_MERGES)
    assert got == expected
    # the objective actually differs from BPE: q and z occur ONLY
    # together, so (q, z) wins round 1 despite its low raw count...
    assert got[0][:3] == ("q", "z", "qz")
    # ...while raw frequency would pick something else entirely
    pair_c: Counter = Counter()
    for w, f in words.items():
        for j in range(len(w) - 1):
            pair_c[(w[j], w[j + 1])] += f
    bpe_winner = min(pair_c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert bpe_winner != ("q", "z")
