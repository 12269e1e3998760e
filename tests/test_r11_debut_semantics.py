"""Semantic invariants of the r11 debut operators — properties the DuckDB
hash oracle can't state (it would accept two engines being wrong the same
way), pinned directly against the definitions.

The curation-increment debut (docs_curation_inc_report) is pinned in
tests/test_incremental_curation.py and the margin-mining debut in
tests/test_similarity_kernels.py; this file covers the IVF+PQ serving
path, the n_probe tuning profile, and the readability score.
"""

from __future__ import annotations

import math
import re

import duckdb
from pyspark.sql import functions as F

from cupertino_nvr_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _dot(a, b):
    # sequential left-fold sum, mirroring the HOF / list_inner_product
    # evaluation order (numpy's pairwise summation can differ in the
    # last ulp)
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def test_ivf_pq_scores_are_true_adc_lookups(spark):
    """Every emitted (probe, neighbor, score) must equal the asymmetric
    distance recomputed from first principles: cosine between the FULL
    probe vector and the neighbor's PQ reconstruction (sum of the four
    per-subspace codeword dots over the norm product) — proving the
    serving path really scores codes, with the exact arithmetic shape
    both engines hash-matched."""
    from cupertino_nvr_spark.plans.llm import (
        _PQ_NSUB,
        _PQ_SUBDIM,
        _pq_assignment,
    )
    from cupertino_nvr_spark.sources.tables import load_table

    rows = REGISTRY["embedding_ivf_pq_ann"].spark(spark, SF).collect()
    assert rows, "no IVF+PQ results at sf0.001"

    emb = load_table(spark, "embeddings", SF)
    cwsub, best = _pq_assignment(emb)
    book = {
        (r["sub_idx"], r["cw_id"]): list(r["csub"]) for r in cwsub.collect()
    }
    codes = {}
    for r in best.collect():
        codes.setdefault(r["vec_id"], {})[r["sub_idx"]] = r["cw_id"]
    probes = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") % 100 == 0).collect()
    }

    for r in rows:
        p = probes[r["probe_id"]]
        pnorm = math.sqrt(_dot(p, p))
        d = cn2 = 0.0
        for s in range(_PQ_NSUB):
            cs = book[(s, codes[r["neighbor_id"]][s])]
            ps = p[s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM]
            d += _dot(ps, cs)
            cn2 += _dot(cs, cs)
        want = d / (math.sqrt(cn2) * pnorm)
        assert abs(r["score"] - want) <= 5e-7, (
            r["probe_id"],
            r["neighbor_id"],
            r["score"],
            want,
        )


def test_ivf_pq_candidates_come_from_the_shared_routing(spark):
    """The IVF+PQ top-k may only contain neighbors reachable through the
    shared n_probe=2 routing stage — the pruning really is the
    embedding_ivf_ann index, not a silent widening."""
    from cupertino_nvr_spark.llm.similarity import ivf_route_candidates
    from cupertino_nvr_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF)
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    allowed = {
        (r["probe_id"], r["member_id"])
        for r in ivf_route_candidates(emb, probes, n_probe=2)
        .select("probe_id", "member_id")
        .collect()
    }
    got = {
        (r["probe_id"], r["neighbor_id"])
        for r in REGISTRY["embedding_ivf_pq_ann"].spark(spark, SF).collect()
    }
    assert got and got <= allowed


def test_ivf_probe_profile_monotone_and_consistent_with_serving_path(spark):
    """The tuning curve's defining properties: candidate cost and recall
    are non-decreasing in n_probe (the n_probe=k candidate set is a
    subset of k+1's by the min_crank slice), and the n_probe=2 point
    must equal the recall of the ACTUAL serving path (ivf_ann_topk at
    n_probe=2) against the same brute-force truth — the profile measures
    the index users query, not a parallel reimplementation."""
    from cupertino_nvr_spark.llm.similarity import brute_force_topk, ivf_ann_topk
    from cupertino_nvr_spark.sources.tables import load_table

    rows = sorted(
        REGISTRY["embedding_ivf_probe_profile"].spark(spark, SF).collect(),
        key=lambda r: r["n_probe"],
    )
    assert [r["n_probe"] for r in rows] == [1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        assert a["total_candidates"] <= b["total_candidates"]
        assert a["recall_at_5"] <= b["recall_at_5"]
    for r in rows:
        assert 0.0 <= r["recall_at_5"] <= 1.0
        assert r["n_hits"] <= r["n_probes"] * 5
        assert abs(
            r["avg_candidates"] - round(r["total_candidates"] / r["n_probes"], 6)
        ) <= 1e-9

    emb = load_table(spark, "embeddings", SF)
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    truth = {
        (r["probe_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, probes, k=5).collect()
    }
    served = {
        (r["probe_id"], r["neighbor_id"])
        for r in ivf_ann_topk(emb, probes, k=5, n_probe=2).collect()
    }
    want = round(len(truth & served) / len(truth), 6)
    got = next(r for r in rows if r["n_probe"] == 2)
    assert got["recall_at_5"] == want
    assert got["n_hits"] == len(truth & served)


def test_readability_matches_python_recompute(spark):
    """Full per-doc recompute of the Flesch pipeline in plain Python
    (independent regex engine, identical IEEE arithmetic): word count,
    vowel-group syllables floored at 1 per word, punctuation-run
    sentences floored at 1, the 206.835/1.015/84.6 formula, and the band
    from the UNROUNDED score."""
    texts = dict(
        duckdb.sql(
            f"select doc_id, text from '{SF}/documents.parquet'"
        ).fetchall()
    )
    rows = {
        r["doc_id"]: r for r in REGISTRY["docs_readability"].spark(spark, SF).collect()
    }
    assert set(rows) == set(texts)
    for doc_id, text in texts.items():
        toks = re.split(r"\s+", text.strip().lower())
        n_words = len(toks)
        n_sent = max(len(re.findall(r"[.!?]+", text)), 1)
        n_syl = sum(max(len(re.findall(r"[aeiouy]+", w)), 1) for w in toks)
        fl = 206.835 - 1.015 * (n_words / n_sent) - 84.6 * (n_syl / n_words)
        band = (
            "very_easy"
            if fl >= 90
            else "easy"
            if fl >= 70
            else "medium"
            if fl >= 50
            else "difficult"
            if fl >= 30
            else "very_difficult"
        )
        r = rows[doc_id]
        assert r["n_words"] == n_words and r["n_sentences"] == n_sent
        assert r["n_syllables"] == n_syl
        assert abs(r["flesch_score"] - fl) <= 5e-5, (doc_id, r["flesch_score"], fl)
        assert r["band"] == band, (doc_id, fl)


def test_copurchase_lift_matches_python_recompute(spark):
    """Full independent recompute of the association-rule mining from the
    raw baskets with collections.Counter: pair/item supports, the >=2
    co-occurrence floor, lift/confidence/support ratios, and the exact
    top-20 ordering (lift desc, then pair ids)."""
    from collections import Counter
    from itertools import combinations

    rows = duckdb.sql(
        f"select distinct l_orderkey, l_partkey from '{SF}/lineitem.parquet'"
    ).fetchall()
    baskets: dict[int, set[int]] = {}
    for ok, pk in rows:
        baskets.setdefault(ok, set()).add(pk)
    n_orders = len(baskets)
    item = Counter()
    both = Counter()
    for parts in baskets.values():
        item.update(parts)
        both.update(combinations(sorted(parts), 2))
    scored = [
        (
            both[p] * n_orders / (item[p[0]] * item[p[1]]),
            p[0],
            p[1],
            both[p],
            item[p[0]],
            item[p[1]],
        )
        for p in both
        if both[p] >= 2
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = scored[:20]

    got = sorted(
        REGISTRY["parts_copurchase_lift"].spark(spark, SF).collect(),
        key=lambda r: r["rank"],
    )
    assert len(got) == len(want) == 20
    for r, (lift, pa, pb, nb, na2, nb2) in zip(got, want):
        assert (r["part_a"], r["part_b"], r["n_both"]) == (pa, pb, nb)
        assert (r["n_a"], r["n_b"]) == (na2, nb2)
        assert abs(r["lift"] - lift) <= 5e-7
        assert abs(r["support"] - nb / n_orders) <= 5e-7
        assert abs(r["confidence_a_to_b"] - nb / na2) <= 5e-7
        assert abs(r["confidence_b_to_a"] - nb / nb2) <= 5e-7


def test_source_quality_report_matches_python_recompute(spark):
    """Full independent recompute of the per-source rollup in plain
    Python: the augmented corpus rebuilt from the base parquet (exact
    %7, tail %11, upper %13, truncated %17 — the shared dedup fixture),
    re-crawl variants attributed to their base source, exact-dup =
    non-minimal doc_id per text digest (hashlib, not SQL md5), Gopher
    gate and Flesch score re-derived per doc, fixed-point mean."""
    import hashlib
    from collections import defaultdict

    from cupertino_nvr_spark.plans.llm import _GOPHER_STOPWORDS, TAIL

    base = duckdb.sql(
        f"select doc_id, text, lang, source from '{SF}/documents.parquet'"
    ).fetchall()
    aug = []
    for did, text, lang, srcname in base:
        aug.append((did, text, srcname))
        if did % 7 == 0:
            aug.append((did + 1000000, text, srcname))
        if did % 11 == 0:
            aug.append((did + 2000000, text + TAIL, srcname))
        if did % 13 == 0:
            aug.append((did + 3000000, text.upper(), srcname))
        if did % 17 == 0:
            toks = re.split(r"\s+", text.strip())
            aug.append((did + 4000000, " ".join(toks[:2]), srcname))
    langs = {did: lang for did, _, lang, _ in base}

    keeper: dict[str, int] = {}
    for did, text, _ in aug:
        h = hashlib.md5(text.encode()).hexdigest()
        keeper[h] = min(keeper.get(h, did), did)

    stops = set(_GOPHER_STOPWORDS)
    per_source = defaultdict(lambda: [0, 0, 0, 0, 0, set()])
    for did, text, srcname in aug:
        toks = re.split(r"\s+", text.strip())
        n_words = len(toks)
        mean_wl = sum(len(w) for w in toks) / n_words
        sym = sum(text.count(c) for c in "#.") / n_words
        alpha = sum(1 for w in toks if re.search(r"[A-Za-z]", w)) / n_words
        n_stop = sum(1 for w in toks if w.lower() in stops)
        passes = (
            50 <= n_words <= 100000
            and 3 <= mean_wl <= 10
            and sym <= 0.1
            and alpha >= 0.8
            and n_stop >= 2
        )
        lt = re.split(r"\s+", text.strip().lower())
        n_sent = max(len(re.findall(r"[.!?]+", text)), 1)
        n_syl = sum(max(len(re.findall(r"[aeiouy]+", w)), 1) for w in lt)
        fl = 206.835 - 1.015 * (len(lt) / n_sent) - 84.6 * (n_syl / len(lt))
        is_dup = keeper[hashlib.md5(text.encode()).hexdigest()] != did
        s = per_source[srcname]
        s[0] += 1
        s[1] += n_words
        s[2] += 1 if is_dup else 0
        s[3] += 1 if passes else 0
        s[4] += round(fl * 10000)
        s[5].add(langs[did % 1000000])

    rows = {
        r["source"]: r
        for r in REGISTRY["docs_source_quality_report"].spark(spark, SF).collect()
    }
    assert set(rows) == set(per_source)
    for srcname, (nd, nt, ndup, npass, fl_sum, ls) in per_source.items():
        r = rows[srcname]
        assert (r["n_docs"], r["n_tokens"], r["n_dups"]) == (nd, nt, ndup)
        assert r["n_langs"] == len(ls)
        assert abs(r["dup_rate"] - ndup / nd) <= 5e-7
        assert abs(r["gopher_pass_rate"] - npass / nd) <= 5e-7
        assert abs(r["avg_flesch"] - fl_sum / 10000 / nd) <= 5e-5, srcname


def test_simhash_neardup_matches_python_recompute(spark):
    """Full independent recompute of the banded simhash pairing: 32-bit
    signatures from hashlib-md5 bit votes over distinct tokens of the
    rebuilt augmented corpus, 4x8-bit banding with the hot cap, pigeonhole
    candidate generation, exact Hamming verification — asserted as SET
    EQUALITY with the query output (the capped definition, so the
    recall/scale trade-off is pinned too, not just the survivors)."""
    import hashlib
    from collections import defaultdict
    from itertools import combinations

    from cupertino_nvr_spark.plans.llm import (
        _SIMHASH_ND_BAND_BITS,
        _SIMHASH_ND_BAND_CAP,
        _SIMHASH_ND_BANDS,
        _SIMHASH_ND_BITS,
        _SIMHASH_ND_TAU,
        TAIL,
    )

    base = duckdb.sql(
        f"select doc_id, text from '{SF}/documents.parquet'"
    ).fetchall()
    aug = []
    for did, text in base:
        aug.append((did, text))
        if did % 7 == 0:
            aug.append((did + 1000000, text))
        if did % 11 == 0:
            aug.append((did + 2000000, text + TAIL))
        if did % 13 == 0:
            aug.append((did + 3000000, text.upper()))
        if did % 17 == 0:
            toks = re.split(r"\s+", text.strip())
            aug.append((did + 4000000, " ".join(toks[:2])))

    def tok_hash(tok: str) -> int:
        return int(hashlib.md5(f"0:{tok}".encode()).hexdigest()[:15], 16)

    sigs = {}
    for did, text in aug:
        votes = [0] * _SIMHASH_ND_BITS
        for tok in set(re.split(r"\s+", text.strip())):
            th = tok_hash(tok)
            for b in range(_SIMHASH_ND_BITS):
                votes[b] += 1 if (th >> b) & 1 else -1
        sigs[did] = sum(1 << b for b in range(_SIMHASH_ND_BITS) if votes[b] >= 0)

    mask = (1 << _SIMHASH_ND_BAND_BITS) - 1
    buckets = defaultdict(list)
    for did, s in sigs.items():
        for b in range(_SIMHASH_ND_BANDS):
            buckets[(b, (s >> (b * _SIMHASH_ND_BAND_BITS)) & mask)].append(did)
    want = {}
    for members in buckets.values():
        if len(members) > _SIMHASH_ND_BAND_CAP:
            continue  # hot band dropped before the self-join
        for x, y in combinations(sorted(members), 2):
            h = bin(sigs[x] ^ sigs[y]).count("1")
            if h <= _SIMHASH_ND_TAU:
                want[(x, y)] = h

    got = {
        (r["id_a"], r["id_b"]): (r["hamming"], r["is_sig_exact"])
        for r in REGISTRY["docs_simhash_neardup"].spark(spark, SF).collect()
    }
    assert set(got) == set(want)
    assert want, "degenerate fixture: no pairs at all"
    for pair, h in want.items():
        assert got[pair] == (h, int(h == 0)), pair
    assert any(h == 0 for h in want.values()), "no exact pairs surfaced"
