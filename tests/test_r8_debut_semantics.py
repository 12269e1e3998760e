"""Semantic invariants of the r8 debut operators — properties the DuckDB
hash oracle can't state (it would accept two engines being wrong the same
way), pinned directly against the definitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from cupertino_nvr_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_substring_dup_spans_exact_copies_fully_duplicated(spark):
    """An exact copy shares EVERY k-token window with its source, so both
    rows of the pair must have dup_gram_frac == 1.0 (when they have any
    windows at all)."""
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["docs_substring_dup_spans"].spark(spark, SF).collect()
    }
    pairs = [
        (i, i + 1000000)
        for i in rows
        if i < 1000000 and i % 7 == 0 and (i + 1000000) in rows
    ]
    assert pairs
    checked = 0
    for a, b in pairs:
        if rows[a]["n_grams"] > 0:
            assert rows[a]["dup_gram_frac"] == 1.0, a
            assert rows[b]["dup_gram_frac"] == 1.0, b
            assert rows[a]["first_dup_pos"] == 1
            checked += 1
    assert checked > 0


def test_gopher_gate_is_conjunction_of_rules(spark):
    for r in REGISTRY["docs_gopher_quality"].spark(spark, SF).collect():
        expect = int(
            50 <= r["n_words"] <= 100000
            and 3 <= r["mean_word_len"] <= 10
            and r["symbol_ratio"] <= 0.1
            and r["alpha_word_ratio"] >= 0.8
            and r["n_stopwords"] >= 2
        )
        assert r["passes_gopher"] == expect, r


def test_classifier_label_matches_sign_and_prob_is_monotone(spark):
    rows = REGISTRY["docs_classifier_score"].spark(spark, SF).collect()
    for r in rows:
        assert r["label_keep"] == int(r["raw_score"] >= 0)
        assert 0.0 < r["keep_prob"] < 1.0
    by_raw = sorted(rows, key=lambda r: r["raw_score"])
    probs = [r["keep_prob"] for r in by_raw]
    assert probs == sorted(probs), "fast-sigmoid must be monotone in raw_score"


def test_media_text_pairs_top1_and_gate(spark):
    rows = REGISTRY["media_text_pairs"].spark(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["media_id"] % 5 == 0
        assert r["caption_id"] % 5 != 0
        assert r["media_id"] // 20 == r["caption_id"] // 20  # same page
        assert r["sim"] >= 0.1
        assert r["media_id"] not in seen  # one best caption per media
        seen.add(r["media_id"])


def test_hybrid_rrf_ranks_are_dense_and_docs_unique(spark):
    rows = REGISTRY["docs_hybrid_rrf_search"].spark(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {1, 2, 3}
    for q, rs in by_q.items():
        ranks = sorted(r["fused_rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1)), q
        docs = [r["doc_id"] for r in rs]
        assert len(docs) == len(set(docs)), q
        # a doc present in both legs must outscore one with a single,
        # equal-rank contribution — spot-check the rrf formula itself
        for r in rs:
            want = (1 / (60 + r["bm25_rank"]) if r["bm25_rank"] else 0.0) + (
                1 / (60 + r["ann_rank"]) if r["ann_rank"] else 0.0
            )
            assert abs(r["rrf_score"] - want) < 1e-12


def test_ab_test_variants_partition_users(spark):
    from cupertino_nvr_spark.llm.dedup import md5_int
    from cupertino_nvr_spark.sources.tables import load_table

    ab = {
        r["event_type"]: r for r in REGISTRY["events_ab_test"].spark(spark, SF).collect()
    }
    ev = load_table(spark, "events", SF)
    truth = {
        r["event_type"]: (r["n0"], r["n1"])
        for r in ev.select(
            "event_type",
            "user_id",
            (md5_int(F.col("user_id").cast("string"), seed=23) % 2).alias("v"),
        )
        .distinct()
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).alias("n0"),
            F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).alias("n1"),
        )
        .collect()
    }
    for et, r in ab.items():
        assert (r["n0"], r["n1"]) == truth[et], et


def test_knn_label_eval_votes_bounded(spark):
    rows = REGISTRY["embedding_knn_label_eval"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["votes"] <= 5
        assert r["correct"] == int(r["predicted_label"] == r["true_label"])


def test_pc1_is_unit_norm_and_outlier_gate_consistent(spark):
    import math

    pc1 = REGISTRY["embedding_power_iteration_pc1"].spark(spark, SF).collect()
    assert len(pc1) == 64
    norm = math.sqrt(sum(r["loading"] ** 2 for r in pc1))
    assert abs(norm - 1.0) < 1e-6  # loadings rounded to 9 decimals
    out = REGISTRY["embedding_pc1_outliers"].spark(spark, SF).collect()
    for r in out:
        assert r["is_outlier"] == int(abs(r["z"]) >= 2.5) or abs(abs(r["z"]) - 2.5) < 1e-5
    assert any(r["is_outlier"] == 1 for r in out)


# ---- late r8 debuts II ----------------------------------------------------


def test_silhouette_bounds_and_membership_matches_kmeans(spark):
    """Silhouette values live in [-1, 1] by construction, cluster means sit
    inside their own [min, max], and the evaluated clustering IS the
    registered embedding_kmeans one: same cells, same member counts."""
    sil = {
        r["cell_id"]: r
        for r in REGISTRY["embedding_silhouette"].spark(spark, SF).collect()
    }
    assert sil
    for r in sil.values():
        assert -1.0 <= r["min_sil"] <= r["mean_sil"] <= r["max_sil"] <= 1.0, r
    km = REGISTRY["embedding_kmeans"].spark(spark, SF).collect()
    sizes: dict[int, int] = {}
    for r in km:
        sizes[r["cell_id"]] = r["cell_size"]
    assert set(sil) == set(sizes)
    for cell, r in sil.items():
        assert r["n_members"] == sizes[cell], cell
    assert sum(r["n_members"] for r in sil.values()) == len(km)


def test_filter_attribution_recomputes_from_registered_filters(spark):
    c4 = {
        r["doc_id"]: r["passes_c4"]
        for r in REGISTRY["docs_c4_filters"].spark(spark, SF).collect()
    }
    gq = {
        r["doc_id"]: r["passes_gopher"]
        for r in REGISTRY["docs_gopher_quality"].spark(spark, SF).collect()
    }
    cl = {
        r["doc_id"]: r["label_keep"]
        for r in REGISTRY["docs_classifier_score"].spark(spark, SF).collect()
    }
    flags = {d: (c4[d], gq[d], cl[d]) for d in c4}
    n_docs = len(flags)
    expect = {
        "c4": (
            sum(1 for f in flags.values() if not f[0]),
            sum(1 for f in flags.values() if not f[0] and f[1] and f[2]),
        ),
        "gopher": (
            sum(1 for f in flags.values() if not f[1]),
            sum(1 for f in flags.values() if f[0] and not f[1] and f[2]),
        ),
        "classifier": (
            sum(1 for f in flags.values() if not f[2]),
            sum(1 for f in flags.values() if f[0] and f[1] and not f[2]),
        ),
    }
    n_pass_all = sum(1 for f in flags.values() if all(f))
    out = REGISTRY["docs_filter_attribution"].spark(spark, SF).collect()
    assert len(out) == 3
    for r in out:
        nf, ns = expect[r["rule"]]
        assert r["n_failed"] == nf, r
        assert r["n_sole_failed"] == ns, r
        assert r["n_sole_failed"] <= r["n_failed"]
        assert r["n_docs"] == n_docs and r["n_pass_all"] == n_pass_all
        assert abs(r["fail_share"] - nf / n_docs) < 1e-6


def test_retrieval_rbo_matches_python_recompute(spark):
    """Truncated RBO recomputed in pure Python from the two top-10 legs
    (the same legs the hybrid fuses) must match within rounding, and the
    measures must respect their ranges."""
    from cupertino_nvr_spark.llm.pipeline import bm25_scores
    from cupertino_nvr_spark.llm.similarity import brute_force_topk
    from cupertino_nvr_spark.plans.llm import _BM25_QUERIES
    from cupertino_nvr_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    emb = load_table(spark, "embeddings", SF)
    queries = spark.createDataFrame(_BM25_QUERIES, "query_id int, term string")
    sparse: dict[int, dict[int, int]] = {}
    for r in bm25_scores(docs, queries, k1=1.25, b=0.75, top_k=10).collect():
        sparse.setdefault(r["query_id"], {})[r["doc_id"]] = r["rank"]
    probes = emb.filter(F.col("vec_id").isin(100, 200, 300))
    dense: dict[int, dict[int, int]] = {}
    for r in brute_force_topk(emb, probes, k=10).collect():
        dense.setdefault(r["probe_id"] // 100, {})[r["neighbor_id"]] = r["rank"]
    out = {r["query_id"]: r for r in REGISTRY["docs_retrieval_rbo"].spark(spark, SF).collect()}
    assert set(out) == set(sparse)
    for q, r in out.items():
        s, d = sparse[q], dense.get(q, {})
        common = set(s) & set(d)
        assert r["overlap_10"] == len(common), q
        assert 0 <= r["rbo_10"] <= 1.0
        rbo = sum(
            round(0.1 * 0.9 ** (dep - 1) / dep, 9)
            * sum(1 for doc in common if max(s[doc], d[doc]) <= dep)
            for dep in range(1, 11)
        )
        assert abs(r["rbo_10"] - rbo) < 2e-6, (q, r["rbo_10"], rbo)


def test_packing_efficiency_consistent_with_packing_plan(spark):
    """At seq_len 512 the report must agree with docs_sequence_packing:
    per-shard sequence counts derive from the same token totals, and the
    identity total_tokens + pad_tokens == n_seqs * seq_len holds for
    every candidate length."""
    pack = REGISTRY["docs_sequence_packing"].spark(spark, SF).collect()
    shard_toks: dict[int, int] = {}
    for r in pack:
        shard_toks[r["shard"]] = shard_toks.get(r["shard"], 0) + r["n_tok"]
    out = {r["seq_len"]: r for r in REGISTRY["docs_packing_efficiency"].spark(spark, SF).collect()}
    assert set(out) == {128, 256, 512, 1024}
    for L, r in out.items():
        n_seqs = sum((t + L - 1) // L for t in shard_toks.values())
        assert r["n_seqs"] == n_seqs, L
        assert r["total_tokens"] == sum(shard_toks.values())
        assert r["total_tokens"] + r["pad_tokens"] == r["n_seqs"] * L
        assert abs(r["efficiency"] - r["total_tokens"] / (n_seqs * L)) < 1e-6
        assert r["n_shards"] == len(shard_toks)


def test_ewma_anomaly_forecast_is_weighted_mean_of_prior_days(spark):
    """The EWMA forecast must lie within [min, max] of the 13 strictly-
    prior daily totals it averages, the flag must equal the threshold
    rule, and a day must never see >13 prior days."""
    from cupertino_nvr_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF)
    daily = {
        (r["event_type"], r["day"]): r["total_value"]
        for r in ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value")
        )
        .collect()
    }
    out = REGISTRY["events_ewma_anomaly"].spark(spark, SF).collect()
    assert out
    import datetime

    for r in out:
        prior = [
            v
            for (t, d), v in daily.items()
            if t == r["event_type"]
            and datetime.timedelta(days=0)
            < r["day"] - d
            <= datetime.timedelta(days=13)
        ]
        assert 0 < len(prior) <= 13
        assert len(prior) == r["n_prev"], r
        assert min(prior) - 1e-6 <= r["ewma_prev"] <= max(prior) + 1e-6, r
        assert r["is_anomaly"] == int(abs(r["pct_dev"]) > 0.5), r


def test_vocab_coverage_monotone_and_consistent_with_topk(spark):
    """Coverage must be monotone non-decreasing in top_n, bounded by 1,
    and the top-10 numerator must equal the sum of docs_vocab_topk's
    top-10 counts (the two queries share the rank rule: count desc,
    term asc)."""
    cov = {
        r["top_n"]: r
        for r in REGISTRY["docs_vocab_coverage"].spark(spark, SF).collect()
    }
    assert sorted(cov) == [10, 100, 1000]
    total = {r["total_tokens"] for r in cov.values()}
    assert len(total) == 1
    prev = 0
    for n in (10, 100, 1000):
        r = cov[n]
        assert r["covered_tokens"] >= prev
        assert 0.0 < r["coverage"] <= 1.0
        assert abs(r["coverage"] - r["covered_tokens"] / r["total_tokens"]) < 1e-6
        prev = r["covered_tokens"]
    topk = REGISTRY["docs_vocab_topk"].spark(spark, SF).collect()
    top10 = sum(r["n"] for r in topk if r["rank"] <= 10)
    assert cov[10]["covered_tokens"] == top10


def test_markov_removal_effect_shares_sum_to_one_and_probs_bounded(spark):
    """Attribution shares must sum to 1 (the normalization is the whole
    point of removal-effect credit), every absorption probability must be
    a probability, and removing a channel can only reduce conversion
    (removal_effect >= 0) because redirected mass lands in NULL, an
    absorbing non-converting state."""
    rows = REGISTRY["events_markov_removal_effect"].spark(spark, SF).collect()
    assert {r["channel"] for r in rows} == {"click", "error", "signup", "view"}
    p_full = {r["p_conv"] for r in rows}
    assert len(p_full) == 1
    p = p_full.pop()
    assert 0.0 < p < 1.0
    for r in rows:
        assert 0.0 <= r["p_conv_removed"] <= p + 1e-9, r
        assert r["removal_effect"] >= 0.0, r
    assert abs(sum(r["attribution_share"] for r in rows) - 1.0) < 1e-4


def test_psi_contribs_nonneg_and_masses_reconcile(spark):
    """Every PSI contribution is (p-q)*ln(p/q) >= 0 (the factors share
    sign), the per-type total is the sum of its bucket contributions, and
    the bucket masses partition the per-period event counts exactly."""
    from cupertino_nvr_spark.sources.tables import load_table

    rows = REGISTRY["events_psi_drift"].spark(spark, SF).collect()
    assert rows
    ev = load_table(spark, "events", SF)
    split = F.lit("2024-01-16").cast("timestamp")
    truth = {
        r["event_type"]: (r["ref"], r["cur"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.when(F.col("ts") < split, 1)).alias("ref"),
            F.count(F.when(F.col("ts") >= split, 1)).alias("cur"),
        )
        .collect()
    }
    by_type: dict[str, list] = {}
    for r in rows:
        assert 0 <= r["bucket"] <= 9
        assert r["psi_contrib"] >= 0.0, r
        by_type.setdefault(r["event_type"], []).append(r)
    assert set(by_type) == set(truth)
    for t, rs in by_type.items():
        assert sum(r["ref_n"] for r in rs) == truth[t][0]
        assert sum(r["cur_n"] for r in rs) == truth[t][1]
        total = {r["psi_total"] for r in rs}
        assert len(total) == 1
        assert abs(total.pop() - sum(r["psi_contrib"] for r in rs)) < 1e-4


def test_ks_matches_python_recompute(spark):
    """D recomputed in Python over the same 0.1 grid must match, and the
    statistic family must be internally consistent."""
    from collections import defaultdict
    import hashlib
    import math

    from cupertino_nvr_spark.sources.tables import load_table

    out = {r["event_type"]: r for r in REGISTRY["events_ks_test"].spark(spark, SF).collect()}
    ev = load_table(spark, "events", SF).select("event_type", "user_id", "value").collect()
    counts: dict[str, dict[float, list[int]]] = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in ev:
        h = hashlib.md5(f"23:{r['user_id']}".encode()).hexdigest()
        variant = int(h[:15], 16) % 2
        # Spark round() is HALF_UP on the double's decimal expansion
        from decimal import Decimal, ROUND_HALF_UP

        v = float(Decimal(repr(r["value"])).quantize(Decimal("0.1"), ROUND_HALF_UP))
        counts[r["event_type"]][v][variant] += 1
    for t, grid in counts.items():
        n0 = sum(c[0] for c in grid.values())
        n1 = sum(c[1] for c in grid.values())
        cum0 = cum1 = 0
        d_num = 0
        for v in sorted(grid):
            cum0 += grid[v][0]
            cum1 += grid[v][1]
            d_num = max(d_num, abs(cum0 * n1 - cum1 * n0))
        d = d_num / (n0 * n1)
        r = out[t]
        assert (r["n0"], r["n1"]) == (n0, n1), t
        assert abs(r["d_stat"] - d) < 2e-6, t
        m = n0 * n1 / (n0 + n1)
        assert abs(r["ks_stat"] - d * math.sqrt(m)) < 1e-5
        assert abs(r["p_approx"] - min(1.0, 2 * math.exp(-2 * d * d * m))) < 1e-5
        assert 0.0 <= r["d_stat"] <= 1.0


def test_hard_negatives_labels_differ_and_match_numpy(spark):
    """No emitted neighbor may share the probe's label, ranks are dense
    1..5 by sim desc, and the pair set matches a NumPy brute-force
    recompute of top-5 different-label cosine neighbors."""
    import numpy as np

    from cupertino_nvr_spark.sources.tables import load_table

    rows = REGISTRY["embedding_hard_negatives"].spark(spark, SF).collect()
    assert rows
    per_probe: dict[int, list] = {}
    for r in rows:
        assert r["neighbor_label"] != r["true_label"], r
        assert r["neighbor_id"] != r["probe_id"]
        per_probe.setdefault(r["probe_id"], []).append(r)
    emb = load_table(spark, "embeddings", SF).collect()
    vecs = {r["vec_id"]: (np.array(r["embedding"], dtype=np.float64), r["label"]) for r in emb}
    for pid, rs in per_probe.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        sims = [r["sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
        pv, plabel = vecs[pid]
        scored = []
        for nid, (cv, clabel) in vecs.items():
            if nid == pid or clabel == plabel:
                continue
            sim = round(float(pv @ cv / (np.linalg.norm(pv) * np.linalg.norm(cv))), 6)
            scored.append((-sim, nid))
        scored.sort()
        expect = [nid for _, nid in scored[: len(rs)]]
        assert [r["neighbor_id"] for r in rs] == expect, pid


def test_mmr_ranks_dense_scores_nonincreasing_and_rank1_is_top1(spark):
    """MMR's selected-score sequence is non-increasing from rank 2 on
    (each candidate's max-sim penalty only grows as the picked set
    grows; rank 1 carries no penalty, and a NEGATIVE max pair cosine can
    legitimately lift a later score above lambda*relevance), ranks are
    dense 1..5 with distinct neighbors, and the first pick is the plain
    relevance argmax."""
    rows = REGISTRY["embedding_mmr_rerank"].spark(spark, SF).collect()
    assert rows
    per_probe: dict[int, list] = {}
    for r in rows:
        per_probe.setdefault(r["probe_id"], []).append(r)
    top1 = {
        r["probe_id"]: r["neighbor_id"]
        for r in REGISTRY["embedding_cosine_topk"].spark(spark, SF).collect()
        if r["rank"] == 1 and r["probe_id"] in per_probe
    }
    for pid, rs in per_probe.items():
        rs.sort(key=lambda r: r["mmr_rank"])
        assert [r["mmr_rank"] for r in rs] == [1, 2, 3, 4, 5]
        assert len({r["neighbor_id"] for r in rs}) == 5
        scores = [r["mmr_score"] for r in rs[1:]]
        assert all(a >= b - 1e-12 for a, b in zip(scores, scores[1:])), pid
        assert rs[0]["neighbor_id"] == top1[pid], pid
        assert abs(rs[0]["mmr_score"] - 0.7 * rs[0]["relevance"]) < 1e-12


def test_k_anonymity_flags_and_fraction_reconcile(spark):
    """The violation flag must equal n_users < 5 row-by-row, class user
    counts must be positive and <= row counts, and the per-type
    violation fraction must equal the recomputed ratio of violating-
    class rows to total rows."""
    rows = REGISTRY["events_k_anonymity"].spark(spark, SF).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert r["violates_k"] == int(r["n_users"] < 5)
        assert 0 < r["n_users"] <= r["n_rows"]
        assert 0 <= r["hour_of_day"] <= 23
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        viol = sum(r["n_rows"] for r in rs if r["violates_k"])
        tot = sum(r["n_rows"] for r in rs)
        frac = {r["type_violation_frac"] for r in rs}
        assert len(frac) == 1
        assert abs(frac.pop() - viol / tot) < 1e-6, t


def test_daily_acf_matches_python_recompute(spark):
    """ACF recomputed in Python over the same daily rollup must match to
    the 9-decimal rounding, pair counts must reflect the calendar lag,
    and |acf| <= 1."""
    from collections import defaultdict
    import datetime
    import math

    from cupertino_nvr_spark.sources.tables import load_table

    out = {
        (r["event_type"], r["lag"]): r
        for r in REGISTRY["events_daily_acf"].spark(spark, SF).collect()
    }
    assert out
    ev = load_table(spark, "events", SF)
    daily = defaultdict(dict)
    for r in (
        ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("t"))
        .collect()
    ):
        daily[r["event_type"]][r["d"]] = r["t"]
    for (et, lag), r in out.items():
        series = daily[et]
        xs, ys = [], []
        for d, x in series.items():
            d2 = d + datetime.timedelta(days=lag)
            if d2 in series:
                xs.append(x)
                ys.append(series[d2])
        n = len(xs)
        assert r["n_pairs"] == n, (et, lag)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
        denom = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        assert abs(r["acf"] - (n * sxy - sx * sy) / denom) < 1e-6, (et, lag)
        assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9


def test_pmi_collocations_match_python_recompute(spark):
    """The emitted top-20 must equal a Python recompute of PMI over the
    same token stream (count floor, rounding and tie rule included)."""
    import math

    from cupertino_nvr_spark.sources.tables import load_table

    rows = REGISTRY["docs_pmi_collocations"].spark(spark, SF).collect()
    assert 0 < len(rows) <= 20
    docs = load_table(spark, "documents", SF).select("text").collect()
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    n_bi = 0
    for r in docs:
        toks = r["text"].strip().lower().split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            n_bi += 1
    n_tok = sum(uni.values())
    scored = []
    for (a, b), c in bi.items():
        if c < 5:
            continue
        pmi = round(
            math.log((c * 1.0 / n_bi) / ((uni[a] * 1.0 / n_tok) * (uni[b] * 1.0 / n_tok))),
            6,
        )
        scored.append((-pmi, a, b, c))
    scored.sort()
    want = [(a, b, c, -np) for np, a, b, c in scored[: len(rows)]]
    got = [(r["w1"], r["w2"], r["c_xy"], r["pmi"]) for r in rows]
    assert got == want
    for r in rows:
        assert r["c_xy"] >= 5
        assert r["c_x"] == uni[r["w1"]] and r["c_y"] == uni[r["w2"]]


def test_session_survival_matches_lifelines_style_recompute(spark):
    """KM recomputed independently in Python (product-limit over the
    same duration/censoring marks) must match; the curve must be
    non-increasing from 1 toward 0 and at-risk counts must telescope."""
    import math

    from cupertino_nvr_spark.plans.temporal import _KM_GAP_US
    from cupertino_nvr_spark.sources.tables import load_table

    out = sorted(
        REGISTRY["events_session_survival"].spark(spark, SF).collect(),
        key=lambda r: r["t_sec"],
    )
    assert out
    sess = REGISTRY["sessionize_events"].spark(spark, SF).collect()
    ev = load_table(spark, "events", SF)
    max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    marks = []
    for s in sess:
        dur = int(math.floor(s["duration_sec"]))
        end_us = int(s["session_end"].timestamp() * 1_000_000)
        marks.append((dur, int(max_us - end_us < _KM_GAP_US)))
    from collections import Counter

    d_cnt = Counter(d for d, c in marks if c == 0)
    c_cnt = Counter(d for d, c in marks if c == 1)
    total = len(marks)
    grid = sorted(set(d for d, _ in marks))
    s_val, removed = 1.0, 0
    expect = {}
    for t in grid:
        at_risk = total - removed
        d = d_cnt.get(t, 0)
        if d:
            s_val *= 1.0 - d / at_risk
            expect[t] = (at_risk, d, c_cnt.get(t, 0), s_val)
        removed += d + c_cnt.get(t, 0)
    assert [r["t_sec"] for r in out] == sorted(expect)
    prev = 1.0
    for r in out:
        ar, d, c, sv = expect[r["t_sec"]]
        assert (r["n_at_risk"], r["n_events"], r["n_censored"]) == (ar, d, c)
        assert abs(r["survival"] - sv) < 1e-5, r["t_sec"]
        assert 0.0 <= r["survival"] <= prev + 1e-9
        prev = r["survival"]


def test_benford_fractions_and_chisq_reconcile(spark):
    """Digits must cover a subset of 1..9, observed fractions must sum
    to 1, expectations must be log10(1+1/d), and the chi-square total
    must equal the contribution sum."""
    import math

    rows = REGISTRY["orders_benford"].spark(spark, SF).collect()
    assert rows
    assert all(1 <= r["digit"] <= 9 for r in rows)
    assert abs(sum(r["obs_frac"] for r in rows) - 1.0) < 1e-4
    total = {r["chisq_total"] for r in rows}
    assert len(total) == 1
    assert abs(total.pop() - sum(r["chisq_contrib"] for r in rows)) < 1e-4
    n_all = sum(r["n"] for r in rows)
    for r in rows:
        assert abs(r["benford_frac"] - math.log10(1 + 1 / r["digit"])) < 1e-6
        assert abs(r["obs_frac"] - r["n"] / n_all) < 1e-6
        assert r["chisq_contrib"] >= 0.0
