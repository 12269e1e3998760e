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

# r13 sampled-window priority. Composition (pinned by
# tests/test_registry_order.py, which recomputes last-green rounds from
# the COMMITTED CORRECTNESS_r01..r12 records — read via `git show` so a
# driver artifact landing in the working tree mid-round can never fail
# the suite):
#   1  flagship (always in-window, green every round)
#   the r13 debut (debut-in-window policy: new queries ship inside the
#      sampled window in the round they are introduced)
#   the 3 changed-definition rows (NEW r13 policy, the r12 VERDICT's top
#      punch-list item: a query whose DECLARED result set or schema
#      changed after its last external green row re-enters the window
#      ahead of staleness fill, so the driver confirms the definition
#      actually shipped — docs_classifier_calibration gained explicit
#      underflow/overflow bins this round; embedding_margin_pairs'
#      cand_cap=32 and parts_copurchase_lift's two-direction schema
#      landed r12 AFTER their r11 greens)
#   the 22 remaining r8-stale rows — the r12 window overflow, the last
#      queries whose most recent driver-green row is r8 (after r13 no
#      declared query's last green row is older than r9)
#   fill: the r9-stale family (TPC-H relational shapes + the r9 debut
#      wave), 48 rows in deterministic (alphabetical) order — the first
#      23 fit the 50-row window, the last 25 directly follow it (first
#      in line for r14)
_R13_WINDOW_PRIORITY = [
    "asof_ttl_overlay",
    # r13 debut
    "embedding_ivf_cell_budget_profile",
    # changed-definition re-window (see above)
    "docs_classifier_calibration", "embedding_margin_pairs",
    "parts_copurchase_lift",
    # the 22 remaining r8-stale rows (r12 VERDICT item 1)
    "embedding_cosine_neardup_lsh", "embedding_hard_negatives",
    "embedding_int8_quant", "embedding_knn_label_eval",
    "embedding_mmr_rerank", "embedding_pc1_outliers",
    "embedding_power_iteration_pc1", "embedding_semdedup_lsh",
    "embedding_silhouette", "events_ab_test", "events_cuped",
    "events_daily_acf", "events_ewma_anomaly", "events_k_anonymity",
    "events_ks_test", "events_markov_removal_effect", "events_psi_drift",
    "events_session_survival", "media_phash_neardup",
    "media_resize_plan", "media_text_pairs", "orders_open_backlog",
    # fill: the r9-stale family, alphabetical
    "customer_order_bracket", "customer_order_distribution",
    "customers_with_orders", "customers_without_orders",
    "disjunctive_part_revenue", "docs_cluster_bcubed",
    "docs_substring_excise_plan", "docs_unigram_lm_train",
    "docs_unigram_segment", "docs_wordpiece_train_merges", "event_gaps",
    "event_type_distinct_users", "events_holt_winters",
    "forecast_revenue", "idle_rich_customers", "large_volume_orders",
    "latest_event_per_user", "lineitem_cube", "market_share",
    "media_doc_dup_clusters", "media_phash_pixels",
    "nation_presence_set_ops", "nation_region_broadcast",
    "nation_volume_shipping", "order_price_stats", "order_priority_check",
    "orders_above_avg", "orders_benford", "orders_grouping_sets",
    "orders_rollup", "premium_lineitems_theta", "pricing_summary",
    "promo_revenue_ratio", "quantity_price_correlation",
    "returned_item_revenue", "returnflag_priority_counts",
    "revenue_by_nation", "shipping_priority", "small_quantity_revenue",
    "top20_lineitems", "top_orders_per_customer", "top_supplier_revenue",
    "trailing_user_activity", "user_event_pivot", "user_event_unpivot",
    "user_running_value", "user_value_exact_stats", "waiting_suppliers",
]

_registry.WINDOW_PRIORITY[:] = _R13_WINDOW_PRIORITY
