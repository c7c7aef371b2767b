"""Query modules — importing this package fills registry.REGISTRY."""

from crm_etl_pipeline_spark.queries import (  # noqa: F401
    aggregates,
    bucketing_q,
    catalog_q,
    crm_q,
    decode_q,
    embeddings_q,
    events_q,
    gateway_q,
    joins,
    layout_q,
    llmops,
    multimodal_q,
    relational,
    scd_q,
    sketch_filters_q,
    sources_q,
    stats_q,
    streaming_q,
    transforms,
    windows,
)

# Queries the driver's bounded correctness prefix should check FIRST this
# round. Round-7 rotation: the final freshness drain, per the round-6
# verdict's top directive. After round 6 every one of the 167 registered
# queries has at least one driver-green row; the remaining debt is AGE.
# This window is: (a) the 17 queries whose latest row predates round 4
# (14 r2 + 3 r3, union over CORRECTNESS_r01-r06); (b) the queries
# whose code or oracle CHANGED this round or are newly registered
# (schema_evolution_read + scd2_compact_small_files +
# language_temperature_sample new;
# ab_test_conversion empty-arm guard; dq_audit_orders empty-load
# contract; wap_publish_roundtrip empty-batch rejection;
# streaming_rate_limit empty-fixture guard — changed code outranks an
# untouched twin's refresh, and the NULL-vector-contract members of the
# embedding family whose latest row predates r6); (c) the remaining
# slots on r4 rows, bench headliners and one-per-family
# representatives. After this round zero queries are older than r4 —
# a steady ~50/round rotation from round 8 on keeps every row <= 3
# rounds old.
#
# The r4 rows left out of this window (all pytest-oracle-green at
# HEAD, tests/test_oracle.py, and all code-identical this round;
# round-8 rotation picks them up first, together with the r6-row
# embedding-family queries the NULL-vector contract touched
# — ann_cosine_topk, ann_lsh_bucketed, ann_ivf_probe, ann_ivf_nprobe2,
# embedding_standardize, embedding_kmeans, embedding_centroid_per_label,
# embedding_norm_topk — all pytest-green at HEAD with clean-fixture
# hashes unchanged):
#   asof_join_latest_order, bucketed_join_colocated,
#   correlated_min_cost_supplier, disjunctive_filter_scan,
#   doc_repetition_ratio, exists_returned_lineitems, lag_order_gap_days,
#   latest_order_per_customer, lsh_bucket_profile, multimodal_manifest,
#   multimodal_features, multimodal_real_decode, multimodal_frame_sample,
#   ntile_order_value_quartiles, pack_training_sequences,
#   percent_rank_acctbal, range_join_clicks_before_purchase,
#   running_revenue, salted_user_event_totals, scd2_versioned_store,
#   simhash_near_dup, sliding_1h_user_value, streaming_dlq,
#   streaming_requeue, streaming_stateful_sessions, tfidf_top_terms,
#   topk_orders_by_revenue, topk_per_group.
#
# registry.load_all reorders REGISTRY to put these at the front; the rest
# follow in module order. Keep this list <= 50
# (test_driver_priority_window enforces the fit).
DRIVER_PRIORITY: list[str] = [
    # --- the 14 r2 rows (oldest in the registry) ---
    "contamination_ngram_overlap",
    "cube_lineitem_flags",
    "rollup_revenue",
    "pivot_status_by_priority",
    "having_filter",
    "kmv_distinct_sketch",
    "retry_and_dead_letter",
    "session_window_builtin",
    "tumbling_daily_counts",
    "train_split_stratified",
    "value_percentiles",
    "props_json_extract",
    "doc_fingerprint",
    "doc_quality_score",
    # --- the 3 r3 rows ---
    "sample_stratified_hashrank",
    "version_counts_per_key",
    "vocab_top_tokens",
    # --- the 6 changed/new queries of this round ---
    "schema_evolution_read",
    "scd2_compact_small_files",
    "ab_test_conversion",
    "dq_audit_orders",
    "wap_publish_roundtrip",
    "streaming_rate_limit",
    # --- 27 of the 50 r4 rows: headline twins first (flagged by the
    # round-6 verdict), then family representatives ---
    "typed_field_decode",
    "filtered_scan",
    "point_lookup",
    "html_strip_normalize",
    "array_csv_roundtrip",
    "date_parse_reformat",
    "safe_numeric_cast",
    "money_decimal_cast",
    "system_column_enrichment",
    "scd2_current_view",
    "scd2_soft_delete",
    "scd2_store_roundtrip",
    "streaming_scd2_state",
    "streaming_tumbling_counts",
    "grouping_sets_region_segment",
    "approx_value_percentiles",
    "flagship_segment_revenue",
    "pricing_summary",
    "minhash_near_dup",
    "dedup_components",
    "curation_pipeline",
    # new this round, never driver-checked (replaces the
    # streaming_stateful_sessions r4 refresh — its gap-session semantics
    # are twin-covered by session_window_builtin in-window and the
    # r6-fresh sessionization row)
    "language_temperature_sample",
    # --- the NULL-vector-contract queries whose latest row predates r6
    # (code+oracle changed this round; the r6-row members of the family
    # wait for the round-8 rotation) ---
    "embedding_near_dup",
    "knn_label_disagreement",
    "embedding_quantize_int8",
    "kmeans_cluster_purity",
    "ann_ivf_persisted_index",
]
