"""Query modules — importing this package fills registry.REGISTRY."""

from crm_etl_pipeline_spark.queries import (  # noqa: F401
    aggregates,
    bucketing_q,
    catalog_q,
    decode_q,
    embeddings_q,
    events_q,
    joins,
    llmops,
    multimodal_q,
    relational,
    scd_q,
    streaming_q,
    transforms,
    windows,
)

# Queries the driver's bounded correctness prefix should check FIRST this
# round: everything with no driver row yet plus the queries changed this
# round. registry.load_all reorders REGISTRY to put these at the front; the
# rest follow in module order. Keep this list ≤ ~50 names.
DRIVER_PRIORITY: list[str] = [
    # no driver row in any round (registered after the r3 window was set)
    "doc_repetition_ratio",
    "tfidf_top_terms",
    "pack_training_sequences",
    # reformulated this round: self-checking rank-error booleans with a
    # real TRUE oracle (was rows-only)
    "approx_value_percentiles",
    # changed this round: BUCKET_CAP modeled in the oracles + from_capped
    # edge keep-rule in dedup_components
    "minhash_near_dup",
    "simhash_near_dup",
    "embedding_near_dup",
    "dedup_components",
    "lsh_bucket_profile",
    # changed this round: first_attempts clamp (negative-value safety)
    "streaming_requeue",
    # changed this round: real PNG decode replaces fake_image_dims
    "multimodal_features",
    "multimodal_real_decode",
    "multimodal_manifest",
    "multimodal_frame_sample",
    # r3-fixed decimal set — keep in the window for re-confirmation
    "typed_field_decode",
    "bucketed_join_colocated",
    "grouping_sets_region_segment",
    "ntile_order_value_quartiles",
    # flagship + relational family
    "flagship_segment_revenue",
    "pricing_summary",
    "point_lookup",
    "filtered_scan",
    "topk_orders_by_revenue",
    "exists_returned_lineitems",
    "correlated_min_cost_supplier",
    "disjunctive_filter_scan",
    # scd / streaming
    "scd2_versioned_store",
    "scd2_current_view",
    "scd2_soft_delete",
    "scd2_store_roundtrip",
    "streaming_scd2_state",
    "streaming_tumbling_counts",
    "streaming_dlq",
    "streaming_stateful_sessions",
    # transforms
    "html_strip_normalize",
    "array_csv_roundtrip",
    "date_parse_reformat",
    "safe_numeric_cast",
    "money_decimal_cast",
    "system_column_enrichment",
    # windows
    "latest_order_per_customer",
    "running_revenue",
    "topk_per_group",
    "lag_order_gap_days",
    "asof_join_latest_order",
    "range_join_clicks_before_purchase",
    "sliding_1h_user_value",
    "salted_user_event_totals",
    "percent_rank_acctbal",
    # llmops composition
    "curation_pipeline",
]
