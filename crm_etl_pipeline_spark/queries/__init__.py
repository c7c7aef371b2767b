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
# round: everything with no driver row yet (r2 checked only the first 50
# registration slots) plus the queries changed this round. registry.load_all
# reorders REGISTRY to put these at the front; the rest follow in module
# order. Keep this list ≤ ~50 names.
DRIVER_PRIORITY: list[str] = [
    # changed this round (decimal→double edge casts) — need fresh driver rows
    "typed_field_decode",
    "bucketed_join_colocated",
    "grouping_sets_region_segment",
    "ntile_order_value_quartiles",
    "approx_value_percentiles",
    # flagship + relational family (r1-only or never checked)
    "flagship_segment_revenue",
    "pricing_summary",
    "point_lookup",
    "filtered_scan",
    "topk_orders_by_revenue",
    "exists_returned_lineitems",
    "correlated_min_cost_supplier",
    "disjunctive_filter_scan",
    # scd / streaming (never driver-checked)
    "scd2_versioned_store",
    "scd2_current_view",
    "scd2_soft_delete",
    "scd2_store_roundtrip",
    "streaming_scd2_state",
    "streaming_tumbling_counts",
    "streaming_dlq",
    "streaming_requeue",
    "streaming_stateful_sessions",
    # transforms (r1-only)
    "html_strip_normalize",
    "array_csv_roundtrip",
    "date_parse_reformat",
    "safe_numeric_cast",
    "money_decimal_cast",
    "system_column_enrichment",
    # windows (r1-only or never checked)
    "latest_order_per_customer",
    "running_revenue",
    "topk_per_group",
    "lag_order_gap_days",
    "asof_join_latest_order",
    "range_join_clicks_before_purchase",
    "sliding_1h_user_value",
    "salted_user_event_totals",
    "percent_rank_acctbal",
    # multimodal (never driver-checked)
    "multimodal_manifest",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_real_decode",
    # llmops tail that fell outside r2's 50-slot window
    "curation_pipeline",
    "lsh_bucket_profile",
    "vocab_top_tokens",
    "sample_stratified_hashrank",
    # near-dedup family: code changed this round (capped pair generation)
    "minhash_near_dup",
    "simhash_near_dup",
    "embedding_near_dup",
    "dedup_components",
]
