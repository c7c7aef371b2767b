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
# round. Round-5 final rotation: the window opened on the 42 queries whose
# latest driver row was CORRECTNESS_r02, but every operator ADDED during
# round 5 took a slot from an r2 refresh whose semantics a fresher twin
# already covers (each cede is justified inline below) — a first-ever
# driver row for a new operator outranks re-confirming a pytest-green r2
# row. Final mix: ~24 r2 refreshes + ~26 never-driver-checked round-5
# operators. Every query in or out of this window passes the stricter
# pytest oracle at HEAD (tests/test_oracle.py). registry.load_all reorders
# REGISTRY to put these at the front; the rest follow in module order.
# Keep this list <= 50 (test_driver_priority_window enforces the fit).
DRIVER_PRIORITY: list[str] = [
    # By end of round 5 every refresh slot was ceded to a never-checked
    # operator: a first-ever driver row outranks re-confirming a
    # pytest-green r2 row, and each ceding query's machinery is covered by
    # an r4-or-newer twin named in its cede note. All 50 slots now carry
    # queries with no driver row at all.
    # ann_cosine_topk ceded its slot (the last refresh holdout) to
    # knn_label_disagreement, which runs the IDENTICAL broadcast-probe +
    # fixed-dot + WindowGroupLimit machinery as a superset (labels joined
    # and voted) — the new first row re-verifies the old query's plan
    # shape in the same run.
    # ann_ivf_nprobe2 ceded its slot to copurchase_lift_topk:
    # ann_ivf_persisted_index holds a first r5 row on the same IVF
    # machinery with a wider probe.
    # ann_ivf_probe ceded its slot to cdc_derive_changes late in round 5:
    # knn_label_disagreement carries the fixed-dot machinery in the window
    # and ann_ivf_persisted_index exercises the IVF cell pruning path;
    # the CDC producer-side diff needs a first-ever row.
    # ann_lsh_bucketed ceded its slot to cdc_apply_snapshot: the fixed-dot
    # machinery rides in via knn_label_disagreement, and the sign-bucket
    # join shape holds an r4 row via embedding_near_dup.
    # catalog_drift ceded its slot to credential_rotation_schedule late in
    # round 5: the gateway family's two-phase global-sequence operator
    # needs a first row; catalog traversal is pytest-green at HEAD.
    # catalog_fields_tree ceded its slot to copurchase_pagerank: the
    # graph-centrality operator needs a first-ever row.
    # catalog_tree ceded its slot to triangle_count late in round 5: the
    # nested-traversal machinery holds an r4 row via typed_field_decode's
    # struct decode and stays pytest-green; the degree-oriented triangle
    # kernel needs a first-ever row.
    # composite_key_roundtrip ceded its slot to embedding_kmeans: a
    # first-ever row for an iterative training operator outranks another
    # catalog refresh (the family is pytest-green at HEAD).
    # contamination_ngram_overlap ceded its slot to embedding_quantize_int8:
    # the candidates-only shingle equi-join machinery holds an r4 row via
    # minhash_near_dup's verify stage.
    # cube_lineitem_flags ceded its slot to ann_ivf_persisted_index: the
    # grouping-sets engine path holds an r4 row
    # (grouping_sets_region_segment).
    # doc_fingerprint ceded its slot to funnel_conversion: the rolling
    # n-gram hash machinery is exercised by the r5-new repeated_span_mining
    # row and token_profile/text_stats stay in the window.
    # doc_quality_score ceded its slot to csv_source_roundtrip: the
    # single-scan quality column-algebra family holds r4/r5 rows via
    # doc_repetition_ratio and token_rarity_score.
    # embedding_centroid_per_label ceded its slot to embedding_standardize:
    # the identical (dim)-grain explode + exact fixed-point aggregate shape
    # now gets two first-ever r5 rows (standardize / quantize_int8).
    # embedding_norm_topk ceded its slot to cohort_retention: the four
    # ann_* rows being refreshed cover the embedding scan+topk shape.
    # event_dedup_last_write_wins ceded its slot to
    # streaming_moments_anomalies: exact_dedup_documents keeps its refresh
    # slot on the same keep-first semantics and the streaming dedup twin is
    # pytest-green at HEAD.
    # event_type_routing ceded its slot to rfm_segmentation: the IN-filter
    # dispatch semantic holds an r4 row via disjunctive_filter_scan and the
    # streaming routing twins (streaming_dlq / streaming_requeue).
    # exact_dedup_documents ceded its slot to robust_outliers_mad: the
    # hash-groupBy keep-first shape holds r5 rows via
    # dedup_incremental_new_docs and multimodal_byte_dedup.
    # fifo_head ceded its slot to record_linkage_fuzzy: the ordered
    # window-head shape holds r4 rows via latest_order_per_customer and
    # scd2_current_view (same row_number-1 plan, opposite sort).
    # having_filter ceded its slot to multimodal_decode_quarantine: the
    # post-aggregate filter semantic is exercised by the r4-verified
    # grouping_sets_region_segment and repeated_span_mining (HAVING twin).
    # hidden_field_projection ceded its slot to keyset_pagination_orders:
    # the F5 projection filter rides the same catalog machinery as the
    # three catalog refresh slots still in the window.
    # join_anti ceded its slot to pps_systematic_sample late in round 5:
    # the anti-join semantic holds r4-or-newer rows via
    # exists_returned_lineitems (its semi twin) and the r5-window
    # dedup_incremental_new_docs (an anti-join at its core), and the
    # two-phase prefix-sum sampler needs a first-ever row.
    # join_fk_enrichment ceded its slot to regional_supplier_volume: the FK
    # enrichment join is a sub-tree of the 6-way Q5 join getting its first
    # row.
    # join_full_outer ceded its slot to event_value_anomalies: the
    # full-outer SMJ shape gets fresh coverage via cdc_derive_changes and
    # incremental_agg_merge (both in the window for a first row).
    # join_left_missing ceded its slot to event_transition_matrix: the
    # left-join-null-filter shape is the anti-join twin with r4-or-newer
    # coverage via exists_returned_lineitems.
    # join_semi ceded its slot to kmeans_cluster_purity:
    # exists_returned_lineitems holds an r4 row on the semi semantic.
    # kmv_distinct_sketch ceded its slot to json_source_roundtrip: the
    # mergeable-sketch family holds an r4 row via approx_value_percentiles
    # (GK), and kmv passes the stricter pytest oracle at HEAD.
    # language_id_ngram ceded its slot to global_rank_two_phase: the
    # single-scan n-gram column algebra holds r4/r5 rows across the text
    # family, and a first row for the two-phase global-rank proof (the
    # documented window escalation, now implemented) outranks the refresh.
    # ngram_jaccard_verify ceded its slot to incremental_agg_merge late in
    # round 5: the candidates-only shingle equi-join holds an r4 row via
    # minhash_near_dup's verify stage, and the IVM merge proof needs a
    # first-ever row.
    # pivot_status_by_priority ceded its slot to
    # weighted_sample_allocation: the grouping-engine path holds an r4 row
    # (grouping_sets_region_segment).
    # props_from_json_typed ceded its slot to scd2_asof_snapshot: the
    # typed JSON-path machinery holds an r4 row via typed_field_decode,
    # and the time-travel read is a first-ever row on the SCD2 surface.
    # props_json_extract ceded its slot to gapfill_daily_user_revenue: its
    # typed twin props_from_json_typed stays in the window on the same
    # JSON-path machinery.
    # retry_and_dead_letter ceded its slot to multimodal_byte_dedup: its
    # streaming twins (streaming_dlq / streaming_requeue /
    # streaming_dlq_replay) hold r4-or-newer rows on the same semantics.
    # return_type_fallback ceded its slot to histogram_equi_depth: the
    # coalesce-typing machinery holds an r4 row via typed_field_decode and
    # the catalog family keeps a refresh slot.
    # rollup_revenue ceded its slot to backoff_penalty_audit late in round
    # 5: the grouping-engine path holds an r4 row via
    # grouping_sets_region_segment (ROLLUP is its subset shape), and the
    # gateway retry-ladder audit needs a first-ever row.
    # session_window_builtin ceded its slot to partition_pruned_scan: the
    # streaming twin streaming_stateful_sessions holds an r4 row on the
    # same gap-based semantics.
    # sessionization ceded its slot to approx_distinct_selfcheck late in
    # round 5: it is re-verified every bench run as a headline query, its
    # gap-window machinery holds an r4 row via streaming_stateful_sessions,
    # and the HLL error-contract proof needs a first-ever row.
    # setops_segments ceded its slot to dq_audit_orders: union/except/
    # intersect are engine-native plans with an r2 row and a green pytest
    # oracle at HEAD — the least distinctive machinery left in the window.
    # text_stats ceded its slot to histogram_order_values: token_profile
    # stays in the window and the single-scan column-algebra shape holds
    # r4/r5 rows via doc_repetition_ratio and token_rarity_score.
    # token_profile ceded its slot to ols_frequency_monetary: the
    # single-scan token-stats family holds r4/r5 rows via
    # doc_repetition_ratio, token_rarity_score and vocab_top_tokens (r3).
    # train_split_stratified ceded its slot to kmv_sketch_merge: the md5
    # hash-assignment idiom holds r5 rows via weighted_sample_allocation
    # and an r3 row via sample_stratified_hashrank.
    # tumbling_daily_counts ceded its slot to streaming_stream_stream_join:
    # its streaming twin streaming_tumbling_counts holds an r4 row on the
    # identical aggregation, and a first-ever driver row for a new operator
    # outranks refreshing a pytest-green r2 row.
    # value_percentiles ceded its slot to rate_limit_admission late in
    # round 5: the exact-percentile machinery holds an r4 row via
    # approx_value_percentiles' rank self-check and an r5-window slot via
    # histogram_equi_depth (the same exact-quantile boundary computation),
    # and the nested-window rate limiter needs a first-ever row.
    # new in round 5 (never driver-checked — must get their first row).
    # The 3 r3-verified queries (sample_stratified_hashrank,
    # version_counts_per_key, vocab_top_tokens) ceded their slots: an r3
    # row is within the two-round freshness tolerance, a missing row is not.
    #
    # Round-5 CONTINUATION rotation: 13 more operators landed after the
    # window above was set (prefix_filter_setsim_join and
    # streaming_rate_limit from the first r5 session; eleven from the
    # continuation session). Each takes a slot from a query whose
    # machinery a remaining in-window or r4-row twin covers:
    # rate_limit_admission ceded to streaming_rate_limit: both check the
    # SAME _ADMISSION_SQL oracle; the stateful applyInPandasWithState
    # limiter is the stricter execution of the identical admission model.
    # kmv_sketch_merge ceded to kmv_set_intersection: the union sketch IS
    # the merge applied (inclusion-exclusion needs it per type pair), and
    # the merge law stays pytest-green at HEAD.
    # weighted_sample_allocation ceded to its PPS twin
    # pps_systematic_sample (in window): same exact-weight prefix math,
    # systematic variant is the stricter check.
    # histogram_order_values ceded to histogram_equi_depth (in window):
    # both exercise the scalar-attach + bucket algebra; equi-depth adds
    # the exact-quantile boundary on top.
    # embedding_standardize ceded to embedding_quantize_int8 (in window):
    # identical per-dim exact aggregate + elementwise map shape.
    # json_source_roundtrip ceded to csv_source_roundtrip (in window):
    # the same schema-on-read roundtrip plumbing, one format apart.
    # event_value_anomalies ceded to winsorize_event_values: the same
    # per-type bounds-broadcast shape gets a first-ever row, and
    # robust_outliers_mad (in window) covers outlier detection proper.
    # cdc_apply_snapshot ceded to cdc_derive_changes (in window): inverse
    # operators on the same op-typed changeset; the derive→apply
    # roundtrip is pytest-proven (test_gateway_cdc).
    # triangle_count ceded to copurchase_pagerank (in window): the
    # co-purchase edge derivation is shared; the iterative kernel is the
    # stricter half.
    # embedding_kmeans ceded to kmeans_cluster_purity (in window), which
    # composes the k-means oracle VERBATIM — its row re-verifies k-means.
    # multimodal_byte_dedup ceded to boilerplate_line_removal: binary
    # plumbing holds r4 rows (multimodal_manifest/features) and the
    # hash-groupBy dedup shape rides in via dedup_incremental_new_docs.
    # chunk_documents ceded to pack_training_sequences' r4 row: the same
    # integer token-window math, bin-packing being the superset.
    # dq_audit_orders ceded to the two NEW order-table audits in the
    # window (shipping_delay_audit, benford_price_audit); its planted-rot
    # path stays pytest-green at HEAD.
    "streaming_dlq_replay",
    "pii_redaction",
    "dedup_incremental_new_docs",
    "token_rarity_score",
    "repeated_span_mining",
    "bm25_topk_search",
    "inverted_index_postings",
    "streaming_stream_stream_join",
    "partition_pruned_scan",
    "ann_ivf_persisted_index",
    "multimodal_decode_quarantine",
    "funnel_conversion",
    "cohort_retention",
    "rfm_segmentation",
    "record_linkage_fuzzy",
    "gapfill_daily_user_revenue",
    "embedding_quantize_int8",
    "csv_source_roundtrip",
    "copurchase_lift_topk",
    "event_transition_matrix",
    "regional_supplier_volume",
    "streaming_moments_anomalies",
    "ols_frequency_monetary",
    "keyset_pagination_orders",
    "global_rank_two_phase",
    "scd2_asof_snapshot",
    "histogram_equi_depth",
    "robust_outliers_mad",
    "copurchase_pagerank",
    "kmeans_cluster_purity",
    "credential_rotation_schedule",
    "backoff_penalty_audit",
    "cdc_derive_changes",
    "incremental_agg_merge",
    "pps_systematic_sample",
    "approx_distinct_selfcheck",
    "knn_label_disagreement",
    # first r5 session's late registrations
    "prefix_filter_setsim_join",
    "streaming_rate_limit",
    # continuation-session operators (sketch filters, attribution,
    # profiling, curation, streaming audit)
    "bloom_semi_join_prune",
    "countmin_heavy_hitters",
    "kmv_set_intersection",
    "attribution_last_touch",
    "chi_square_segment_nation",
    "shipping_delay_audit",
    # mom_revenue_growth ceded its slot to ewma_user_value late in the
    # continuation session: the lag-window-on-pre-agg shape is the least
    # novel machinery of the batch (running_revenue / lag_order_gap_days
    # carry the same windowed-lag plan and it stays pytest-green at
    # HEAD), while ewma is the ONLY query on the batch grouped-Arrow
    # applyInPandas surface — which otherwise has no driver row at all.
    "ewma_user_value",
    "boilerplate_line_removal",
    "streaming_late_data_audit",
    "winsorize_event_values",
    "benford_price_audit",
    # Ceded queries queue for their next driver row in round 6 (all
    # pytest-oracle-green at HEAD): chunk_documents, multimodal_byte_dedup,
    # embedding_kmeans, embedding_standardize, event_value_anomalies,
    # histogram_order_values, weighted_sample_allocation,
    # json_source_roundtrip, cdc_apply_snapshot, kmv_sketch_merge,
    # rate_limit_admission, triangle_count, dq_audit_orders, and the
    # post-rotation registrations mom_revenue_growth (ceded to ewma),
    # decile_gains_table, ab_test_conversion, session_path_trigrams,
    # orc_source_roundtrip, interpolate_daily_user_value,
    # wap_publish_roundtrip, pearson_correlation_matrix,
    # abc_pareto_classification.
]
